"""Ray-wise training-sample generation.

Parity target: reference ``dataSampler.sample`` (utils/data_sampler.py:18-139).
Given a frame's measured surface points (scaled to the [-1,1] cube) and the
sensor origin, generate per-ray:

1. close-to-surface samples, uniform in +-surface_sample_range (labels =
   signed displacement along the ray, behind surface positive),
2. clearance samples just in front of the band,
3. free-space samples from free_min_ratio*d up to d + free_sample_end_dist,

with projective-SDF labels, signed sample weights (negative = free-space /
clearance), per-sample depths and ray distances, reordered ray-major —
identical layout and label math to the reference, vectorized host-side numpy
(fixed per-point sample counts mean the output shape is
``N * (surface_n + clearance_n + free_n)``, statically known per frame).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class SamplerParams:
    scale: float
    surface_sample_range_m: float
    surface_sample_n: int
    clearance_dist_m: float
    clearance_sample_n: int
    free_sample_begin_ratio: float
    free_sample_end_dist_m: float
    free_sample_n: int
    sigma_sigmoid_m: float
    behind_dropoff_on: bool = False
    dropoff_min_sigma: float = 1.0
    dropoff_max_sigma: float = 5.0

    @classmethod
    def from_config(cls, cfg) -> "SamplerParams":
        return cls(
            scale=cfg.scale,
            surface_sample_range_m=cfg.surface_sample_range_m,
            surface_sample_n=cfg.surface_sample_n,
            clearance_dist_m=cfg.clearance_dist_m,
            clearance_sample_n=cfg.clearance_sample_n,
            free_sample_begin_ratio=cfg.free_sample_begin_ratio,
            free_sample_end_dist_m=cfg.free_sample_end_dist_m,
            free_sample_n=cfg.free_sample_n,
            sigma_sigmoid_m=cfg.sigma_sigmoid_m,
            behind_dropoff_on=cfg.behind_dropoff_on,
            dropoff_min_sigma=cfg.dropoff_min_sigma,
            dropoff_max_sigma=cfg.dropoff_max_sigma,
        )

    @property
    def all_sample_n(self) -> int:
        return self.surface_sample_n + self.clearance_sample_n + self.free_sample_n


def sample_rays(
    points: np.ndarray,
    sensor_origin: np.ndarray,
    params: SamplerParams,
    rng: np.random.Generator,
    normals: Optional[np.ndarray] = None,
    sem_labels: Optional[np.ndarray] = None,
):
    """Vectorized transcription of utils/data_sampler.py:18-139.

    Args:
        points: (N, 3) measured points in the scaled [-1, 1] frame.
        sensor_origin: (3,) scaled sensor position.
        params: sampling hyper-parameters (already metre-scaled by `scale`
            internally, like the reference).
        rng: numpy random generator (distribution-parity; bitstreams differ
            from the torch reference by design).

    Returns (ray-major ordering, matching utils/data_sampler.py:123-134):
        coords (N*A, 3), sdf_labels (N*A,), normal_labels (N*A,3)|None,
        sem_labels (N*A,)|None, weights (N*A,), sample_depths (N*A,) [m],
        ray_depths (N,) [m]
    """
    scale = params.scale
    range_s = params.surface_sample_range_m * scale
    clearance_s = params.clearance_dist_m * scale
    free_end_s = params.free_sample_end_dist_m * scale
    s_n = params.surface_sample_n
    c_n = params.clearance_sample_n
    f_n = params.free_sample_n
    a_n = params.all_sample_n
    free_min_ratio = params.free_sample_begin_ratio
    sigma_base = params.sigma_sigmoid_m * scale

    shift = points - sensor_origin[None, :]
    n = shift.shape[0]
    dist = np.linalg.norm(shift, axis=1, keepdims=True)  # (N, 1) scaled

    # part 1: +- band around the measured surface point
    surf_disp = (rng.random((n * s_n, 1)) - 0.5) * 2.0 * range_s
    rep = np.tile(dist, (s_n, 1))
    surf_ratio = surf_disp / rep + 1.0

    # part 2: clearance just in front of the band
    clr_disp = -rng.random((n * c_n, 1)) * clearance_s - range_s
    rep = np.tile(dist, (c_n, 1))
    clr_ratio = clr_disp / rep + 1.0

    # part 3: free space from free_min_ratio*d to d + free_end
    rep = np.tile(dist, (f_n, 1))
    free_max_ratio = free_end_s / rep + 1.0
    free_ratio = (
        rng.random((n * f_n, 1)) * (free_max_ratio - free_min_ratio)
        + free_min_ratio
    )
    free_disp = (free_ratio - 1.0) * rep

    all_disp = np.concatenate([surf_disp, clr_disp, free_disp], axis=0)
    all_ratio = np.concatenate([surf_ratio, clr_ratio, free_ratio], axis=0)

    rep_points = np.tile(shift, (a_n, 1))
    rep_dist = np.tile(dist, (a_n, 1))
    coords = rep_points * all_ratio + sensor_origin[None, :]

    depths = (rep_dist * all_ratio) / scale  # metres

    weights = np.ones_like(depths)
    if params.behind_dropoff_on:
        # reference utils/data_sampler.py:93-100
        dd = params.dropoff_max_sigma - params.dropoff_min_sigma
        behind = (rep_dist * (all_ratio - 1.0) / sigma_base)[:, 0]
        drop = (params.dropoff_max_sigma - behind) / dd
        weights *= np.clip(drop, 0.0, 1.0)[:, None]
    # negative weight flags non-surface samples (utils/data_sampler.py:102-103)
    weights[n * s_n:] *= -1.0

    ray_depths = dist[:, 0] / scale  # metres
    sdf_labels = all_disp[:, 0]  # projective distance, behind +

    normal_labels = None
    if normals is not None:
        normal_labels = np.tile(normals, (a_n, 1))
    sem_out = None
    if sem_labels is not None:
        surf_sem = np.tile(sem_labels, s_n)
        other_sem = np.zeros(n * (c_n + f_n), dtype=sem_labels.dtype)
        sem_out = np.concatenate([surf_sem, other_sem])

    # reorder from class-major to ray-major (utils/data_sampler.py:123-134)
    def ray_major(x):
        if x is None:
            return None
        if x.ndim == 2 and x.shape[1] == 3:
            return x.reshape(a_n, n, 3).transpose(1, 0, 2).reshape(-1, 3)
        return x.reshape(a_n, n).transpose(1, 0).reshape(-1)

    return (
        ray_major(coords),
        ray_major(sdf_labels),
        ray_major(normal_labels),
        ray_major(sem_out),
        ray_major(weights[:, 0]),
        ray_major(depths[:, 0]),
        ray_depths,
    )
