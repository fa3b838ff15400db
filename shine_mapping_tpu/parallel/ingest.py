"""Multi-host sharded data ingest.

The data phase (scan I/O, crop, downsample, normals, SOR, ray sampling —
``LiDARDataset.load_and_sample``) is pure host compute and the dominant
startup cost on long sequences.  The reference is single-process
(dataset/lidar_dataset.py runs every frame inline); multi-host here shards
it round-robin: in round ``r`` process ``p`` computes frame
``frame_ids[r*world + p]``, the per-frame products are exchanged with
``jax.experimental.multihost_utils.process_allgather`` (padded to the round
maximum, bytes carried as uint32 so float64 survives x64-disabled JAX), and
EVERY process integrates ALL frames in frame order.

Because ``load_and_sample`` seeds its rng per frame ((cfg.seed, frame_id) —
data/dataset.py:152), the integrated pool and octree are bit-identical to a
single-process data phase regardless of which process computed which frame.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..data.io import PointCloud

# fixed exchange schema: (trailing columns, dtype); rows are padded to the
# round max and carried as uint32 words
_SCHEMA = (
    ("origin", 3, np.float64),
    ("points_s", 3, np.float64),
    ("fd_points", 3, np.float64),
    ("fd_normals", 3, np.float64),
    ("fd_intensity", 1, np.float64),
    ("coord", 3, np.float64),
    ("sdf_label", 1, np.float64),
    ("normal_label", 3, np.float64),
    ("sem_label", 1, np.int64),
    ("weight", 1, np.float64),
    ("sample_depth", 1, np.float64),
    ("ray_depth", 1, np.float64),
)


def _pack_prep(prep: Optional[dict]) -> List[Optional[np.ndarray]]:
    """Frame product dict -> ordered list matching _SCHEMA (None = absent)."""
    if prep is None:
        return [None] * len(_SCHEMA)
    fd = prep["frame_down"]
    coord, sdf, normal, sem, weight, sdepth, rdepth = prep["sampled"]
    out = [
        np.asarray(prep["origin"], np.float64).reshape(1, 3),
        np.asarray(prep["points_s"], np.float64).reshape(-1, 3),
        np.asarray(fd.points, np.float64).reshape(-1, 3),
        None if fd.normals is None else np.asarray(fd.normals, np.float64),
        None if fd.intensity is None
        else np.asarray(fd.intensity, np.float64).reshape(-1, 1),
        np.asarray(coord, np.float64).reshape(-1, 3),
        np.asarray(sdf, np.float64).reshape(-1, 1),
        None if normal is None else np.asarray(normal, np.float64),
        None if sem is None else np.asarray(sem, np.int64).reshape(-1, 1),
        np.asarray(weight, np.float64).reshape(-1, 1),
        np.asarray(sdepth, np.float64).reshape(-1, 1),
        np.asarray(rdepth, np.float64).reshape(-1, 1),
    ]
    return out


def _unpack_prep(arrs: Sequence[Optional[np.ndarray]], frame_id: int) -> dict:
    """Inverse of _pack_prep."""
    (origin, points_s, fd_points, fd_normals, fd_intensity, coord, sdf,
     normal, sem, weight, sdepth, rdepth) = arrs
    frame_down = PointCloud(
        points=fd_points,
        normals=fd_normals,
        intensity=None if fd_intensity is None else fd_intensity[:, 0],
    )
    return {
        "frame_id": frame_id,
        "origin": origin[0],
        "points_s": points_s,
        "frame_down": frame_down,
        "sampled": (
            coord,
            sdf[:, 0],
            normal,
            None if sem is None else sem[:, 0],
            weight[:, 0],
            sdepth[:, 0],
            rdepth[:, 0],
        ),
    }


def _as_u32_rows(a: np.ndarray, cols: int, dtype) -> np.ndarray:
    """(n, cols) typed array -> (n, cols * itemsize/4) uint32 view copy."""
    a = np.ascontiguousarray(a.reshape(-1, cols).astype(dtype, copy=False))
    return a.view(np.uint32).reshape(a.shape[0], -1)


def _exchange_round(
    local: List[Optional[np.ndarray]], world: int
) -> List[List[Optional[np.ndarray]]]:
    """All-gather one round's frame products across processes.

    ``local``: this process's _pack_prep output.  Returns
    ``per_proc[p][j]`` numpy arrays (None where absent).
    """
    from jax.experimental import multihost_utils as mh

    lens = np.array(
        [(-1 if a is None else a.shape[0]) for a in local], np.int32
    )
    all_lens = np.asarray(mh.process_allgather(lens, tiled=False))
    assert all_lens.shape == (world, len(_SCHEMA))

    per_proc: List[List[Optional[np.ndarray]]] = [
        [None] * len(_SCHEMA) for _ in range(world)
    ]
    for j, (_, cols, dtype) in enumerate(_SCHEMA):
        maxn = int(all_lens[:, j].max())
        if maxn < 0:
            continue  # absent everywhere this round
        words = cols * np.dtype(dtype).itemsize // 4
        a = local[j]
        buf = np.zeros((max(maxn, 1), words), np.uint32)
        if a is not None and a.shape[0] > 0:
            buf[: a.shape[0]] = _as_u32_rows(a, cols, dtype)
        out = np.asarray(mh.process_allgather(buf, tiled=False))
        for p in range(world):
            n = int(all_lens[p, j])
            if n < 0:
                continue
            per_proc[p][j] = (
                np.ascontiguousarray(out[p, :n])
                .view(dtype)
                .reshape(n, cols)
            )
    return per_proc


def process_frames_multihost(
    dataset, frame_ids: Sequence[int], rank: int, world: int,
    incremental_on: bool = False,
) -> int:
    """Sharded data phase: each process preprocesses every ``world``-th
    frame, products are all-gathered, all processes integrate all frames in
    frame order.  Returns the number of new samples (same on every
    process)."""
    total = 0
    for r0 in range(0, len(frame_ids), world):
        round_ids = list(frame_ids[r0 : r0 + world])
        prep = (
            dataset.load_and_sample(round_ids[rank])
            if rank < len(round_ids)
            else None
        )
        gathered = _exchange_round(_pack_prep(prep), world)
        for i, fid in enumerate(round_ids):
            total += dataset._integrate_frame(
                _unpack_prep(gathered[i], fid), incremental_on
            )
    return total
