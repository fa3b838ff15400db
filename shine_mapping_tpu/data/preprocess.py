"""Host-side per-frame point-cloud preprocessing.

Replaces the Open3D C++ calls of reference dataset/lidar_dataset.py:138-164:
axis-aligned crop, random / voxel downsampling, statistical outlier removal
and normal estimation — all vectorized numpy (+ scipy cKDTree where a
neighborhood search is needed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .io import PointCloud


def crop_bbx(
    pc: PointCloud, min_bound: np.ndarray, max_bound: np.ndarray
) -> PointCloud:
    """Keep points inside an axis-aligned box (o3d crop equivalent)."""
    p = pc.points
    mask = np.all((p >= min_bound) & (p <= max_bound), axis=1)
    return pc.select(mask)


def filter_min_range(pc: PointCloud, min_range: float, z_th: float) -> PointCloud:
    """Reference ``preprocess_kitti`` (dataset/lidar_dataset.py:334-339):
    drop points below z_th and closer than min_range to the sensor."""
    p = pc.points
    mask = p[:, 2] > z_th
    pc = pc.select(mask)
    mask = np.linalg.norm(pc.points, axis=1) >= min_range
    return pc.select(mask)


def random_downsample(pc: PointCloud, ratio: float, rng: np.random.Generator) -> PointCloud:
    """Keep a random ``ratio`` of the points (o3d random_down_sample)."""
    n = len(pc)
    k = int(round(n * ratio))
    if k >= n:
        return pc
    idx = rng.choice(n, size=k, replace=False)
    return pc.select(np.sort(idx))


def voxel_downsample(pc: PointCloud, voxel_size: float) -> PointCloud:
    """Average points per voxel (o3d voxel_down_sample equivalent)."""
    if len(pc) == 0:
        return pc
    p = pc.points
    vmin = p.min(axis=0)
    keys = np.floor((p - vmin) / voxel_size).astype(np.int64)
    # pack to a single key (30 bits per axis is plenty for any real scan)
    packed = (keys[:, 0] << 42) | (keys[:, 1] << 21) | keys[:, 2]
    uniq, inv, counts = np.unique(packed, return_inverse=True, return_counts=True)

    def mean_per_voxel(attr):
        if attr is None:
            return None
        if attr.ndim == 1:
            s = np.bincount(inv, weights=attr, minlength=len(uniq))
            return s / counts
        out = np.empty((len(uniq), attr.shape[1]))
        for c in range(attr.shape[1]):
            out[:, c] = np.bincount(inv, weights=attr[:, c], minlength=len(uniq)) / counts
        return out

    normals = mean_per_voxel(pc.normals)
    if normals is not None:
        norm = np.linalg.norm(normals, axis=1, keepdims=True)
        normals = normals / np.maximum(norm, 1e-12)
    return PointCloud(
        points=mean_per_voxel(p),
        normals=normals,
        colors=mean_per_voxel(pc.colors),
        intensity=mean_per_voxel(pc.intensity),
    )


def statistical_outlier_removal(
    pc: PointCloud, nb_neighbors: int = 25, std_ratio: float = 2.5
) -> PointCloud:
    """o3d remove_statistical_outlier equivalent (reference
    dataset/lidar_dataset.py:160-164): drop points whose mean kNN distance
    exceeds global mean + std_ratio * std."""
    from scipy.spatial import cKDTree

    if len(pc) <= nb_neighbors:
        return pc
    tree = cKDTree(pc.points, balanced_tree=False)
    d, _ = tree.query(pc.points, k=nb_neighbors + 1, workers=-1)
    mean_d = d[:, 1:].mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    return pc.select(mean_d <= thresh)


def _smallest_eigvec_3x3(cov: np.ndarray) -> np.ndarray:
    """Unit eigenvector of the smallest eigenvalue for a batch of symmetric
    3x3 matrices, in closed form (trigonometric eigenvalues + null-space
    column pick) — fully vectorized; ~20x faster than the LAPACK loop
    ``np.linalg.eigh`` runs per matrix at 100k points.

    Degenerate neighborhoods (isotropic / repeated smallest eigenvalue)
    fall back to an arbitrary unit vector; callers mask those separately
    via their neighbor-count checks.
    """
    A = cov.astype(np.float64)
    n = A.shape[0]
    tr = np.trace(A, axis1=1, axis2=2)
    q = tr / 3.0
    B = A - q[:, None, None] * np.eye(3)
    p2 = np.einsum("nab,nab->n", B, B) / 6.0
    p = np.sqrt(np.maximum(p2, 0.0))
    # det(B) / (2 p^3), clamped into acos domain
    detB = np.linalg.det(B)
    safe_p = np.where(p > 0, p, 1.0)
    r = np.clip(detB / (2.0 * safe_p**3), -1.0, 1.0)
    phi = np.arccos(r) / 3.0
    # phi in [0, pi/3]: cos(phi) largest, cos(phi + 2pi/3) smallest
    eig2 = q + 2.0 * p * np.cos(phi)
    eig0 = q + 2.0 * p * np.cos(phi + 2.0 * np.pi / 3.0)
    eig1 = tr - eig0 - eig2
    # (A - eig1 I)(A - eig2 I) has columns spanning the eig0 eigenspace
    M = np.matmul(
        A - eig1[:, None, None] * np.eye(3),
        A - eig2[:, None, None] * np.eye(3),
    )
    norms = np.linalg.norm(M, axis=1)  # column norms (n, 3)
    col = np.argmax(norms, axis=1)
    v = M[np.arange(n), :, col]
    vn = np.linalg.norm(v, axis=1)
    # repeated smallest eigenvalue (planar-isotropic / spherical): the
    # product collapses; any unit vector is a valid answer
    bad = vn < 1e-20
    v[bad] = [0.0, 0.0, 1.0]
    vn[bad] = 1.0
    return (v / vn[:, None]).astype(np.float32)


def estimate_normals(
    pc: PointCloud,
    radius: float = 0.2,
    max_nn: int = 20,
    orient_towards: Optional[np.ndarray] = None,
) -> PointCloud:
    """PCA normal estimation within a hybrid radius/kNN neighborhood
    (o3d estimate_normals KDTreeSearchParamHybrid equivalent, reference
    dataset/lidar_dataset.py:145-150), optionally oriented toward the sensor."""
    from scipy.spatial import cKDTree

    p = pc.points
    n = len(pc)
    tree = cKDTree(p, balanced_tree=False)
    d, idx = tree.query(
        p, k=min(max_nn, n), distance_upper_bound=radius, workers=-1
    )
    if d.ndim == 1:  # k == 1 edge case
        d, idx = d[:, None], idx[:, None]
    # batched PCA: masked neighbor gather -> per-point 3x3 covariance ->
    # batched eigh (LAPACK loop in C); smallest-eigenvalue eigenvector
    valid = np.isfinite(d)
    counts = valid.sum(axis=1)
    # missing neighbors are reported as idx == n; clamp (cheaper than a
    # where) and cast narrow — the (n, k) gather below is the widest alloc
    safe_idx = np.minimum(idx, n - 1).astype(np.int32)
    p32 = np.ascontiguousarray(p, dtype=np.float32)
    q = p32[safe_idx]  # (n, k, 3); masked/centred in place below
    w = valid[..., None].astype(np.float32)
    mean = np.einsum("nkc,nkc->nc", q, np.broadcast_to(w, q.shape))
    mean /= np.maximum(counts, 1)[:, None]
    q -= mean[:, None, :]
    q *= w
    cov = np.empty((n, 3, 3), np.float32)
    for a in range(3):
        for b in range(a, 3):
            cov[:, a, b] = cov[:, b, a] = np.einsum("nk,nk->n", q[:, :, a], q[:, :, b])
    ok = counts >= 3
    cov[~ok] = np.eye(3, dtype=np.float32)  # placeholder, overwritten below
    normals = _smallest_eigvec_3x3(cov).astype(p.dtype)
    normals[~ok] = [0.0, 0.0, 1.0]
    if orient_towards is not None:
        to_sensor = orient_towards[None, :] - p
        flip = np.sum(normals * to_sensor, axis=1) < 0
        normals[flip] *= -1
    return PointCloud(p, normals, pc.colors, pc.intensity)
