"""Synthetic LiDAR world for end-to-end tests.

Simulates scans of an analytic scene (ground plane + sphere) from a moving
sensor, written in KITTI layout (.bin scans + poses.txt + calib.txt) so the
full driver stack — I/O, poses, preprocessing, sampling, training, meshing,
eval — runs exactly as it would on real data.
"""

from __future__ import annotations

import os

import numpy as np

SPHERE_C = np.array([6.0, 0.0, 1.0])
SPHERE_R = 1.0
GROUND_Z = 0.0


def scene_sdf(p: np.ndarray) -> np.ndarray:
    """Analytic SDF of the scene (used for gt checks)."""
    d_plane = p[:, 2] - GROUND_Z
    d_sphere = np.linalg.norm(p - SPHERE_C[None, :], axis=1) - SPHERE_R
    return np.minimum(d_plane, d_sphere)


def _ray_scene_hit(origins: np.ndarray, dirs: np.ndarray, max_range=30.0):
    """First intersection of rays with ground plane and sphere."""
    t_best = np.full(origins.shape[0], np.inf)
    # plane z = GROUND_Z
    dz = dirs[:, 2]
    tp = (GROUND_Z - origins[:, 2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
    ok = (tp > 0.1) & (dz < 0)
    t_best = np.where(ok, np.minimum(t_best, tp), t_best)
    # sphere
    oc = origins - SPHERE_C[None, :]
    b = np.einsum("ij,ij->i", oc, dirs)
    c = np.einsum("ij,ij->i", oc, oc) - SPHERE_R ** 2
    disc = b * b - c
    hit = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    ts = -b - sq
    ok = hit & (ts > 0.1)
    t_best = np.where(ok, np.minimum(t_best, ts), t_best)
    valid = np.isfinite(t_best) & (t_best < max_range)
    return t_best, valid


def simulate_scan(pose: np.ndarray, n_az=180, n_el=24, rng=None) -> np.ndarray:
    """One LiDAR scan (sensor-frame points) from a world pose."""
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(np.deg2rad(-25), np.deg2rad(8), n_el)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    dirs_s = np.stack(
        [np.cos(ee) * np.cos(aa), np.cos(ee) * np.sin(aa), np.sin(ee)], axis=-1
    ).reshape(-1, 3)
    R, t = pose[:3, :3], pose[:3, 3]
    dirs_w = dirs_s @ R.T
    origins = np.tile(t[None, :], (dirs_w.shape[0], 1))
    trange, valid = _ray_scene_hit(origins, dirs_w)
    pts_w = origins[valid] + dirs_w[valid] * trange[valid][:, None]
    if rng is not None:  # measurement noise
        pts_w = pts_w + rng.normal(0, 0.005, pts_w.shape)
    # back to sensor frame
    return (pts_w - t[None, :]) @ R


def make_kitti_dataset(root: str, n_frames: int = 5, seed: int = 0) -> str:
    """Write a synthetic sequence in KITTI layout; returns the root dir."""
    rng = np.random.default_rng(seed)
    pc_dir = os.path.join(root, "velodyne")
    os.makedirs(pc_dir, exist_ok=True)
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [i * 1.0, 0.0, 1.5]  # move along +x at 1.5 m height
        poses.append(T)
        pts = simulate_scan(T, rng=rng).astype(np.float32)
        scan = np.concatenate([pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1)
        scan.tofile(os.path.join(pc_dir, f"{i:06d}.bin"))
    with open(os.path.join(root, "calib.txt"), "w") as f:
        eye = " ".join(str(v) for v in np.eye(4)[:3].reshape(-1))
        f.write(f"Tr: {eye}\n")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    return root


def gt_surface_points(n: int = 200_000, seed: int = 1, x_range=(-2, 10), r=12.0):
    """Dense ground-truth samples of the visible scene surfaces."""
    rng = np.random.default_rng(seed)
    n_plane = n * 3 // 4
    xy = rng.uniform([x_range[0], -r], [x_range[1], r], (n_plane, 2))
    plane = np.concatenate([xy, np.full((n_plane, 1), GROUND_Z)], axis=1)
    nv = n - n_plane
    v = rng.standard_normal((nv, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sphere = SPHERE_C[None, :] + v * SPHERE_R
    sphere = sphere[sphere[:, 2] > 0.05]  # above ground
    return np.concatenate([plane, sphere])
