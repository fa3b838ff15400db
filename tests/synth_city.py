"""Synthetic multi-block CITY world — the KITTI-scale proxy.

No network egress exists in this environment, so the largest-credible
stand-in for the reference's KITTI demo (reference Dockerfile:39,
config/kitti/docker_kitti_batch.yaml) is generated analytically: a street
grid of building blocks, parked and MOVING cars, and street furniture,
scanned by a rotating-head LiDAR from a trajectory with a turn, written in
KITTI layout (.bin scans + semantic-kitti .label files + poses.txt +
calib.txt) so the full driver stack — I/O, poses, semantic filtering
(including the moving-object filter), preprocessing, sampling, rotating
sub-pools, training, meshing, eval — runs exactly as on real data.

Semantics use raw semantic-kitti ids (data/semantic_kitti.py):
road 40, building 50, car 10 (parked), moving-car 252 (dropped by
cfg.filter_moving_object), pole 80.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

ROAD_RAW = 40
BUILDING_RAW = 50
CAR_RAW = 10
MOVING_CAR_RAW = 252
POLE_RAW = 80

BLOCK_PITCH = 44.0  # street-to-street spacing (m)
STREET_W = 14.0     # street width (m)


@dataclass
class City:
    """Axis-aligned-box world + moving actors."""

    # static boxes: (B, 3) min, (B, 3) max, (B,) raw label
    bmin: np.ndarray
    bmax: np.ndarray
    blabel: np.ndarray
    # moving cars: base position (M, 3), velocity (M, 3) m/frame, size (3,)
    mv_base: np.ndarray
    mv_vel: np.ndarray
    mv_size: np.ndarray = field(
        default_factory=lambda: np.array([4.2, 1.8, 1.6]))

    def moving_boxes(self, frame: int):
        c = self.mv_base + self.mv_vel * frame
        half = self.mv_size / 2
        bmin = c - half[None, :]
        bmin[:, 2] = 0.0
        bmax = c + half[None, :]
        bmax[:, 2] = self.mv_size[2]
        return bmin, bmax


def build_city(seed: int = 0, n_blocks_x: int = 6, n_blocks_y: int = 3,
               n_moving: int = 4) -> City:
    """Street grid of building blocks around the x-axis trajectory.

    Blocks sit on a (BLOCK_PITCH x BLOCK_PITCH) grid; each holds 1-3
    buildings with random footprints/heights, parked cars along the street
    edges, and poles at the corners.
    """
    rng = np.random.default_rng(seed)
    bmins, bmaxs, labels = [], [], []
    half_inner = (BLOCK_PITCH - STREET_W) / 2.0
    for bx in range(n_blocks_x):
        for by in range(-(n_blocks_y // 2) - 1, n_blocks_y // 2 + 1):
            # streets run along the x axis at y = k*PITCH and along y at
            # x = k*PITCH; blocks sit centered between them, so the main
            # street (y = 0) and every crossing stay clear of buildings
            cx = (bx + 0.5) * BLOCK_PITCH
            cy = (by + 0.5) * BLOCK_PITCH
            # buildings inside the block footprint
            n_b = rng.integers(1, 4)
            for _ in range(n_b):
                w = rng.uniform(8.0, half_inner * 2 - 2.0)
                d = rng.uniform(8.0, half_inner * 2 - 2.0)
                h = rng.uniform(5.0, 22.0)
                ox = rng.uniform(-(half_inner - w / 2), half_inner - w / 2)
                oy = rng.uniform(-(half_inner - d / 2), half_inner - d / 2)
                bmins.append([cx + ox - w / 2, cy + oy - d / 2, 0.0])
                bmaxs.append([cx + ox + w / 2, cy + oy + d / 2, h])
                labels.append(BUILDING_RAW)
            # parked cars curbside along the block's street-facing edge
            # (just INSIDE the block margin, so the driving lanes and the
            # sensor trajectory stay clear of static geometry)
            for _ in range(rng.integers(1, 4)):
                px = cx + rng.uniform(-half_inner + 3, half_inner - 3)
                py = cy - half_inner + 1.2
                bmins.append([px - 2.1, py - 0.9, 0.0])
                bmaxs.append([px + 2.1, py + 0.9, 1.55])
                labels.append(CAR_RAW)
            # a pole at the block corner
            px, py = cx - half_inner + 0.5, cy - half_inner + 0.5
            bmins.append([px - 0.15, py - 0.15, 0.0])
            bmaxs.append([px + 0.15, py + 0.15, 5.0])
            labels.append(POLE_RAW)
    # moving cars drive the main street's side lanes (the sensor holds the
    # center, so passing cars never engulf the scan), spread along the
    # whole corridor
    lane = rng.choice([-1.0, 1.0], n_moving) * rng.uniform(
        2.8, 5.2, n_moving)
    mv_base = np.stack([
        rng.uniform(10.0, n_blocks_x * BLOCK_PITCH * 0.8, n_moving),
        lane,
        np.zeros(n_moving),
    ], axis=1)
    mv_vel = np.stack([
        rng.uniform(0.8, 2.5, n_moving) * rng.choice([-1.0, 1.0], n_moving),
        np.zeros(n_moving),
        np.zeros(n_moving),
    ], axis=1)
    return City(
        bmin=np.asarray(bmins, np.float64),
        bmax=np.asarray(bmaxs, np.float64),
        blabel=np.asarray(labels, np.int32),
        mv_base=mv_base, mv_vel=mv_vel,
    )


def _ray_boxes(origins, dirs, bmin, bmax, chunk: int = 8192):
    """First-hit of N rays against B axis-aligned boxes (slab test).

    Returns (t (N,), box index (N,), valid (N,)); vectorized per ray chunk
    to bound memory at N x B intermediates.
    """
    N = origins.shape[0]
    t_out = np.full(N, np.inf)
    idx_out = np.full(N, -1, np.int64)
    inv_guard = lambda d: np.where(np.abs(d) < 1e-12, 1e-12, d)
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        o = origins[lo:hi][:, None, :]           # (n, 1, 3)
        inv = 1.0 / inv_guard(dirs[lo:hi])[:, None, :]
        t1 = (bmin[None, :, :] - o) * inv        # (n, B, 3)
        t2 = (bmax[None, :, :] - o) * inv
        tnear = np.max(np.minimum(t1, t2), axis=2)
        tfar = np.min(np.maximum(t1, t2), axis=2)
        hit = (tnear <= tfar) & (tfar > 0.1) & (tnear > 0.1)
        tn = np.where(hit, tnear, np.inf)
        j = np.argmin(tn, axis=1)
        tbest = tn[np.arange(hi - lo), j]
        t_out[lo:hi] = tbest
        idx_out[lo:hi] = j
    return t_out, idx_out, np.isfinite(t_out)


def simulate_city_scan(city: City, pose: np.ndarray, frame: int,
                       n_az: int = 1024, n_el: int = 48, rng=None,
                       max_range: float = 70.0):
    """One labeled LiDAR scan (sensor-frame points + raw semantic labels)."""
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(np.deg2rad(-24.0), np.deg2rad(4.0), n_el)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    dirs_s = np.stack(
        [np.cos(ee) * np.cos(aa), np.cos(ee) * np.sin(aa), np.sin(ee)],
        axis=-1).reshape(-1, 3)
    R, t = pose[:3, :3], pose[:3, 3]
    dirs = dirs_s @ R.T
    origins = np.tile(t[None, :], (dirs.shape[0], 1))

    # ground plane z = 0 (road)
    dz = dirs[:, 2]
    tp = (0.0 - origins[:, 2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
    t_best = np.where((tp > 0.1) & (dz < 0), tp, np.inf)
    label = np.full(dirs.shape[0], ROAD_RAW, np.int64)

    # static boxes
    tb, jb, okb = _ray_boxes(origins, dirs, city.bmin, city.bmax)
    closer = okb & (tb < t_best)
    t_best = np.where(closer, tb, t_best)
    label = np.where(closer, city.blabel[jb], label)

    # moving cars at this frame's positions
    mmin, mmax = city.moving_boxes(frame)
    tm, jm, okm = _ray_boxes(origins, dirs, mmin, mmax)
    closer = okm & (tm < t_best)
    t_best = np.where(closer, tm, t_best)
    label = np.where(closer, MOVING_CAR_RAW, label)

    valid = np.isfinite(t_best) & (t_best < max_range)
    pts_w = origins[valid] + dirs[valid] * t_best[valid][:, None]
    label = label[valid]
    if rng is not None:
        pts_w = pts_w + rng.normal(0, 0.008, pts_w.shape)
    pts_s = (pts_w - t[None, :]) @ R
    return pts_s.astype(np.float32), label


def city_trajectory(n_frames: int, step: float = 1.5,
                    turn_after: float = 0.6) -> list[np.ndarray]:
    """Drive east along the main street, then turn north at a crossing.

    The turn happens at the nearest street crossing after ``turn_after``
    of the frames, exercising 2-D map extent like a real KITTI sequence.
    """
    poses = []
    x, y, heading = 2.0, 0.0, 0.0
    n_turn = int(n_frames * turn_after)
    # the crossing north corridor sits at x = k*BLOCK_PITCH (street center)
    turn_x = round((2.0 + n_turn * step) / BLOCK_PITCH) * BLOCK_PITCH
    for i in range(n_frames):
        T = np.eye(4)
        if heading == 0.0 and x >= turn_x and i >= n_turn:
            heading = np.pi / 2
        if heading == 0.0:
            x += step
        else:
            y += step
            c, s = np.cos(heading), np.sin(heading)
            T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [x, y, 1.8]
        poses.append(T)
    return poses


def make_city_dataset(root: str, n_frames: int = 150, seed: int = 0,
                      n_az: int = 1024, n_el: int = 48,
                      n_blocks_x: int = 8, n_blocks_y: int = 3) -> City:
    """Write the labeled city sequence in KITTI layout; returns the City."""
    rng = np.random.default_rng(seed)
    city = build_city(seed, n_blocks_x=n_blocks_x, n_blocks_y=n_blocks_y)
    pc_dir = os.path.join(root, "velodyne")
    lb_dir = os.path.join(root, "labels")
    os.makedirs(pc_dir, exist_ok=True)
    os.makedirs(lb_dir, exist_ok=True)
    poses = city_trajectory(n_frames)
    for i, T in enumerate(poses):
        pts, raw = simulate_city_scan(city, T, i, n_az, n_el, rng)
        scan = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1)
        scan.tofile(os.path.join(pc_dir, f"{i:06d}.bin"))
        raw.astype(np.uint32).tofile(os.path.join(lb_dir, f"{i:06d}.label"))
    with open(os.path.join(root, "calib.txt"), "w") as f:
        eye = " ".join(str(v) for v in np.eye(4)[:3].reshape(-1))
        f.write(f"Tr: {eye}\n")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    return city


def city_gt_points(city: City, root: str, n_frames: int,
                   every: int = 5, n_az: int = 2048, n_el: int = 96,
                   max_range: float = 60.0) -> np.ndarray:
    """Noise-free dense ground truth of the VISIBLE static surfaces:
    super-resolved rescans (moving cars excluded) from every ``every``-th
    pose — the same visibility the map was built from, so recall measures
    map completeness rather than occlusion."""
    poses = city_trajectory(n_frames)
    pts_all = []
    for i in range(0, n_frames, every):
        T = poses[i]
        az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
        el = np.linspace(np.deg2rad(-24.0), np.deg2rad(4.0), n_el)
        aa, ee = np.meshgrid(az, el, indexing="ij")
        dirs_s = np.stack(
            [np.cos(ee) * np.cos(aa), np.cos(ee) * np.sin(aa), np.sin(ee)],
            axis=-1).reshape(-1, 3)
        R, t = T[:3, :3], T[:3, 3]
        dirs = dirs_s @ R.T
        origins = np.tile(t[None, :], (dirs.shape[0], 1))
        dz = dirs[:, 2]
        tp = (0.0 - origins[:, 2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
        t_best = np.where((tp > 0.1) & (dz < 0), tp, np.inf)
        tb, jb, okb = _ray_boxes(origins, dirs, city.bmin, city.bmax)
        t_best = np.where(okb & (tb < t_best), tb, t_best)
        valid = np.isfinite(t_best) & (t_best < max_range)
        pts_all.append(
            (origins[valid] + dirs[valid] * t_best[valid][:, None]
             ).astype(np.float32))
    return np.concatenate(pts_all)
