"""Synthetic COLLEGE-QUAD world — the Newer-College-Dataset-style proxy.

The reference's second headline dataset (Newer College, eval protocol
`/root/reference/eval/evaluator.py:53-56`: 20 cm threshold, trunc
0.4/2.0 m; config ncd_batch.yaml with `every_frame: 3`) is a handheld
scan of a walled college quad: an indoor/outdoor mix with STRONG VERTICAL
STRUCTURE (building facades to ~15 m), narrow passages, and a closed
LOOP trajectory.  No egress exists to fetch it, so this module generates
the same regime analytically:

* a walled rectangular quad (4 facade boxes, 14 m high) with an inner
  chapel block, a covered archway passage (roof slab + side piers — the
  sensor walks THROUGH it: indoor ceiling returns), pillars, and benches;
* a closed-loop handheld trajectory around the inner block, returning to
  the start pose (loop closure revisits the first facades);
* a dome-style scan pattern (elevation -70..+70 deg) so walls are scanned
  to their full height — the vertical regime MaiCity/KITTI proxies lack.

Written in KITTI layout (.bin + poses.txt + calib.txt) so the real CLI
ingests it unchanged.
"""

from __future__ import annotations

import os

import numpy as np

from tests.synth_city import _ray_boxes


def build_quad(seed: int = 0):
    """Axis-aligned boxes of the quad world.  Returns (bmin, bmax)."""
    rng = np.random.default_rng(seed)
    boxes = []

    def add(x0, y0, z0, x1, y1, z1):
        boxes.append((min(x0, x1), min(y0, y1), min(z0, z1),
                      max(x0, x1), max(y0, y1), max(z0, z1)))

    # outer facades: 64 x 44 m court, 14 m high, 2 m thick
    W, H, T, Z = 64.0, 44.0, 2.0, 14.0
    add(-W / 2 - T, -H / 2 - T, 0, W / 2 + T, -H / 2, Z)       # south
    add(-W / 2 - T, H / 2, 0, W / 2 + T, H / 2 + T, Z)         # north
    add(-W / 2 - T, -H / 2, 0, -W / 2, H / 2, Z)               # west
    add(W / 2, -H / 2, 0, W / 2 + T, H / 2, Z)                 # east
    # inner chapel block (strong vertical structure mid-court)
    add(-9, -6, 0, 9, 6, 11.0)
    # covered archway through the south facade region: roof slab + piers
    # (the trajectory passes under it — indoor ceiling + floor returns)
    add(12, -16, 3.2, 22, -8, 4.0)     # roof slab
    add(12, -16, 0, 13.2, -8, 3.2)     # west pier wall
    add(20.8, -16, 0, 22, -8, 3.2)     # east pier wall
    # pillars and benches scattered in the court
    for _ in range(10):
        x = rng.uniform(-26, 26)
        y = rng.uniform(-17, 17)
        if abs(x) < 12 and abs(y) < 9:
            continue  # keep the chapel clear
        add(x - 0.25, y - 0.25, 0, x + 0.25, y + 0.25, 3.5)
    for _ in range(6):
        x = rng.uniform(-24, 24)
        y = rng.uniform(-15, 15)
        if abs(x) < 12 and abs(y) < 9:
            continue
        add(x - 1.0, y - 0.3, 0.0, x + 1.0, y + 0.3, 0.45)
    b = np.asarray(boxes, np.float64)
    return b[:, :3], b[:, 3:]


def quad_trajectory(n_frames: int) -> list[np.ndarray]:
    """Closed handheld loop around the inner block (returns to start)."""
    # rectangle around the chapel, biased through the archway corridor
    waypoints = np.array([
        [17.0, -12.0], [26.0, 0.0], [17.0, 14.0], [0.0, 17.0],
        [-20.0, 14.0], [-26.0, 0.0], [-20.0, -13.0], [0.0, -16.0],
        [17.0, -12.0],  # loop closure
    ])
    seg = np.diff(waypoints, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0], np.cumsum(seg_len)])
    total = cum[-1]
    poses = []
    for i in range(n_frames):
        d = total * i / n_frames
        j = int(np.searchsorted(cum[1:], d, side="right"))
        f = (d - cum[j]) / seg_len[j]
        xy = waypoints[j] + f * seg[j]
        heading = np.arctan2(seg[j][1], seg[j][0])
        T = np.eye(4)
        c, s = np.cos(heading), np.sin(heading)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        T[:3, 3] = [xy[0], xy[1], 1.3]  # handheld height
        poses.append(T)
    return poses


def simulate_quad_scan(bmin, bmax, pose: np.ndarray,
                       n_az: int = 900, n_el: int = 64, rng=None,
                       max_range: float = 60.0):
    """Dome scan (el -70..+70 deg): facades return to full height."""
    az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
    el = np.linspace(np.deg2rad(-70.0), np.deg2rad(70.0), n_el)
    aa, ee = np.meshgrid(az, el, indexing="ij")
    dirs_s = np.stack(
        [np.cos(ee) * np.cos(aa), np.cos(ee) * np.sin(aa), np.sin(ee)],
        axis=-1).reshape(-1, 3)
    R, t = pose[:3, :3], pose[:3, 3]
    dirs = dirs_s @ R.T
    origins = np.tile(t[None, :], (dirs.shape[0], 1))

    # ground plane z = 0
    dz = dirs[:, 2]
    tp = (0.0 - origins[:, 2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
    t_best = np.where((tp > 0.1) & (dz < 0), tp, np.inf)
    tb, _, okb = _ray_boxes(origins, dirs, bmin, bmax)
    t_best = np.where(okb & (tb < t_best), tb, t_best)

    valid = np.isfinite(t_best) & (t_best < max_range)
    pts_w = origins[valid] + dirs[valid] * t_best[valid][:, None]
    if rng is not None:
        pts_w = pts_w + rng.normal(0, 0.01, pts_w.shape)
    pts_s = (pts_w - t[None, :]) @ R
    return pts_s.astype(np.float32)


def make_quad_dataset(root: str, n_frames: int = 90, seed: int = 0,
                      n_az: int = 900, n_el: int = 64):
    """Write the quad sequence in KITTI layout; returns (bmin, bmax)."""
    rng = np.random.default_rng(seed)
    bmin, bmax = build_quad(seed)
    pc_dir = os.path.join(root, "velodyne")
    os.makedirs(pc_dir, exist_ok=True)
    poses = quad_trajectory(n_frames)
    for i, T in enumerate(poses):
        pts = simulate_quad_scan(bmin, bmax, T, n_az, n_el, rng)
        scan = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1)
        scan.tofile(os.path.join(pc_dir, f"{i:06d}.bin"))
    with open(os.path.join(root, "calib.txt"), "w") as f:
        eye = " ".join(str(v) for v in np.eye(4)[:3].reshape(-1))
        f.write(f"Tr: {eye}\n")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")
    return bmin, bmax


def quad_gt_points(bmin, bmax, n_frames: int, every: int = 5,
                   n_az: int = 2048, n_el: int = 128) -> np.ndarray:
    """Noise-free dense GT of the visible surfaces (super-resolved
    rescans from every ``every``-th pose)."""
    poses = quad_trajectory(n_frames)
    pts_all = []
    for i in range(0, n_frames, every):
        pts = simulate_quad_scan(bmin, bmax, poses[i], n_az, n_el, None)
        R, t = poses[i][:3, :3], poses[i][:3, 3]
        pts_all.append(pts @ R.T + t)
    return np.concatenate(pts_all).astype(np.float32)
