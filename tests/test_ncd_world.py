"""The Newer-College-style quad proxy world (tests/synth_ncd.py).

The NCD regime the reference's second headline dataset lives in: strong
vertical structure (facades to 14 m scanned by a dome pattern), an
indoor passage (archway roof), and a CLOSED loop trajectory.  These pin
the generator's regime properties so the demo's world stays honest.
"""

import os

import numpy as np

from tests import synth_ncd


def test_quad_scans_have_vertical_structure_and_ceiling(tmp_path):
    bmin, bmax = synth_ncd.make_quad_dataset(
        str(tmp_path / "w"), n_frames=8, n_az=360, n_el=32)
    scans = sorted(os.listdir(str(tmp_path / "w" / "velodyne")))
    assert len(scans) == 8
    poses = synth_ncd.quad_trajectory(8)
    # world-frame points of frame 0
    pts_s = np.fromfile(
        str(tmp_path / "w" / "velodyne" / scans[0]), np.float32
    ).reshape(-1, 4)[:, :3]
    R, t = poses[0][:3, :3], poses[0][:3, 3]
    pts = pts_s @ R.T + t
    # strong vertical structure: a sizable fraction of returns above 2 m
    assert (pts[:, 2] > 2.0).mean() > 0.15
    # facades scanned high (the dome pattern reaches them)
    assert pts[:, 2].max() > 8.0
    # ground present
    assert (np.abs(pts[:, 2]) < 0.2).mean() > 0.2


def test_quad_trajectory_closes_loop_and_passes_archway():
    n = 60
    poses = synth_ncd.quad_trajectory(n)
    p0 = poses[0][:3, 3]
    # the waypoint cycle returns to the start: the LAST pose approaches
    # the first (loop closure revisits the first facades)
    gap = np.linalg.norm(poses[-1][:3, 3] - p0)
    step = np.linalg.norm(poses[1][:3, 3] - p0)
    assert gap < 4 * step, (gap, step)
    # some poses pass under the archway roof slab (x 12-22, y -16..-8)
    xy = np.array([T[:3, 3][:2] for T in poses])
    under = ((xy[:, 0] > 13.2) & (xy[:, 0] < 20.8)
             & (xy[:, 1] > -16) & (xy[:, 1] < -8))
    assert under.any()


def test_quad_gt_is_dense_and_static(tmp_path):
    bmin, bmax = synth_ncd.build_quad(0)
    gt = synth_ncd.quad_gt_points(bmin, bmax, 8, every=4, n_az=500,
                                  n_el=40)
    assert gt.shape[0] > 20_000
    assert np.isfinite(gt).all()
    # noise-free: ground returns sit exactly on z = 0
    ground = gt[np.abs(gt[:, 2]) < 0.01]
    assert len(ground) > 1000
