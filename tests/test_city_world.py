"""Invariants of the synthetic-city world generator (tests/synth_city.py)
backing the KITTI-scale demo (experiments/demo_tpu_kitti_scale.py)."""

import os

import numpy as np
import pytest

from tests import synth_city


def test_city_scan_labels_and_geometry(tmp_path):
    city = synth_city.build_city(0, n_blocks_x=3, n_blocks_y=2)
    # a mix of buildings, parked cars and poles exists
    labs = set(city.blabel.tolist())
    assert {synth_city.BUILDING_RAW, synth_city.CAR_RAW,
            synth_city.POLE_RAW} <= labs
    pose = np.eye(4)
    pose[:3, 3] = [10.0, 0.0, 1.8]
    pts, raw = synth_city.simulate_city_scan(
        city, pose, 0, n_az=512, n_el=32, rng=np.random.default_rng(0))
    assert pts.shape[0] > 5000
    # road dominates; buildings visible; all labels are known raw ids
    counts = {k: int((raw == k).sum()) for k in set(raw.tolist())}
    assert counts.get(synth_city.ROAD_RAW, 0) > 0.3 * raw.size
    assert counts.get(synth_city.BUILDING_RAW, 0) > 0
    known = {synth_city.ROAD_RAW, synth_city.BUILDING_RAW,
             synth_city.CAR_RAW, synth_city.POLE_RAW,
             synth_city.MOVING_CAR_RAW}
    assert set(counts) <= known
    # sensor-frame points: ranges bounded by max_range
    assert np.linalg.norm(pts, axis=1).max() < 71.0


def test_city_moving_cars_move_and_streets_stay_clear():
    city = synth_city.build_city(1, n_blocks_x=3, n_blocks_y=2)
    b0 = city.moving_boxes(0)[0]
    b9 = city.moving_boxes(9)[0]
    # cars translate along x between frames
    assert np.all(np.abs((b9 - b0)[:, 0]) > 1.0)
    assert np.allclose((b9 - b0)[:, 1], 0)
    # no static box intrudes into the driving lanes of the main street
    # (|y| <= 6.2: sensor center + moving-car lanes + car half-width)
    assert np.all((city.bmin[:, 1] >= 6.2) | (city.bmax[:, 1] <= -6.2))


def test_city_dataset_layout_and_turn(tmp_path):
    root = str(tmp_path / "city")
    os.makedirs(root)
    city = synth_city.make_city_dataset(
        root, n_frames=8, n_az=128, n_el=12, n_blocks_x=2, n_blocks_y=2)
    assert len(os.listdir(root + "/velodyne")) == 8
    assert len(os.listdir(root + "/labels")) == 8
    poses = np.loadtxt(root + "/poses.txt").reshape(-1, 3, 4)
    assert poses.shape[0] == 8
    # label files align with scans point-for-point
    for i in range(8):
        n_pts = os.path.getsize(f"{root}/velodyne/{i:06d}.bin") // 16
        n_lab = os.path.getsize(f"{root}/labels/{i:06d}.label") // 4
        assert n_pts == n_lab
    # a long trajectory turns north at a crossing
    long_poses = synth_city.city_trajectory(120)
    xy = np.stack([p[:3, 3][:2] for p in long_poses])
    assert xy[-1, 1] > 20.0, "trajectory never turned"
    assert np.ptp(xy[:, 0]) > 60.0


def test_city_gt_excludes_moving_cars(tmp_path):
    root = str(tmp_path / "city")
    os.makedirs(root)
    city = synth_city.make_city_dataset(
        root, n_frames=4, n_az=128, n_el=12, n_blocks_x=2, n_blocks_y=2)
    gt = synth_city.city_gt_points(city, root, 4, every=2, n_az=256, n_el=24)
    assert gt.shape[0] > 1000
    # GT points never lie inside any moving car's swept volume interior
    for frame in range(4):
        mmin, mmax = city.moving_boxes(frame)
        for lo, hi in zip(mmin, mmax):
            inside = np.all((gt > lo + 0.05) & (gt < hi - 0.05), axis=1)
            assert not inside.any()
