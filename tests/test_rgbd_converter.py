"""RGB-D -> KITTI-layout converter tests (synthetic depth images via PIL)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from shine_mapping_tpu.data import io
from shine_mapping_tpu.data.rgbd_converter import (
    Intrinsics,
    depth_to_points,
    load_poses,
    rgbd_to_kitti_format,
    write_poses_kitti_format,
)


def test_depth_to_points_plane():
    intr = Intrinsics(width=64, height=48, fx=50.0, fy=50.0, cx=31.5, cy=23.5)
    depth = np.full((48, 64), 2.0)
    pc = depth_to_points(depth, intr, None, max_depth_m=5.0, flip=False)
    assert len(pc) == 48 * 64
    np.testing.assert_allclose(pc.points[:, 2], 2.0)
    # center pixel maps near the optical axis
    center = pc.points[np.argmin(np.abs(pc.points[:, :2]).sum(axis=1))]
    assert abs(center[0]) < 0.05 and abs(center[1]) < 0.05
    # depth truncation removes far pixels
    depth[0, 0] = 10.0
    pc2 = depth_to_points(depth, intr, None, max_depth_m=5.0, flip=False)
    assert len(pc2) == 48 * 64 - 1


def test_full_conversion(tmp_path):
    depth_dir = tmp_path / "depth"
    rgb_dir = tmp_path / "rgb"
    depth_dir.mkdir()
    rgb_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        depth_mm = (rng.uniform(500, 3000, (48, 64))).astype(np.uint16)
        Image.fromarray(depth_mm, mode="I;16").save(depth_dir / f"{i}.png")
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(rgb_dir / f"{i}.png")
    # NeuralRGBD-style focal file + 4x4 pose blocks
    focal_file = tmp_path / "focal.txt"
    focal_file.write_text("50.0\n")
    pose_file = tmp_path / "poses_in.txt"
    with open(pose_file, "w") as f:
        for i in range(3):
            T = np.eye(4)
            T[0, 3] = i * 0.1
            for row in T:
                f.write(" ".join(str(v) for v in row) + "\n")

    import types

    args = types.SimpleNamespace(
        depth_img_folder=str(depth_dir),
        rgb_img_folder=str(rgb_dir),
        intrinsic_file=str(focal_file),
        pose_file=str(pose_file),
        output_root=str(tmp_path / "out"),
        max_depth_m=5.0,
        is_focal_file=True,
        already_kitti_format_pose=False,
    )
    rgbd_to_kitti_format(args)
    out = tmp_path / "out"
    plys = sorted(os.listdir(out / "rgbd_ply"))
    assert plys == ["000000.ply", "000001.ply", "000002.ply"]
    pc = io.read_point_cloud(str(out / "rgbd_ply" / "000000.ply"))
    assert len(pc) > 1000
    assert pc.colors is not None
    poses = np.loadtxt(out / "poses.txt")
    assert poses.shape == (3, 12)
    np.testing.assert_allclose(poses[2, 3], 0.2, atol=1e-9)


def test_load_poses_blocks(tmp_path):
    p = tmp_path / "p.txt"
    T1, T2 = np.eye(4), np.eye(4)
    T2[1, 3] = 5.0
    with open(p, "w") as f:
        for T in (T1, T2):
            for row in T:
                f.write(" ".join(str(v) for v in row) + "\n")
    poses = load_poses(str(p))
    assert len(poses) == 2
    np.testing.assert_allclose(poses[1][1, 3], 5.0)
