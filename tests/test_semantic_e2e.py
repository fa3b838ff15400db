"""Semantic mapping end-to-end on the synthetic world."""

import os

import numpy as np
import pytest

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.data import io
from tests import synth
from tests.test_e2e import small_cfg


@pytest.fixture(scope="module")
def synth_sem_root(tmp_path_factory):
    """Synthetic KITTI world + per-point semantic labels.

    Labels by geometry: ground plane -> raw id 40 ("road" -> class 9),
    sphere -> raw id 50 ("building" -> class 13).
    """
    root = str(tmp_path_factory.mktemp("synth_sem"))
    synth.make_kitti_dataset(root, n_frames=4)
    label_dir = os.path.join(root, "labels")
    os.makedirs(label_dir, exist_ok=True)
    import re

    for name in sorted(os.listdir(os.path.join(root, "velodyne"))):
        scan = np.fromfile(
            os.path.join(root, "velodyne", name), dtype=np.float32
        ).reshape(-1, 4)
        # world z of the point (poses translate along x at z=1.5; scans are
        # sensor-frame with identity rotation)
        frame_id = int(re.findall(r"\d+", name)[0])
        world = scan[:, :3] + np.array([frame_id * 1.0, 0.0, 1.5], np.float32)
        on_sphere = (
            np.linalg.norm(world - synth.SPHERE_C[None, :], axis=1)
            < synth.SPHERE_R + 0.05
        )
        raw = np.where(on_sphere, 50, 40).astype(np.uint32)
        raw.tofile(os.path.join(label_dir, name.replace("bin", "label")))
    return root


def test_semantic_batch_end_to_end(synth_sem_root, tmp_path):
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch
    from shine_mapping_tpu.mesher import Mesher

    cfg = small_cfg(synth_sem_root, str(tmp_path))
    cfg.semantic_on = True
    cfg.label_path = os.path.join(synth_sem_root, "labels")
    cfg.min_range = 0.5
    cfg.iters = 300
    cfg.weight_s = 1.0
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)

    mesher = Mesher(cfg, grid, params["geo"], params["sem"])
    mesh_path = run_path + "/mesh/final_sem.ply"
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, mesh_path, "", False,
        estimate_sem=True,
    )
    assert mesh.vertices.shape[0] > 200
    assert mesh.vertex_colors is not None

    # vertices near the sphere should mostly carry the building color,
    # ground vertices the road color
    from shine_mapping_tpu.data.semantic_kitti import SEM_KITTI_COLOR_MAP

    on_sphere = (
        np.linalg.norm(mesh.vertices - synth.SPHERE_C[None, :], axis=1)
        < synth.SPHERE_R + 0.1
    )
    ground = np.abs(mesh.vertices[:, 2] - synth.GROUND_Z) < 0.1
    c_building = np.array(SEM_KITTI_COLOR_MAP[13]) / 255.0
    c_road = np.array(SEM_KITTI_COLOR_MAP[9]) / 255.0
    if on_sphere.sum() > 20:
        frac = np.mean(
            np.all(np.isclose(mesh.vertex_colors[on_sphere], c_building, atol=0.02), axis=1)
        )
        assert frac > 0.6, f"sphere vertices building-labeled: {frac:.2%}"
    if ground.sum() > 50:
        frac = np.mean(
            np.all(np.isclose(mesh.vertex_colors[ground], c_road, atol=0.02), axis=1)
        )
        assert frac > 0.6, f"ground vertices road-labeled: {frac:.2%}"
