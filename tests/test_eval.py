"""Mesh-evaluation metric tests."""

import numpy as np

from shine_mapping_tpu.data import io
from shine_mapping_tpu.eval.metrics import (
    crop_intersection,
    eval_depth,
    eval_mesh,
    nn_correspondence,
    sample_points_uniformly,
)
from shine_mapping_tpu.ops.marching import marching_tetrahedra
from tests.test_marching import sphere_grid


def _sphere_mesh(tmp_path, n=40, radius=0.6):
    sdf, spacing, origin = sphere_grid(n=n, radius=radius)
    verts, faces = marching_tetrahedra(sdf, 0.0, spacing=spacing, origin=origin)
    mesh = io.TriangleMesh(vertices=verts, triangles=faces.astype(np.int32))
    p = str(tmp_path / "sphere.ply")
    io.write_ply(p, mesh)
    return p, mesh


def test_sample_points_uniformly_on_surface(tmp_path):
    _, mesh = _sphere_mesh(tmp_path)
    pts = sample_points_uniformly(mesh, 20000)
    r = np.linalg.norm(pts, axis=1)
    assert np.abs(r - 0.6).max() < 0.06  # within a voxel of the sphere


def test_nn_correspondence_truncation():
    a = np.zeros((1, 3))
    b = np.array([[0.01, 0, 0], [1.0, 0, 0]])
    d = nn_correspondence(a, b, truncation_dist=0.5, ignore_outlier=True)
    np.testing.assert_allclose(d, [0.01])
    d = nn_correspondence(a, b, truncation_dist=0.5, ignore_outlier=False)
    np.testing.assert_allclose(d, [0.01, 0.5])


def test_eval_mesh_perfect_sphere(tmp_path):
    mesh_path, _ = _sphere_mesh(tmp_path)
    rng = np.random.default_rng(0)
    v = rng.standard_normal((50000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    gt = io.PointCloud(points=v * 0.6)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, gt)
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.02, threshold=0.05,
        truncation_acc=0.2, truncation_com=0.2, mesh_sample_point=100_000,
    )
    assert m["Chamfer_L1 (m)"] < 0.02
    assert m["F-score (%)"] > 95
    assert m["Precision [Accuracy] (%)"] > 95


def test_eval_mesh_detects_bad_mesh(tmp_path):
    mesh_path, _ = _sphere_mesh(tmp_path, radius=0.6)
    rng = np.random.default_rng(1)
    v = rng.standard_normal((20000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    gt = io.PointCloud(points=v * 0.9)  # wrong radius
    gt_path = str(tmp_path / "gt_bad.ply")
    io.write_ply(gt_path, gt)
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.02, threshold=0.05,
        truncation_acc=2.0, truncation_com=2.0, mesh_sample_point=50_000,
        gt_bbx_mask_on=False,
    )
    assert m["Chamfer_L1 (m)"] > 0.2


def test_crop_intersection(tmp_path):
    mesh_path, _ = _sphere_mesh(tmp_path)
    rng = np.random.default_rng(2)
    # gt: half on the sphere, half far away
    v = rng.standard_normal((5000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    far = rng.uniform(5, 6, (5000, 3))
    gt = io.PointCloud(points=np.concatenate([v * 0.6, far]))
    gt_path = str(tmp_path / "gt_all.ply")
    io.write_ply(gt_path, gt)
    out = str(tmp_path / "crop.ply")
    crop_intersection(gt_path, [mesh_path], out, dist_thre=0.1, mesh_sample_point=50_000)
    cropped = io.read_point_cloud(out)
    assert 4000 < len(cropped) <= 5000  # far points removed


def test_eval_depth():
    gt = np.full((10, 10), 2.0)
    pred = gt * 1.1
    m = eval_depth(pred, gt)
    np.testing.assert_allclose(m["AbsRel"], 0.1, atol=1e-6)
    assert m["r1"] == 1.0
