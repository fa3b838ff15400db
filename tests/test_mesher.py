"""Mesher internals: query grids, masking, artifacts."""

import numpy as np
import jax
import pytest

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.data import io
from shine_mapping_tpu.mesher import Mesher, _remove_vertices
from shine_mapping_tpu.models import decoder
from shine_mapping_tpu.ops.hashgrid import HashGridHost


@pytest.fixture(scope="module")
def sphere_setup():
    cfg = SHINEConfig()
    cfg.tree_level_world = 6
    cfg.tree_level_feat = 3
    cfg.leaf_vox_size = 0.5
    cfg.bs = 1024
    cfg.mc_vis_level = 1
    cfg.derive()
    cfg.scale = 1.0  # identity world scale for the unit tests

    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((4000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    surf = (dirs * 0.5).astype(np.float32)
    grid = HashGridHost(
        max_level=cfg.tree_level_world, featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim, feature_std=cfg.feature_std, seed=0,
        init_node_capacity=1 << 12, init_corner_capacity=1 << 12,
    )
    grid.update(surf)
    geo = decoder.init_decoder_params(jax.random.PRNGKey(0), cfg.feature_dim)
    return cfg, grid, geo, surf


def test_get_query_from_bbx_padding(sphere_setup):
    cfg, grid, geo, _ = sphere_setup
    mesher = Mesher(cfg, grid, geo)
    bbx = (np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0]))
    coord, nxyz, origin = mesher.get_query_from_bbx(bbx, 0.5)
    # pad_voxel on each side + 1 extra underground voxel (utils/mesher.py:126-130)
    assert nxyz[0] == int(np.ceil(2.0 / 0.5)) + 2
    assert nxyz[2] == int(np.ceil(2.0 / 0.5)) + 3
    assert coord.shape == (nxyz[0] * nxyz[1] * nxyz[2], 3)
    np.testing.assert_allclose(origin[2], -1.0 - 0.5 - 0.5)


def test_query_points_mask_semantics(sphere_setup):
    cfg, grid, geo, surf = sphere_setup
    mesher = Mesher(cfg, grid, geo)
    q = np.concatenate([surf[:64], np.full((64, 3), 0.95, np.float32)])
    sdf, _, mask = mesher.query_points(q, bs=64, query_sdf=True, query_mask=True)
    assert mask[:64].all()
    assert not mask[64:].any()
    assert np.isfinite(sdf).all()


def test_generate_sdf_map_artifact(sphere_setup, tmp_path):
    cfg, grid, geo, surf = sphere_setup
    mesher = Mesher(cfg, grid, geo)
    coord = surf[:128].astype(np.float64)
    sdf = np.linspace(-1, 1, 128)
    path = str(tmp_path / "sdf_map.ply")
    mesher.generate_sdf_map(coord, sdf, None, path)
    pc = io.read_point_cloud(path)
    assert len(pc) == 128
    # sdf stored in intensity, scaled to metres (utils/mesher.py:161)
    expected = sdf * cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
    np.testing.assert_allclose(pc.intensity, expected, atol=1e-6)


def test_filter_isolated_vertices(sphere_setup):
    cfg, grid, geo, _ = sphere_setup
    mesher = Mesher(cfg, grid, geo)
    # two components: a big fan (10 triangles) and one lone triangle
    n_fan = 12
    verts = np.concatenate(
        [
            np.zeros((1, 3)),
            np.stack([np.cos(np.linspace(0, 3, n_fan)), np.sin(np.linspace(0, 3, n_fan)), np.zeros(n_fan)], 1),
            np.array([[5.0, 5, 5], [6, 5, 5], [5, 6, 5]]),
        ]
    )
    tris = [[0, i + 1, i + 2] for i in range(n_fan - 1)] + [[n_fan + 1, n_fan + 2, n_fan + 3]]
    mesh = io.TriangleMesh(vertices=verts, triangles=np.array(tris, np.int32))
    out = mesher.filter_isolated_vertices(mesh, filter_cluster_min_tri=5)
    # lone triangle removed, fan kept
    assert out.triangles.shape[0] == n_fan - 1
    assert not np.any(out.triangles >= n_fan + 1)


def test_remove_vertices_compacts():
    verts = np.arange(12, dtype=np.float64).reshape(4, 3)
    tris = np.array([[0, 1, 2], [1, 2, 3]], np.int32)
    mesh = io.TriangleMesh(vertices=verts, triangles=tris)
    keep = np.array([True, True, True, False])
    out = _remove_vertices(mesh, keep)
    assert out.vertices.shape[0] == 3
    np.testing.assert_array_equal(out.triangles, [[0, 1, 2]])


def test_sharded_mesher_matches_single(sphere_setup):
    """Inference with dp_mesh set shards each infer batch over the virtual
    8-device mesh and must reproduce the single-device SDF/mask outputs
    exactly (meshing consumes only these)."""
    from shine_mapping_tpu.parallel.mesh import make_data_mesh

    cfg, grid, geo, surf = sphere_setup
    single = Mesher(cfg, grid, geo)
    sharded = Mesher(cfg, grid, geo, dp_mesh=make_data_mesh(8))

    rng = np.random.default_rng(3)
    q = np.concatenate(
        [surf[:500], rng.uniform(-1, 1, (700, 3)).astype(np.float32)]
    )
    # bs 256 divisible by 8; 1200 points exercises the padded tail chunk
    sdf1, _, mask1 = single.query_points(q, bs=256)
    sdf2, _, mask2 = sharded.query_points(q, bs=256)
    np.testing.assert_array_equal(mask1, mask2)
    np.testing.assert_allclose(sdf1, sdf2, atol=1e-6)
    # second call reuses the cached mesh placement
    assert sharded._placed_key is not None
    sdf3, _, _ = sharded.query_points(q, bs=256)
    np.testing.assert_allclose(sdf2, sdf3, atol=0)


def test_query_grid_matches_host_grid(sphere_setup):
    """Device-side grid generation (query_grid) reproduces the host
    meshgrid + query_points pair: same mask, same SDF to f32 coord noise."""
    cfg, grid, geo, surf = sphere_setup
    mesher = Mesher(cfg, grid, geo)
    bbx = (np.array([-0.6, -0.6, -0.6]) / cfg.scale,
           np.array([0.6, 0.6, 0.6]) / cfg.scale)
    vs = 0.21 / cfg.scale * 0.1  # odd step so grid planes avoid voxel faces
    coord, vnum, vorig = mesher.get_query_from_bbx(bbx, vs)
    sdf_h, _, mask_h = mesher.query_points(coord, cfg.infer_bs, True, False, True)
    sdf_d, _, mask_d = mesher.query_grid(vnum, vorig, vs, True, False, True)
    assert sdf_d.shape == sdf_h.shape
    # grid points landing EXACTLY on voxel faces are ambiguous under f32
    # coordinate rounding (host path computes f64 then casts; device path
    # is f32 throughout — and compile-cache-vs-fresh executables may even
    # contract differently): tolerate a <0.01% boundary fraction
    mask_mism = int((mask_h != mask_d).sum())
    sdf_mism = int((np.abs(sdf_h - sdf_d) > 5e-5).sum())
    n = sdf_h.shape[0]
    assert mask_mism <= n // 10000, mask_mism
    assert sdf_mism <= n // 10000, sdf_mism


def test_lattice_block_inference_matches_direct(sphere_setup):
    """_infer_node_blocks_lattice (per-block node lattice + one-hot MXU
    selection) must reproduce the per-point path exactly — same
    quantization, exact one-hot selection, same interpolation sums."""
    import jax.numpy as jnp
    import math
    from shine_mapping_tpu.mesher import (
        _infer_node_blocks, _infer_node_blocks_lattice, _bucket_chunks)

    cfg, grid, geo, surf = sphere_setup
    query_level = cfg.tree_level_world - cfg.tree_level_feat + 1
    nodes = grid.get_octree_nodes(query_level)
    assert nodes.shape[0] > 0
    node_res = 2.0 ** (1 - query_level)
    for vpn in (2, 4, 5):  # incl. vpn < n (coarse mc_res) and odd sizes
        mc_res_scaled = node_res / vpn
        npb = 4
        K = _bucket_chunks(math.ceil(nodes.shape[0] / npb))
        origins = (nodes - 0.5 * (node_res - mc_res_scaled)).astype(np.float32)
        pad = K * npb - nodes.shape[0]
        if pad:
            origins = np.concatenate(
                [origins, np.full((pad, 3), 3.0, np.float32)], axis=0)
        args = (
            geo, geo, tuple(grid.features), tuple(grid.tables),
            jnp.asarray(origins.reshape(K, npb, 3)),
            jnp.float32(mc_res_scaled), jnp.float32(0.0),
        )
        tail = (tuple(grid.levels), grid.polynomial_interpolation, 0,
                False, False)
        sdf_d, _, mask_d = _infer_node_blocks(*args, K, npb, vpn, *tail)
        sdf_l, _, mask_l = _infer_node_blocks_lattice(
            *args, K, npb, vpn, query_level, *tail)
        np.testing.assert_array_equal(np.asarray(mask_d), np.asarray(mask_l))
        np.testing.assert_allclose(
            np.asarray(sdf_d), np.asarray(sdf_l), rtol=0, atol=2e-6)
        assert np.asarray(mask_d).any()


def test_query_grid_lattice_matches_query_grid(sphere_setup):
    """The dense-grid lattice path (index-space blocks + node lattices)
    must reproduce the flat per-point grid query."""
    cfg, grid, geo, _ = sphere_setup
    cfg.infer_bs = 4096
    mesher = Mesher(cfg, grid, geo)
    bbx = (np.array([-0.8, -0.8, -0.8]), np.array([0.75, 0.8, 0.77]))
    vs = 0.07
    vnum, vorig = mesher.grid_shape_from_bbx(bbx, vs)
    sdf_f, _, mask_f = mesher.query_grid(vnum, vorig, vs, True, False, True)
    sdf3, _, mask3 = mesher.assign_to_bbx(sdf_f, None, mask_f, vnum)
    sdf_l, _, mask_l = mesher.query_grid_lattice(vnum, vorig, vs)
    np.testing.assert_array_equal(mask3, mask_l)
    np.testing.assert_allclose(sdf3, sdf_l, atol=2e-6)
    assert mask_l.any()


def test_recon_bbx_save_map_via_lattice(sphere_setup, tmp_path):
    """save_map through the lattice dense path: the exported sdf-map cloud
    must carry one point per OBSERVED voxel with finite sdf intensities in
    grid order (the flattened 3D query matches get_query_from_bbx)."""
    cfg, grid, geo, _ = sphere_setup
    cfg.infer_bs = 4096
    cfg.mc_mask_on = True
    mesher = Mesher(cfg, grid, geo)
    bbx = (np.array([-0.7, -0.7, -0.7]), np.array([0.7, 0.7, 0.7]))
    mesh_path = str(tmp_path / "m.ply")
    map_path = str(tmp_path / "sdf.ply")
    mesher.recon_bbx_mesh(bbx, 0.1, mesh_path, map_path, save_map=True,
                          estimate_normal=False, filter_isolated_mesh=False)
    pc = io.read_point_cloud(map_path)
    assert pc.points.shape[0] > 50
    assert np.isfinite(pc.intensity).all()
    # every exported point is an observed voxel center
    vnum, vorig = mesher.grid_shape_from_bbx(bbx, 0.1)
    _, _, mask3 = mesher.query_grid_lattice(vnum, vorig, 0.1)
    assert pc.points.shape[0] == int(mask3.sum())
