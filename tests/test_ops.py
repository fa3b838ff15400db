"""Unit tests for geometry kernels: morton codec, interpolation, hash grid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.ops import morton, interp
from shine_mapping_tpu.ops.hashgrid import HashGridHost, lookup_level
from shine_mapping_tpu.ops.query import (
    query_feature,
    query_feature_np,
    query_feature_with_aux,
)


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.integers(0, 2 ** 16, size=(1000, 3)).astype(np.int32)
    code = morton.points_to_morton_np(p)
    back = morton.morton_to_points_np(code)
    np.testing.assert_array_equal(p, back)
    # codes are unique for unique points
    assert len(np.unique(code)) == len(np.unique(p, axis=0))


def test_morton_ordering_small():
    # interleave order: x highest bit — (1,0,0) > (0,1,1)
    a = morton.points_to_morton_np(np.array([[1, 0, 0]]))[0]
    b = morton.points_to_morton_np(np.array([[0, 1, 1]]))[0]
    assert a == 4 and b == 3
    assert morton.points_to_morton_np(np.array([[0, 0, 1]]))[0] == 1
    assert morton.points_to_morton_np(np.array([[0, 1, 0]]))[0] == 2


def test_quantize_matches_reference_semantics():
    # floor((x*0.5+0.5)*2^level), clipped into the grid
    x = np.array([[-1.0, -0.999, 0.0], [0.999, 1.0, 0.5]])
    q = morton.quantize_points_np(x, 3)
    assert q[0, 0] == 0 and q[1, 1] == 7
    qj = np.asarray(morton.quantize_points(jnp.asarray(x), 3))
    np.testing.assert_array_equal(q, qj)


def test_interp_weights_sum_to_one_and_match_numpy():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(256, 3))
    for poly in (True, False):
        w_np = interp.corner_weights_np(x, 5, poly)
        w_j = np.asarray(interp.corner_weights(jnp.asarray(x), 5, poly))
        np.testing.assert_allclose(w_np, w_j, atol=1e-5)  # f32 device vs f64 host
        np.testing.assert_allclose(w_np.sum(-1), 1.0, atol=1e-6)


def test_interp_weights_match_reference_formula():
    """Golden transcription of model/feature_octree.py:172-196."""
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(64, 3))
    level = 4
    coords = (2 ** level) * (x * 0.5 + 0.5)
    d = coords - np.floor(coords)
    tx = 3 * d[:, 0] ** 2 - 2 * d[:, 0] ** 3
    ty = 3 * d[:, 1] ** 2 - 2 * d[:, 1] ** 3
    tz = 3 * d[:, 2] ** 2 - 2 * d[:, 2] ** 3
    p0 = (1 - tx) * (1 - ty) * (1 - tz)
    p7 = tx * ty * tz
    w = interp.corner_weights_np(x, level, True)
    np.testing.assert_allclose(w[:, 0], p0, atol=1e-12)
    np.testing.assert_allclose(w[:, 7], p7, atol=1e-12)


def _make_grid(max_level=6, feat_levels=3, dim=8, seed=3):
    return HashGridHost(
        max_level=max_level,
        featured_level_num=feat_levels,
        feature_dim=dim,
        feature_std=0.05,
        seed=seed,
        init_node_capacity=1 << 10,
        init_corner_capacity=1 << 10,
    )


def test_hashgrid_update_and_lookup():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-0.5, 0.5, size=(500, 3))
    g = _make_grid()
    g.update(pts)
    assert not g.is_empty()
    # every inserted point's node must be found at every featured level
    for i, level in enumerate(g.levels):
        corners, found = lookup_level(g.tables[i], jnp.asarray(pts), level)
        assert bool(np.all(np.asarray(found))), f"level {level} misses"
        # corner rows must be < n_corners (valid, not trashbin)
        assert int(np.asarray(corners).max()) < g.host_levels[i].n_corners
    # far-away points must miss
    far = np.full((10, 3), 0.95)
    _, found = lookup_level(g.tables[0], jnp.asarray(far), g.levels[0])
    assert not bool(np.any(np.asarray(found)))


def test_hashgrid_incremental_growth_consistency():
    rng = np.random.default_rng(5)
    g = _make_grid()
    a = rng.uniform(-0.5, 0.0, size=(300, 3))
    b = rng.uniform(0.0, 0.5, size=(300, 3))
    g.update(a)
    n0 = g.host_levels[0].n_corners
    g.update(b)
    assert g.host_levels[0].n_corners > n0
    allpts = np.concatenate([a, b], 0)
    for i, level in enumerate(g.levels):
        _, found = lookup_level(g.tables[i], jnp.asarray(allpts), level)
        assert bool(np.all(np.asarray(found)))
    # updating with the same points adds nothing
    n1 = [hl.n_nodes for hl in g.host_levels]
    g.update(allpts)
    assert [hl.n_nodes for hl in g.host_levels] == n1


def test_hashgrid_capacity_doubling():
    """Force both node-table and feature-table growth."""
    rng = np.random.default_rng(6)
    g = HashGridHost(
        max_level=8,
        featured_level_num=2,
        feature_dim=4,
        feature_std=0.05,
        seed=0,
        init_node_capacity=1 << 6,
        init_corner_capacity=1 << 7,
    )
    pts = rng.uniform(-0.9, 0.9, size=(3000, 3))
    g.update(pts)
    assert g.host_levels[0].node_capacity > (1 << 6)
    assert g.host_levels[0].corner_capacity > (1 << 7)
    for i, level in enumerate(g.levels):
        _, found = lookup_level(g.tables[i], jnp.asarray(pts), level)
        assert bool(np.all(np.asarray(found)))


def test_query_feature_matches_numpy_golden():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-0.5, 0.5, size=(200, 3))
    g = _make_grid()
    g.update(pts)
    # queries: half inside, half outside the map
    q = np.concatenate(
        [rng.uniform(-0.5, 0.5, size=(100, 3)), rng.uniform(0.8, 1.0, size=(50, 3))]
    )
    for poly in (True, False):
        ours = np.asarray(
            query_feature(jnp.asarray(q), g.tables, g.features, g.levels, poly)
        )
        golden = query_feature_np(q, g.host_levels, g.features, g.levels, poly)
        np.testing.assert_allclose(ours, golden, atol=1e-5)
    # out-of-map queries return exactly zero (trashbin semantics)
    np.testing.assert_allclose(ours[100:], 0.0, atol=1e-7)


def test_query_feature_grad_wrt_features_and_coords():
    rng = np.random.default_rng(8)
    pts = rng.uniform(-0.5, 0.5, size=(100, 3))
    g = _make_grid()
    g.update(pts)
    # query at the inserted points (guaranteed hits at every level)
    q = jnp.asarray(pts[:32])

    def loss_fn(features, coords):
        f = query_feature(coords, g.tables, list(features), g.levels, True)
        return jnp.sum(f ** 2)

    gf, gc = jax.grad(loss_fn, argnums=(0, 1))(tuple(g.features), q)
    # feature grads land only on touched corner rows, never the trashbin
    for i, gfi in enumerate(gf):
        arr = np.asarray(gfi)
        assert np.any(arr != 0)
        assert np.all(arr[g.host_levels[i].n_corners :] == 0)
    assert np.any(np.asarray(gc) != 0)  # coord grads flow via weights


def test_query_mc_mask_found_semantics():
    rng = np.random.default_rng(9)
    pts = rng.uniform(-0.3, 0.3, size=(200, 3))
    g = _make_grid()
    g.update(pts)
    q = np.concatenate([pts[:50], np.full((20, 3), 0.95)])
    _, corners, found = query_feature_with_aux(
        jnp.asarray(q), g.tables, g.features, g.levels, True
    )
    f0 = np.asarray(found[0])
    assert np.all(f0[:50]) and not np.any(f0[50:])


def test_octree_nodes_centers():
    g = _make_grid()
    pts = np.array([[0.05, 0.05, 0.05]])
    g.update(pts)
    for level in g.levels:
        centers = g.get_octree_nodes(level)
        node_size = 2.0 ** (1 - level)
        # the point's node center must contain the point
        assert np.all(np.abs(centers - pts) <= node_size / 2 + 1e-9)


def test_state_dict_roundtrip():
    rng = np.random.default_rng(10)
    pts = rng.uniform(-0.5, 0.5, size=(300, 3))
    g = _make_grid()
    g.update(pts)
    q = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 3)))
    before = np.asarray(query_feature(q, g.tables, g.features, g.levels, True))
    g2 = HashGridHost.from_state_dict(g.state_dict())
    after = np.asarray(query_feature(q, g2.tables, g2.features, g2.levels, True))
    np.testing.assert_allclose(before, after, atol=1e-6)
