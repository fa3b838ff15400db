"""Sparse (lazy) feature-table Adam: equivalence with the dense path."""

import numpy as np
import jax
import jax.numpy as jnp

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state
from shine_mapping_tpu.train.sparse_adam import segment_by_row
from tests.test_trainer import make_sphere_pool, default_cfg, build


def test_segment_by_row_sums_duplicates():
    corners = jnp.asarray([[0, 1, 1, 2, 2, 2, 5, 9]], dtype=jnp.int32)
    contribs = jnp.ones((1, 8, 4))
    seg = segment_by_row(corners, contribs, table_rows=10)
    rows = np.asarray(seg.rows)
    grads = np.asarray(seg.grads)
    valid = np.asarray(seg.valid)
    got = {int(r): grads[i, 0] for i, r in enumerate(rows) if valid[i]}
    # row 9 is the trashbin (table_rows-1): must be excluded
    assert got == {0: 1.0, 1: 2.0, 2: 3.0, 5: 1.0}
    # trashbin-dumped invalid entries carry zero gradient
    assert np.all(grads[~valid] == 0)


def test_segment_by_row_random_matches_bincount():
    rng = np.random.default_rng(0)
    B, D, R = 64, 8, 50
    corners = jnp.asarray(rng.integers(0, R - 1, (B, 8)).astype(np.int32))
    contribs = jnp.asarray(rng.standard_normal((B, 8, D)).astype(np.float32))
    seg = segment_by_row(corners, contribs, table_rows=R)
    dense = np.zeros((R, D), np.float64)
    np.add.at(dense, np.asarray(corners).reshape(-1), np.asarray(contribs).reshape(-1, D))
    sparse = np.zeros((R, D), np.float64)
    rows, grads, valid = np.asarray(seg.rows), np.asarray(seg.grads), np.asarray(seg.valid)
    for i in range(rows.size):
        if valid[i]:
            sparse[rows[i]] += grads[i]
    np.testing.assert_allclose(sparse, dense, atol=1e-4)


def test_sparse_vs_dense_training_equivalent_losses():
    """Same seed: sparse-lazy and dense Adam must track closely for the
    first steps (identical gradients; only untouched-row momentum differs)."""
    pool, surf = make_sphere_pool(2000)
    cfg = default_cfg(bs=1024)

    grid, settings_s, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="sparse"
    )
    settings_d = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="dense"
    )
    assert settings_s.feature_update == "sparse"

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    key = jax.random.PRNGKey(3)
    shadow = trainer.empty_shadow(params["features"])
    p_s, o_s, aux_s = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings_s, 3,
    )
    p_d, o_d, aux_d = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings_d, 3,
    )
    # first-iteration losses identical (same params), later ones close
    np.testing.assert_allclose(
        float(aux_s["mean"]["total_loss"]), float(aux_d["mean"]["total_loss"]),
        rtol=1e-3,
    )
    # decoder params follow the same trajectory (small drift from lazy
    # momentum on rows untouched between steps; misses now correctly touch
    # NOTHING in the sparse path — the reference's trashbin convention —
    # which defers a little more catch-up than before)
    for k in p_s["geo"]:
        np.testing.assert_allclose(
            np.asarray(p_s["geo"][k]), np.asarray(p_d["geo"][k]), atol=2e-3
        )
    # feature rows: with Adam eps=1e-15 the first step is ~sign(g)*lr, so
    # rows whose summed gradient is float-noise-level can legitimately flip
    # sign between the two summation orders; demand that the vast majority
    # of moved rows agree and none diverge beyond a few steps
    for i in range(len(p_s["features"])):
        a = np.asarray(p_s["features"][i])
        b = np.asarray(p_d["features"][i])
        moved = np.any(a != np.asarray(params["features"][i]), axis=1)
        diffs = np.abs(a[moved] - b[moved])
        # bounded by a few sign-flipped Adam steps, never runaway
        assert np.max(diffs) < 8 * cfg.lr
        assert np.median(diffs) < 2 * cfg.lr


def test_sparse_vs_dense_gradient_equivalence():
    """The segment-summed sparse gradients equal jax.grad's dense scatter."""
    import jax.numpy as jnp
    from shine_mapping_tpu.ops.hashgrid import lookup_level
    from shine_mapping_tpu.ops.query import query_feature
    from shine_mapping_tpu.models import decoder
    from shine_mapping_tpu.train import losses
    from shine_mapping_tpu.train.sparse_adam import segment_by_row

    pool, surf = make_sphere_pool(1000)
    cfg = default_cfg(bs=512)
    grid, settings, params, _, dev_pool, _ = build(cfg, pool, surf)
    coords = dev_pool["coord"][: cfg.bs]
    labels = dev_pool["sdf_label"][: cfg.bs]

    # dense grads
    def dense_loss(feats):
        f = query_feature(coords, tuple(grid.tables), list(feats), grid.levels, True)
        return losses.sdf_bce_loss(decoder.sdf(params["geo"], f), labels, 0.05)

    g_dense = jax.grad(dense_loss)(tuple(params["features"]))

    # sparse grads
    corners, found, G = [], [], []
    for i, lvl in enumerate(grid.levels):
        c_i, f_i = lookup_level(grid.tables[i], coords, lvl)
        corners.append(c_i)
        found.append(f_i)
        G.append(params["features"][i][c_i])

    def sparse_loss(G_list):
        from shine_mapping_tpu.ops.interp import corner_weights

        f = None
        for i, lvl in enumerate(grid.levels):
            w = corner_weights(coords, lvl, True)
            w = jnp.where(found[i][:, None], w, 0.0)
            c = jnp.einsum("nc,ncd->nd", w, G_list[i])
            f = c if f is None else f + c
        return losses.sdf_bce_loss(decoder.sdf(params["geo"], f), labels, 0.05)

    g_G = jax.grad(sparse_loss)(G)
    for i in range(len(grid.levels)):
        seg = segment_by_row(corners[i], g_G[i], params["features"][i].shape[0])
        dense_i = np.asarray(g_dense[i])
        sparse_i = np.zeros_like(dense_i)
        rows, grads, valid = (
            np.asarray(seg.rows), np.asarray(seg.grads), np.asarray(seg.valid),
        )
        for j in range(rows.size):
            if valid[j]:
                sparse_i[rows[j]] += grads[j]
        np.testing.assert_allclose(sparse_i, dense_i, atol=1e-5)


def test_sparse_training_converges():
    pool, surf = make_sphere_pool(3000)
    cfg = default_cfg()
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="sparse"
    )
    assert settings.feature_update == "sparse"
    from tests.test_trainer import run_chunks

    params, _, aux = run_chunks(grid, settings, params, opt_state, dev_pool, n_valid)
    assert float(aux["mean"]["total_loss"]) < 0.45
    # trashbin row untouched
    for i, f in enumerate(params["features"]):
        assert np.all(np.asarray(f[-1]) == 0)


def test_sparse_continual_reg():
    pool, surf = make_sphere_pool(1500)
    cfg = default_cfg()
    grid, settings0, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    from tests.test_trainer import run_chunks

    params, opt_state, _ = run_chunks(
        grid, settings0, params, opt_state, dev_pool, n_valid, iters=100, chunk=50
    )
    shadow = {
        "importance": tuple(jnp.ones_like(f) for f in params["features"]),
        "last_frame": tuple(jnp.array(f, copy=True) for f in params["features"]),
    }
    settings_reg = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="sparse",
        continual_reg_on=True, lambda_forget=1e5, loss_reduction="sum",
    )
    assert settings_reg.feature_update == "sparse"

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p2, _, aux = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool, shadow,
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings_reg, 50,
    )
    assert float(aux["mean"]["reg_loss"]) >= 0
    # strong reg pins features near the snapshot
    drift = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(p2["features"], params["features"])
    )
    settings_noreg = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, loss_reduction="sum",
    )
    p3, _, _ = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        trainer.empty_shadow(params["features"]),
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings_noreg, 50,
    )
    drift_noreg = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(p3["features"], params["features"])
    )
    assert drift < drift_noreg


def test_per_level_lr_ratio_scales_updates():
    """lr_level_reduce_ratio: finest level gets base LR, coarser levels get
    lr * ratio^i (reference utils/tools.py:68-72)."""
    pool, surf = make_sphere_pool(1500)
    cfg = default_cfg(bs=1024)
    cfg.lr_level_reduce_ratio = 0.1
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, lr_level_reduce_ratio=0.1
    )
    assert settings.lr_level_reduce_ratio == 0.1
    p0 = [np.asarray(f).copy() for f in params["features"]]
    p1, _, _ = trainer.train_chunk(
        params, init_opt_state(params), tuple(grid.tables), dev_pool,
        trainer.empty_shadow(params["features"]), n_valid, jnp.int32(0),
        jax.random.PRNGKey(0), settings, 1,
    )
    # one Adam step with eps~0 moves touched entries by ~lr*scale^i
    deltas = []
    for i in range(3):
        d = np.abs(np.asarray(p1["features"][i]) - p0[i])
        moved = d[d > 0]
        deltas.append(np.median(moved))
    np.testing.assert_allclose(deltas[0], cfg.lr, rtol=0.05)
    np.testing.assert_allclose(deltas[1], cfg.lr * 0.1, rtol=0.05)
    np.testing.assert_allclose(deltas[2], cfg.lr * 0.01, rtol=0.05)
