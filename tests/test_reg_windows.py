"""Continual-learning reg on the fused-window fast path (round 5).

The reference's flagship incremental mode (shine_incre.py:155-157,
model/feature_octree.py:246-255) regularizes batch-touched features toward
their last-frame values weighted by importance.  Previously this demoted
the pallas/window path to 'fused' (13x off flagship); now body_winx folds
the reg gradient 2*lambda*imp*(p - last) onto precomputed per-entry cover
masks (each touched corner lane has exactly one owner entry), with three
row gathers and zero scatters.

Tests pin (a) the cover-mask invariant (every touched lane owned exactly
once), (b) one-step equivalence against the DENSE formulation
(trainer._compute_loss + adam_update on the same batch — the transcription
of the reference's math), and (c) multi-step training + the DP island.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import (
    adam_update, init_opt_state, lr_at_step, make_group_trees,
)

from tests.test_trainer import build, default_cfg, make_sphere_pool


def _reg_setup(seed=5, n=2500, bs=256):
    pool, surf = make_sphere_pool(n, seed=seed)
    cfg = default_cfg(bs=bs)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas")
    settings = dataclasses.replace(
        settings, continual_reg_on=True, lambda_forget=10.0)
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in params["features"]))
    rng = np.random.default_rng(seed + 1)
    shadow = {
        "importance": tuple(
            jnp.asarray(np.abs(rng.normal(0.5, 0.2, f.shape)), jnp.float32)
            .at[-1].set(0.0)  # trashbin importance zeroed (incre_learning)
            for f in params["features"]),
        "last_frame": tuple(
            f + jnp.asarray(rng.normal(0, 0.02, f.shape), jnp.float32)
            for f in params["features"]),
    }
    return (grid, settings, params, opt_state, dev_pool, n_valid,
            feat_shapes, tables, pre, shadow)


def test_reg_mode_keeps_pallas_with_windows():
    (_, settings, params, *_rest) = _reg_setup()[:3] + ((),)
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    assert trainer.resolve_feature_update(
        settings, feat_shapes, winx=True) == "pallas"
    assert trainer.resolve_feature_update(
        settings, feat_shapes, winx=False) == "fused"
    assert trainer.batch_windows_ok(settings, feat_shapes)


@pytest.mark.parametrize("split_k", [False, True])
def test_cover_masks_own_each_touched_lane_once(split_k):
    (grid, settings, params, _, dev_pool, n_valid,
     feat_shapes, tables, pre, shadow) = _reg_setup()
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, split_k=split_k, reg_cover=True)
    split = "rows_hi" in wx
    L = len(settings.levels)
    D = feat_shapes[0][1]
    PACK = 128 // D
    cover = np.asarray(wx["cover"])  # (W, M)
    idx = np.asarray(wx["idx"])
    for w_i in range(min(2, cover.shape[0])):
        # rows per entry, flat order matching cover
        if split:
            rows = np.concatenate(
                [np.asarray(wx["rows_hi"][w_i]).reshape(-1),
                 np.asarray(wx["rows_lo"][w_i]).reshape(-1)])
        else:
            rows = np.asarray(wx["rows_kg"][w_i]).reshape(-1)
        # expected touched lanes: every found sample's corners
        touched = set()
        for i, lvl in enumerate(settings.levels):
            c = np.asarray(pre[i][0])[idx[w_i]]
            f = np.asarray(pre[i][1])[idx[w_i]]
            for b in np.nonzero(f)[0]:
                for corner in c[b]:
                    touched.add((i, corner // PACK, corner % PACK))
        # owned lanes from the cover bitmasks (rows are GLOBAL: recover
        # the level from the row offsets)
        Rs = [C * d // 128 for C, d in feat_shapes]
        roffs = np.concatenate([[0], np.cumsum(Rs)])
        owned = {}
        for e in range(cover.shape[1]):
            bits = int(cover[w_i, e])
            if not bits:
                continue
            r = int(rows[e])
            lvl_i = int(np.searchsorted(roffs, r, side="right") - 1)
            for slot in range(PACK):
                if bits >> slot & 1:
                    lane = (lvl_i, r - roffs[lvl_i], slot)
                    assert lane not in owned, f"lane {lane} owned twice"
                    owned[lane] = e
        assert set(owned) == touched


def test_winx_reg_one_step_matches_dense_formulation():
    """One train_chunk iteration with the reg fold vs the explicit dense
    formulation (trainer._compute_loss includes _continual_reg — the
    transcription of model/feature_octree.py:246-255) on the SAME batch."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre, shadow) = _reg_setup()
    wkey = jax.random.PRNGKey(1)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), wkey, settings, feat_shapes,
        split_k=True, reg_cover=True)
    copy = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t)
    p_w, o_w, aux_w = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings, 1,
        batch_windows=wx)

    # manual dense step on window 0's batch
    idx0 = np.asarray(wx["idx"][0])
    batch = {
        "coord": dev_pool["coord"][idx0],
        "sdf_label": dev_pool["sdf_label"][idx0],
        "weight": dev_pool["weight"][idx0],
        "ts": dev_pool["time"][idx0],
    }
    s = settings

    def loss_fn(p):
        total, aux = trainer._compute_loss(
            p, tables, batch, shadow, jax.random.PRNGKey(0), s)
        return total, aux

    (loss_ref, aux_ref), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    lr_scale_tree, wd_tree = make_group_trees(
        params, s.lr_level_reduce_ratio, s.weight_decay)
    lr = lr_at_step(s.lr, jnp.int32(0), s.lr_decay_step,
                    s.lr_iters_reduce_ratio)
    p_ref, o_ref = adam_update(
        copy(params), grads, copy(opt_state), lr, lr_scale_tree, wd_tree,
        b1=0.9, b2=0.99, eps=s.adam_eps)

    np.testing.assert_allclose(
        float(aux_w["mean"]["reg_loss"]), float(aux_ref["reg_loss"]),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(aux_w["mean"]["total_loss"]), float(aux_ref["total_loss"]),
        rtol=1e-5)
    for a, b in zip(p_w["features"], p_ref["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for k in ("geo",):
        for a, b in zip(jax.tree_util.tree_leaves(p_w[k]),
                        jax.tree_util.tree_leaves(p_ref[k])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_winx_reg_trains_and_shrinks_drift():
    """Multi-step: the reg term pulls features toward last_frame — with a
    large lambda the weighted drift stays far below the unregularized
    run's."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre, shadow) = _reg_setup()
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, split_k=True, reg_cover=True)
    copy = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t)

    def drift(p):
        return sum(
            float(jnp.sum(np.asarray(shadow["importance"][i])
                          * (a - shadow["last_frame"][i]) ** 2))
            for i, a in enumerate(p["features"]))

    strong = dataclasses.replace(settings, lambda_forget=1e4)
    p_s, _, aux_s = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), strong, 20,
        batch_windows=wx)
    weak = dataclasses.replace(settings, continual_reg_on=False)
    wx_plain = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, split_k=True)
    p_u, _, _ = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool,
        trainer.empty_shadow(params["features"]),
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), weak, 20,
        batch_windows=wx_plain)
    assert np.isfinite(float(aux_s["mean"]["total_loss"]))
    assert drift(p_s) < 0.5 * drift(p_u), (drift(p_s), drift(p_u))


def test_winx_reg_data_parallel_matches_single_chip():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre, shadow) = _reg_setup()
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, split_k=True, reg_cover=True)
    copy = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), t)
    key = jax.random.PRNGKey(2)
    p1, _, aux1 = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), key, settings, 4, batch_windows=wx)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    repl = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(x, repl)
    p4, _, aux4 = trainer.train_chunk(
        put(copy(params)), put(copy(opt_state)), put(tables),
        put(dev_pool), put(shadow), put(n_valid), jnp.int32(0), key,
        settings, 4, batch_windows=put(wx),
        batch_sharding=NamedSharding(mesh, P("data")))
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux4["mean"]["total_loss"]),
        rtol=1e-4)
    for a, b in zip(p1["features"], p4["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
