"""Fused feature update (explicit scatter + dense Adam) vs autodiff dense.

Both paths implement the SAME math — dense Adam over full feature tables
(reference utils/tools.py:57-83) — the fused one just computes the feature
gradient through the gathered corner rows and scatters it explicitly, which
XLA fuses into the optimizer sweep (experiments/exp_fusion_shapes.py).
They must therefore track each other to float tolerance, not just loosely.
"""

import numpy as np
import jax
import jax.numpy as jnp

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state
from tests.test_trainer import make_sphere_pool, default_cfg, build


def _copy(p):
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)


def _run(cfg, grid, settings, params, dev_pool, n_valid, iters=5, key=0,
         pre_lookups=None):
    shadow = trainer.empty_shadow(params["features"])
    return trainer.train_chunk(
        _copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), jax.random.PRNGKey(key), settings, iters,
        pre_lookups=pre_lookups,
    )


def test_fused_matches_dense_exactly():
    pool, surf = make_sphere_pool(2000)
    cfg = default_cfg(bs=1024)
    grid, settings_f, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, ekional_loss_on=True
    )
    assert settings_f.feature_update == "fused"
    settings_d = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="dense",
        ekional_loss_on=True,
    )
    p_f, o_f, aux_f = _run(cfg, grid, settings_f, params, dev_pool, n_valid)
    p_d, o_d, aux_d = _run(cfg, grid, settings_d, params, dev_pool, n_valid)
    np.testing.assert_allclose(
        float(aux_f["mean"]["total_loss"]), float(aux_d["mean"]["total_loss"]),
        rtol=1e-5,
    )
    for k in p_f["geo"]:
        np.testing.assert_allclose(
            np.asarray(p_f["geo"][k]), np.asarray(p_d["geo"][k]),
            rtol=1e-4, atol=1e-6,
        )
    for i in range(len(p_f["features"])):
        np.testing.assert_allclose(
            np.asarray(p_f["features"][i]), np.asarray(p_d["features"][i]),
            rtol=1e-4, atol=2e-5,
        )
        # optimizer moments too (same dense-Adam state evolution)
        np.testing.assert_allclose(
            np.asarray(o_f.m["features"][i]), np.asarray(o_d.m["features"][i]),
            rtol=1e-4, atol=1e-6,
        )


def test_fused_consistency_loss_trains_finite_and_scatters_near_rows():
    pool, surf = make_sphere_pool(1200, seed=5)
    cfg = default_cfg(bs=512)
    grid, settings, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, consistency_loss_on=True, consistency_count=64
    )
    p2, _, aux = _run(cfg, grid, settings, params, dev_pool, n_valid, iters=3)
    assert np.isfinite(float(aux["mean"]["total_loss"]))
    assert np.isfinite(float(aux["mean"]["consistency_loss"]))
    for leaf in jax.tree_util.tree_leaves(p2):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # trashbin row stays exactly zero under the fused update
    for f in p2["features"]:
        assert np.all(np.asarray(f[-1]) == 0)


def test_pallas_mode_matches_fused_exactly():
    """feature_update='pallas' (packed-carry path; XLA-twin kernel on CPU)
    must reproduce the fused path bit-for-bit-ish — same dense-Adam math,
    different table layout."""
    pool, surf = make_sphere_pool(1500, seed=9)
    cfg = default_cfg(bs=1024)
    grid, settings_p, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", ekional_loss_on=True
    )
    settings_f = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="fused",
        ekional_loss_on=True,
    )
    p_p, o_p, aux_p = _run(cfg, grid, settings_p, params, dev_pool, n_valid)
    p_f, o_f, aux_f = _run(cfg, grid, settings_f, params, dev_pool, n_valid)
    np.testing.assert_allclose(
        float(aux_p["mean"]["total_loss"]), float(aux_f["mean"]["total_loss"]),
        rtol=1e-6,
    )
    for i in range(len(p_p["features"])):
        assert p_p["features"][i].shape == p_f["features"][i].shape
        # the pallas path sorts entries before the scatter: duplicate-row
        # adds reassociate, so allow float-addition-order noise
        np.testing.assert_allclose(
            np.asarray(p_p["features"][i]), np.asarray(p_f["features"][i]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(o_p.m["features"][i]), np.asarray(o_f.m["features"][i]),
            rtol=1e-4, atol=1e-6,
        )


def test_pallas_mode_consistency_loss():
    """Consistency entries are concatenated into the sparse update."""
    pool, surf = make_sphere_pool(1000, seed=4)
    cfg = default_cfg(bs=512)
    grid, settings, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas",
        consistency_loss_on=True, consistency_count=64,
    )
    p2, _, aux = _run(cfg, grid, settings, params, dev_pool, n_valid, iters=3)
    assert np.isfinite(float(aux["mean"]["total_loss"]))
    for f in p2["features"]:
        assert np.all(np.isfinite(np.asarray(f)))
        assert np.all(np.asarray(f[-1]) == 0)  # trashbin untouched


def test_precomputed_lookups_match_live_lookups():
    """Passing precompute_pool_lookups output (run-level full-pool corner
    resolution) must reproduce the live-probe run exactly: found corners
    are identical by construction and missed corners carry zero gradients
    either way."""
    pool, surf = make_sphere_pool(1500, seed=21)
    cfg = default_cfg(bs=1024)
    for mode in ("fused", "pallas"):
        grid, settings, params, _, dev_pool, n_valid = build(
            cfg, pool, surf, feature_update=mode, ekional_loss_on=True
        )
        pre = trainer.precompute_pool_lookups(
            tuple(grid.tables), dev_pool["coord"], tuple(grid.levels),
            tuple(f.shape[0] for f in params["features"]),
        )
        p_a, o_a, aux_a = _run(cfg, grid, settings, params, dev_pool, n_valid)
        p_b, o_b, aux_b = _run(cfg, grid, settings, params, dev_pool, n_valid,
                               pre_lookups=pre)
        np.testing.assert_allclose(
            float(aux_a["mean"]["total_loss"]),
            float(aux_b["mean"]["total_loss"]), rtol=1e-6,
        )
        for i in range(len(p_a["features"])):
            np.testing.assert_allclose(
                np.asarray(p_a["features"][i]), np.asarray(p_b["features"][i]),
                rtol=1e-5, atol=1e-7,
            )


def test_adam_kernel_xla_twin_matches_scatter_reference():
    """fused_adam_packed (XLA path) == scatter+adam on unpacked tables."""
    from shine_mapping_tpu.ops import adam_kernel

    rng = np.random.default_rng(0)
    C, D, M = 1 << 12, 8, 4096
    p = rng.normal(size=(C, D)).astype(np.float32)
    m = rng.normal(size=(C, D)).astype(np.float32) * 0.1
    v = np.abs(rng.normal(size=(C, D))).astype(np.float32) * 0.01
    rows = rng.integers(0, C - 1, M).astype(np.int32)
    grads = rng.normal(size=(M, D)).astype(np.float32)
    lr, bc1, bc2 = jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5)

    p2, m2, v2 = adam_kernel.fused_adam_packed(
        jnp.asarray(p.reshape(-1, 128)), jnp.asarray(m.reshape(-1, 128)),
        jnp.asarray(v.reshape(-1, 128)), jnp.asarray(rows), jnp.asarray(grads),
        lr, bc1, bc2, C, D, use_pallas=False,
    )
    gd = np.zeros((C, D), np.float32)
    np.add.at(gd, rows, grads)
    m_ref = 0.9 * m + 0.1 * gd
    v_ref = 0.99 * v + 0.01 * gd * gd
    p_ref = p - 0.01 * (m_ref / 0.5) / (np.sqrt(v_ref / 0.5) + 1e-15)
    np.testing.assert_allclose(np.asarray(p2).reshape(C, D), p_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2).reshape(C, D), m_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v2).reshape(C, D), v_ref, atol=1e-5)


def test_adam_kernel_multi_matches_per_level():
    """fused_adam_packed_multi over concatenated levels == per-level
    fused_adam_packed with each level's own learning rate."""
    from shine_mapping_tpu.ops import adam_kernel

    rng = np.random.default_rng(1)
    D = 8
    shapes = ((1 << 12, D), (1 << 11, D), (1 << 11, D))
    lr_scales = (1.0, 0.7, 0.49)
    lr, bc1, bc2 = jnp.float32(0.02), jnp.float32(0.4), jnp.float32(0.6)

    p_l, m_l, v_l, rows_l, g_l = [], [], [], [], []
    for C, _ in shapes:
        p_l.append(rng.normal(size=(C * D // 128, 128)).astype(np.float32))
        m_l.append(0.1 * rng.normal(size=(C * D // 128, 128)).astype(np.float32))
        v_l.append(np.abs(rng.normal(size=(C * D // 128, 128))).astype(np.float32) * 0.01)
        M = 2048
        rows = rng.integers(0, C, M).astype(np.int32)  # incl. trashbin C-1
        g128 = np.zeros((M, 128), np.float32)
        narrow = rng.normal(size=(M, D)).astype(np.float32)
        narrow[rows == C - 1] = 0.0  # trashbin grads are zero by construction
        for k in range(M):  # lane-aligned layout (lanefold backward)
            s = (rows[k] % (128 // D)) * D
            g128[k, s:s + D] = narrow[k]
        rows_l.append(rows)
        g_l.append(g128)

    p_all, m_all, v_all = (jnp.concatenate([jnp.asarray(x) for x in xs])
                           for xs in (p_l, m_l, v_l))
    p2, m2, v2 = adam_kernel.fused_adam_packed_multi(
        p_all, m_all, v_all,
        [jnp.asarray(r) for r in rows_l], [jnp.asarray(g) for g in g_l],
        lr, bc1, bc2, shapes, lr_scales, use_pallas=False,
    )

    lo = 0
    for i, (C, _) in enumerate(shapes):
        R = C * D // 128
        pe, me, ve = adam_kernel.fused_adam_packed(
            jnp.asarray(p_l[i]), jnp.asarray(m_l[i]), jnp.asarray(v_l[i]),
            jnp.asarray(rows_l[i]), jnp.asarray(g_l[i]),
            lr * lr_scales[i], bc1, bc2, C, D, lanes=True, use_pallas=False,
        )
        np.testing.assert_allclose(np.asarray(p2[lo:lo + R]), np.asarray(pe),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m2[lo:lo + R]), np.asarray(me),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(v2[lo:lo + R]), np.asarray(ve),
                                   rtol=1e-6, atol=1e-7)
        lo += R


def test_fused_continual_reg_matches_sparse_reg_value():
    """Fused and sparse continual-reg paths compute the same penalty on the
    same touched rows (model/feature_octree.py:246-255 semantics)."""
    pool, surf = make_sphere_pool(1000, seed=3)
    cfg = default_cfg(bs=512)
    grid, _, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    shadow = {
        "importance": tuple(jnp.ones_like(f) for f in params["features"]),
        "last_frame": tuple(
            jnp.array(f, copy=True) + 0.01 for f in params["features"]
        ),
    }
    out = {}
    for mode in ("fused", "sparse"):
        settings = trainer.TrainSettings.from_config(
            cfg, grid.levels, sigma_sigmoid=0.05, feature_update=mode,
            continual_reg_on=True, lambda_forget=10.0,
        )
        _, _, aux = trainer.train_chunk(
            _copy(params), init_opt_state(params), tuple(grid.tables),
            dev_pool, shadow, n_valid, jnp.int32(0), jax.random.PRNGKey(4),
            settings, 1,
        )
        out[mode] = float(aux["mean"]["reg_loss"])
    assert out["fused"] > 0
    np.testing.assert_allclose(out["fused"], out["sparse"], rtol=1e-4)


def test_used_rows_hint_and_n_used_equivalence():
    """used_rows_hint buckets correctly, and a pallas-mode run with n_used
    set produces the same trajectory as without (headroom rows carry zero
    moments and zero grads, so skipping their sweep is exact; the real-chip
    bit-equality check is experiments/exp_used_rows.py)."""
    from shine_mapping_tpu.ops import adam_kernel

    C = 1 << 16
    hint = adam_kernel.used_rows_hint((40_000, C), ((C, 8), (C, 8)),
                                      granularity=16)
    step = C // 16
    assert hint[0] % step == 0 and 40_000 <= hint[0] < C
    assert hint[1] == C  # full tables stay full

    pool, surf = make_sphere_pool(2000, seed=5)
    cfg = default_cfg(bs=1024)
    grid, _, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    base = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="pallas",
    )
    used = trainer.used_rows_for(grid, granularity=16)
    caps = tuple(f.shape[0] for f in grid.features)
    settings_u = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="pallas",
        n_used=used,
    )
    assert all(u <= c for u, c in zip(used, caps))
    p_a, o_a, aux_a = _run(cfg, grid, base, params, dev_pool, n_valid)
    p_b, o_b, aux_b = _run(cfg, grid, settings_u, params, dev_pool, n_valid)
    np.testing.assert_allclose(
        float(aux_a["mean"]["total_loss"]), float(aux_b["mean"]["total_loss"]),
        rtol=1e-6,
    )
    for i in range(len(p_a["features"])):
        np.testing.assert_array_equal(
            np.asarray(p_a["features"][i]), np.asarray(p_b["features"][i]))
        np.testing.assert_array_equal(
            np.asarray(o_a.m["features"][i]), np.asarray(o_b.m["features"][i]))
        np.testing.assert_array_equal(
            np.asarray(o_a.v["features"][i]), np.asarray(o_b.v["features"][i]))


def test_moments_bf16_quality_parity_and_guard():
    """bf16 Adam moments (tpu.moments_bf16): dtype-stable carry, loss
    trajectory at the f32 path's level, and a hard error outside pallas
    mode (other formulations would promote the carry)."""
    import pytest

    pool, surf = make_sphere_pool(2000, seed=7)
    cfg = default_cfg(bs=1024)
    grid, _, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    settings = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="pallas",
    )

    def run(moments_bf16):
        shadow = trainer.empty_shadow(params["features"])
        opt = init_opt_state(params, moments_bf16=moments_bf16)
        return trainer.train_chunk(
            _copy(params), opt, tuple(grid.tables), dev_pool, shadow,
            n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings, 40,
        )

    p32, o32, aux32 = run(False)
    p16, o16, aux16 = run(True)
    assert o16.m["features"][0].dtype == jnp.bfloat16
    assert o16.v["features"][0].dtype == jnp.bfloat16
    assert p16["features"][0].dtype == jnp.float32
    l32 = float(aux32["mean"]["total_loss"])
    l16 = float(aux16["mean"]["total_loss"])
    # same descent, SGD-noise-level difference from moment quantization
    np.testing.assert_allclose(l16, l32, rtol=0.02)
    for i in range(len(p32["features"])):
        a = np.asarray(p32["features"][i])
        b = np.asarray(p16["features"][i])
        # feature drift stays a small fraction of the update magnitude
        denom = max(np.abs(a - np.asarray(params["features"][i])).max(), 1e-6)
        assert np.abs(a - b).max() < 0.2 * denom

    settings_f = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="fused",
    )
    with pytest.raises(ValueError, match="moments_bf16"):
        trainer.train_chunk(
            _copy(params), init_opt_state(params, moments_bf16=True),
            tuple(grid.tables), dev_pool,
            trainer.empty_shadow(params["features"]), n_valid, jnp.int32(0),
            jax.random.PRNGKey(2), settings_f, 2,
        )
