"""Epoch-window batch mode (tpu.batch_windows): precomputed update-kernel
prep + window sampling.

The windows path changes the SAMPLING (without-replacement epoch windows of
one fixed shuffle vs the reference's iid randint batches) but must leave the
per-batch math untouched: `adam_kernel.entry_prep_lanes` is the exact
row-only prefix of `fused_adam_packed(lanes=True)`, and the trainer merely
hoists it out of the scan.  Tests here pin the prep invariants the pallas
kernel relies on, the window partition semantics, and the trainer plumbing
(chunk-split determinism == resume continuity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shine_mapping_tpu.ops import adam_kernel
from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state

from tests.test_trainer import build, default_cfg, make_sphere_pool


def _manual_prep(rows, C, D, n_used=None):
    """Transcription of the pre-refactor inline prep (lanes=True branch of
    fused_adam_packed) — guards the extraction refactor."""
    rows = np.asarray(rows)
    M = rows.shape[0]
    PACK = 128 // D
    R = C * D // 128
    tb, w = adam_kernel.choose_tiles(C, D, M)
    R_used = R
    if n_used is not None and n_used < C:
        need = (n_used * D + 127) // 128
        R_used = max(min(R, (need + tb - 1) // tb * tb), tb)
    T = R_used // tb
    trash = rows == C - 1
    spread_p = np.arange(M, dtype=np.int32) % max(R_used - 1, 1)
    prow_u = np.where(trash, spread_p, (rows // PACK).astype(np.int32))
    order = np.argsort(prow_u, kind="stable")
    prow = prow_u[order]
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = np.full((1, Mpad), -1, np.int32)
    prow_p[0, :M] = prow
    bounds = np.arange(T + 1, dtype=np.int32) * tb
    wstart = np.searchsorted(prow, bounds).astype(np.int32)
    offs = np.minimum(wstart[:-1] // w, Mpad // w - 2).astype(np.int32)
    ok = bool(np.all(wstart[1:] <= offs * w + 2 * w))
    if R_used < R:
        ok = ok and bool(wstart[-1] == M)
    return order, trash[order], prow_p, offs, ok, (tb, w, R_used)


@pytest.mark.parametrize("n_used", [None, 3000])
def test_entry_prep_lanes_matches_inline_transcription(n_used):
    rng = np.random.default_rng(3)
    C, D, M = 1 << 12, 8, 4096
    rows = rng.integers(0, C - 1, M).astype(np.int32)
    rows[rng.random(M) < 0.1] = C - 1  # trashbin entries
    if n_used is not None:
        rows = np.where(rows == C - 1, rows,
                        rows % n_used).astype(np.int32)

    pre = adam_kernel.entry_prep_lanes(jnp.asarray(rows), C, D, n_used)
    order, trash_s, prow_p, offs, ok, _ = _manual_prep(rows, C, D, n_used)

    # jnp.argsort is stable -> orders agree exactly
    np.testing.assert_array_equal(np.asarray(pre.order), order)
    np.testing.assert_array_equal(np.asarray(pre.trash), trash_s)
    np.testing.assert_array_equal(np.asarray(pre.prow_p), prow_p)
    np.testing.assert_array_equal(np.asarray(pre.offs), offs)
    assert bool(pre.ok) == ok


def test_entry_prep_window_coverage_invariant():
    """The kernel contract: every tile's entries lie inside its two
    w-blocks, and (with n_used) every entry lands in a visited tile."""
    rng = np.random.default_rng(11)
    C, D, M = 1 << 13, 8, 8192
    rows = rng.integers(0, C - 1, M).astype(np.int32)
    pre = adam_kernel.entry_prep_lanes(jnp.asarray(rows), C, D, None)
    assert bool(pre.ok), "uniform rows must not overflow the tile windows"
    tb, w = adam_kernel.choose_tiles(C, D, M)
    prow = np.asarray(pre.prow_p)[0, :M]
    offs = np.asarray(pre.offs)
    for t in range(len(offs)):
        inside = np.nonzero((prow >= t * tb) & (prow < (t + 1) * tb))[0]
        if inside.size:
            assert inside.min() >= offs[t] * w
            assert inside.max() < offs[t] * w + 2 * w


@pytest.mark.parametrize("grads_bf16,n_used", [(False, None), (True, 3000)])
def test_kernel_pre_path_bit_equals_live_prep(grads_bf16, n_used):
    """The REAL pallas kernel (interpret mode on CPU) with a precomputed
    EntryPrep must produce BIT-identical output to the live-prep call —
    `pre` only moves where the row-only work happens.  Also bounds the
    kernel against the XLA twin."""
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(7)
    C, D, M = 1 << 12, 8, 2048
    p = rng.normal(size=(C, D)).astype(np.float32)
    m = (rng.normal(size=(C, D)) * 0.1).astype(np.float32)
    v = np.abs(rng.normal(size=(C, D)) * 0.01).astype(np.float32)
    if n_used is not None:
        # the n_used contract (used_rows_hint): headroom rows never appear
        # in lookups and carry zero moments, so dense Adam leaves them
        # bit-identical and the kernel may skip their tiles
        m[n_used:] = 0.0
        v[n_used:] = 0.0
    p = p.reshape(-1, 128)
    m = m.reshape(-1, 128)
    v = v.reshape(-1, 128)
    hi = C - 1 if n_used is None else n_used
    rows = rng.integers(0, hi, M).astype(np.int32)
    rows[rng.random(M) < 0.05] = C - 1  # trashbin entries (zero grads)
    g128 = np.zeros((M, 128), np.float32)
    slot = rows % (128 // D)
    lane0 = slot * D
    g_vals = rng.normal(size=(M, D)).astype(np.float32)
    for k_ in range(M):
        if rows[k_] != C - 1:
            g128[k_, lane0[k_]:lane0[k_] + D] = g_vals[k_]

    args = (jnp.asarray(p), jnp.asarray(m), jnp.asarray(v),
            jnp.asarray(rows), jnp.asarray(g128), jnp.float32(0.01),
            jnp.float32(0.5), jnp.float32(0.5), C, D)
    kw = dict(lanes=True, n_used=n_used, grads_bf16=grads_bf16)

    orig = pl.pallas_call

    def interpreted(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = interpreted
    try:
        live = adam_kernel.fused_adam_packed(*args, use_pallas=True, **kw)
        pre = adam_kernel.entry_prep_lanes(jnp.asarray(rows), C, D, n_used)
        assert bool(pre.ok)
        given = adam_kernel.fused_adam_packed(*args, use_pallas=True,
                                              pre=pre, **kw)
    finally:
        pl.pallas_call = orig
    for a, b in zip(live, given):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the kernel tracks the XLA twin (bf16 hi/lo split ~ 2e-6 abs)
    twin = adam_kernel.fused_adam_packed(*args, use_pallas=False, **kw)
    for a, b in zip(live, twin):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_precompute_batch_windows_partitions_the_pool():
    pool, surf = make_sphere_pool(2000, seed=5)
    cfg = default_cfg(bs=256)
    grid, settings, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas"
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tuple(grid.tables), dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in params["features"]),
    )
    n = int(n_valid)
    win = trainer.precompute_batch_windows(
        pre, n, jax.random.PRNGKey(0), settings, feat_shapes
    )
    W = -(n // -settings.bs)  # ceil: the shuffle tail gets its own window
    idx = np.asarray(win["idx"])
    assert idx.shape == (W, settings.bs)
    flat = idx.reshape(-1)
    # one epoch covers EVERY pool sample (the tail window wraps to the
    # shuffle's start, so only W*bs - n wrap duplicates exist)
    assert len(np.unique(flat)) == n
    assert flat.min() >= 0 and flat.max() < n
    assert flat.size - n == W * settings.bs - n
    # stacked per-level preps align with the window count
    for lvl_prep in win["preps"]:
        assert lvl_prep.order.shape[0] == W
        assert lvl_prep.ok.shape == (W,)


def test_train_chunk_windows_chunk_split_consistency():
    """Window selection is (start_iter + it) % W — a run split into two
    chunks must reproduce the single-chunk run exactly (this is also what
    makes a resumed run continue the same epoch sequence)."""
    pool, surf = make_sphere_pool(1500, seed=9)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas"
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps
    )
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), jax.random.PRNGKey(1), settings, feat_shapes
    )
    key = jax.random.PRNGKey(2)

    def run(splits):
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        start = 0
        for n in splits:
            p, o, aux = trainer.train_chunk(
                p, o, tables, dev_pool, trainer.empty_shadow(p["features"]),
                n_valid, jnp.int32(start), key, settings, n,
                pre_lookups=pre, batch_windows=win,
            )
            start += n
        return p, aux

    p_once, _ = run([6])
    p_split, _ = run([2, 4])
    for a, b in zip(p_once["features"], p_split["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_windows_sharded_matches_single_device():
    """Epoch-window mode under data parallelism: the sharded update island
    re-spreads the narrow entry gradients to lanes and consumes the same
    precomputed EntryPrep — an 8-device run must match single-device
    (same windows => same batches; only float reduction order differs)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    pool, surf = make_sphere_pool(1500, seed=31)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas"
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps
    )
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), jax.random.PRNGKey(1), settings, feat_shapes
    )
    key = jax.random.PRNGKey(2)
    shadow = trainer.empty_shadow(params["features"])

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p1, _, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), key, settings, 5,
        pre_lookups=pre, batch_windows=win,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, repl)
    p8, _, aux8 = trainer.train_chunk(
        put(copy(params)), put(init_opt_state(params)), put(tables),
        put(dev_pool), put(shadow), put(n_valid), jnp.int32(0), key,
        settings, 5,
        pre_lookups=put(pre), batch_windows=put(win),
        batch_sharding=batch_sh,
    )
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(p1["features"], p8["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
        )


def test_train_chunk_windows_gate():
    """batch_windows with an incompatible configuration must raise."""
    pool, surf = make_sphere_pool(1000, seed=13)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", consistency_loss_on=True,
        consistency_count=32,
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps
    )
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), jax.random.PRNGKey(1), settings, feat_shapes
    )
    with pytest.raises(ValueError, match="batch_windows"):
        trainer.train_chunk(
            params, opt_state, tables, dev_pool,
            trainer.empty_shadow(params["features"]),
            n_valid, jnp.int32(0), jax.random.PRNGKey(0), settings, 2,
            pre_lookups=pre, batch_windows=win,
        )
