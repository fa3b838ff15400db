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
    tb, w = adam_kernel.choose_tiles(C, D, M, n_used)
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


# --------------------------------------------------------------- winx mode
# (fused-gather window layout: K-deduplicated packed rows, stacked batch
# content, ONE gather + ONE multi-level kernel dispatch per iteration —
# trainer.precompute_batch_windows_fused / body_winx)


def _winx_setup(seed=5, n=2000, bs=256):
    pool, surf = make_sphere_pool(n, seed=seed)
    cfg = default_cfg(bs=bs)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas"
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps
    )
    return (grid, settings, params, opt_state, dev_pool, n_valid,
            feat_shapes, tables, pre)


def test_precompute_windows_fused_structure():
    """The fused window prep must (a) draw the SAME windows as the
    per-level prep given the same key, and (b) encode exactly the corner
    structure: reconstructing each corner's packed row from rows_kg[kidx]
    recovers corners // PACK."""
    (grid, settings, params, _, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup()
    key = jax.random.PRNGKey(1)
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), key, settings, feat_shapes)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    np.testing.assert_array_equal(np.asarray(win["idx"]), np.asarray(wx["idx"]))

    L = len(settings.levels)
    K = wx["rows_kg"].shape[-1] // L
    import numpy as _np
    from shine_mapping_tpu.ops.adam_kernel import _multi_geometry
    Rs, Rus, roffs, *_ = _multi_geometry(
        feat_shapes, settings.bs * L * K, settings.n_used)
    for wsel in range(min(3, wx["idx"].shape[0])):
        idx = _np.asarray(wx["idx"][wsel])
        for i in range(L):
            D = feat_shapes[i][1]
            PACK = 128 // D
            corners = _np.asarray(pre[i][0])[idx]
            found = _np.asarray(pre[i][1])[idx]
            rows_k = _np.asarray(wx["rows_kg"][wsel])[:, i * K:(i + 1) * K]
            kidx = _np.asarray(wx["kidx"][wsel])[:, i * 8:(i + 1) * 8]
            slots = _np.asarray(wx["slots"][wsel])[:, i * 8:(i + 1) * 8]
            got = _np.take_along_axis(rows_k, kidx.astype(_np.int64), axis=1)
            want = corners // PACK + int(roffs[i])
            _np.testing.assert_array_equal(got[found], want[found])
            _np.testing.assert_array_equal(
                slots[found], (corners % PACK)[found])
            # stacked batch content == pool gather
            _np.testing.assert_array_equal(
                _np.asarray(wx["pool"]["coord"][wsel]),
                _np.asarray(dev_pool["coord"])[idx])


def test_winx_matches_per_level_windows():
    """Same windows, same seeds: the winx body must reproduce the
    per-level windows trajectory (same trilinear sums grouped by packed
    row; CPU runs both through the XLA fallbacks)."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup()
    key = jax.random.PRNGKey(1)
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), key, settings, feat_shapes)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    shadow = trainer.empty_shadow(params["features"])

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    k = jax.random.PRNGKey(2)
    p1, _, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 8,
        pre_lookups=pre, batch_windows=win)
    p2, _, aux2 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 8,
        batch_windows=wx)
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux2["mean"]["total_loss"]),
        rtol=1e-6)
    for a, b in zip(p1["features"], p2["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_winx_chunk_split_consistency():
    """(start_iter + it) % W window selection: split runs == single run,
    bit-exact — resume continuity for the fused layout."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=9, n=1500)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes)
    key = jax.random.PRNGKey(2)

    def run(splits):
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        start = 0
        for n in splits:
            p, o, aux = trainer.train_chunk(
                p, o, tables, dev_pool, trainer.empty_shadow(p["features"]),
                n_valid, jnp.int32(start), key, settings, n,
                batch_windows=wx)
            start += n
        return p

    p_once = run([6])
    p_split = run([2, 4])
    for a, b in zip(p_once["features"], p_split["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("params_bf16", [False, True])
def test_winx_sharded_matches_single_device(params_bf16):
    """The fused-window (winx) layout under data parallelism: the
    batch-sharded entry gradients all-gather at the update island's
    boundary and the replicated kernel consumes the same precomputed
    EntryPrep — an 8-device run must match single-device (identical
    windows => identical batches; only float reduction order differs, and
    for bf16 tables the stochastic-rounding seed is iteration-derived so
    both runs round the same values with the same bits)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=31)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes)
    if params_bf16:
        params = dict(params, features=tuple(
            f.astype(jnp.bfloat16) for f in params["features"]))
        opt_state = init_opt_state(params, moments_bf16=True)
    key = jax.random.PRNGKey(2)
    shadow = trainer.empty_shadow(params["features"])

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p1, _, aux1 = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), key, settings, 5, batch_windows=wx,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, repl)
    p8, _, aux8 = trainer.train_chunk(
        put(copy(params)), put(copy(opt_state)), put(tables),
        put(dev_pool), put(shadow), put(n_valid), jnp.int32(0), key,
        settings, 5, batch_windows=put(wx), batch_sharding=batch_sh,
    )
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(p1["features"], p8["features"]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if params_bf16:
            # reduction-order f32 noise can flip individual stochastic
            # roundings; bound by one bf16 quantum
            tol = np.maximum(np.abs(a) * 2.0 ** -7, 1e-6)
            assert (np.abs(a - b) <= tol).mean() > 0.999
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_estimate_windows_bytes_tracks_actual():
    """The driver's OOM guard must bound the real device footprint of both
    window layouts to within ~2x (it only gates a fallback decision)."""
    (grid, settings, params, _, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=3, n=3000)
    key = jax.random.PRNGKey(1)

    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    K = wx["rows_kg"].shape[-1] // len(settings.levels)
    actual = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(wx)
    )
    est = trainer.estimate_windows_bytes(
        int(n_valid), settings, feat_shapes, dev_pool, fused=True, K=K)
    assert 0.5 * actual <= est <= 2.0 * actual, (est, actual)

    win = trainer.precompute_batch_windows(
        pre, int(n_valid), key, settings, feat_shapes)
    actual_w = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(win)
    )
    est_w = trainer.estimate_windows_bytes(
        int(n_valid), settings, feat_shapes, dev_pool, fused=False)
    assert 0.5 * actual_w <= est_w <= 2.0 * actual_w, (est_w, actual_w)


def test_tile_windows_fit_steep_level_pyramids():
    """Regression (round-5 find): window blocks sized by the table-AVERAGE
    entry density overflowed on steep level pyramids — the street/city
    coarse level holds ~4% of the fine level's rows but the same M/L
    entries (~7/row), so every window failed pre.ok and the update
    silently ran the XLA fallback each iteration.  The geometry must size
    the window block for the DENSEST level's used head."""
    rng = np.random.default_rng(2)
    shapes = ((1 << 21, 8), (1 << 19, 8), (1 << 17, 8))
    n_used = (1_200_000, 310_000, 83_000)
    L, bs, K = 3, 8192, 4
    Rs = [C * d // 128 for C, d in shapes]
    roffs = np.concatenate([[0], np.cumsum(Rs)])
    used_rows = [(nu * 8 + 127) // 128 for nu in n_used]
    prow = np.concatenate([
        roffs[i] + rng.integers(0, used_rows[i], bs * K)
        for i in range(L)
    ]).astype(np.int32)
    zero = np.zeros(bs * K * L, bool)
    pre = adam_kernel.entry_prep_multi(
        jnp.asarray(prow), jnp.asarray(zero), shapes, n_used)
    assert bool(pre.ok), (
        "uniform-over-used-rows entries must fit the tile windows on a "
        "steep pyramid (coarse level ~7 entries/row)")
    # the single-level path with a dense used head (~12 entries/row)
    C, D = 1 << 17, 8
    rows1 = rng.integers(0, 83_000, bs * 8).astype(np.int32)
    pre1 = adam_kernel.entry_prep_lanes(jnp.asarray(rows1), C, D, 83_000)
    assert bool(pre1.ok)


def test_hbm_monitor_census_bounds_window_stacks():
    """The drivers' peak-HBM telemetry (live-buffer census — the axon
    plugin returns no memory_stats) must SEE the fused window stacks, and
    the OOM-guard estimate must bound the measured residency delta."""
    from shine_mapping_tpu.utils.profiling import HbmMonitor

    (grid, settings, params, _, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=5, n=3000)
    mon = HbmMonitor()
    before = mon.sample("before")
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes)
    jax.block_until_ready(jax.tree_util.tree_leaves(wx))
    after = mon.sample("after")
    actual = sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(wx))
    delta = after - before
    assert delta >= 0.5 * actual, (delta, actual)
    K = wx["rows_kg"].shape[-1] // len(settings.levels)
    est = trainer.estimate_windows_bytes(
        int(n_valid), settings, feat_shapes, dev_pool, fused=True, K=K)
    # at this toy scale the census also catches a few MB of executable
    # constants the precompute compile left live; the proportional term is
    # what scales (the city demo records census vs estimate at real scale)
    assert delta <= 2.0 * est + (16 << 20), (delta, est)
    rep = mon.report()
    assert rep["peak_live_bytes"] == max(before, after)
    assert rep["samples_gb"]["after"] == round(after / 2**30, 3)


def test_winx_w_bucket_rounds_to_pow2_and_trains():
    """w_bucket=True (the incremental driver's recompile bound): the window
    count rounds up to a power of two by wrapping the permutation; every
    pool sample still appears, and training runs."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=7, n=1300)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, w_bucket=True)
    W = wx["idx"].shape[0]
    assert W & (W - 1) == 0, f"W={W} not a power of two"
    assert W >= -(int(n_valid) // -settings.bs)
    idx = np.asarray(wx["idx"]).reshape(-1)
    assert len(np.unique(idx)) == int(n_valid)
    p, o, aux = trainer.train_chunk(
        params, opt_state, tables, dev_pool,
        trainer.empty_shadow(params["features"]),
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings, 3,
        batch_windows=wx)
    assert np.isfinite(float(aux["mean"]["total_loss"]))


def test_winx_pad_spread_no_int32_overflow():
    """Regression (round-3 advisor finding): the pad-entry spread used an
    in-graph int32 quotient/remainder split whose remainder term
    flat * r overflows once bs*K > ~46341 (bs 32768, K 4 in production),
    yielding NEGATIVE pad rows that fail entry_prep_multi's coverage check
    — pre.ok false — and silently running the XLA fallback every
    iteration.  The spread is now computed host-side in int64; this pins
    pre.ok (and in-range rows) at a size that overflows the old code."""
    C, D = 1 << 20, 8  # R = 65536 packed rows -> remainder ~65535
    bs = 16384         # with K = 4: bs*K = 65536 > 46341
    feat_shapes = ((C, D),)
    settings = trainer.TrainSettings(
        bs=bs, levels=(2,), poly_int_on=False, main_loss_type="sdf_bce",
        loss_reduction="mean", loss_weight_on=False, sigma_sigmoid=0.05,
        scale=1.0, feature_update="pallas",
    )
    n = bs  # one window
    # half the samples span 4 packed rows (k_raw = 4 -> K = 4), half share
    # ONE packed row so 3 of their K slots are PAD entries that take the
    # spread path
    b = np.arange(n, dtype=np.int64)
    base = (b * 16) % (C - 64)
    multi = base[:, None] + np.array([0, 1, 16, 17, 32, 33, 48, 49])
    single = base[:, None] + np.arange(8)
    corners = np.where((b % 2 == 0)[:, None], multi, single).astype(np.int32)
    found = np.ones(n, bool)
    found[::97] = False  # a few misses -> more pad entries
    pre_lookups = ((jnp.asarray(corners), jnp.asarray(found)),)
    dev_pool = {
        "coord": jnp.zeros((n, 3), jnp.float32),
        "sdf_label": jnp.zeros((n,), jnp.float32),
        "weight": jnp.ones((n,), jnp.float32),
        "time": jnp.zeros((n,), jnp.float32),
    }
    wx = trainer.precompute_batch_windows_fused(
        pre_lookups, dev_pool, n, jax.random.PRNGKey(0), settings,
        feat_shapes)
    K = wx["rows_kg"].shape[-1] // 1
    assert K == 4 and bs * K > 46341
    rows = np.asarray(wx["rows_kg"])
    assert rows.min() >= 0, "pad spread produced negative rows (overflow)"
    assert rows.max() < C * D // 128
    ok = np.asarray(wx["pre"].ok)
    assert ok.all(), (
        "pre.ok false: pad spread overflowed the tile windows — the "
        "fused-window path would silently run the XLA fallback"
    )


@pytest.mark.parametrize("grads_bf16", [False, True])
def test_fused_adam_multi_pre_matches_per_level(grads_bf16):
    """entry_prep_multi + fused_adam_packed_multi_pre == per-level
    fused_adam_packed on the level slices (the multi kernel is a
    re-grouping, not new math).  Runs the REAL pallas kernels in interpret
    mode on CPU; also checks the XLA fallback branch."""
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(17)
    shapes = ((1 << 11, 8), (1 << 11, 8))
    L = len(shapes)
    M_i = 1024
    n_used = (1500, 1200)
    from shine_mapping_tpu.ops.adam_kernel import _multi_geometry
    Rs, Rus, roffs, tb, w, rowmap_np, lvl_np = _multi_geometry(
        shapes, M_i * L, n_used)

    p_l, m_l, v_l, rows_l, g_l = [], [], [], [], []
    prow_parts, zero_parts, g_parts = [], [], []
    for i, (C, D) in enumerate(shapes):
        PACK = 128 // D
        p = rng.normal(size=(C, D)).astype(np.float32)
        m = (rng.normal(size=(C, D)) * 0.1).astype(np.float32)
        v = np.abs(rng.normal(size=(C, D)) * 0.01).astype(np.float32)
        m[n_used[i]:] = 0.0
        v[n_used[i]:] = 0.0
        rows = rng.integers(0, n_used[i], M_i).astype(np.int32)
        g128 = np.zeros((M_i, 128), np.float32)
        lane0 = (rows % PACK) * D
        gv = rng.normal(size=(M_i, D)).astype(np.float32)
        for k_ in range(M_i):
            g128[k_, lane0[k_]:lane0[k_] + D] = gv[k_]
        p_l.append(p.reshape(-1, 128))
        m_l.append(m.reshape(-1, 128))
        v_l.append(v.reshape(-1, 128))
        rows_l.append(rows)
        g_l.append(g128)
        prow_parts.append(rows // PACK + int(roffs[i]))
        zero_parts.append(np.zeros(M_i, bool))
        g_parts.append(g128)

    prow_g = jnp.asarray(np.concatenate(prow_parts))
    zero_mask = jnp.asarray(np.concatenate(zero_parts))
    g_cat = jnp.asarray(np.concatenate(g_parts))
    pre = adam_kernel.entry_prep_multi(prow_g, zero_mask, shapes, n_used)
    assert bool(pre.ok)

    p_cat = jnp.asarray(np.concatenate(p_l))
    m_cat = jnp.asarray(np.concatenate(m_l))
    v_cat = jnp.asarray(np.concatenate(v_l))
    lr, bc1, bc2 = jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5)
    lr_scales = (1.0, 0.7)

    orig = pl.pallas_call

    def interpreted(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = interpreted
    try:
        got = adam_kernel.fused_adam_packed_multi_pre(
            p_cat, m_cat, v_cat, g_cat, prow_g, pre, lr, bc1, bc2,
            shapes, lr_scales, use_pallas=True, n_used=n_used,
            grads_bf16=grads_bf16)
        want = []
        for i, (C, D) in enumerate(shapes):
            lo, hi = int(roffs[i]), int(roffs[i + 1])
            want.append(adam_kernel.fused_adam_packed(
                p_cat[lo:hi], m_cat[lo:hi], v_cat[lo:hi],
                jnp.asarray(rows_l[i]), jnp.asarray(g_l[i]),
                lr * lr_scales[i], bc1, bc2, C, D, use_pallas=True,
                lanes=True, n_used=n_used[i], grads_bf16=grads_bf16))
    finally:
        pl.pallas_call = orig
    for j in range(3):
        a = np.asarray(got[j])
        b = np.concatenate([np.asarray(w_[j]) for w_ in want])
        np.testing.assert_allclose(a, b, atol=5e-6)

    # XLA fallback branch agrees too
    fb = adam_kernel.fused_adam_packed_multi_pre(
        p_cat, m_cat, v_cat, g_cat, prow_g, pre, lr, bc1, bc2,
        shapes, lr_scales, use_pallas=False, n_used=n_used,
        grads_bf16=grads_bf16)
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(fb[j]), np.asarray(got[j]), atol=5e-6)


def test_winx_matches_per_level_windows_with_eikonal():
    """Point-gradient losses (eikonal) differentiate through _feat_winx's
    corner weights w.r.t. the COORDS; the fixed window structure (kidx /
    slots / found) must not break that path."""
    pool, surf = make_sphere_pool(1500, seed=21)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", ekional_loss_on=True,
        weight_e=0.1,
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps)
    key = jax.random.PRNGKey(1)
    win = trainer.precompute_batch_windows(
        pre, int(n_valid), key, settings, feat_shapes)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    shadow = trainer.empty_shadow(params["features"])

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    k = jax.random.PRNGKey(2)
    p1, _, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 6,
        pre_lookups=pre, batch_windows=win)
    p2, _, aux2 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 6,
        batch_windows=wx)
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux2["mean"]["total_loss"]),
        rtol=1e-5)
    assert float(aux1["mean"]["eikonal_loss"]) > 0
    for a, b in zip(p1["features"], p2["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------- params_bf16
# (bf16 feature tables + stochastic-rounding update — tpu.params_bf16)


def test_sr_round_bf16_properties():
    """Stochastic rounding: lands on one of the two bf16 neighbors, is
    unbiased in expectation, and passes non-finite values through."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4096,)).astype(np.float32)) * 0.1
    lo = x.astype(jnp.bfloat16)  # nearest — one of the neighbors
    acc = jnp.zeros_like(x)
    n = 32
    for seed in range(n):
        r = adam_kernel.sr_round_bf16(x, jnp.int32(seed)).astype(jnp.float32)
        # each draw lands on a bf16 value within one quantum of x
        assert np.all(np.abs(np.asarray(r - x)) <= np.maximum(
            np.abs(np.asarray(x)) * 2.0 ** -7, 2.0 ** -126))
        acc = acc + r
    mean = np.asarray(acc / n)
    err = np.abs(mean - np.asarray(x))
    tol = np.maximum(np.abs(np.asarray(x)), 1e-3) * 2.0 ** -8 * 1.5
    assert (err <= tol).mean() > 0.95, "SR mean drifted from the input"
    special = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    out = np.asarray(adam_kernel.sr_round_bf16(special, jnp.int32(1)),
                     np.float32)
    assert np.isinf(out[0]) and np.isinf(out[1]) and np.isnan(out[2])


def test_multi_pre_bf16_params_tracks_f32():
    """The bf16-table update (XLA twin) must stay within one bf16 quantum
    of the f32 update and keep the bf16 dtype."""
    rng = np.random.default_rng(5)
    shapes = ((1 << 10, 8),)
    C, D = shapes[0]
    M = 512
    from shine_mapping_tpu.ops.adam_kernel import _multi_geometry
    p = rng.normal(size=(C, D)).astype(np.float32).reshape(-1, 128)
    m = (rng.normal(size=(C, D)) * 0.1).astype(np.float32).reshape(-1, 128)
    v = np.abs(rng.normal(size=(C, D)) * 0.01).astype(
        np.float32).reshape(-1, 128)
    rows = rng.integers(0, C - 1, M).astype(np.int32)
    PACK = 128 // D
    g128 = np.zeros((M, 128), np.float32)
    lane0 = (rows % PACK) * D
    for k_ in range(M):
        g128[k_, lane0[k_]:lane0[k_] + D] = rng.normal(size=D)
    prow_g = jnp.asarray(rows // PACK)
    pre = adam_kernel.entry_prep_multi(
        prow_g, jnp.zeros(M, bool), shapes, None)
    lr, bc1, bc2 = jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5)
    args = (jnp.asarray(g128), prow_g, pre, lr, bc1, bc2, shapes, (1.0,))
    p32, m32, v32 = adam_kernel.fused_adam_packed_multi_pre(
        jnp.asarray(p), jnp.asarray(m), jnp.asarray(v), *args,
        use_pallas=False, grads_bf16=True)
    pb, mb, vb = adam_kernel.fused_adam_packed_multi_pre(
        jnp.asarray(p).astype(jnp.bfloat16).astype(
            jnp.bfloat16),
        jnp.asarray(m).astype(jnp.bfloat16),
        jnp.asarray(v).astype(jnp.bfloat16), *args,
        use_pallas=False, grads_bf16=True, sr_seed=jnp.int32(3))
    assert pb.dtype == jnp.bfloat16
    # within (input quantization + output quantization) of the f32 step
    diff = np.abs(np.asarray(pb, np.float32) - np.asarray(p32))
    quantum = np.maximum(np.abs(np.asarray(p32)) * 2.0 ** -7, 1e-4)
    assert (diff <= quantum * 1.5).mean() > 0.99
    # seed is required for bf16 tables
    with pytest.raises(ValueError, match="sr_seed"):
        adam_kernel.fused_adam_packed_multi_pre(
            jnp.asarray(p).astype(jnp.bfloat16),
            jnp.asarray(m).astype(jnp.bfloat16),
            jnp.asarray(v).astype(jnp.bfloat16), *args,
            use_pallas=False, grads_bf16=True)


def test_winx_params_bf16_trains_and_splits_deterministically():
    """bf16 tables through the fused-window trainer: loss falls, params
    stay finite AND bf16, and the chunk-split trajectory is bit-exact (the
    stochastic-rounding seed derives from the absolute iteration)."""
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = _winx_setup(seed=23, n=2000)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes)
    params = dict(params, features=tuple(
        f.astype(jnp.bfloat16) for f in params["features"]))
    opt_state = init_opt_state(params, moments_bf16=True)
    key = jax.random.PRNGKey(2)

    def run(splits):
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        start = 0
        aux0 = aux = None
        for n in splits:
            p, o, aux = trainer.train_chunk(
                p, o, tables, dev_pool, trainer.empty_shadow(p["features"]),
                n_valid, jnp.int32(start), key, settings, n,
                batch_windows=wx)
            if aux0 is None:
                aux0 = aux
            start += n
        return p, aux0, aux

    p_once, aux_first, aux_last = run([8])
    assert p_once["features"][0].dtype == jnp.bfloat16
    first = float(aux_first["last"]["total_loss"])
    for leaf in p_once["features"]:
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    p_split, _, _ = run([3, 5])
    for a, b in zip(p_once["features"], p_split["features"]):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))
    # training makes progress despite the quantized store
    p2, _, aux2 = run([40])
    assert float(aux2["mean"]["total_loss"]) < first


def test_winx_params_bf16_gate():
    """bf16 tables without the fused-window body must raise."""
    pool, surf = make_sphere_pool(800, seed=29)
    cfg = default_cfg(bs=256)
    grid, settings, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas")
    params = dict(params, features=tuple(
        f.astype(jnp.bfloat16) for f in params["features"]))
    opt_state = init_opt_state(params, moments_bf16=True)
    with pytest.raises(ValueError, match="params_bf16"):
        trainer.train_chunk(
            params, opt_state, tuple(grid.tables), dev_pool,
            trainer.empty_shadow(params["features"]),
            n_valid, jnp.int32(0), jax.random.PRNGKey(0), settings, 2)


# ------------------------------------------------------------- split-K mode
# (round 4: windows_split_k — 96.8-99.95% of samples touch ONE packed row
# per level, so each window reorders the multi-row samples into a static
# pow2 prefix; the tail gathers exactly one row per level, cutting forward
# gather rows and kernel entries ~3x.  BENCH_NOTES round 4.)


def _winxs_pre(setup, key=None, **kw):
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = setup
    key = key if key is not None else jax.random.PRNGKey(1)
    return trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes,
        split_k=True, **kw)


def test_winxs_structure():
    """Split windows hold the same samples as the plain fused windows
    (reordered), the tail really is single-row per level (split_ok), the
    kernel prep covers (pre.ok), and the encoded structure reconstructs
    every found corner's packed row exactly."""
    setup = _winxs_setup_maybe_split()
    (grid, settings, params, _, dev_pool, n_valid,
     feat_shapes, tables, pre) = setup
    key = jax.random.PRNGKey(1)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    ws = _winxs_pre(setup, key)
    assert "rows_hi" in ws and "rows_kg" not in ws
    assert bool(np.all(np.asarray(ws["split_ok"])))
    assert bool(np.all(np.asarray(ws["pre"].ok)))
    # same window membership, reordered
    np.testing.assert_array_equal(
        np.sort(np.asarray(wx["idx"]), axis=1),
        np.sort(np.asarray(ws["idx"]), axis=1))

    L = len(settings.levels)
    K = ws["rows_hi"].shape[-1] // L
    K_lo = ws["rows_lo"].shape[-1] // L
    P = ws["rows_hi"].shape[1]
    assert P & (P - 1) == 0
    assert K_lo < K
    from shine_mapping_tpu.ops.adam_kernel import _multi_geometry
    bs = settings.bs
    M = (P * K + (bs - P) * K_lo) * L
    Rs, Rus, roffs, *_ = _multi_geometry(feat_shapes, M, settings.n_used)
    for wsel in range(min(3, ws["idx"].shape[0])):
        idx = np.asarray(ws["idx"][wsel])
        for i in range(L):
            D = feat_shapes[i][1]
            PACK = 128 // D
            corners = np.asarray(pre[i][0])[idx]
            found = np.asarray(pre[i][1])[idx]
            kidx = np.asarray(ws["kidx"][wsel])[:, i * 8:(i + 1) * 8]
            slots = np.asarray(ws["slots"][wsel])[:, i * 8:(i + 1) * 8]
            rows_hi = np.asarray(ws["rows_hi"][wsel])[:, i * K:(i + 1) * K]
            rows_lo = np.asarray(
                ws["rows_lo"][wsel])[:, i * K_lo:(i + 1) * K_lo]
            want = corners // PACK + int(roffs[i])
            # prefix: rows_hi[kidx] recovers each corner's packed row
            got_hi = np.take_along_axis(
                rows_hi, kidx[:P].astype(np.int64), axis=1)
            np.testing.assert_array_equal(
                got_hi[found[:P]], want[:P][found[:P]])
            # tail: at most K_lo distinct rows; rows_lo[kidx] recovers them
            assert kidx[P:].max() < K_lo
            got_lo = np.take_along_axis(
                rows_lo, kidx[P:].astype(np.int64), axis=1)
            tail_found = found[P:]
            np.testing.assert_array_equal(
                got_lo[tail_found], want[P:][tail_found])
            np.testing.assert_array_equal(
                slots[found], (corners % PACK)[found])


def _winxs_setup_maybe_split(seed=5, n=2000, bs=256):
    return _winx_setup(seed=seed, n=n, bs=bs)


def test_winxs_matches_winx_trajectory():
    """Split-K vs plain fused windows: identical window membership, the
    same math minus provably-zero terms — trajectories must agree to f32
    reassociation noise."""
    setup = _winxs_setup_maybe_split()
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = setup
    key = jax.random.PRNGKey(1)
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), key, settings, feat_shapes)
    ws = _winxs_pre(setup, key)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    k = jax.random.PRNGKey(2)
    shadow = trainer.empty_shadow(params["features"])
    p1, _, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 8, batch_windows=wx)
    p2, _, aux2 = trainer.train_chunk(
        copy(params), init_opt_state(params), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), k, settings, 8, batch_windows=ws)
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux2["mean"]["total_loss"]),
        rtol=1e-6)
    for a, b in zip(p1["features"], p2["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_winxs_chunk_split_consistency():
    """Resume continuity for the split layout: chunked runs bit-equal the
    single run."""
    setup = _winxs_setup_maybe_split(seed=9, n=1500)
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = setup
    ws = _winxs_pre(setup)
    key = jax.random.PRNGKey(2)

    def run(splits):
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        start = 0
        for n in splits:
            p, o, aux = trainer.train_chunk(
                p, o, tables, dev_pool, trainer.empty_shadow(p["features"]),
                n_valid, jnp.int32(start), key, settings, n,
                batch_windows=ws)
            start += n
        return p

    p_once = run([6])
    p_split = run([2, 4])
    for a, b in zip(p_once["features"], p_split["features"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_winxs_with_eikonal_trains_finite():
    """The split layout under the production (eikonal-on) loss: the
    coordinate gradient flows through both segments' interpolation."""
    pool, surf = make_sphere_pool(2000, seed=5)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", ekional_loss_on=True
    )
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    tables = tuple(grid.tables)
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps)
    ws = trainer.precompute_batch_windows_fused(
        pre, dev_pool, int(n_valid), jax.random.PRNGKey(1), settings,
        feat_shapes, split_k=True)
    p, o, aux = trainer.train_chunk(
        params, opt_state, tables, dev_pool,
        trainer.empty_shadow(params["features"]),
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings, 4,
        batch_windows=ws)
    assert np.isfinite(float(aux["mean"]["total_loss"]))
    assert np.isfinite(float(aux["mean"]["eikonal_loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_winxs_sharded_matches_single_device():
    """Split-K under data parallelism: prefix and tail shard over their
    sample dims; the all-gathered entry gradients (now ~3x smaller than
    plain winx) feed the replicated kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    setup = _winxs_setup_maybe_split(seed=31)
    (grid, settings, params, opt_state, dev_pool, n_valid,
     feat_shapes, tables, pre) = setup
    ws = _winxs_pre(setup)
    key = jax.random.PRNGKey(2)
    shadow = trainer.empty_shadow(params["features"])

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p1, _, aux1 = trainer.train_chunk(
        copy(params), copy(opt_state), tables, dev_pool, shadow,
        n_valid, jnp.int32(0), key, settings, 5, batch_windows=ws,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, repl)
    p8, _, aux8 = trainer.train_chunk(
        put(copy(params)), put(copy(opt_state)), put(tables),
        put(dev_pool), put(shadow), put(n_valid), jnp.int32(0), key,
        settings, 5, batch_windows=put(ws), batch_sharding=batch_sh,
    )
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4)
    for a, b in zip(p1["features"], p8["features"]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5)


def test_choose_split_k_selection():
    """choose_split_k picks the entry-minimizing (K_lo, P): tiny prefixes
    keep K_lo = 1 (miss-heavy pools), found-dominated distributions that
    overflow small prefixes land K_lo = K/2 with a bs/2 prefix instead of
    falling back, and distributions where no candidate cuts entries by
    1/8 return (K, 0)."""
    bs = 4096
    # mostly-light pool: K_lo = 2 with a small prefix minimizes M
    # (128*8 + 3968*2 = 8960 beats K_lo=1's 1024*8 + 3072*1 = 11264)
    k_lo, p = trainer.choose_split_k([700, 80, 10], (1, 2, 4), bs, 8)
    assert (k_lo, p) == (2, 128)
    # miss-heavy at K = 4 (the bench world's shape): K_lo = 1 wins
    # (256*4 + 7936*1 = 8960 beats K_lo=2's 64*4 + 8128*2 = 16512)
    k_lo, p = trainer.choose_split_k([250, 40], (1, 2), 8192, 4)
    assert (k_lo, p) == (1, 256)
    # found-dominated (city): >bs/4 samples exceed 4 rows in the worst
    # window under no candidate but K/2 with a bs/2 prefix
    k_lo, p = trainer.choose_split_k([4000, 3500, 1500], (1, 2, 4), bs, 8)
    assert (k_lo, p) == (4, 2048)
    # hopeless: every window nearly all heavy -> no split
    k_lo, p = trainer.choose_split_k([4096, 4000, 3000], (1, 2, 4), bs, 8)
    assert (k_lo, p) == (8, 0)
    # entry-minimizing, not first-fit: K_lo=2 with a bs/4 prefix
    # (M = 0.25*8 + 0.75*2 = 3.5/sample) beats first-fit K_lo=1 with a
    # bs/2 prefix (M = 0.5*8 + 0.5*1 = 4.5/sample)
    k_lo, p = trainer.choose_split_k([1500, 1000, 200], (1, 2, 4), bs, 8)
    assert (k_lo, p) == (2, 1024)
