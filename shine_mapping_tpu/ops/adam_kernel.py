"""Pallas fused scatter+Adam update for the feature tables.

The round-2 bottleneck analysis (experiments/exp_iter_ablation.py,
exp_pallas_debug.py, exp_reshape_cost.py) found:

* XLA's scatter is entry-bound (~90-110 ns/entry) and its dense-Adam
  sweep is bandwidth-bound (~440 GB/s); written as explicit scatter + sweep
  the update costs ~7.3 ms/level at ICRA scale (4.2M x 8 corners, 65k
  entries).
* This kernel replaces BOTH with one pass over the table tiles: the tile
  gradient is formed IN VMEM by a one-hot MXU matmul over the tile's
  (sorted) gradient entries — no scatter anywhere — then full dense-Adam
  semantics are applied to the tile.  Measured 3.1 ms/level.
* CRITICAL layout detail: the tables must stay in the packed
  ``(C*D/128, 128)`` shape across the training scan.  A ``(C, D)``-shaped
  carry forces XLA to materialize layout copies around the pallas
  custom-call (22 ms/level instead of 3.1); a plain XLA ``reshape`` of the
  packed array is free, so the un-packed view is used for gathers inside
  the same jit.

Gradient exactness: the one-hot matrix A is exactly 0/1, so splitting the
gradient entries into bf16 hi+lo parts and accumulating two bf16 matmuls
in f32 reproduces the f32 scatter-add bit-for-bit up to f32 addition
order (verified to ~3e-6 absolute in exp_pallas_debug.py).

Falls back to an equivalent XLA formulation when not on TPU, when the
feature dim does not pack into 128 lanes, or when a pathologically
clustered batch overflows a tile's entry window (checked, lax.cond).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def packable(C: int, D: int) -> bool:
    """Can a (C, D) table be viewed as (C*D/128, 128)?"""
    return D > 0 and 128 % D == 0 and (C * D) % 128 == 0


# ------------------------------------------------------------------ kernel


def _kernel(offs_ref, scal_ref, p_ref, m_ref, v_ref,
            prow0_ref, prow1_ref, *g_refs, tb: int, w: int, b1: float,
            b2: float, eps: float):
    po_ref, mo_ref, vo_ref = g_refs[-3:]
    g_refs = g_refs[:-3]
    t = pl.program_id(0)
    lr = scal_ref[0]
    bc1 = scal_ref[1]
    bc2 = scal_ref[2]
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0) + t * tb
    A0 = (prow0_ref[:] == s_ids).astype(jnp.bfloat16)  # (1,W) bcast -> (TB,W)
    A1 = (prow1_ref[:] == s_ids).astype(jnp.bfloat16)
    if len(g_refs) == 4:  # exact: bf16 hi+lo split reproduces f32 grads
        g0h_ref, g0l_ref, g1h_ref, g1l_ref = g_refs
        gtile = (
            jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A0, g0l_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1l_ref[:], preferred_element_type=jnp.float32)
        )
    else:  # bf16 grads (tpu.moments_bf16 update path): half the matmuls
        g0h_ref, g1h_ref = g_refs
        gtile = (
            jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
        )
    # moments may be stored bf16 (tpu.moments_bf16): compute f32, store back
    m_new = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * gtile
    v_new = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * gtile * gtile
    po_ref[:] = p_ref[:] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    mo_ref[:] = m_new.astype(mo_ref.dtype)
    vo_ref[:] = v_new.astype(vo_ref.dtype)


def _pallas_update(p128, m128, v128, prow_p, g_hi, g_lo, offs, scal,
                   tb: int, w: int, b1: float, b2: float, eps: float,
                   R_used: int | None = None):
    R = p128.shape[0]
    # grid over the used head only: tiles beyond R_used are never visited
    # and — thanks to the in-place aliasing — keep their (bit-identical
    # no-op under dense Adam) contents
    T = (R if R_used is None else R_used) // tb
    with_lo = g_lo is not None
    tile_spec = pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0))
    w0_spec = pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t], 0))
    w1_spec = pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0))
    g_specs = [w0_spec, w0_spec, w1_spec, w1_spec] if with_lo else [
        w0_spec, w1_spec]
    g_args = (g_hi, g_lo, g_hi, g_lo) if with_lo else (g_hi, g_hi)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t])),
            pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t] + 1)),
        ] + g_specs,
        out_specs=[tile_spec, tile_spec, tile_spec],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tb=tb, w=w, b1=b1, b2=b2, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), m128.dtype),
            jax.ShapeDtypeStruct((R, 128), v128.dtype),
        ],
        # update p/m/v IN PLACE: without aliasing, any other consumer of the
        # tables in the same scan body (the forward corner gather) makes XLA
        # copy all three full tables back into the loop carry every
        # iteration — 3 x 134 MB at bench scale, +4.4 ms/level (HLO:
        # experiments/exp_hlo_gather.py; fix measured in exp_pallas_trainer)
        input_output_aliases={2: 0, 3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(offs, scal, p128, m128, v128, prow_p, prow_p, *g_args)


# ----------------------------------------------------- multi-level kernel
#
# One pallas_call over the CONCATENATION of all levels' packed tables.
# Each level keeps its own learning rate (lr * lr_level_reduce_ratio**i):
# a static tile->level map is scalar-prefetched and indexes a per-level lr
# vector inside the kernel.  Fusing the levels pays the prep tax (argsort,
# reorder, bf16 split, pad, searchsorted, cond) ONCE per iteration instead
# of once per level — measured ~0.84 ms/level of prep at bench scale
# (experiments/exp_pallas_trainer.py: kernel 1.85 ms, +prep+cond 2.69).


def _kernel_multi(offs_ref, scal_ref, lvl_ref, rowmap_ref, seed_ref, p_ref,
                  m_ref, v_ref, prow0_ref, prow1_ref, *g_refs, tb: int,
                  w: int, b1: float, b2: float, eps: float):
    po_ref, mo_ref, vo_ref = g_refs[-3:]
    g_refs = g_refs[:-3]
    t = pl.program_id(0)
    lr = scal_ref[3 + lvl_ref[t]]  # per-level learning rate
    bc1 = scal_ref[1]
    bc2 = scal_ref[2]
    # rowmap gives this tile's GLOBAL packed-row block (tiles skip each
    # level's unused capacity headroom; prows are global row ids)
    s_ids = (jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0)
             + rowmap_ref[t] * tb)
    A0 = (prow0_ref[:] == s_ids).astype(jnp.bfloat16)
    A1 = (prow1_ref[:] == s_ids).astype(jnp.bfloat16)
    if len(g_refs) == 4:  # exact: bf16 hi+lo split reproduces f32 grads
        g0h_ref, g0l_ref, g1h_ref, g1l_ref = g_refs
        gtile = (
            jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A0, g0l_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1l_ref[:], preferred_element_type=jnp.float32)
        )
    else:  # bf16 grads (tpu.moments_bf16 update path): half the matmuls
        g0h_ref, g1h_ref = g_refs
        gtile = (
            jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
        )
    m_new = b1 * m_ref[:].astype(jnp.float32) + (1.0 - b1) * gtile
    v_new = b2 * v_ref[:].astype(jnp.float32) + (1.0 - b2) * gtile * gtile
    p_new = (p_ref[:].astype(jnp.float32)
             - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps))
    if po_ref.dtype == jnp.bfloat16:
        # bf16 table mode (tpu.params_bf16): write the parameters back with
        # STOCHASTIC rounding — nearest-rounding would swallow every update
        # smaller than the bf16 quantum (~0.4% relative) and stall training;
        # SR keeps the expected parameter exact.  Seed varies per (step,
        # tile) so rounding noise never correlates across iterations.
        pltpu.prng_seed(seed_ref[0] + t)
        rbits = pltpu.bitcast(
            pltpu.prng_random_bits(p_new.shape), jnp.uint32)
        po_ref[:] = pltpu.stochastic_round(
            p_new, rbits, target_dtype=jnp.bfloat16)
    else:
        po_ref[:] = p_new
    mo_ref[:] = m_new.astype(mo_ref.dtype)
    vo_ref[:] = v_new.astype(vo_ref.dtype)


def _pallas_update_multi(p128, m128, v128, prow_p, g_hi, g_lo, offs, scal,
                         lvl, rowmap, seed, T: int, tb: int, w: int,
                         b1: float, b2: float, eps: float):
    R = p128.shape[0]
    with_lo = g_lo is not None
    tile_spec = pl.BlockSpec((tb, 128), lambda t, o, s, l, rm, sd: (rm[t], 0))
    w0_spec = pl.BlockSpec((w, 128), lambda t, o, s, l, rm, sd: (o[t], 0))
    w1_spec = pl.BlockSpec((w, 128), lambda t, o, s, l, rm, sd: (o[t] + 1, 0))
    g_specs = [w0_spec, w0_spec, w1_spec, w1_spec] if with_lo else [
        w0_spec, w1_spec]
    g_args = (g_hi, g_lo, g_hi, g_lo) if with_lo else (g_hi, g_hi)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((1, w), lambda t, o, s, l, rm, sd: (0, o[t])),
            pl.BlockSpec((1, w), lambda t, o, s, l, rm, sd: (0, o[t] + 1)),
        ] + g_specs,
        out_specs=[tile_spec, tile_spec, tile_spec],
    )
    return pl.pallas_call(
        functools.partial(_kernel_multi, tb=tb, w=w, b1=b1, b2=b2, eps=eps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), p128.dtype),
            jax.ShapeDtypeStruct((R, 128), m128.dtype),
            jax.ShapeDtypeStruct((R, 128), v128.dtype),
        ],
        # in-place p/m/v update — same aliasing rationale as _pallas_update
        input_output_aliases={5: 0, 6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(offs, scal, lvl, rowmap, seed, p128, m128, v128, prow_p, prow_p,
      *g_args)


def choose_tiles_multi(Rs: Sequence[int], M: int,
                       needs: Sequence[int] | None = None) -> Tuple[int, int]:
    """Static (tile rows, window block) for the fused multi-level kernel.

    ``tb`` must divide every level's packed-row count so no tile straddles
    a level boundary (tiles carry a single per-level learning rate).

    ``needs``: per-level USED-row counts (the rows entries actually
    spread over).  The window block must fit the DENSEST level's expected
    per-tile entry count, not the table-wide average: entries split
    evenly across levels (M/L per level), so a steep level pyramid (e.g.
    the street world's 1.19M/311k/83k corners) packs ~7 entries/row on
    its coarse level while the average says ~0.6 — sizing by the average
    overflowed every tile window there and silently ran the XLA fallback
    each iteration (round-5 find)."""
    tb0 = min(512, min(Rs))
    while any(R % tb0 for R in Rs):
        tb0 //= 2
    R_tot = sum(Rs)
    L = len(Rs)
    while True:
        exp = max(256, 4 * M * tb0 // max(R_tot, 1))
        if needs is not None:
            for need in needs:
                exp = max(exp, 4 * (M // L) * tb0 // max(need, 1))
        w = 256
        while w < exp:
            w *= 2
        if 4 * tb0 * w + 2048 * w <= _VMEM_BUDGET or tb0 <= 16:
            return tb0, w
        tb0 //= 2


def _multi_geometry(shapes, M: int, n_used):
    """Shared static geometry of the fused multi-level kernel: tile size,
    window block, per-level used-head row counts, and the tile -> (global
    row block, level) maps.  ``entry_prep_multi`` and
    ``fused_adam_packed_multi_pre`` must derive identical geometry from the
    same static (shapes, M, n_used) — factored so they cannot drift."""
    Rs = [C * d // 128 for C, d in shapes]
    roffs = np.concatenate([[0], np.cumsum(Rs)]).astype(np.int64)
    needs = None
    if n_used is not None:
        needs = [
            max(min(R_i, (nu * D_i + 127) // 128), 1)
            for R_i, nu, (_, D_i) in zip(Rs, n_used, shapes)
        ]
    tb, w = choose_tiles_multi(Rs, M, needs)
    Rus = list(Rs)
    if n_used is not None:
        for i, (C_i, D_i) in enumerate(shapes):
            if n_used[i] < C_i:
                need = (n_used[i] * D_i + 127) // 128
                ru = (need + tb - 1) // tb * tb
                Rus[i] = max(min(Rs[i], ru), tb)
    rowmap_np = np.concatenate([
        roffs[i] // tb + np.arange(Rus[i] // tb, dtype=np.int64)
        for i in range(len(shapes))
    ]).astype(np.int32)
    lvl_np = np.repeat(np.arange(len(shapes), dtype=np.int32),
                       [ru // tb for ru in Rus]).astype(np.int32)
    return Rs, Rus, roffs, tb, w, rowmap_np, lvl_np


def entry_prep_multi(prow_g: jnp.ndarray, zero_mask: jnp.ndarray,
                     shapes, n_used=None) -> EntryPrep:
    """:class:`EntryPrep` for the fused multi-level kernel.

    ``prow_g`` (M,) int32 GLOBAL packed-row ids (level-local row + the
    level's packed-row offset), including pad entries already spread over
    visited rows by the caller; ``zero_mask`` (M,) marks entries whose
    gradients must be zeroed defensively (pads / misses — their gradients
    are zero by construction, the mask guards against regressions).  Must
    use the same static (shapes, M, n_used) as the consuming
    :func:`fused_adam_packed_multi_pre`.
    """
    M = prow_g.shape[0]
    Rs, Rus, roffs, tb, w, rowmap_np, lvl_np = _multi_geometry(
        shapes, M, n_used)
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    order = jnp.argsort(prow_g)
    prow = prow_g.at[order].get(**hints)
    zm_s = zero_mask.at[order].get(**hints)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    starts = jnp.asarray(rowmap_np.astype(np.int64) * tb, jnp.int32)
    wstart = jnp.searchsorted(prow, starts).astype(jnp.int32)
    wend = jnp.searchsorted(prow, starts + tb).astype(jnp.int32)
    offs = jnp.minimum(wstart // w, Mpad // w - 2).astype(jnp.int32)
    # every tile's entries must fit its two w-blocks AND every entry must
    # land in a visited tile (coverage == M)
    ok = jnp.logical_and(
        jnp.all(wend <= offs * w + 2 * w),
        jnp.sum(wend - wstart) == M,
    )
    return EntryPrep(order=order, trash=zm_s, prow_p=prow_p, offs=offs,
                     ok=ok)


def fused_adam_packed_multi_pre(
    p128: jnp.ndarray,
    m128: jnp.ndarray,
    v128: jnp.ndarray,
    g128: jnp.ndarray,
    prow_g: jnp.ndarray,
    pre: EntryPrep,
    lr: jnp.ndarray,
    bc1: jnp.ndarray,
    bc2: jnp.ndarray,
    shapes: Sequence[Tuple[int, int]],
    lr_scales: Sequence[float],
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    use_pallas: bool = True,
    n_used: Sequence[int] | None = None,
    grads_bf16: bool = False,
    sr_seed=None,
):
    """Dense-Adam step over ALL levels' concatenated packed tables in ONE
    kernel dispatch, with the row-only prep (:func:`entry_prep_multi`)
    precomputed — the epoch-window production path.

    ``g128`` (M, 128) lane-aligned gradients in ENTRY order (each entry's
    nonzero lanes sit wherever its corners live in the packed row — entries
    may cover several slots, unlike the per-level path); ``prow_g`` (M,)
    the matching global packed rows (used by the XLA fallback scatter).
    Pad/miss entries must carry exactly-zero gradients (``pre.trash``
    re-zeroes them defensively).  Semantics: reference dense Adam per
    level, identical to :func:`fused_adam_packed_multi` up to f32
    addition order.

    bf16 table mode (tpu.params_bf16): when ``p128`` is bfloat16, the
    update computes in f32 and writes the parameters back with STOCHASTIC
    rounding (seeded by ``sr_seed``, an int32 scalar that must vary per
    step) — halves both the sweep's parameter traffic and the map's
    memory; documented quantization of the stored field.
    """
    M = g128.shape[0]
    Rs, Rus, roffs, tb, w, rowmap_np, lvl_np = _multi_geometry(
        shapes, M, n_used)
    if grads_bf16:
        g128 = g128.astype(jnp.bfloat16).astype(jnp.float32)

    # static per-row lr-scale vector for the fallback (level boundaries are
    # static): one dense per-row-lr Adam pass over the concatenated table
    lr_rows = jnp.asarray(np.repeat(
        np.asarray(list(lr_scales), np.float32), Rs)[:, None])
    hints = dict(unique_indices=True, mode="promise_in_bounds")

    bf16_p = p128.dtype == jnp.bfloat16
    if bf16_p and sr_seed is None:
        raise ValueError("params_bf16 update needs a per-step sr_seed")

    def xla_full(p128, m128, v128):
        gz = jnp.where(
            pre.trash.at[jnp.argsort(pre.order)].get(**hints)[:, None],
            0.0, g128)
        gd = jnp.zeros(p128.shape, jnp.float32).at[prow_g].add(gz)
        m = b1 * m128.astype(jnp.float32) + (1.0 - b1) * gd
        v = b2 * v128.astype(jnp.float32) + (1.0 - b2) * gd * gd
        p = (p128.astype(jnp.float32)
             - (lr * lr_rows) * (m / bc1) / (jnp.sqrt(v / bc2) + eps))
        p = sr_round_bf16(p, sr_seed) if bf16_p else p
        return p, m.astype(m128.dtype), v.astype(v128.dtype)

    if not (use_pallas and _HAS_PALLAS
            and all(packable(C, d) for C, d in shapes)):
        return xla_full(p128, m128, v128)
    gs = g128.at[pre.order].get(**hints)
    gs = jnp.where(pre.trash[:, None], 0.0, gs)
    g_hi = gs.astype(jnp.bfloat16)
    g_lo = (None if grads_bf16
            else (gs - g_hi.astype(jnp.float32)).astype(jnp.bfloat16))
    Mpad = pre.prow_p.shape[1]
    pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    if g_lo is not None:
        g_lo = jnp.concatenate([g_lo, pad_g], axis=0)

    scal = jnp.concatenate([
        jnp.stack([lr, bc1, bc2]).astype(jnp.float32),
        lr * jnp.asarray(list(lr_scales), jnp.float32),
    ])
    lvl = jnp.asarray(lvl_np)
    rowmap = jnp.asarray(rowmap_np)
    T = int(rowmap_np.shape[0])

    seed = (jnp.zeros((1,), jnp.int32) if sr_seed is None
            else jnp.asarray(sr_seed, jnp.int32).reshape(1))

    def do_pallas(args):
        p128, m128, v128 = args
        return tuple(_pallas_update_multi(
            p128, m128, v128, pre.prow_p, g_hi, g_lo, pre.offs, scal,
            lvl, rowmap, seed, T, tb, w, b1, b2, eps,
        ))

    def do_xla(args):
        return xla_full(*args)

    return jax.lax.cond(pre.ok, do_pallas, do_xla, (p128, m128, v128))


def shard_geometry(shapes, n_shards: int, M_sh: int):
    """Static geometry of the ROW-SHARDED multi-level kernel (round 5).

    The concatenated packed table (R_tot, 128) splits into ``n_shards``
    contiguous row blocks of R_loc = R_tot / n_shards; each shard sweeps
    ALL of its local tiles every step (no n_used skip — the headroom tiles
    it sweeps are exact no-ops: zero moments, zero gradients) and receives
    only ITS entries via the window routing's all-to-all
    (trainer.precompute_batch_windows_fused(shards=n)).

    Returns (R_loc, tb, w, T, lvl) with ``lvl`` an (n_shards, T) int32
    numpy array mapping each shard's local tiles to their level (drives the
    per-level learning rate inside the kernel and the fallback's per-row
    lr).  Raises ValueError when the shapes cannot shard evenly — callers
    gate on :func:`shardable`.
    """
    Rs = [C * d // 128 for C, d in shapes]
    R_tot = sum(Rs)
    if n_shards < 1 or R_tot % n_shards:
        raise ValueError(f"R_tot {R_tot} not divisible by {n_shards} shards")
    R_loc = R_tot // n_shards
    # tiles must never straddle a level OR shard boundary (each tile
    # carries one level's lr; each shard owns whole tiles)
    tb = min(512, R_loc, min(Rs))
    while tb > 1 and (any(R % tb for R in Rs) or R_loc % tb):
        tb //= 2
    if any(R % tb for R in Rs) or R_loc % tb:
        raise ValueError(f"no tile size divides levels {Rs} and R_loc {R_loc}")
    while True:
        exp = max(256, 4 * M_sh * tb // max(R_loc, 1))
        w = 256
        while w < exp:
            w *= 2
        if 4 * tb * w + 2048 * w <= _VMEM_BUDGET or tb <= 16:
            break
        tb //= 2
    if R_loc % tb:
        raise ValueError(f"VMEM-shrunk tile {tb} no longer divides {R_loc}")
    T = R_loc // tb
    roffs = np.concatenate([[0], np.cumsum(Rs)])
    # global tile t covers rows [t*tb, (t+1)*tb) — inside ONE level
    gtile_lvl = np.searchsorted(roffs, np.arange(R_tot // tb) * tb,
                                side="right") - 1
    lvl = gtile_lvl.reshape(n_shards, T).astype(np.int32)
    return R_loc, tb, w, T, lvl


def shardable(shapes, n_shards: int) -> bool:
    """Can these feature tables row-shard evenly over ``n_shards``?"""
    try:
        shard_geometry(shapes, n_shards, 1)
        return True
    except ValueError:
        return False


def entry_prep_local(prow_local: jnp.ndarray, trash: jnp.ndarray,
                     R_loc: int, tb: int, w: int) -> EntryPrep:
    """:class:`EntryPrep` over a shard's LOCAL rows — every local tile is
    visited, so coverage is automatic for in-range rows.  ``prow_local``
    (M_sh,) int32 local packed rows (pads already spread by the caller);
    ``trash`` marks pad slots whose gradients the kernel zeroes."""
    M = prow_local.shape[0]
    T = R_loc // tb
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    order = jnp.argsort(prow_local)
    prow = prow_local.at[order].get(**hints)
    trash_s = trash.at[order].get(**hints)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
    wstart = jnp.searchsorted(prow, bounds).astype(jnp.int32)
    offs = jnp.minimum(wstart[:-1] // w, Mpad // w - 2).astype(jnp.int32)
    ok = jnp.logical_and(
        jnp.all(wstart[1:] <= offs * w + 2 * w),
        wstart[-1] == M,  # every entry's row is in [0, R_loc)
    )
    return EntryPrep(order=order, trash=trash_s, prow_p=prow_p, offs=offs,
                     ok=ok)


def fused_adam_packed_shard(
    p_loc: jnp.ndarray,
    m_loc: jnp.ndarray,
    v_loc: jnp.ndarray,
    g_sh: jnp.ndarray,
    pre: EntryPrep,
    lvl_d: jnp.ndarray,
    lr: jnp.ndarray,
    bc1: jnp.ndarray,
    bc2: jnp.ndarray,
    shapes: Sequence[Tuple[int, int]],
    lr_scales: Sequence[float],
    n_shards: int,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    use_pallas: bool = True,
    grads_bf16: bool = False,
    sr_seed=None,
):
    """Dense-Adam step over ONE row shard of the concatenated packed
    tables — the per-device body of the row-sharded epoch-window update
    island (runs under shard_map; every shard executes the same program on
    its own (R_loc, 128) slice, entries, and prep).

    ``g_sh`` (M_sh, 128) lane-aligned entry gradients in the all-to-all
    receive order; ``pre`` the per-(window, shard)
    :func:`entry_prep_local`; ``lvl_d`` (T,) this shard's tile -> level
    map (traced data — shards differ).  Semantics: identical per-row math
    to :func:`fused_adam_packed_multi_pre` (each row's entries all live in
    exactly one shard), reassociated within tiles.
    """
    M_sh = g_sh.shape[0]
    R_loc, tb, w, T, _ = shard_geometry(shapes, n_shards, M_sh)
    if grads_bf16:
        g_sh = g_sh.astype(jnp.bfloat16).astype(jnp.float32)
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    bf16_p = p_loc.dtype == jnp.bfloat16
    if bf16_p and sr_seed is None:
        raise ValueError("params_bf16 update needs a per-step sr_seed")
    scal_lvl = lr * jnp.asarray(list(lr_scales), jnp.float32)

    gs = g_sh.at[pre.order].get(**hints)
    gs = jnp.where(pre.trash[:, None], 0.0, gs)

    def xla_full(args):
        p_loc, m_loc, v_loc = args
        # scatter the SORTED zero-masked entries at their sorted rows —
        # same sums as the kernel's one-hot matmul up to f32 add order
        prow_s = pre.prow_p[0, :M_sh]
        gd = jnp.zeros((R_loc, 128), jnp.float32).at[prow_s].add(gs)
        lvl_rows = jnp.repeat(lvl_d, tb)
        lr_rows = scal_lvl[lvl_rows][:, None]
        m = b1 * m_loc.astype(jnp.float32) + (1.0 - b1) * gd
        v = b2 * v_loc.astype(jnp.float32) + (1.0 - b2) * gd * gd
        p = (p_loc.astype(jnp.float32)
             - lr_rows * (m / bc1) / (jnp.sqrt(v / bc2) + eps))
        p = sr_round_bf16(p, sr_seed) if bf16_p else p.astype(p_loc.dtype)
        return p, m.astype(m_loc.dtype), v.astype(v_loc.dtype)

    if not (use_pallas and _HAS_PALLAS
            and all(packable(C, d) for C, d in shapes)):
        return xla_full((p_loc, m_loc, v_loc))

    g_hi = gs.astype(jnp.bfloat16)
    g_lo = (None if grads_bf16
            else (gs - g_hi.astype(jnp.float32)).astype(jnp.bfloat16))
    Mpad = pre.prow_p.shape[1]
    pad_g = jnp.zeros((Mpad - M_sh, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    if g_lo is not None:
        g_lo = jnp.concatenate([g_lo, pad_g], axis=0)
    scal = jnp.concatenate([
        jnp.stack([lr, bc1, bc2]).astype(jnp.float32), scal_lvl])
    rowmap = jnp.arange(T, dtype=jnp.int32)  # every local tile is visited
    seed = (jnp.zeros((1,), jnp.int32) if sr_seed is None
            else jnp.asarray(sr_seed, jnp.int32).reshape(1))

    def do_pallas(args):
        p_loc, m_loc, v_loc = args
        return tuple(_pallas_update_multi(
            p_loc, m_loc, v_loc, pre.prow_p, g_hi, g_lo, pre.offs, scal,
            lvl_d.astype(jnp.int32), rowmap, seed, T, tb, w, b1, b2, eps,
        ))

    return jax.lax.cond(pre.ok, do_pallas, xla_full, (p_loc, m_loc, v_loc))


def _xla_update_lanes_lr(p128, m128, v128, rows, g128, lr, bc1, bc2,
                         D: int, b1: float, b2: float, eps: float):
    """Per-level-lr twin used by the multi-level fallback — one
    implementation with :func:`_xla_update_lanes` (the lax.cond branches'
    semantic alignment depends on them staying bit-identical)."""
    return _xla_update_lanes(p128, m128, v128, rows, g128, lr, bc1, bc2,
                             0, D, b1, b2, eps)


def fused_adam_packed_multi(
    p128: jnp.ndarray,
    m128: jnp.ndarray,
    v128: jnp.ndarray,
    rows_list: Sequence[jnp.ndarray],
    g128_list: Sequence[jnp.ndarray],
    lr: jnp.ndarray,
    bc1: jnp.ndarray,
    bc2: jnp.ndarray,
    shapes: Sequence[Tuple[int, int]],
    lr_scales: Sequence[float],
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    use_pallas: bool = True,
    n_used: Sequence[int] | None = None,
):
    """Dense-Adam step on ALL levels' packed tables concatenated into one
    (R_tot, 128) array, in one kernel dispatch.

    ``rows_list[i]`` are level-LOCAL corner rows (M_i,), ``g128_list[i]``
    the matching (M_i, 128) lane-aligned gradients (``lanefold`` backward).
    ``shapes`` gives each level's logical (C_i, D); ``lr_scales`` the static
    per-level multiplier (lr_level_reduce_ratio ** i).  ``n_used`` (static,
    per level) promises non-trash rows < n_used[i]: the grid skips each
    level's capacity-headroom tiles (see :func:`fused_adam_packed`).
    Semantics are identical to calling :func:`fused_adam_packed` per level
    slice.
    """
    if p128.dtype != jnp.float32:
        # only the precomputed-prep variant carries the stochastic-rounding
        # seed a bf16 table needs (fused_adam_packed_multi_pre)
        raise ValueError("fused_adam_packed_multi needs f32 tables")
    L = len(shapes)
    D = shapes[0][1]
    PACK = 128 // D
    Rs = [C * d // 128 for C, d in shapes]
    roffs = np.concatenate([[0], np.cumsum(Rs)]).astype(np.int32)
    R_tot = int(roffs[-1])

    if not (use_pallas and _HAS_PALLAS
            and all(packable(C, d) and d == D for C, d in shapes)):
        # CPU / fallback: per-level slice update (static offsets -> free)
        p_out, m_out, v_out = [], [], []
        for i, (C_i, D_i) in enumerate(shapes):
            lo, hi = int(roffs[i]), int(roffs[i + 1])
            p_i, m_i, v_i = _xla_update_lanes_lr(
                p128[lo:hi], m128[lo:hi], v128[lo:hi],
                rows_list[i], g128_list[i], lr * lr_scales[i], bc1, bc2,
                D_i, b1, b2, eps,
            )
            p_out.append(p_i)
            m_out.append(m_i)
            v_out.append(v_i)
        return (jnp.concatenate(p_out), jnp.concatenate(m_out),
                jnp.concatenate(v_out))

    M_tot = sum(int(r.shape[0]) for r in rows_list)
    tb, w = choose_tiles_multi(Rs, M_tot)

    # per-level used-head row counts (tile-aligned; see used_rows_hint)
    Rus = list(Rs)
    if n_used is not None:
        for i, (C_i, D_i) in enumerate(shapes):
            if n_used[i] < C_i:
                need = (n_used[i] * D_i + 127) // 128
                ru = (need + tb - 1) // tb * tb
                Rus[i] = max(min(Rs[i], ru), tb)

    # per-level trash spreading (missed-lookup rows carry exactly-zero
    # grads; see fused_adam_packed) then globalize the packed-row ids
    prows, gs = [], []
    for i, (C_i, _) in enumerate(shapes):
        rows_i = rows_list[i]
        g_i = g128_list[i]
        M_i = rows_i.shape[0]
        trash = rows_i == C_i - 1
        spread = jnp.arange(M_i, dtype=jnp.int32) % max(Rus[i] - 1, 1)
        prow_i = jnp.where(trash, spread,
                           (rows_i // PACK).astype(jnp.int32))
        prows.append(prow_i + int(roffs[i]))
        gs.append(jnp.where(trash[:, None], 0.0, g_i))
    prow_u = jnp.concatenate(prows)
    g128 = jnp.concatenate(gs)
    M = prow_u.shape[0]

    hints = dict(unique_indices=True, mode="promise_in_bounds")
    order = jnp.argsort(prow_u)
    prow = prow_u.at[order].get(**hints)
    g128 = g128.at[order].get(**hints)
    g_hi = g128.astype(jnp.bfloat16)
    g_lo = (g128 - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    g_lo = jnp.concatenate([g_lo, pad_g], axis=0)

    # static tile -> (global block, level) maps over USED tiles only
    rowmap_np = np.concatenate([
        roffs[i] // tb + np.arange(Rus[i] // tb, dtype=np.int32)
        for i in range(L)
    ]).astype(np.int32)
    lvl_np = np.repeat(np.arange(L, dtype=np.int32),
                       [ru // tb for ru in Rus]).astype(np.int32)
    T = int(rowmap_np.shape[0])

    starts = jnp.asarray(rowmap_np.astype(np.int64) * tb, jnp.int32)
    wstart = jnp.searchsorted(prow, starts).astype(jnp.int32)
    wend = jnp.searchsorted(prow, starts + tb).astype(jnp.int32)
    offs = jnp.minimum(wstart // w, Mpad // w - 2).astype(jnp.int32)
    # each tile's entries must fit its two w-blocks, and every entry must
    # belong to some visited tile (coverage == M; violated only if the
    # n_used promise is wrong) — else the XLA full sweep handles it
    ok = jnp.logical_and(
        jnp.all(wend <= offs * w + 2 * w),
        jnp.sum(wend - wstart) == M,
    )

    lvl = jnp.asarray(lvl_np)
    rowmap = jnp.asarray(rowmap_np)
    scal = jnp.concatenate([
        jnp.stack([lr, bc1, bc2]).astype(jnp.float32),
        lr * jnp.asarray(list(lr_scales), jnp.float32),
    ])

    def do_pallas(args):
        p128, m128, v128 = args
        return tuple(_pallas_update_multi(
            p128, m128, v128, prow_p, g_hi, g_lo, offs, scal, lvl, rowmap,
            jnp.zeros((1,), jnp.int32), T, tb, w, b1, b2, eps,
        ))

    def do_xla(args):
        p128, m128, v128 = args
        p_out, m_out, v_out = [], [], []
        for i in range(L):
            lo, hi = int(roffs[i]), int(roffs[i + 1])
            p_i, m_i, v_i = _xla_update_lanes_lr(
                p128[lo:hi], m128[lo:hi], v128[lo:hi],
                rows_list[i], g128_list[i], lr * lr_scales[i], bc1, bc2,
                D, b1, b2, eps,
            )
            p_out.append(p_i)
            m_out.append(m_i)
            v_out.append(v_i)
        return (jnp.concatenate(p_out), jnp.concatenate(m_out),
                jnp.concatenate(v_out))

    return jax.lax.cond(ok, do_pallas, do_xla, (p128, m128, v128))


def sr_round_bf16(x: jnp.ndarray, seed) -> jnp.ndarray:
    """Stochastically round f32 ``x`` to bfloat16 — the XLA twin of the
    kernel's ``pltpu.stochastic_round`` (different random stream, same
    unbiasedness): add uniform bits below the bf16 mantissa cut, truncate.
    Carries propagate into the exponent correctly; non-finite values pass
    through untouched."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = jax.random.bits(
        jax.random.PRNGKey(seed), x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    out = jax.lax.bitcast_convert_type(
        (bits + r) & jnp.uint32(0xFFFF0000), jnp.float32)
    return jnp.where(jnp.isfinite(x), out, x).astype(jnp.bfloat16)


# ------------------------------------------------------------------ wrapper


def _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                C: int, D: int, b1: float, b2: float, eps: float):
    """Equivalent dense-Adam update in plain XLA (CPU / fallback path)."""
    p = p128.reshape(C, D)
    gd = jnp.zeros_like(p).at[rows].add(grads)
    m = b1 * m128.reshape(C, D).astype(jnp.float32) + (1.0 - b1) * gd
    v = b2 * v128.reshape(C, D).astype(jnp.float32) + (1.0 - b2) * gd * gd
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    R = p128.shape[0]
    return (p.reshape(R, 128), m.reshape(R, 128).astype(m128.dtype),
            v.reshape(R, 128).astype(v128.dtype))


def _xla_update_lanes(p128, m128, v128, rows, g128, lr, bc1, bc2,
                      C: int, D: int, b1: float, b2: float, eps: float):
    """Lane-aligned twin of ``_xla_update``: gradients arrive pre-spread
    over whole 128-lane packed rows (the backward of ``lanefold``), so the
    scatter targets packed rows directly.  Off-slot lanes are exactly zero,
    making this bit-equivalent to the narrow scatter up to add order."""
    gd = jnp.zeros_like(p128).at[rows // (128 // D)].add(g128)
    m = b1 * m128.astype(jnp.float32) + (1.0 - b1) * gd
    v = b2 * v128.astype(jnp.float32) + (1.0 - b2) * gd * gd
    p = p128 - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return p, m.astype(m128.dtype), v.astype(v128.dtype)


def gather_rows_packed(p128: jnp.ndarray, rows: jnp.ndarray, D: int) -> jnp.ndarray:
    """Gather (..., D) corner rows from a packed (R, 128) table.

    Reshaping the packed table to (C, D) and gathering through the view
    makes XLA materialize a layout copy of the whole table every iteration
    (+7 ms/level at 4.2M corners — experiments/exp_pallas_trainer.py);
    gathering whole 128-lane rows and selecting the D target lanes
    in-register avoids it.

    NOTE: the production trainer no longer extracts (..., D) rows at all —
    ``take_along_axis``'s per-element lane select costs ~4 ms/level at
    bench scale (experiments/exp_iter_ablation.py ``pk_lanefold``).  It
    gathers whole lane-rows (``gather_lanerows``) and folds the lane
    select into the interpolation reduction (``lanefold``) instead.  This
    helper remains for callers that genuinely need the narrow rows.
    """
    PACK = 128 // D
    lanerows = p128[rows // PACK]  # (..., 128)
    lane0 = (rows % PACK) * D
    idx = lane0[..., None] + jnp.arange(D, dtype=rows.dtype)
    return jnp.take_along_axis(lanerows, idx, axis=-1)


def gather_lanerows(p128: jnp.ndarray, rows: jnp.ndarray, D: int) -> jnp.ndarray:
    """Gather the whole 128-lane packed rows containing each (C,D)-row.

    Returns (..., 128); pair with ``rows % (128 // D)`` slot ids and
    ``lanefold`` to form interpolated features without ever materializing
    the narrow (..., D) view.
    """
    return p128[rows // (128 // D)]


def lanefold(lanerows: jnp.ndarray, slots: jnp.ndarray, w: jnp.ndarray,
             D: int) -> jnp.ndarray:
    """Weighted corner reduction fused with the packed-lane select.

    ``lanerows`` (B, 8, 128) whole packed rows, ``slots`` (B, 8) int32 slot
    ids (row % PACK), ``w`` (B, 8) interpolation weights (found-masked).
    Masking the weights over the slot's D lanes and reducing corners gives
    the level's feature contribution in one elementwise pass:

        f128[b, l] = sum_c w[b, c] * [slot(l) == slots[b, c]] * lanerows[b, c, l]
        feat[b, d] = sum_s f128[b, s * D + d]

    measured 5.7 ms vs 17.4 ms for gather_rows_packed + einsum at bench
    scale (experiments/exp_iter_ablation.py).  The backward w.r.t.
    ``lanerows`` is the broadcast outer product w_masked * g_f128 — lane
    aligned, consumable by ``fused_adam_packed(..., lanes=True)`` with no
    scatter or lane shuffle anywhere.
    """
    PACK = 128 // D
    lanegrp = jnp.arange(128, dtype=jnp.int32) // D  # lane -> slot id
    sel = lanegrp[None, None, :] == slots[:, :, None]
    w_m = jnp.where(sel, w[:, :, None].astype(lanerows.dtype), 0.0)
    f128 = jnp.einsum("bcl,bcl->bl", w_m, lanerows)
    return f128.reshape(-1, PACK, D).sum(axis=1)


def narrow_to_lanes(g: jnp.ndarray, rows: jnp.ndarray, D: int) -> jnp.ndarray:
    """(M, D) narrow gradients -> (M, 128) lane-aligned rows: each entry's
    D values land in its packed-row slot's lanes, zeros elsewhere.  The
    bit-exact inverse of :func:`lanes_to_narrow` (lanefold-backward rows
    have exactly one nonzero slot).  Shared by the kernel wrapper's
    lanes=False path and the sharded epoch-window island."""
    PACK = 128 // D
    lane = jnp.arange(128, dtype=jnp.int32)
    mask = (lane[None, :] // D) == (rows % PACK)[:, None].astype(jnp.int32)
    return jnp.where(mask, jnp.tile(g, (1, PACK)), 0.0)


def lanes_to_narrow(g128: jnp.ndarray, D: int) -> jnp.ndarray:
    """(..., 128) lane-aligned gradients (lanefold backward) -> (..., D).

    Each entry's gradient occupies exactly one slot's D lanes (the other
    15 slots are zero), so summing the PACK slots recovers the narrow row
    exactly — one elementwise pass, no ``take_along_axis`` lane select.
    Used by the multi-chip path to shrink the cross-chip entry payload
    16x before the all-gather at the shard_map boundary.
    """
    PACK = 128 // D
    return g128.reshape(g128.shape[:-1] + (PACK, D)).sum(axis=-2)


# VMEM budget for the kernel's working set: the two (tb, w) one-hot bf16
# matrices (4*tb*w bytes) plus the pipelined hi/lo gradient window blocks
# (~2048*w bytes).  Shrinking tb shrinks the expected per-tile entry count
# and hence w, so large batches trade tile height for window width.
_VMEM_BUDGET = 8 << 20


class EntryPrep(NamedTuple):
    """Row-only (gradient-independent) prep for ``fused_adam_packed``
    with ``lanes=True`` — everything the kernel needs that derives from
    the entry ROWS alone.  For a frozen batch composition (epoch-style
    batch windows) this is precomputable once per window, removing the
    per-iteration argsort + searchsorted from the step.

    order:  (M,) int32 — entry permutation sorting by packed row
    trash:  (M,) bool  — sorted-order trashbin mask (grads zeroed)
    prow_p: (1, Mpad) int32 — sorted packed rows, -1 padded
    offs:   (T,) int32 — per-tile gradient-window block offsets
    ok:     () bool — tile windows hold every entry (else XLA fallback)
    """

    order: jnp.ndarray
    trash: jnp.ndarray
    prow_p: jnp.ndarray
    offs: jnp.ndarray
    ok: jnp.ndarray


def _used_rows(R: int, tb: int, C: int, D: int, n_used: int | None) -> int:
    if n_used is not None and n_used < C:
        need = (n_used * D + 127) // 128  # ceil: last used row covered
        return max(min(R, (need + tb - 1) // tb * tb), tb)
    return R


def entry_prep_lanes(rows: jnp.ndarray, C: int, D: int,
                     n_used: int | None = None) -> EntryPrep:
    """Compute :class:`EntryPrep` for lane-aligned entries ``rows`` (M,).

    Must be called with the same static (C, D, M, n_used) the consuming
    :func:`fused_adam_packed` call uses — the tile geometry
    (:func:`choose_tiles`) is derived from them.
    """
    M = rows.shape[0]
    PACK = 128 // D
    R = C * D // 128
    tb, w = choose_tiles(C, D, M, n_used)
    R_used = _used_rows(R, tb, C, D, n_used)
    T = R_used // tb

    trash = rows == C - 1
    spread_p = jnp.arange(M, dtype=jnp.int32) % max(R_used - 1, 1)
    prow_u = jnp.where(trash, spread_p, (rows // PACK).astype(jnp.int32))
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    order = jnp.argsort(prow_u)
    prow = prow_u.at[order].get(**hints)
    trash_s = trash.at[order].get(**hints)

    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
    wstart = jnp.searchsorted(prow, bounds).astype(jnp.int32)
    offs = jnp.minimum(wstart[:-1] // w, Mpad // w - 2).astype(jnp.int32)
    ok = jnp.all(wstart[1:] <= offs * w + 2 * w)
    if R_used < R:
        ok = jnp.logical_and(ok, wstart[-1] == M)
    return EntryPrep(order=order, trash=trash_s, prow_p=prow_p, offs=offs,
                     ok=ok)


def _fit_tiles(R: int, M: int, R_dense: int | None = None) -> Tuple[int, int]:
    # R_dense: the rows entries actually spread over (the used head) —
    # the window block must fit the expected per-tile entry count at THAT
    # density, not the full-capacity average (round-5 find: dense used
    # heads overflowed every window and fell back to XLA silently)
    R_d = R if R_dense is None else max(min(R_dense, R), 1)
    tb = min(512, R)
    while R % tb:
        tb //= 2
    while True:
        exp = max(256, 4 * M * tb // R_d)
        w = 256
        while w < exp:
            w *= 2
        # floor 16: bf16 moment blocks need sublane multiples of 16
        if 4 * tb * w + 2048 * w <= _VMEM_BUDGET or tb <= 16:
            return tb, w
        tb //= 2


def choose_tiles(C: int, D: int, M: int,
                 n_used: int | None = None) -> Tuple[int, int]:
    """Static (tile rows, window block) sizes for the kernel.  Must be
    called with the same (C, D, M, n_used) by the prep and the consuming
    kernel call."""
    R = C * D // 128
    R_dense = None
    if n_used is not None:
        R_dense = max(min(R, (n_used * D + 127) // 128), 1)
    return _fit_tiles(R, M, R_dense)


def used_rows_hint(n_corners, shapes, granularity: int = 16):
    """Static per-level used-row counts, bucketed to limit recompiles.

    ``n_corners[i]`` is the host-known allocated corner count of level i;
    rows >= n_corners never appear in lookups (corner ids are allocated
    densely from 0) and keep m = v = 0 and zero gradients, so dense Adam
    leaves them bit-exactly unchanged — the kernel can skip their tiles
    (the capacity headroom after doubling, ~25-50% of the sweep).  Counts
    round UP to capacity/granularity so a growing map (incremental mode)
    recompiles at most ``granularity`` times per capacity level.
    """
    out = []
    for n, (C, _) in zip(n_corners, shapes):
        step = max(C // granularity, 1)
        out.append(int(min(C, ((int(n) + step - 1) // step) * step)))
    return tuple(out)


def fused_adam_packed(
    p128: jnp.ndarray,
    m128: jnp.ndarray,
    v128: jnp.ndarray,
    rows: jnp.ndarray,
    grads: jnp.ndarray,
    lr: jnp.ndarray,
    bc1: jnp.ndarray,
    bc2: jnp.ndarray,
    C: int,
    D: int,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    use_pallas: bool = True,
    lanes: bool = False,
    n_used: int | None = None,
    grads_bf16: bool = False,
    pre: EntryPrep | None = None,
):
    """Dense-Adam step on a packed (R,128) table with sparse gradient
    entries ``rows`` (M,) int32 (unsorted, duplicates fine; trashbin rows
    carry zero grads) and ``grads`` (M, D) — or, with ``lanes=True``,
    (M, 128) whole-lane-row gradients as emitted by the ``lanefold``
    backward (nonzero only in each entry's D slot lanes), skipping the
    in-wrapper lane spread entirely.

    ``n_used`` (static) promises every non-trash row < n_used: the kernel
    grid then only visits the used head of the table — the in-place
    aliasing leaves the headroom tiles untouched, which dense Adam would
    leave bit-identical anyway (zero moments, zero grads).

    ``grads_bf16`` rounds the gradient entries to bfloat16 and skips the
    exact hi+lo split — half the one-hot matmuls and no lo window DMA.
    Part of the opt-in bf16 update mode (tpu.moments_bf16); the same
    rounding is applied in the XLA fallback so the lax.cond branches stay
    semantically aligned.

    ``pre``: optional :class:`EntryPrep` computed by
    :func:`entry_prep_lanes` for these exact ``rows`` (and the same static
    C/D/M/n_used) — skips the per-call argsort + searchsorted.  The
    epoch-window training mode precomputes one per batch window.
    ``lanes=True`` only.

    Returns updated (p128, m128, v128).
    """
    if p128.dtype != jnp.float32:
        # bf16 tables ride the fused-window multi kernel only
        # (fused_adam_packed_multi_pre, which carries the SR seed)
        raise ValueError("fused_adam_packed needs f32 tables")
    M = rows.shape[0]
    if grads_bf16:
        # same rounding in every path so kernel and fallbacks agree
        grads = grads.astype(jnp.bfloat16).astype(jnp.float32)
    if not (use_pallas and _HAS_PALLAS and packable(C, D)):
        if lanes:
            return _xla_update_lanes(p128, m128, v128, rows, grads, lr,
                                     bc1, bc2, C, D, b1, b2, eps)
        return _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                           C, D, b1, b2, eps)

    PACK = 128 // D
    R = C * D // 128
    tb, w = choose_tiles(C, D, M, n_used)
    # visit only tiles that can hold touched rows (see n_used docstring)
    R_used = _used_rows(R, tb, C, D, n_used)
    T = R_used // tb

    # trashbin entries (missed lookups) all target row C-1 and would pile
    # thousands of entries into the last tile, overflowing its window and
    # forcing the slow fallback every iteration.  Their gradients are
    # exactly zero by construction (found-masked interpolation weights), so
    # spread them uniformly over the (visited) table and zero them
    # defensively.  (Row-only work lives in entry_prep_lanes for the lanes
    # path so batch-window callers can hoist it out of the iteration.)
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    if lanes:
        if pre is None:
            pre = entry_prep_lanes(rows, C, D, n_used)
        g128 = grads.at[pre.order].get(**hints)
        g128 = jnp.where(pre.trash[:, None], 0.0, g128)
        prow_p, offs, ok = pre.prow_p, pre.offs, pre.ok
        Mpad = prow_p.shape[1]
    else:
        trash = rows == C - 1
        spread = (jnp.arange(M, dtype=rows.dtype) * PACK) % max(
            min(C - 1, R_used * PACK - 1), 1)
        rows = jnp.where(trash, spread, rows)
        grads = jnp.where(trash[:, None], 0.0, grads)

        order = jnp.argsort(rows)
        rows_s = rows.at[order].get(**hints)
        grads_s = grads.at[order].get(**hints)
        prow = (rows_s // PACK).astype(jnp.int32)
        g128 = narrow_to_lanes(grads_s, rows_s, D)

        Mpad = ((M + w - 1) // w) * w + w
        prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
        bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
        wstart = jnp.searchsorted(prow, bounds).astype(jnp.int32)
        offs = jnp.minimum(wstart[:-1] // w, Mpad // w - 2).astype(jnp.int32)
        # every tile's entries must fit its two w-blocks; a pathologically
        # clustered batch falls back to the XLA formulation.  With n_used,
        # all entries must also land in visited tiles (violated only if the
        # caller's promise is wrong — then the fallback full sweep still
        # gives the right answer).
        ok = jnp.all(wstart[1:] <= offs * w + 2 * w)
        if R_used < R:
            ok = jnp.logical_and(ok, wstart[-1] == M)

    g_hi = g128.astype(jnp.bfloat16)
    g_lo = (None if grads_bf16
            else (g128 - g_hi.astype(jnp.float32)).astype(jnp.bfloat16))
    pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    if g_lo is not None:
        g_lo = jnp.concatenate([g_lo, pad_g], axis=0)
    scal = jnp.stack([lr, bc1, bc2, jnp.float32(0)]).astype(jnp.float32)

    def do_pallas(args):
        p128, m128, v128 = args
        return tuple(_pallas_update(
            p128, m128, v128, prow_p, g_hi, g_lo, offs, scal,
            tb, w, b1, b2, eps, R_used=R_used,
        ))

    def do_xla(args):
        p128, m128, v128 = args
        if lanes:
            return _xla_update_lanes(p128, m128, v128, rows, grads, lr,
                                     bc1, bc2, C, D, b1, b2, eps)
        return _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                           C, D, b1, b2, eps)

    return jax.lax.cond(ok, do_pallas, do_xla, (p128, m128, v128))
