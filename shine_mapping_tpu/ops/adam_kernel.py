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
from typing import Tuple

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
            prow0_ref, prow1_ref, g0h_ref, g0l_ref, g1h_ref, g1l_ref,
            po_ref, mo_ref, vo_ref, *, tb: int, w: int, b1: float, b2: float,
            eps: float):
    t = pl.program_id(0)
    lr = scal_ref[0]
    bc1 = scal_ref[1]
    bc2 = scal_ref[2]
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0) + t * tb
    A0 = (prow0_ref[:] == s_ids).astype(jnp.bfloat16)  # (1,W) bcast -> (TB,W)
    A1 = (prow1_ref[:] == s_ids).astype(jnp.bfloat16)
    gtile = (
        jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(A0, g0l_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(A1, g1l_ref[:], preferred_element_type=jnp.float32)
    )
    m_new = b1 * m_ref[:] + (1.0 - b1) * gtile
    v_new = b2 * v_ref[:] + (1.0 - b2) * gtile * gtile
    po_ref[:] = p_ref[:] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
    mo_ref[:] = m_new
    vo_ref[:] = v_new


def _pallas_update(p128, m128, v128, prow_p, g_hi, g_lo, offs, scal,
                   tb: int, w: int, b1: float, b2: float, eps: float):
    R = p128.shape[0]
    T = R // tb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t])),
            pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t] + 1)),
            pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t], 0)),
            pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t], 0)),
            pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0)),
            pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tb=tb, w=w, b1=b1, b2=b2, eps=eps),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 3,
        # update p/m/v IN PLACE: without aliasing, any other consumer of the
        # tables in the same scan body (the forward corner gather) makes XLA
        # copy all three full tables back into the loop carry every
        # iteration — 3 x 134 MB at bench scale, +4.4 ms/level (HLO:
        # experiments/exp_hlo_gather.py; fix measured in exp_pallas_trainer)
        input_output_aliases={2: 0, 3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(offs, scal, p128, m128, v128, prow_p, prow_p, g_hi, g_lo, g_hi, g_lo)


# ------------------------------------------------------------------ wrapper


def _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                C: int, D: int, b1: float, b2: float, eps: float):
    """Equivalent dense-Adam update in plain XLA (CPU / fallback path)."""
    p = p128.reshape(C, D)
    gd = jnp.zeros_like(p).at[rows].add(grads)
    m = b1 * m128.reshape(C, D) + (1.0 - b1) * gd
    v = b2 * v128.reshape(C, D) + (1.0 - b2) * gd * gd
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    R = p128.shape[0]
    return p.reshape(R, 128), m.reshape(R, 128), v.reshape(R, 128)


def _xla_update_lanes(p128, m128, v128, rows, g128, lr, bc1, bc2,
                      C: int, D: int, b1: float, b2: float, eps: float):
    """Lane-aligned twin of ``_xla_update``: gradients arrive pre-spread
    over whole 128-lane packed rows (the backward of ``lanefold``), so the
    scatter targets packed rows directly.  Off-slot lanes are exactly zero,
    making this bit-equivalent to the narrow scatter up to add order."""
    gd = jnp.zeros_like(p128).at[rows // (128 // D)].add(g128)
    m = b1 * m128 + (1.0 - b1) * gd
    v = b2 * v128 + (1.0 - b2) * gd * gd
    p = p128 - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return p, m, v


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


def choose_tiles(C: int, D: int, M: int) -> Tuple[int, int]:
    """Static (tile rows, window block) sizes for the kernel."""
    R = C * D // 128
    tb = min(512, R)
    while R % tb:
        tb //= 2
    exp = max(256, 4 * M * tb // max(R, 1))
    w = 256
    while w < exp:
        w *= 2
    return tb, w


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
):
    """Dense-Adam step on a packed (R,128) table with sparse gradient
    entries ``rows`` (M,) int32 (unsorted, duplicates fine; trashbin rows
    carry zero grads) and ``grads`` (M, D) — or, with ``lanes=True``,
    (M, 128) whole-lane-row gradients as emitted by the ``lanefold``
    backward (nonzero only in each entry's D slot lanes), skipping the
    in-wrapper lane spread entirely.

    Returns updated (p128, m128, v128).
    """
    M = rows.shape[0]
    if not (use_pallas and _HAS_PALLAS and packable(C, D)):
        if lanes:
            return _xla_update_lanes(p128, m128, v128, rows, grads, lr,
                                     bc1, bc2, C, D, b1, b2, eps)
        return _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                           C, D, b1, b2, eps)

    PACK = 128 // D
    R = C * D // 128
    tb, w = choose_tiles(C, D, M)
    T = R // tb

    # trashbin entries (missed lookups) all target row C-1 and would pile
    # thousands of entries into the last tile, overflowing its window and
    # forcing the slow fallback every iteration.  Their gradients are
    # exactly zero by construction (found-masked interpolation weights), so
    # spread them uniformly over the table and zero them defensively.
    trash = rows == C - 1
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    if lanes:
        spread_p = jnp.arange(M, dtype=jnp.int32) % max(R - 1, 1)
        prow_u = jnp.where(trash, spread_p,
                           (rows // PACK).astype(jnp.int32))
        g128 = jnp.where(trash[:, None], 0.0, grads)
        order = jnp.argsort(prow_u)
        prow = prow_u.at[order].get(**hints)
        g128 = g128.at[order].get(**hints)
    else:
        spread = (jnp.arange(M, dtype=rows.dtype) * PACK) % (C - 1)
        rows = jnp.where(trash, spread, rows)
        grads = jnp.where(trash[:, None], 0.0, grads)

        order = jnp.argsort(rows)
        rows_s = rows.at[order].get(**hints)
        grads_s = grads.at[order].get(**hints)
        prow = (rows_s // PACK).astype(jnp.int32)

        lane = jnp.arange(128, dtype=jnp.int32)
        g_rep = jnp.tile(grads_s, (1, PACK))  # g_rep[k, l] = grads[k, l % D]
        mask = (lane[None, :] // D) == (rows_s % PACK)[:, None].astype(jnp.int32)
        g128 = jnp.where(mask, g_rep, 0.0)
    g_hi = g128.astype(jnp.bfloat16)
    g_lo = (g128 - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    g_lo = jnp.concatenate([g_lo, pad_g], axis=0)

    bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
    wstart = jnp.searchsorted(prow, bounds).astype(jnp.int32)
    offs = jnp.minimum(wstart[:-1] // w, Mpad // w - 2).astype(jnp.int32)
    # every tile's entries must fit its two w-blocks; a pathologically
    # clustered batch falls back to the XLA formulation
    ok = jnp.all(wstart[1:] <= offs * w + 2 * w)
    scal = jnp.stack([lr, bc1, bc2, jnp.float32(0)]).astype(jnp.float32)

    def do_pallas(args):
        p128, m128, v128 = args
        return tuple(_pallas_update(
            p128, m128, v128, prow_p, g_hi, g_lo, offs, scal,
            tb, w, b1, b2, eps,
        ))

    def do_xla(args):
        p128, m128, v128 = args
        if lanes:
            return _xla_update_lanes(p128, m128, v128, rows, grads, lr,
                                     bc1, bc2, C, D, b1, b2, eps)
        return _xla_update(p128, m128, v128, rows, grads, lr, bc1, bc2,
                           C, D, b1, b2, eps)

    return jax.lax.cond(ok, do_pallas, do_xla, (p128, m128, v128))
