"""Sparse (lazy) Adam updates for the grid feature tables.

The reference applies dense torch Adam over every feature row each iteration
(utils/tools.py:57-83) — on a bandwidth-bound accelerator that full-table
sweep dominates the step time once the map reaches millions of corners.
Here only the rows actually touched by the batch are updated ("lazy Adam"):
gradients are mathematically identical (gather/scatter is linear); the only
semantic difference is that untouched rows do not continue their momentum
decay, the standard embedding-table trade-off.

The per-level update takes the raw per-(point, corner) gradient
contributions (B, 8, D) plus their rows (B, 8), segment-sums duplicates via
sort + cumsum (no dense scatter), optionally adds the continual-learning
regularizer's gradient on those same unique rows (reproducing
``cal_regularization``'s unique-index semantics, model/feature_octree.py:
246-255), and applies Adam to the unique rows only.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SegmentedGrads(NamedTuple):
    rows: jnp.ndarray  # (M,) int32 unique-ized rows (invalid -> trashbin)
    grads: jnp.ndarray  # (M, D) summed gradient per row (invalid -> 0)
    valid: jnp.ndarray  # (M,) bool


def segment_by_row(
    corners: jnp.ndarray, contribs: jnp.ndarray, table_rows: int
) -> SegmentedGrads:
    """Sum duplicate-row contributions: (B,8)+(B,8,D) -> per-unique-row sums.

    Sort by row, cumulative-sum, take differences at segment ends.  Static
    shapes: output length M = B*8 with a validity mask (S <= M real
    segments).  The trashbin row (table_rows - 1) is always marked invalid —
    it must stay zero (reference model/feature_octree.py:78-81).
    """
    M = corners.shape[0] * corners.shape[1]
    D = contribs.shape[-1]
    idx = corners.reshape(M)
    vals = contribs.reshape(M, D)

    order = jnp.argsort(idx)
    perm_hints = dict(unique_indices=True, mode="promise_in_bounds")
    sidx = idx.at[order].get(**perm_hints)
    svals = vals.at[order].get(**perm_hints)

    seg_end = jnp.concatenate(
        [sidx[1:] != sidx[:-1], jnp.ones((1,), bool)]
    )  # last element of each run
    csum = jnp.cumsum(svals, axis=0)
    end_pos = jnp.nonzero(seg_end, size=M, fill_value=M - 1)[0]
    # end positions ascend while valid, then repeat M-1 (zero-delta tail)
    seg_tot = csum.at[end_pos].get(indices_are_sorted=True, mode="promise_in_bounds")
    prev = jnp.concatenate([jnp.zeros((1, D), svals.dtype), seg_tot[:-1]], axis=0)
    seg_sum = seg_tot - prev
    seg_key = sidx.at[end_pos].get(indices_are_sorted=True, mode="promise_in_bounds")

    n_seg = jnp.sum(seg_end.astype(jnp.int32))
    valid = jnp.arange(M) < n_seg
    valid = valid & (seg_key != table_rows - 1)
    seg_key = jnp.where(valid, seg_key, table_rows - 1)
    seg_sum = jnp.where(valid[:, None], seg_sum, 0.0)
    return SegmentedGrads(rows=seg_key, grads=seg_sum, valid=valid)


def sparse_adam_level_packed(
    pmv: jnp.ndarray,
    seg: SegmentedGrads,
    lr: jnp.ndarray,
    step_t: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    reg_lambda: float = 0.0,
    importance: Optional[jnp.ndarray] = None,
    last_frame: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lazy Adam on a PACKED (C, 3D) [p|m|v] table — ONE gather and ONE
    scatter per level instead of three of each (the XLA scatter is
    entry-bound, so packing p, m, v into a single row roughly divides the
    dominant sparse-path cost by three; VERDICT round 1 item 1).

    Same math as :func:`sparse_adam_level`; returns (pmv, reg_value).
    """
    D = seg.grads.shape[-1]
    rows = seg.rows
    hints = dict(indices_are_sorted=True, unique_indices=True, mode="promise_in_bounds")
    rows_pmv = pmv.at[rows].get(**hints)  # (M, 3D)
    p_rows = rows_pmv[:, :D]
    m_rows = rows_pmv[:, D:2 * D]
    v_rows = rows_pmv[:, 2 * D:]
    g = seg.grads

    reg_value = jnp.zeros((), pmv.dtype)
    vmask = seg.valid[:, None].astype(pmv.dtype)
    if reg_lambda > 0.0 and importance is not None and last_frame is not None:
        imp = importance.at[rows].get(**hints)
        diff = p_rows - last_frame.at[rows].get(**hints)
        reg_value = jnp.sum(imp * diff * diff * vmask)
        g = g + reg_lambda * 2.0 * imp * diff * vmask

    t = step_t.astype(pmv.dtype)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * g * g
    update = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)

    delta = jnp.concatenate(
        [-update * vmask, (m_new - m_rows) * vmask, (v_new - v_rows) * vmask],
        axis=1,
    )
    pmv = pmv.at[rows].add(delta, **hints)
    return pmv, reg_value


def sparse_adam_level(
    features: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    seg: SegmentedGrads,
    lr: jnp.ndarray,
    step_t: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
    reg_lambda: float = 0.0,
    importance: Optional[jnp.ndarray] = None,
    last_frame: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Lazy Adam on one level's touched rows.

    Returns (features, m, v, reg_value).  When ``reg_lambda`` > 0 the
    continual-learning penalty lambda * sum(importance * (f - last)^2) over
    the touched unique rows is added to the row gradients and its value
    returned for logging (reference shine_incre.py:155-157).
    """
    rows = seg.rows
    # rows are ascending (valid segment keys ascending, then a constant
    # trashbin tail) — tell XLA so scatter/gather take the fast path.
    # unique_indices is safe despite the trashbin duplicates: every
    # duplicate entry carries an exactly-zero delta, so any
    # ordering/overwrite of those read-modify-writes leaves the row equal
    # to its base value.
    hints = dict(indices_are_sorted=True, unique_indices=True, mode="promise_in_bounds")
    p_rows = features.at[rows].get(**hints)
    m_rows = m.at[rows].get(**hints)
    v_rows = v.at[rows].get(**hints)
    g = seg.grads

    reg_value = jnp.zeros((), features.dtype)
    if reg_lambda > 0.0 and importance is not None and last_frame is not None:
        imp = importance.at[rows].get(**hints)
        diff = p_rows - last_frame.at[rows].get(**hints)
        vmask = seg.valid[:, None].astype(features.dtype)
        reg_value = jnp.sum(imp * diff * diff * vmask)
        g = g + reg_lambda * 2.0 * imp * diff * vmask

    t = step_t.astype(features.dtype)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * g * g
    update = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)

    vmask = seg.valid[:, None].astype(features.dtype)
    features = features.at[rows].add(-update * vmask, **hints)
    m = m.at[rows].add((m_new - m_rows) * vmask, **hints)
    v = v.at[rows].add((v_new - v_rows) * vmask, **hints)
    return features, m, v, reg_value
