"""Continual-learning feature-importance accumulation.

Parity target: reference ``cal_feature_importance``
(utils/incre_learning.py:8-40): after each incremental frame, re-run the
forward + backward over the whole pool in strided batches and accumulate the
absolute feature-table gradient into the importance weights (trashbin row
kept at zero).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import decoder
from ..ops.query import query_feature
from . import losses


@functools.partial(
    jax.jit,
    static_argnames=("levels", "poly_on", "sigma", "loss_reduction",
                     "loss_weight_on", "bs", "down_rate", "iters"),
)
def _importance_scan(
    features,
    geo_params,
    tables,
    coords_pad,
    labels_pad,
    n,
    levels: Tuple[int, ...],
    poly_on: bool,
    sigma: float,
    loss_reduction: str,
    loss_weight_on: bool,
    bs: int,
    down_rate: int,
    iters: int,
):
    """The whole importance sweep as ONE compiled scan: through the remote
    tunnel, the per-batch eager formulation paid a host round trip per
    dispatch plus three full-table eager adds per batch (~20 s/frame in
    the reg demo); this is one dispatch per frame."""

    def body(acc, k):
        head = k * bs * down_rate
        idx = head + jnp.arange(bs, dtype=jnp.int32) * down_rate
        valid = (idx < n).astype(jnp.float32)
        idxc = jnp.minimum(idx, coords_pad.shape[0] - 1)
        c = coords_pad[idxc]
        l = labels_pad[idxc]

        def loss_fn(feats):
            f = query_feature(c, tables, list(feats), levels, poly_on)
            pred = decoder.sdf(geo_params, f)
            # valid zeroes padded entries; with the reference's "sum"
            # reduction (shine_incre.py:78) this is exact, with "mean" it
            # only rescales the last partial batch by a constant
            return losses.sdf_bce_loss(
                pred, l, sigma, valid, True, loss_reduction)

        g = jax.grad(loss_fn)(features)
        return tuple(a + jnp.abs(gi) for a, gi in zip(acc, g)), 0.0

    acc0 = tuple(jnp.zeros_like(f) for f in features)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(iters))
    return acc


def cal_feature_importance(
    grid,
    geo_params,
    pool_coord,
    pool_sdf_label,
    sigma: float,
    bs: int,
    down_rate: int = 1,
    loss_reduction: str = "mean",
    loss_weight_on: bool = False,
) -> None:
    """Accumulate |d loss / d features| over the pool into
    ``grid.importance_weight`` (in place on the HashGridHost).

    Strided batching mirrors utils/incre_learning.py:15-27: batches of
    ``bs * down_rate`` samples thinned by ``down_rate``; the whole sweep
    runs as one compiled scan (pool padded to a pow2 capacity so the
    executable count stays O(log pool) as frames grow).
    """
    import numpy as np

    n = pool_coord.shape[0]
    interval = bs * down_rate
    # pow2-pad the pool so (capacity, iters) — the static shapes — change
    # O(log n) times over an incremental run, not every frame
    cap = 1 << max(int(np.ceil(np.log2(max(n, 1)))), 10)
    iters = math.ceil(cap / interval)
    coords_pad = np.zeros((cap, 3), np.float32)
    coords_pad[:n] = pool_coord
    labels_pad = np.zeros((cap,), np.float32)
    labels_pad[:n] = pool_sdf_label
    feats = tuple(grid.features)
    acc = _importance_scan(
        feats,
        geo_params,
        tuple(grid.tables),
        jnp.asarray(coords_pad),
        jnp.asarray(labels_pad),
        jnp.int32(n),
        tuple(grid.levels),
        grid.polynomial_interpolation,
        float(sigma),
        loss_reduction,
        loss_weight_on,
        int(bs),
        int(down_rate),
        int(iters),
    )
    for i in range(len(acc)):
        upd = grid.importance_weight[i] + acc[i]
        # trashbin row forced to zero (utils/incre_learning.py:40)
        upd = upd.at[-1].set(0.0)
        # padded unused rows get no gradient anyway, but clamp for safety
        grid.importance_weight[i] = upd
