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


@functools.partial(jax.jit, static_argnames=("levels", "poly_on", "sigma", "loss_reduction", "loss_weight_on"))
def _batch_importance(
    features: Tuple[jnp.ndarray, ...],
    geo_params,
    tables,
    coords,
    sdf_labels,
    valid_mask,
    levels: Tuple[int, ...],
    poly_on: bool,
    sigma: float,
    loss_reduction: str,
    loss_weight_on: bool,
):
    def loss_fn(feats):
        f = query_feature(coords, tables, list(feats), levels, poly_on)
        pred = decoder.sdf(geo_params, f)
        # zero-out padded entries by weighting (static shapes)
        # valid_mask zeroes padded entries; with the reference's "sum"
        # reduction (shine_incre.py:78) this is exact, with "mean" it only
        # rescales the last partial batch by a constant
        w = valid_mask.astype(pred.dtype)
        return losses.sdf_bce_loss(pred, sdf_labels, sigma, w, True, loss_reduction)

    grads = jax.grad(loss_fn)(features)
    return tuple(jnp.abs(g) for g in grads)


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
    ``bs * down_rate`` samples thinned by ``down_rate``.
    """
    import numpy as np

    n = pool_coord.shape[0]
    interval = bs * down_rate
    iters = math.ceil(n / interval)
    feats = tuple(grid.features)
    acc = [jnp.zeros_like(f) for f in feats]
    for k in range(iters):
        head = k * interval
        tail = min((k + 1) * interval, n)
        c = pool_coord[head:tail:down_rate]
        l = pool_sdf_label[head:tail:down_rate]
        # pad to the fixed batch size for a single compiled variant
        m = c.shape[0]
        pad = bs - m
        if pad > 0:
            c = np.concatenate([c, np.zeros((pad, 3), c.dtype)])
            l = np.concatenate([l, np.zeros((pad,), l.dtype)])
        valid = np.zeros((bs,), np.float32)
        valid[:m] = 1.0
        g = _batch_importance(
            feats,
            geo_params,
            tuple(grid.tables),
            jnp.asarray(c[:bs]),
            jnp.asarray(l[:bs]),
            jnp.asarray(valid),
            tuple(grid.levels),
            grid.polynomial_interpolation,
            float(sigma),
            loss_reduction,
            loss_weight_on,
        )
        acc = [a + gi for a, gi in zip(acc, g)]
    for i in range(len(acc)):
        upd = grid.importance_weight[i] + acc[i]
        # trashbin row forced to zero (utils/incre_learning.py:40)
        upd = upd.at[-1].set(0.0)
        # padded unused rows get no gradient anyway, but clamp for safety
        grid.importance_weight[i] = upd
