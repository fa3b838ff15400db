"""Training losses.

Parity targets (reference utils/loss.py and driver-side loss terms in
shine_batch.py:160-204 / shine_incre.py:148-177):

* ``sdf_bce_loss``      — BCE-with-logits of predicted sdf logits against the
  sigmoid-mapped projective-distance label (utils/loss.py:17-24).  The core
  supervision of the method.
* ``sdf_diff_loss``     — L1/L2 regression in metres (utils/loss.py:6-14).
* ``batch_ray_rendering_loss`` — depth rendering along sorted ray samples,
  optionally with NeuS-style unbiased alpha (utils/loss.py:82-118).
* ``eikonal_loss``      — (|grad|-1)^2 over surface samples
  (shine_batch.py:183-185).
* ``normal_loss`` / ``consistency_loss`` — gradient-direction supervision
  (shine_batch.py:187-197).
* ``sem_nll_loss``      — NLL over log-softmax semantic head
  (shine_batch.py:200-204).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"unknown reduction {reduction}")


def sdf_bce_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    sigma: float,
    weight: Optional[jnp.ndarray] = None,
    weighted: bool = False,
    bce_reduction: str = "mean",
) -> jnp.ndarray:
    """BCEWithLogits(pred, sigmoid(label / sigma)) — utils/loss.py:17-24.

    ``pred`` are raw logits; the target is the soft occupancy probability of
    the projective-distance label.  When ``weighted``, per-sample weights
    multiply the element losses before reduction (torch BCEWithLogitsLoss
    ``weight=`` semantics).
    """
    target = jax.nn.sigmoid(label / sigma)
    # numerically-stable BCE with logits: max(x,0) - x*t + log1p(exp(-|x|))
    x = pred
    per = jnp.maximum(x, 0.0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weighted and weight is not None:
        per = per * weight
    return _reduce(per, bce_reduction)


def sdf_diff_loss(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    weight: jnp.ndarray,
    scale: float,
    l2_loss: bool = True,
) -> jnp.ndarray:
    """Weighted L1/L2 sdf regression in metres — utils/loss.py:6-14."""
    count = pred.shape[0]
    diff_m = (pred - label) / scale
    if l2_loss:
        return jnp.sum(weight * diff_m ** 2) / count
    return jnp.sum(weight * jnp.abs(diff_m)) / count


def batch_ray_rendering_loss(
    x: jnp.ndarray, y: jnp.ndarray, d_meas: jnp.ndarray, neus_on: bool = True
) -> jnp.ndarray:
    """Volume-rendered depth vs measured depth — utils/loss.py:82-118.

    Args:
        x: (R, S) sample depths per ray.
        y: (R, S) predicted occupancy probabilities per sample.
        d_meas: (R,) measured ray depths.
        neus_on: use the NeuS unbiased occlusion-aware alpha.
    """
    order = jnp.argsort(x, axis=1)
    sort_x = jnp.take_along_axis(x, order, axis=1)
    sort_y = jnp.take_along_axis(y, order, axis=1)

    if neus_on:
        neus_alpha = (sort_y[:, 1:] - sort_y[:, :-1]) / (
            1.0 - sort_y[:, :-1] + 1e-10
        )
        alpha = jnp.clip(neus_alpha, 0.0, 1.0)
    else:
        alpha = sort_y

    # reference computes cumprod(1-a)/(1-a)*a (utils/loss.py:102-106); we use
    # the equivalent exclusive cumprod, which avoids the divide-by-epsilon and
    # its NaN gradients when alpha saturates at 1
    one_minus_alpha = 1.0 - alpha + 1e-10
    cum = jnp.cumprod(one_minus_alpha, axis=1)
    exclusive = jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1
    )
    weights = exclusive * alpha
    d_render = jnp.sum(weights * sort_x[:, : alpha.shape[1]], axis=1)
    return jnp.mean(jnp.abs(d_render - d_meas))


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """|x| with a ZERO subgradient at x == 0 (torch's norm convention).

    ``jnp.linalg.norm``'s backward at exactly zero is 0/0 = NaN — and an
    all-levels-missed sample has an exactly-zero point gradient (constant
    trashbin feature), so one such sample NaNs the whole batch through the
    eikonal/normal/consistency terms even when the mask zeroes its loss
    (0 * NaN = NaN in the backward).  The reference's torch norm defines
    the subgradient at 0 as 0, so this is also a parity fix.  Standard
    double-where: the sqrt never sees 0 on the taken branch.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def eikonal_loss(grads: jnp.ndarray, surface_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - |grad|)^2 over surface samples — shine_batch.py:183-185.

    Static-shape version: the mask weights the mean instead of boolean
    indexing (dynamic shapes don't jit).
    """
    norms = safe_norm(grads, axis=-1)
    per = (1.0 - norms) ** 2
    m = surface_mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def normal_loss(
    grads: jnp.ndarray, normal_label: jnp.ndarray, surface_mask: jnp.ndarray
) -> jnp.ndarray:
    """Gradient-direction vs measured-normal L2 — shine_batch.py:192-197."""
    g_dir = grads / (safe_norm(grads, axis=-1, keepdims=True) + 1e-12)
    diff = jnp.abs(g_dir - normal_label)
    per = safe_norm(diff, axis=1)
    m = surface_mask.astype(per.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def consistency_loss(g_a: jnp.ndarray, g_b: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity between gradients of nearby points
    (shine_batch.py:187-190)."""
    na = safe_norm(g_a, axis=-1) + 1e-12
    nb = safe_norm(g_b, axis=-1) + 1e-12
    cos = jnp.sum(g_a * g_b, axis=-1) / (na * nb)
    return jnp.mean(1.0 - cos)


def sem_nll_loss(log_prob: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """NLL of log-softmax semantic predictions — shine_batch.py:200-204."""
    picked = jnp.take_along_axis(log_prob, label[:, None].astype(jnp.int32), axis=1)
    return -jnp.mean(picked)
