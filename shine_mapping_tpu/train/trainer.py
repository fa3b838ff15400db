"""Jitted training loop: sample batch -> query grid -> MLP -> losses -> Adam.

Covers the reference's hot loop (shine_batch.py:105-226, shine_incre.py:
114-188) as ONE jitted, sharded function that `lax.scan`s over
``scan_chunk`` iterations per dispatch — removing the reference's three
structural costs: per-iteration Python dispatch, per-iteration host dict
lookups (model/feature_octree.py:204-215), and host-side batch indexing
(dataset/lidar_dataset.py:401-450).

Loss terms reproduced: sdf_bce / sdf_l1 / sdf_l2 main losses, dr / dr_neus
ray rendering, eikonal, normal, consistency (gradient agreement of jittered
points), semantic NLL, and the continual-learning regularizer
(model/feature_octree.py:246-255).

Multi-chip: pass ``data_sharding`` (a NamedSharding over a mesh axis) and
the per-iteration batch is sharded over it; with replicated parameters XLA
inserts the gradient all-reduce over ICI automatically.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models import decoder
from ..ops.hashgrid import LevelTable, lookup_level
from ..ops.interp import corner_weights
from ..ops.query import query_feature_with_aux
from . import losses
from .optimizer import (
    OptState,
    adam_update,
    init_opt_state,
    lr_at_step,
    make_group_trees,
    sgd_update,
)
from .sparse_adam import segment_by_row, sparse_adam_level_packed
from ..ops import adam_kernel


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Static (hashable) training configuration — one jit variant per value."""

    bs: int
    levels: Tuple[int, ...]
    poly_int_on: bool
    main_loss_type: str  # sdf_bce | sdf_l1 | sdf_l2 | dr | dr_neus
    loss_reduction: str
    loss_weight_on: bool
    sigma_sigmoid: float  # scaled: logistic_gaussian_ratio*sigma_sigmoid_m*scale
    scale: float
    ekional_loss_on: bool = False
    weight_e: float = 0.1
    normal_loss_on: bool = False
    weight_n: float = 0.01
    consistency_loss_on: bool = False
    weight_c: float = 1.0
    consistency_count: int = 1000
    consistency_range: float = 0.1
    # projective-distance correction by the cosine between the SDF gradient
    # and the ray (reference shine_batch.py:144-147)
    proj_correction_on: bool = False
    semantic_on: bool = False
    weight_s: float = 1.0
    sem_label_decimation: int = 1
    continual_reg_on: bool = False
    lambda_forget: float = 1e5
    ray_loss: bool = False
    ray_sample_count: int = 7
    time_conditioned: bool = False
    # optimizer
    opt_adam: bool = True
    lr: float = 1e-3
    weight_decay: float = 0.0
    adam_eps: float = 1e-15
    lr_level_reduce_ratio: float = 1.0
    lr_iters_reduce_ratio: float = 0.1
    lr_decay_step: Tuple[int, ...] = (10000, 50000, 100000)
    # decoder freezing (incremental mode, shine_incre.py:93-97)
    freeze_decoder: bool = False
    # feature-table update strategy:
    #   "fused"  (default): gradients w.r.t. the *gathered* corner rows via
    #            autodiff, then one explicit scatter-add feeding the dense
    #            Adam sweep.  XLA fuses the scatter into the sweep, so the
    #            whole feature update runs at the HBM bandwidth floor
    #            (~2.1 ms/level at 4.2M corners on v5e vs 9.4 ms/level for
    #            the autodiff-scatter + separate-sweep formulation —
    #            experiments/exp_fusion_shapes.py).  Reference-exact dense
    #            Adam semantics (untouched rows keep their momentum decay).
    #   "sparse": lazy Adam on touched rows only — map-size-independent;
    #            the multi-chip / giant-map path (compact gradients).
    #   "dense": plain autodiff + dense Adam (reference formulation; slow —
    #            autodiff's scatter does not fuse).  Fallback for SGD.
    feature_update: str = "fused"
    # pallas single-chip: one kernel dispatch over ALL levels' concatenated
    # packed tables (prep tax paid once) vs one dispatch per level.  Off by
    # default: the gradient concat costs more than the saved prep at bench
    # scale (experiments/exp_fuse_ab.py, 12.3 vs 11.9 ms/iter)
    fuse_update_levels: bool = False
    # sort each batch's sample indices (point mode): gather locality for
    # the pool and corner reads; order-invariant loss.  Measured NEUTRAL
    # on v5e (9.80 vs 9.83 ms/iter — TPU gathers don't reward index
    # locality; experiments/exp_sort_batch.py); kept for other targets.
    sort_batch: bool = False
    # static per-level allocated-corner counts (adam_kernel.used_rows_hint):
    # the pallas sweep skips each table's capacity-headroom tiles, which
    # dense Adam leaves bit-identical anyway (zero moments, zero grads).
    # None = sweep full capacity.
    n_used: Optional[Tuple[int, ...]] = None

    @classmethod
    def from_config(cls, cfg, levels: Tuple[int, ...], **overrides) -> "TrainSettings":
        kw = dict(
            bs=cfg.bs,
            levels=tuple(levels),
            poly_int_on=cfg.poly_int_on,
            main_loss_type=cfg.main_loss_type,
            loss_reduction=cfg.loss_reduction,
            loss_weight_on=cfg.loss_weight_on,
            sigma_sigmoid=cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m * cfg.scale,
            scale=cfg.scale,
            ekional_loss_on=cfg.ekional_loss_on,
            weight_e=cfg.weight_e,
            normal_loss_on=cfg.normal_loss_on,
            weight_n=cfg.weight_n,
            consistency_loss_on=cfg.consistency_loss_on,
            weight_c=cfg.weight_c,
            consistency_count=cfg.consistency_count,
            consistency_range=cfg.consistency_range,
            proj_correction_on=cfg.proj_correction_on,
            semantic_on=cfg.semantic_on,
            weight_s=cfg.weight_s,
            sem_label_decimation=cfg.sem_label_decimation,
            continual_reg_on=False,
            lambda_forget=cfg.lambda_forget,
            ray_loss=cfg.ray_loss,
            ray_sample_count=cfg.surface_sample_n + cfg.free_sample_n + cfg.clearance_sample_n,
            time_conditioned=cfg.time_conditioned,
            opt_adam=cfg.opt_adam,
            lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            adam_eps=cfg.adam_eps,
            lr_level_reduce_ratio=cfg.lr_level_reduce_ratio,
            lr_iters_reduce_ratio=cfg.lr_iters_reduce_ratio,
            lr_decay_step=tuple(cfg.lr_decay_step),
            feature_update=getattr(cfg, "feature_update", "fused"),
            fuse_update_levels=getattr(cfg, "fuse_update_levels", False),
            sort_batch=getattr(cfg, "sort_batch", False),
        )
        kw.update(overrides)
        return cls(**kw)


def resolve_feature_update(settings: "TrainSettings", feat_shapes,
                           winx: bool = False) -> str:
    """The feature-update implementation train_chunk will actually use
    (public twin of _resolve_mode — drivers gate tpu.moments_bf16 on it:
    bf16 moments are only legal when the resolved mode is 'pallas').
    ``winx``: fused-gather epoch windows will be supplied — the one mode
    whose body folds the continual-learning regularizer into the entry
    gradients, so reg no longer demotes pallas there."""
    return _resolve_mode(settings, feat_shapes, winx=winx)


def batch_windows_ok(settings: "TrainSettings", feat_shapes) -> bool:
    """Is epoch-window sampling (tpu.batch_windows) usable here?  The ONE
    predicate both the driver's soft gate (fall back to iid with a
    message) and train_chunk's hard gate (ValueError) share — keep them
    from drifting.  Windows also require pre_lookups; callers check that
    separately since it is an argument, not a setting.  Data-parallel runs
    are supported: the sharded update island re-spreads the narrow entry
    gradients to lanes and consumes the same precomputed EntryPrep.
    Continual-learning reg is supported by the FUSED window layout
    (windows_fused; the reg gradient rides the entry gradients via the
    precomputed cover masks) — the per-level window layout still demotes.
    """
    return (
        _resolve_mode(settings, feat_shapes, winx=True) == "pallas"
        and not settings.fuse_update_levels
        and not settings.ray_loss
        and not settings.consistency_loss_on
    )


def shard_windows_ok(settings: "TrainSettings", feat_shapes,
                     n_shards: int) -> bool:
    """Can the fused epoch windows row-shard the update over ``n_shards``
    chips?  Requires a power-of-two shard count that divides the batch
    (the sample shards) and an even row split of the concatenated packed
    table (the split-K prefix is pow2-bumped to >= n_shards at precompute,
    so it always divides).  The driver gates
    ``precompute_batch_windows_fused(shards=n)`` on this."""
    if n_shards < 2 or (n_shards & (n_shards - 1)):
        return False
    if settings.bs % n_shards or settings.bs // n_shards < 1:
        return False
    return adam_kernel.shardable(feat_shapes, n_shards)


def used_rows_for(grid, granularity: int = 16) -> Tuple[int, ...]:
    """Per-level used-corner hints for TrainSettings.n_used (the pallas
    sweep skips capacity-headroom tiles — adam_kernel.used_rows_hint)."""
    return adam_kernel.used_rows_hint(
        [hl.n_corners for hl in grid.host_levels],
        [tuple(f.shape) for f in grid.features],
        granularity,
    )


def init_params(cfg, grid, key: jax.Array) -> Dict[str, Any]:
    """Canonical parameter pytree: geo/sem decoders + feature tables + sigma."""
    kg, ks = jax.random.split(key)
    return {
        "geo": decoder.init_decoder_params(
            kg,
            cfg.feature_dim,
            cfg.geo_mlp_hidden_dim,
            cfg.geo_mlp_level,
            cfg.sem_class_count,
            cfg.geo_mlp_bias_on,
            cfg.time_conditioned,
        ),
        "sem": decoder.init_decoder_params(
            ks,
            cfg.feature_dim,
            cfg.sem_mlp_hidden_dim,
            cfg.sem_mlp_level,
            cfg.sem_class_count,
            cfg.sem_mlp_bias_on,
        ),
        "features": tuple(grid.features),
        "sigma": jnp.ones((), jnp.float32),  # learnable dr sigma (shine_batch.py:85)
    }


def _forward_sdf(params, tables, coords, ts, s: TrainSettings):
    feat, corners, found = query_feature_with_aux(
        coords, tables, list(params["features"]), s.levels, s.poly_int_on
    )
    # misses probe an arbitrary slot: its corner rows may belong to a REAL
    # node (hashgrid.lookup_level returns slot 0 of the window when nothing
    # hits).  The interpolation masks their weights, but consumers that key
    # off row IDENTITY (the continual-reg touched mask, sparse segments)
    # must see the trashbin row — the reference's miss convention
    # (model/feature_octree.py:209-215, index -1)
    corners = [
        jnp.where(found[i][:, None], c, params["features"][i].shape[0] - 1)
        for i, c in enumerate(corners)
    ]
    if s.time_conditioned:
        pred = decoder.time_conditioned_sdf(params["geo"], feat, ts)
    else:
        pred = decoder.sdf(params["geo"], feat)
    return pred, feat, corners, found


def _point_gradient(params, tables, coords, ts, s: TrainSettings):
    """d pred / d coord per point (reference utils/tools.py:175-185)."""

    def scalar_sum(c):
        pred, _, _, _ = _forward_sdf(params, tables, c, ts, s)
        return jnp.sum(pred)

    return jax.grad(scalar_sum)(coords)


def _continual_reg(params, shadow, corners_per_level, s: TrainSettings):
    """Continual-learning regularizer over batch-touched corners.

    Parity: model/feature_octree.py:246-255 — for each level, the *unique*
    corners touched by the batch contribute importance * (feat - last)^2.
    Static-shape trick: scatter a 0/1 touched mask over the table instead of
    dynamic unique().
    """
    reg = jnp.zeros((), jnp.float32)
    for i, corners in enumerate(corners_per_level):
        feats = params["features"][i]
        imp = shadow["importance"][i]
        last = shadow["last_frame"][i]
        touched = jnp.zeros((feats.shape[0],), jnp.float32)
        touched = touched.at[corners.reshape(-1)].set(1.0)
        diff2 = (feats - last) ** 2
        reg = reg + jnp.sum(touched[:, None] * imp * diff2)
    return reg


def _compute_loss(params, tables, batch, shadow, key, s: TrainSettings):
    coords = batch["coord"]
    weight = batch["weight"]
    surface_mask = weight > 0
    aux: Dict[str, jnp.ndarray] = {}

    pred, feat, corners, found = _forward_sdf(params, tables, coords, batch["ts"], s)

    need_grad = (
        s.ekional_loss_on or s.normal_loss_on or s.consistency_loss_on
        or s.proj_correction_on
    )
    if need_grad:
        g = _point_gradient(params, tables, coords, batch["ts"], s) * s.sigma_sigmoid

    sdf_target = batch["sdf_label"] if "sdf_label" in batch else None
    if s.proj_correction_on and sdf_target is not None:
        # scale surface samples' projective labels by |cos(grad, ray)|;
        # free-space samples keep cos = 1 (shine_batch.py:144-147)
        ray = coords - batch["origin"]
        cos = jnp.abs(
            jnp.sum(g * ray, axis=-1)
            / (losses.safe_norm(g, axis=-1)
               * losses.safe_norm(ray, axis=-1) + 1e-12)
        )
        cos = jnp.where(surface_mask, cos, 1.0)
        sdf_target = sdf_target * cos

    total = jnp.zeros((), jnp.float32)
    if s.ray_loss:
        # rendering losses over rays (shine_batch.py:162-170)
        pred_occ = jax.nn.sigmoid(pred / params["sigma"])
        pred_ray = pred_occ.reshape(-1, s.ray_sample_count)
        depth_ray = batch["sample_depth"].reshape(-1, s.ray_sample_count)
        dr = losses.batch_ray_rendering_loss(
            depth_ray, pred_ray, batch["ray_depth"], neus_on=(s.main_loss_type == "dr_neus")
        )
        total = total + dr
        aux["sdf_loss"] = dr
    else:
        w = jnp.abs(weight)
        if s.main_loss_type == "sdf_bce":
            sdf_loss = losses.sdf_bce_loss(
                pred, sdf_target, s.sigma_sigmoid, w, s.loss_weight_on, s.loss_reduction
            )
        elif s.main_loss_type == "sdf_l1":
            sdf_loss = losses.sdf_diff_loss(pred, sdf_target, w, s.scale, False)
        elif s.main_loss_type == "sdf_l2":
            sdf_loss = losses.sdf_diff_loss(pred, sdf_target, w, s.scale, True)
        else:
            raise ValueError(f"unknown main_loss_type {s.main_loss_type}")
        total = total + sdf_loss
        aux["sdf_loss"] = sdf_loss

    if s.continual_reg_on:
        reg = _continual_reg(params, shadow, corners, s)
        total = total + s.lambda_forget * reg
        aux["reg_loss"] = reg

    if s.ekional_loss_on:
        ek = losses.eikonal_loss(g, surface_mask)
        total = total + s.weight_e * ek
        aux["eikonal_loss"] = ek

    if s.consistency_loss_on:
        # gradient agreement between jittered nearby points
        # (shine_batch.py:149-158,187-190)
        k1, k2 = jax.random.split(key)
        cnt = min(s.consistency_count, coords.shape[0])
        near_idx = jax.random.randint(k1, (cnt,), 0, coords.shape[0])
        shift_scale = s.consistency_range * s.scale
        shift = jax.random.uniform(k2, (cnt, 3), coords.dtype, -shift_scale, shift_scale)
        near = coords[near_idx] + shift
        g_near = _point_gradient(params, tables, near, batch["ts"][near_idx], s) * s.sigma_sigmoid
        cons = losses.consistency_loss(g[near_idx], g_near)
        total = total + s.weight_c * cons
        aux["consistency_loss"] = cons

    if s.normal_loss_on:
        nl = losses.normal_loss(g, batch["normal_label"], surface_mask)
        total = total + s.weight_n * nl
        aux["normal_loss"] = nl

    if s.semantic_on:
        sem_pred = decoder.sem_label_prob(params["sem"], feat)
        d = s.sem_label_decimation
        sl = losses.sem_nll_loss(sem_pred[::d], batch["sem_label"][::d])
        total = total + s.weight_s * sl
        aux["sem_loss"] = sl

    aux["total_loss"] = total
    return total, aux


def _feat_winx(c, G, wx, s: TrainSettings):
    """Interpolated hierarchical feature from K-deduplicated packed rows.

    ``G`` is ONE (B, L*K, 128) array: K gathered packed rows per sample per
    level (a node's 8 corners almost always share one packed row because
    growth allocates them contiguously — bench world: mean 1.3, max 4
    unique rows; experiments/exp_r3_winx.py).  Per level the 8 corner
    weights accumulate into per-(sample, gathered-row) lane masks ``w_k``
    before multiplying the rows — the same trilinear sum as ``lanefold``
    grouped by packed row (bit-equal on CPU), with HALF the gathered rows
    and kernel entries.  ``wx`` carries the window's static structure:
    kidx (B, L*8) row-slot of each corner, slots (B, L*8) lane slot,
    found (B, L), K.

    Parity: computes exactly the reference's hierarchical interpolation
    (trilinear/smoothstep weights x 8 corner features, summed over
    featured levels — model/feature_octree.py:172-244), regrouped by
    packed row; misses contribute zero like the trashbin convention
    (model/feature_octree.py:209-215).
    """
    K = wx["K"]
    D = wx["feat_dims"][0]
    PACK = 128 // D
    lanegrp = jnp.arange(128, dtype=jnp.int32) // D
    karange = jnp.arange(K, dtype=jnp.int32)
    f = None
    for i, level in enumerate(s.levels):
        w8 = corner_weights(c, level, s.poly_int_on)
        w8 = jnp.where(wx["found"][:, i][:, None], w8, 0.0)
        sl_i = wx["slots"][:, i * 8:(i + 1) * 8]
        ki = wx["kidx"][:, i * 8:(i + 1) * 8]
        w_m = jnp.where(
            lanegrp[None, None, :] == sl_i[:, :, None], w8[:, :, None], 0.0)
        onek = (ki[:, :, None] == karange[None, None, :]).astype(w_m.dtype)
        # group the masked weights by gathered row: a true matmul (free l
        # and k), so TPU's DEFAULT f32 dot would round w_m to bf16 —
        # unlike the per-level path's lanefold, whose "bcl,bcl->bl" is an
        # elementwise reduce with no rounding.  HIGHEST on the weight
        # operand (one-hot onek is exact in bf16) keeps the two layouts'
        # trilinear sums aligned on TPU; the einsum is tiny (8xKx128 MACs
        # per sample) so the 3-pass decomposition costs nothing measurable.
        w_k = jnp.einsum(
            "bcl,bck->bkl", w_m, onek,
            precision=(jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT),
        )
        c128 = jnp.einsum("bkl,bkl->bl", w_k, G[:, i * K:(i + 1) * K])
        fi = c128.reshape(-1, PACK, D).sum(axis=1)
        f = fi if f is None else f + fi
    return f


def _feat_winx_split(c, G_hi, G_lo, wx, s: TrainSettings):
    """Split-K fused-window interpolation (round 4).

    The window's samples are reordered so the few that touch more than
    K_lo packed rows per level sit in a static P-slot prefix
    (``precompute_batch_windows_fused(split_k=True)``); ``G_hi`` (P, L*K,
    128) are the prefix's K gathered rows (the :func:`_feat_winx` path) and
    ``G_lo`` (bs-P, L*K_lo, 128) the tail's — for K_lo == 1 (miss-heavy
    pools) the trilinear sum collapses to an elementwise lane-masked
    product (kidx is all zero by construction; no einsum, no dot
    rounding), otherwise the tail is the same K-row path at width K_lo.
    Same reference semantics as :func:`_feat_winx` (hierarchical
    interpolation, model/feature_octree.py:172-244), minus the
    provably-zero terms.
    """
    P = G_hi.shape[0]
    L = len(s.levels)
    K_lo = G_lo.shape[1] // L
    D = wx["feat_dims"][0]
    PACK = 128 // D
    wx_hi = dict(wx, kidx=wx["kidx"][:P], slots=wx["slots"][:P],
                 found=wx["found"][:P])
    f_hi = _feat_winx(c[:P], G_hi, wx_hi, s)
    ct = c[P:]
    wx_lo = dict(wx, K=K_lo, kidx=wx["kidx"][P:], slots=wx["slots"][P:],
                 found=wx["found"][P:])
    if K_lo > 1:
        f_lo = _feat_winx(ct, G_lo, wx_lo, s)
        return jnp.concatenate([f_hi, f_lo], axis=0)
    lanegrp = jnp.arange(128, dtype=jnp.int32) // D
    f_lo = None
    for i, level in enumerate(s.levels):
        w8 = corner_weights(ct, level, s.poly_int_on)
        w8 = jnp.where(wx["found"][P:, i][:, None], w8, 0.0)
        sl_i = wx["slots"][P:, i * 8:(i + 1) * 8]
        w_m = jnp.where(lanegrp[None, None, :] == sl_i[:, :, None],
                        w8[:, :, None], 0.0)
        w_lane = jnp.sum(w_m, axis=1)  # (B, 128)
        c128 = w_lane * G_lo[:, i, :]
        fi = c128.reshape(-1, PACK, D).sum(axis=1)
        f_lo = fi if f_lo is None else f_lo + fi
    return jnp.concatenate([f_hi, f_lo], axis=0)


def _feat_from_rows(c, G_l, found_l, s: TrainSettings, slots_l=None,
                    feat_dims=None):
    """Interpolated hierarchical feature from pre-gathered corner rows.

    With ``slots_l`` (pallas mode) ``G_l[i]`` holds whole 128-lane packed
    rows and the lane select is folded into the interpolation reduction
    (``adam_kernel.lanefold``): the narrow (B, 8, D) view never exists —
    ``take_along_axis``'s per-element lane select costs ~4 ms/level at
    bench scale — and the backward w.r.t. ``G_l`` is lane-aligned, exactly
    what ``fused_adam_packed(lanes=True)`` consumes with no lane shuffle.
    """
    f = None
    for i, level in enumerate(s.levels):
        w = corner_weights(c, level, s.poly_int_on)
        w = jnp.where(found_l[i][:, None], w, 0.0)
        if slots_l is not None:
            contrib = adam_kernel.lanefold(G_l[i], slots_l[i], w, feat_dims[i])
        else:
            contrib = jnp.einsum("nc,ncd->nd", w.astype(G_l[i].dtype), G_l[i])
        f = contrib if f is None else f + contrib
    return f


def _compute_loss_sparse(dense_params, G_list, G_near, batch, fac, key, s: TrainSettings):
    """Loss with the feature tables factored out as gathered rows ``G_list``.

    ``G_list[i]`` is (B, 8, D) — the batch's corner feature rows per level.
    The field value/gradient is linear in G given the (fixed) structure, so
    d loss/d features = scatter-add of d loss/d G over the corner rows; the
    sparse/fused optimizers apply that without autodiff-materialized dense
    grad tables.

    ``fac`` carries the fixed structure: corners/found for the batch, and —
    when the consistency loss is on — the jittered near points' coords,
    source indices, and found masks (their rows are ``G_near``; gradients
    w.r.t. them scatter like the batch rows).
    """
    coords = batch["coord"]
    weight = batch["weight"]
    found = fac.get("found")
    # pallas mode: G rows are whole 128-lane packed rows; slots select the
    # D target lanes inside the interpolation reduction (lanefold)
    slots = fac.get("slots")
    feat_dims = fac.get("feat_dims")
    winx = fac.get("winx")  # K-dedup fused-gather mode (epoch windows)
    surface_mask = weight > 0
    aux: Dict[str, jnp.ndarray] = {}

    def feat_of(c):
        if winx is not None:
            if winx.get("split"):
                return _feat_winx_split(c, G_list[0], G_list[1], winx, s)
            return _feat_winx(c, G_list, winx, s)
        return _feat_from_rows(c, G_list, found, s, slots, feat_dims)

    def pred_of(c):
        f = feat_of(c)
        if s.time_conditioned:
            return decoder.time_conditioned_sdf(dense_params["geo"], f, batch["ts"])
        return decoder.sdf(dense_params["geo"], f)

    feat = feat_of(coords)
    if s.time_conditioned:
        pred = decoder.time_conditioned_sdf(dense_params["geo"], feat, batch["ts"])
    else:
        pred = decoder.sdf(dense_params["geo"], feat)

    need_grad = (
        s.ekional_loss_on or s.normal_loss_on or s.proj_correction_on
        or s.consistency_loss_on
    )
    if need_grad:
        g = jax.grad(lambda c: jnp.sum(pred_of(c)))(coords) * s.sigma_sigmoid

    sdf_target = batch.get("sdf_label")
    if s.proj_correction_on and sdf_target is not None:
        # scale surface samples' projective labels by |cos(grad, ray)|;
        # free-space samples keep cos = 1 (shine_batch.py:144-147)
        ray = coords - batch["origin"]
        cos = jnp.abs(
            jnp.sum(g * ray, axis=-1)
            / (losses.safe_norm(g, axis=-1)
               * losses.safe_norm(ray, axis=-1) + 1e-12)
        )
        cos = jnp.where(surface_mask, cos, 1.0)
        sdf_target = sdf_target * cos

    total = jnp.zeros((), jnp.float32)
    if s.ray_loss:
        pred_occ = jax.nn.sigmoid(pred / dense_params["sigma"])
        pred_ray = pred_occ.reshape(-1, s.ray_sample_count)
        depth_ray = batch["sample_depth"].reshape(-1, s.ray_sample_count)
        dr = losses.batch_ray_rendering_loss(
            depth_ray, pred_ray, batch["ray_depth"], neus_on=(s.main_loss_type == "dr_neus")
        )
        total = total + dr
        aux["sdf_loss"] = dr
    else:
        w = jnp.abs(weight)
        if s.main_loss_type == "sdf_bce":
            sdf_loss = losses.sdf_bce_loss(
                pred, sdf_target, s.sigma_sigmoid, w, s.loss_weight_on, s.loss_reduction
            )
        elif s.main_loss_type == "sdf_l1":
            sdf_loss = losses.sdf_diff_loss(pred, sdf_target, w, s.scale, False)
        elif s.main_loss_type == "sdf_l2":
            sdf_loss = losses.sdf_diff_loss(pred, sdf_target, w, s.scale, True)
        else:
            raise ValueError(f"unknown main_loss_type {s.main_loss_type}")
        total = total + sdf_loss
        aux["sdf_loss"] = sdf_loss

    if s.ekional_loss_on:
        ek = losses.eikonal_loss(g, surface_mask)
        total = total + s.weight_e * ek
        aux["eikonal_loss"] = ek
    if s.consistency_loss_on:
        # gradient agreement between the pre-sampled jittered near points
        # (their structure lookup happens in the body; shine_batch.py:149-158)
        def pred_near(c):
            f = _feat_from_rows(c, G_near, fac["near_found"], s,
                                fac.get("near_slots"), feat_dims)
            if s.time_conditioned:
                ts_n = batch["ts"][fac["near_idx"]]
                return decoder.time_conditioned_sdf(dense_params["geo"], f, ts_n)
            return decoder.sdf(dense_params["geo"], f)

        g_near = jax.grad(lambda c: jnp.sum(pred_near(c)))(fac["near_coords"])
        g_near = g_near * s.sigma_sigmoid
        cons = losses.consistency_loss(g[fac["near_idx"]], g_near)
        total = total + s.weight_c * cons
        aux["consistency_loss"] = cons
    if s.normal_loss_on:
        nl = losses.normal_loss(g, batch["normal_label"], surface_mask)
        total = total + s.weight_n * nl
        aux["normal_loss"] = nl
    if s.semantic_on:
        sem_pred = decoder.sem_label_prob(dense_params["sem"], feat)
        d = s.sem_label_decimation
        sl = losses.sem_nll_loss(sem_pred[::d], batch["sem_label"][::d])
        total = total + s.weight_s * sl
        aux["sem_loss"] = sl

    aux["total_loss"] = total
    return total, aux


def _gather_batch(pool, idx, s: TrainSettings):
    batch = {
        "coord": pool["coord"][idx],
        "sdf_label": pool["sdf_label"][idx],
        "weight": pool["weight"][idx],
        "ts": pool["time"][idx],
    }
    if s.ray_loss:
        batch["sample_depth"] = pool["sample_depth"][idx]
    if s.normal_loss_on:
        batch["normal_label"] = pool["normal_label"][idx]
    if s.proj_correction_on:
        batch["origin"] = pool["origin"][idx]
    if s.semantic_on:
        batch["sem_label"] = pool["sem_label"][idx]
    return batch


def _resolve_mode(settings: TrainSettings, feat_shapes,
                  winx: bool = False) -> str:
    """Pick the feature-update implementation for this configuration.

    ``winx``: the caller will supply FUSED epoch windows — body_winx folds
    the continual-learning reg into the entry gradients (cover masks), so
    reg does not demote pallas there (round 5; the reference's flagship
    incremental-reg mode previously ran 13x off flagship on 'fused')."""
    s = settings
    mode = s.feature_update if s.opt_adam else "dense"
    if mode == "sparse" and s.consistency_loss_on:
        mode = "dense"
    if mode == "pallas" and (
        (s.continual_reg_on and not winx)
        or not all(adam_kernel.packable(C, D) for C, D in feat_shapes)
    ):
        mode = "fused"
    # pallas + multi-chip: the kernel runs replicated inside a shard_map
    # island (see body_fused); no fallback needed
    if mode not in ("dense", "sparse", "fused", "pallas"):
        raise ValueError(f"unknown feature_update {settings.feature_update!r}")
    return mode


@functools.partial(jax.jit, donate_argnames=("feats",))
def _pack_feats_jit(feats):
    """(C,D) tables -> packed (C*D/128, 128), as a SEPARATE jit: the packed
    arrays then enter the training jit as native-layout parameters.
    Reshaping inside the training jit instead leaves the scan carry in the
    (C,D)-derived layout and XLA relayouts around the pallas custom-call
    EVERY iteration (48 ms/level vs 3.9 — experiments/exp_prep_bisect.py)."""
    return tuple(f.reshape(-1, 128) for f in feats)


@functools.partial(jax.jit, static_argnames=("shapes",), donate_argnames=("feats",))
def _unpack_feats_jit(feats, shapes):
    return tuple(f.reshape(sh) for f, sh in zip(feats, shapes))


@functools.partial(jax.jit, donate_argnames=("feats",))
def _pack_feats_fused_jit(feats):
    """All levels' (C,D) tables -> ONE concatenated packed (R_tot, 128)
    array: the single-chip pallas path updates every level in one kernel
    dispatch (adam_kernel.fused_adam_packed_multi), paying the prep tax
    (argsort/reorder/bf16-split/pad/cond) once per iteration, not per
    level."""
    return jnp.concatenate([f.reshape(-1, 128) for f in feats], axis=0)


@functools.partial(jax.jit, static_argnames=("shapes",), donate_argnames=("fused",))
def _unpack_feats_fused_jit(fused, shapes):
    out = []
    lo = 0
    for C, D in shapes:
        R = C * D // 128
        out.append(fused[lo:lo + R].reshape(C, D))
        lo += R
    return tuple(out)


def train_chunk(
    params,
    opt_state: OptState,
    tables: Tuple[LevelTable, ...],
    pool: Dict[str, jnp.ndarray],
    shadow: Dict[str, Any],
    n_valid: jnp.ndarray,
    start_iter: jnp.ndarray,
    key: jax.Array,
    settings: TrainSettings,
    n_iters: int,
    batch_sharding=None,
    pre_lookups=None,
    batch_windows=None,
):
    """Run ``n_iters`` optimization steps in one compiled scan.

    ``pool`` arrays are padded to static capacity; random indices are drawn
    in [0, n_valid).  ``shadow`` holds the continual-learning importance /
    last-frame tables (pass empty dict shapes when off).  Returns updated
    (params, opt_state, mean-aux dict).

    ``batch_sharding``: optional ``NamedSharding`` over a data-parallel mesh
    axis; the sampled batch is sharding-constrained to it so XLA partitions
    the forward/backward across chips and all-reduces the (replicated)
    parameter gradients over ICI.

    ``pre_lookups``: optional output of :func:`precompute_pool_lookups` for
    the SAME (tables, pool) — per-iteration hash probes become plain
    gathers.  The caller owns invalidation: recompute whenever the map
    structure or the uploaded pool contents change.

    ``batch_windows``: optional output of :func:`precompute_batch_windows`
    for the SAME (pre_lookups, n_valid) — iteration ``t`` trains on epoch
    window ``t % W`` instead of an iid randint draw, and the update
    kernel's row-only prep (argsort + tile windows) comes precomputed.
    SAMPLING-SEMANTICS DELTA vs the reference: epoch-style
    without-replacement windows of one fixed shuffle instead of iid
    batches (the loss/optimizer math per batch is unchanged).  Requires
    the pallas update path (single-chip or data-parallel), point-mode
    loss, no consistency term, and ``pre_lookups``.
    """
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    winx = batch_windows is not None and (
        "rows_kg" in batch_windows or "rows_hi" in batch_windows)
    mode = _resolve_mode(settings, feat_shapes, winx=winx)
    if batch_windows is not None and not winx and not (
        batch_windows_ok(settings, feat_shapes)
        and pre_lookups is not None
    ):
        raise ValueError(
            "batch_windows requires the pallas update (feature_update: "
            "pallas, no fuse_update_levels), point-mode loss without "
            f"consistency, and pre_lookups (mode: {mode})"
        )
    if winx:
        if not (batch_windows_ok(settings, feat_shapes) and mode == "pallas"):
            raise ValueError(
                "fused batch windows require the pallas update and a "
                f"point-mode loss without consistency (mode: {mode})"
            )
        if settings.continual_reg_on and "cover" not in batch_windows:
            raise ValueError(
                "continual_reg_on with fused windows needs the reg cover "
                "masks — precompute with reg_cover=True"
            )
        # data-parallel winx is supported: the forward/backward shards over
        # the batch dim and the update runs replicated inside a shard_map
        # island whose boundary all-gathers the (bs, L*K, 128) entry
        # gradients (bf16 when the kernel rounds them anyway).  Replicated
        # tables are required — checked just below for all pallas modes.
    shard_routed = (
        winx and batch_sharding is not None
        and isinstance(batch_windows, dict)
        and batch_windows.get("shard") is not None
    )
    if shard_routed and settings.continual_reg_on:
        # the reg fold gathers imp/last rows sample-side; the routed
        # layout would need them served per shard — not built (reg is the
        # incremental driver's mode; routed windows are the batch-scale
        # path).  Run reg with replicated tables instead.
        raise ValueError(
            "continual_reg_on is not supported with shard-routed windows; "
            "use replicated tables (the reg fold runs in that island)")
    if winx and settings.continual_reg_on:
        # pack the shadow tables like the features: the reg fold gathers
        # imp/last rows through the same fused (R_tot, 128) layout.  NOT
        # donated — the driver keeps the shadow across frames.
        shadow = {
            "importance_fused": jnp.concatenate(
                [jnp.asarray(f).reshape(-1, 128)
                 for f in shadow["importance"]]),
            "last_fused": jnp.concatenate(
                [jnp.asarray(f).reshape(-1, 128)
                 for f in shadow["last_frame"]]),
        }
    if mode == "pallas" and batch_sharding is not None and not shard_routed:
        # without window shard routing the pallas kernel runs REPLICATED
        # inside a shard_map island — row-sharded (giant-map) tables would
        # be silently all-gathered into every chip each iteration.  Those
        # maps use fused/sparse (GSPMD partitions their scatter+sweep
        # across the row shards) — or, with epoch windows, the round-5
        # routed layout (precompute_batch_windows_fused(shards=n)), which
        # row-shards the split-K kernel itself.
        sh = getattr(params["features"][0], "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            raise ValueError(
                "feature_update 'pallas' needs replicated feature tables; "
                "with tpu.table_sharding: rows use 'fused'/'sparse' or "
                "precompute the windows with shards=n_devices"
            )
    if opt_state.m["features"][0].dtype == jnp.bfloat16 and mode != "pallas":
        # only the pallas update (and its fallbacks) preserves the bf16
        # moment carry; the other formulations would promote it to f32 and
        # break the scan carry dtype
        raise ValueError(
            "tpu.moments_bf16 requires feature_update: pallas "
            f"(resolved mode: {mode})"
        )
    if params["features"][0].dtype == jnp.bfloat16 and not winx:
        # bf16 TABLES need the stochastic-rounding multi kernel — only the
        # fused-window body feeds it; every other path would silently
        # nearest-round and stall sub-quantum updates
        raise ValueError(
            "tpu.params_bf16 requires fused batch windows "
            "(batch_windows + windows_fused, single chip)"
        )
    # pallas: concatenate all levels into one packed array so the update is
    # ONE kernel dispatch (the per-level-window DP path keeps per-level
    # arrays: its shard_map island + narrow all-gather is per level).  The
    # fused window mode (winx) REQUIRES the fused carry — single-chip or
    # data-parallel — because its forward is one gather from the
    # concatenated table.
    fuse_tables = (mode == "pallas"
                   and (winx or (settings.fuse_update_levels
                                 and batch_sharding is None)))
    if mode == "pallas":
        pack = _pack_feats_fused_jit if fuse_tables else _pack_feats_jit
        params = dict(params, features=pack(params["features"]))
        opt_state = OptState(
            m=dict(opt_state.m, features=pack(opt_state.m["features"])),
            v=dict(opt_state.v, features=pack(opt_state.v["features"])),
            step=opt_state.step,
        )
        if shard_routed:
            # the routed islands hold one contiguous R_tot/n row block per
            # chip — place the packed tables that way (one reshard per
            # chunk; the scan carry then keeps the layout)
            rows_sh = jax.sharding.NamedSharding(
                batch_sharding.mesh,
                jax.sharding.PartitionSpec(batch_sharding.mesh.axis_names[0]),
            )
            n_sh = batch_windows["shard"]["serve_rows"].shape[1]
            if params["features"].shape[0] % n_sh:
                raise ValueError(
                    f"packed rows {params['features'].shape[0]} not "
                    f"divisible by {n_sh} shards")
            params = dict(
                params, features=jax.device_put(params["features"], rows_sh))
            opt_state = OptState(
                m=dict(opt_state.m, features=jax.device_put(
                    opt_state.m["features"], rows_sh)),
                v=dict(opt_state.v, features=jax.device_put(
                    opt_state.v["features"], rows_sh)),
                step=opt_state.step,
            )
    params, opt_state, aux = _train_chunk_impl(
        params, opt_state, tables, pool, shadow, n_valid, start_iter, key,
        settings, n_iters, batch_sharding, mode, feat_shapes, pre_lookups,
        fuse_tables, batch_windows,
    )
    if mode == "pallas":
        if fuse_tables:
            unpack = _unpack_feats_fused_jit
        else:
            unpack = _unpack_feats_jit
        params = dict(
            params, features=unpack(params["features"], feat_shapes)
        )
        opt_state = OptState(
            m=dict(opt_state.m,
                   features=unpack(opt_state.m["features"], feat_shapes)),
            v=dict(opt_state.v,
                   features=unpack(opt_state.v["features"], feat_shapes)),
            step=opt_state.step,
        )
    return params, opt_state, aux


@functools.partial(
    jax.jit,
    static_argnames=("settings", "n_iters", "batch_sharding", "mode",
                     "feat_shapes", "fuse_tables"),
    donate_argnames=("params", "opt_state"),
)
def _train_chunk_impl(
    params,
    opt_state: OptState,
    tables: Tuple[LevelTable, ...],
    pool: Dict[str, jnp.ndarray],
    shadow: Dict[str, Any],
    n_valid: jnp.ndarray,
    start_iter: jnp.ndarray,
    key: jax.Array,
    settings: TrainSettings,
    n_iters: int,
    batch_sharding=None,
    mode: str = "fused",
    feat_shapes=(),
    pre_lookups=None,
    fuse_tables: bool = False,
    batch_windows=None,
):
    s = settings
    lr_scale_tree, wd_tree = make_group_trees(
        params, s.lr_level_reduce_ratio, s.weight_decay
    )
    if s.freeze_decoder:
        # zero decoder LR = frozen (state still threads through)
        for grp in ("geo", "sem"):
            lr_scale_tree[grp] = jax.tree_util.tree_map(
                lambda _: 0.0, lr_scale_tree[grp]
            )

    use_pallas_kernel = adam_kernel.on_tpu()
    # bf16 update mode (tpu.moments_bf16): moments stored bf16 AND gradient
    # entries rounded bf16 (kernel runs half the one-hot matmuls)
    bf16_update = (mode == "pallas"
                   and opt_state.m["features"][0].dtype == jnp.bfloat16)
    # static per-level packed-row offsets into the fused (R_tot, 128) table
    feat_roffs = []
    off = 0
    for C, D in feat_shapes:
        feat_roffs.append(off)
        off += C * D // 128

    if mode == "sparse":
        # pack [p|m|v] side by side: one gather + one scatter per level
        # per iteration instead of three (entry-bound scatters)
        params = dict(
            params,
            features=tuple(
                jnp.concatenate([f, mf, vf], axis=1)
                for f, mf, vf in zip(
                    params["features"],
                    opt_state.m["features"],
                    opt_state.v["features"],
                )
            ),
        )
        dummy = tuple(
            jnp.zeros((1, 1), f.dtype) for f in opt_state.m["features"]
        )
        opt_state = OptState(
            m=dict(opt_state.m, features=dummy),
            v=dict(opt_state.v, features=dummy),
            step=opt_state.step,
        )

    def sample_batch(k_idx):
        if s.ray_loss:
            # sample rays, expand to their consecutive samples
            # (dataset/lidar_dataset.py:402-410)
            n_rays = n_valid // s.ray_sample_count
            ray_idx = jax.random.randint(k_idx, (s.bs,), 0, n_rays)
            idx = (
                ray_idx[:, None] * s.ray_sample_count
                + jnp.arange(s.ray_sample_count)[None, :]
            ).reshape(-1)
            batch = _gather_batch(pool, idx, s)
            batch["ray_depth"] = pool["ray_depth"][ray_idx]
        else:
            idx = jax.random.randint(k_idx, (s.bs,), 0, n_valid)
            if s.sort_batch:
                # same sample multiset, pool-order sorted: samples from the
                # same frame/ray neighborhood sit together, so the batch's
                # pool and corner gathers hit clustered rows.  The loss is
                # a mean — order-invariant up to f32 addition order.
                idx = jnp.sort(idx)
            batch = _gather_batch(pool, idx, s)
        if batch_sharding is not None:
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()
            }
            idx = jax.lax.with_sharding_constraint(idx, batch_sharding)
        return batch, idx

    if mode not in ("fused", "pallas"):
        pre_lookups = None

    def body_dense(carry, it):
        params, opt_state, key = carry
        key, k_idx, k_loss = jax.random.split(key, 3)
        batch, idx = sample_batch(k_idx)
        (loss, aux), grads = jax.value_and_grad(_compute_loss, has_aux=True)(
            params, tables, batch, shadow, k_loss, s
        )
        lr = lr_at_step(
            s.lr, start_iter + it, s.lr_decay_step, s.lr_iters_reduce_ratio
        )
        if s.opt_adam:
            params, opt_state = adam_update(
                params, grads, opt_state, lr, lr_scale_tree, wd_tree,
                b1=0.9, b2=0.99, eps=s.adam_eps,
            )
        else:
            params, opt_state = sgd_update(
                params, grads, opt_state, lr, lr_scale_tree, wd_tree
            )
        return (params, opt_state, key), aux

    def body_sparse(carry, it):
        """Lazy Adam on the touched rows of a PACKED (C, 3D) [p|m|v] table.

        The XLA scatter is entry-bound, so p, m, v are stored side by side
        in one row: each level pays ONE gather and ONE scatter per
        iteration instead of three of each (~3x cheaper dominant cost —
        the round-1 packed-row measurement, BENCH_NOTES.md)."""
        params, opt_state, key = carry
        key, k_idx, k_loss = jax.random.split(key, 3)
        batch, idx = sample_batch(k_idx)
        coords = batch["coord"]

        D = feat_shapes[0][1]
        # structure lookups + row gathers (outside the diff region)
        corners = []
        found = []
        G_list = []
        for i, level in enumerate(s.levels):
            c_i, f_i = lookup_level(tables[i], coords, level)
            # misses -> trashbin row (see _forward_sdf): the sparse
            # segments and reg must not touch the arbitrary slot a missed
            # probe lands on
            c_i = jnp.where(f_i[:, None], c_i, feat_shapes[i][0] - 1)
            corners.append(c_i)
            found.append(f_i)
            G_list.append(params["features"][i][c_i][..., :D])

        dense_params = {k: v for k, v in params.items() if k != "features"}
        fac = {"corners": corners, "found": found}
        (loss, aux), (g_dense, g_G) = jax.value_and_grad(
            _compute_loss_sparse, argnums=(0, 1), has_aux=True
        )(dense_params, G_list, (), batch, fac, k_loss, s)

        lr = lr_at_step(
            s.lr, start_iter + it, s.lr_decay_step, s.lr_iters_reduce_ratio
        )

        # dense Adam for the (tiny) decoder/sigma params
        dense_state = OptState(
            m={k: opt_state.m[k] for k in dense_params},
            v={k: opt_state.v[k] for k in dense_params},
            step=opt_state.step,
        )
        dense_scale = {k: lr_scale_tree[k] for k in dense_params}
        dense_wd = {k: wd_tree[k] for k in dense_params}
        new_dense, dense_state = adam_update(
            dense_params, g_dense, dense_state, lr, dense_scale, dense_wd,
            b1=0.9, b2=0.99, eps=s.adam_eps,
        )

        # lazy Adam on the touched feature rows per level — one packed RMW
        new_feats = []
        reg_total = jnp.zeros((), jnp.float32)
        for i in range(len(s.levels)):
            pmv_i = params["features"][i]
            seg = segment_by_row(corners[i], g_G[i], feat_shapes[i][0])
            level_lr = lr * (s.lr_level_reduce_ratio ** i)
            if s.continual_reg_on:
                pmv_i, reg_i = sparse_adam_level_packed(
                    pmv_i, seg, level_lr, dense_state.step, eps=s.adam_eps,
                    reg_lambda=s.lambda_forget,
                    importance=shadow["importance"][i],
                    last_frame=shadow["last_frame"][i],
                )
                reg_total = reg_total + reg_i
            else:
                pmv_i, _ = sparse_adam_level_packed(
                    pmv_i, seg, level_lr, dense_state.step, eps=s.adam_eps,
                )
            new_feats.append(pmv_i)

        if s.continual_reg_on:
            aux["reg_loss"] = reg_total
            aux["total_loss"] = aux["total_loss"] + s.lambda_forget * reg_total

        params = dict(new_dense)
        params["features"] = tuple(new_feats)
        opt_state = OptState(
            m=dict(dense_state.m, features=opt_state.m["features"]),
            v=dict(dense_state.v, features=opt_state.v["features"]),
            step=dense_state.step,
        )
        return (params, opt_state, key), aux

    def body_fused(carry, it):
        """Factorized gradients + explicit scatter-add feeding dense Adam.

        The scatter is written out explicitly (not autodiff-emitted), which
        XLA fuses into the full-table Adam sweep — one bandwidth-bound pass
        per level (experiments/exp_fusion_shapes.py: 2.15 ms vs 8.6 ms for
        the autodiff formulation at 4.2M corners).  Optimizer semantics are
        exactly the reference's dense Adam (utils/tools.py:57-83).
        """
        params, opt_state, key = carry
        # same split structure as body_dense so dense/fused runs with equal
        # seeds draw identical batches (equivalence-testable)
        key, k_idx, k_loss = jax.random.split(key, 3)
        if batch_windows is not None:
            # epoch-window mode: iteration t trains on window t % W of the
            # precomputed shuffle (resume-continuous by construction); the
            # update kernel's row-only prep comes stacked per window
            W = batch_windows["idx"].shape[0]
            wsel = jnp.mod(start_iter + it, W)
            idx = batch_windows["idx"][wsel]
            batch = _gather_batch(pool, idx, s)
            if batch_sharding is not None:
                batch = {
                    k: jax.lax.with_sharding_constraint(v, batch_sharding)
                    for k, v in batch.items()
                }
                idx = jax.lax.with_sharding_constraint(idx, batch_sharding)
        else:
            wsel = None
            batch, idx = sample_batch(k_idx)
        coords = batch["coord"]

        def gather_rows(i, c_i):
            # pallas mode carries the tables packed (R,128): gather whole
            # lane-rows — reshaping to (C,D) and gathering through the view
            # makes XLA materialize a layout copy of the table every
            # iteration (+7 ms/level), and extracting the narrow (B,8,D)
            # rows via take_along_axis costs ~4 ms/level; the lane select
            # instead folds into the interpolation (lanefold, via fac slots)
            if mode == "pallas":
                D_i = feat_shapes[i][1]
                if fuse_tables:
                    # level-local corner rows -> global packed-row space
                    # (roffs[i] packed rows per preceding level)
                    return adam_kernel.gather_lanerows(
                        params["features"],
                        c_i + feat_roffs[i] * (128 // D_i), D_i,
                    )
                return adam_kernel.gather_lanerows(
                    params["features"][i], c_i, D_i
                )
            return params["features"][i][c_i]

        def lookups(c):
            corners, found, G = [], [], []
            for i, level in enumerate(s.levels):
                c_i, f_i = lookup_level(tables[i], c, level)
                # misses -> trashbin row (see _forward_sdf); also matches
                # the precompute_pool_lookups convention so the pre path
                # and live probes produce identical rows
                c_i = jnp.where(f_i[:, None], c_i, feat_shapes[i][0] - 1)
                corners.append(c_i)
                found.append(f_i)
                G.append(gather_rows(i, c_i))
            return corners, found, G

        def lane_slots(corners_l):
            return tuple(
                corners_l[i] % (128 // feat_shapes[i][1])
                for i in range(len(s.levels))
            )

        if pre_lookups is not None:
            # per-chunk precomputed structure: batch lookups are gathers
            corners = [pre_lookups[i][0][idx] for i in range(len(s.levels))]
            found = [pre_lookups[i][1][idx] for i in range(len(s.levels))]
            G_list = [gather_rows(i, c_i) for i, c_i in enumerate(corners)]
        else:
            corners, found, G_list = lookups(coords)
        fac = {"corners": corners, "found": found}
        if mode == "pallas":
            fac["feat_dims"] = tuple(sh[1] for sh in feat_shapes)
            fac["slots"] = lane_slots(corners)
        G_near = ()
        if s.consistency_loss_on:
            k_c1, k_c2 = jax.random.split(jax.random.fold_in(k_loss, 7))
            cnt = min(s.consistency_count, coords.shape[0])
            near_idx = jax.random.randint(k_c1, (cnt,), 0, coords.shape[0])
            shift_scale = s.consistency_range * s.scale
            shift = jax.random.uniform(
                k_c2, (cnt, 3), coords.dtype, -shift_scale, shift_scale
            )
            near_coords = coords[near_idx] + shift
            corners_n, found_n, G_near = lookups(near_coords)
            G_near = tuple(G_near)
            fac.update(
                near_idx=near_idx, near_coords=near_coords,
                near_found=found_n, near_corners=corners_n,
            )
            if mode == "pallas":
                fac["near_slots"] = lane_slots(corners_n)

        dense_params = {k: v for k, v in params.items() if k != "features"}
        (loss, aux), (g_dense, g_G, g_Gn) = jax.value_and_grad(
            _compute_loss_sparse, argnums=(0, 1, 2), has_aux=True
        )(dense_params, G_list, G_near, batch, fac, k_loss, s)

        lr = lr_at_step(
            s.lr, start_iter + it, s.lr_decay_step, s.lr_iters_reduce_ratio
        )

        dense_state = OptState(
            m={k: opt_state.m[k] for k in dense_params},
            v={k: opt_state.v[k] for k in dense_params},
            step=opt_state.step,
        )
        dense_scale = {k: lr_scale_tree[k] for k in dense_params}
        dense_wd = {k: wd_tree[k] for k in dense_params}
        new_dense, dense_state = adam_update(
            dense_params, g_dense, dense_state, lr, dense_scale, dense_wd,
            b1=0.9, b2=0.99, eps=s.adam_eps,
        )

        t = dense_state.step.astype(jnp.float32)
        bc1 = 1.0 - 0.9 ** t
        bc2 = 1.0 - 0.99 ** t
        new_feats, new_m, new_v = [], [], []
        reg_total = jnp.zeros((), jnp.float32)
        if mode == "pallas" and fuse_tables:
            # all levels in ONE kernel dispatch over the concatenated table:
            # per-level lr rides a scalar-prefetched tile->level map
            rows_list, g_list = [], []
            for i in range(len(s.levels)):
                rows = corners[i].reshape(-1)
                g = g_G[i].reshape(-1, 128)
                if s.consistency_loss_on:
                    rows = jnp.concatenate(
                        [rows, fac["near_corners"][i].reshape(-1)])
                    g = jnp.concatenate([g, g_Gn[i].reshape(-1, 128)])
                rows_list.append(rows)
                g_list.append(g)
            lr_scales = tuple(
                s.lr_level_reduce_ratio ** i for i in range(len(s.levels))
            )
            f_n, m_n, v_n = adam_kernel.fused_adam_packed_multi(
                params["features"],
                opt_state.m["features"],
                opt_state.v["features"],
                rows_list, g_list, lr, bc1, bc2, feat_shapes, lr_scales,
                eps=s.adam_eps, use_pallas=use_pallas_kernel,
                n_used=s.n_used,
            )
            params = dict(new_dense)
            params["features"] = f_n
            opt_state = OptState(
                m=dict(dense_state.m, features=m_n),
                v=dict(dense_state.v, features=v_n),
                step=dense_state.step,
            )
            return (params, opt_state, key), aux
        if mode == "pallas":
            for i in range(len(s.levels)):
                C_i, D_i = feat_shapes[i]
                rows = corners[i].reshape(-1)
                # lanefold backward: (B, 8, 128) lane-aligned gradients, fed
                # to the kernel as-is (no narrow extraction, no lane spread)
                g = g_G[i].reshape(-1, 128)
                if s.consistency_loss_on:
                    rows = jnp.concatenate([rows, fac["near_corners"][i].reshape(-1)])
                    g = jnp.concatenate([g, g_Gn[i].reshape(-1, 128)])
                level_lr = lr * (s.lr_level_reduce_ratio ** i)
                pre_i = None
                if batch_windows is not None:
                    pre_i = jax.tree_util.tree_map(
                        lambda a: a[wsel], batch_windows["preps"][i]
                    )
                if batch_sharding is not None:
                    # multi-chip: the pallas custom-call cannot be GSPMD-
                    # partitioned, so the update runs REPLICATED inside a
                    # shard_map island — the batch-sharded entries all-
                    # gather at its boundary.  Narrowing the lane grads to
                    # (M, D) first shrinks the cross-chip payload 16x
                    # (~2.3 MB/level at bs 8192 over ICI); the wrapper's
                    # (or, with windows, the in-island) lane spread
                    # reconstructs the same g128 bit-exactly.
                    g = adam_kernel.lanes_to_narrow(g, D_i)
                    P = jax.sharding.PartitionSpec

                    def upd(p_, m_, v_, rows_, g_, lr_, bc1_, bc2_,
                            C_i=C_i, D_i=D_i, i=i):
                        return adam_kernel.fused_adam_packed(
                            p_, m_, v_, rows_, g_, lr_, bc1_, bc2_,
                            C_i, D_i, eps=s.adam_eps,
                            use_pallas=use_pallas_kernel, lanes=False,
                            n_used=s.n_used[i] if s.n_used else None,
                            grads_bf16=bf16_update,
                        )

                    def upd_win(p_, m_, v_, rows_, g_, lr_, bc1_, bc2_,
                                pre_, C_i=C_i, D_i=D_i, i=i):
                        # re-spread narrow -> lane-aligned (bit-exact
                        # inverse of lanes_to_narrow: one nonzero slot per
                        # entry) so the precomputed lanes EntryPrep applies
                        g128_ = adam_kernel.narrow_to_lanes(g_, rows_, D_i)
                        return adam_kernel.fused_adam_packed(
                            p_, m_, v_, rows_, g128_, lr_, bc1_, bc2_,
                            C_i, D_i, eps=s.adam_eps,
                            use_pallas=use_pallas_kernel, lanes=True,
                            n_used=s.n_used[i] if s.n_used else None,
                            grads_bf16=bf16_update, pre=pre_,
                        )

                    island = upd_win if pre_i is not None else upd
                    extra = (pre_i,) if pre_i is not None else ()
                    f_n, m_n, v_n = jax.shard_map(
                        island, mesh=batch_sharding.mesh,
                        in_specs=P(), out_specs=P(), check_vma=False,
                    )(
                        params["features"][i],
                        opt_state.m["features"][i],
                        opt_state.v["features"][i],
                        rows, g, level_lr, bc1, bc2, *extra,
                    )
                else:
                    f_n, m_n, v_n = adam_kernel.fused_adam_packed(
                        params["features"][i],
                        opt_state.m["features"][i],
                        opt_state.v["features"][i],
                        rows, g, level_lr, bc1, bc2, C_i, D_i,
                        eps=s.adam_eps, use_pallas=use_pallas_kernel,
                        lanes=True,
                        n_used=s.n_used[i] if s.n_used else None,
                        grads_bf16=bf16_update,
                        pre=pre_i,
                    )
                new_feats.append(f_n)
                new_m.append(m_n)
                new_v.append(v_n)
            params = dict(new_dense)
            params["features"] = tuple(new_feats)
            opt_state = OptState(
                m=dict(dense_state.m, features=tuple(new_m)),
                v=dict(dense_state.v, features=tuple(new_v)),
                step=dense_state.step,
            )
            return (params, opt_state, key), aux
        for i in range(len(s.levels)):
            feats_i = params["features"][i]
            gd = jnp.zeros_like(feats_i).at[corners[i]].add(g_G[i])
            if s.consistency_loss_on:
                gd = gd.at[fac["near_corners"][i]].add(g_Gn[i])
            if s.continual_reg_on:
                # batch-touched unique rows' importance penalty, dense form
                # (model/feature_octree.py:246-255); trashbin row excluded
                # like the sparse path's valid mask
                touched = jnp.zeros((feats_i.shape[0],), feats_i.dtype)
                touched = touched.at[corners[i].reshape(-1)].set(1.0)
                touched = touched.at[-1].set(0.0)
                imp = shadow["importance"][i]
                diff = feats_i - shadow["last_frame"][i]
                reg_total = reg_total + jnp.sum(touched[:, None] * imp * diff * diff)
                gd = gd + touched[:, None] * (s.lambda_forget * 2.0) * imp * diff
            m_i = opt_state.m["features"][i]
            v_i = opt_state.v["features"][i]
            m_n = 0.9 * m_i + 0.1 * gd
            v_n = 0.99 * v_i + 0.01 * gd * gd
            level_lr = lr * (s.lr_level_reduce_ratio ** i)
            f_n = feats_i - level_lr * (m_n / bc1) / (jnp.sqrt(v_n / bc2) + s.adam_eps)
            new_feats.append(f_n)
            new_m.append(m_n)
            new_v.append(v_n)

        if s.continual_reg_on:
            aux["reg_loss"] = reg_total
            aux["total_loss"] = aux["total_loss"] + s.lambda_forget * reg_total

        params = dict(new_dense)
        params["features"] = tuple(new_feats)
        opt_state = OptState(
            m=dict(dense_state.m, features=tuple(new_m)),
            v=dict(dense_state.v, features=tuple(new_v)),
            step=dense_state.step,
        )
        return (params, opt_state, key), aux

    def body_winx(carry, it):
        """Fused-window iteration: the batch content, the K-deduplicated
        global gather rows, and the kernel's row prep all come PRECOMPUTED
        per epoch window (precompute_batch_windows_fused) — the iteration
        is one contiguous window slice, ONE (B, L*K) gather from the
        concatenated table, the loss, and ONE multi-level kernel dispatch
        (experiments/exp_r3_winx.py; bit-equal to the per-level window
        path on CPU)."""
        params, opt_state, key = carry
        # same split structure as body_fused so equal seeds draw the same
        # k_loss (k_idx unused: the window IS the batch)
        key, k_idx, k_loss = jax.random.split(key, 3)
        del k_idx
        wx = batch_windows
        split = "rows_hi" in wx
        W = (wx["rows_hi"] if split else wx["rows_kg"]).shape[0]
        wsel = jnp.mod(start_iter + it, W)

        def sl(a):
            return jax.lax.dynamic_index_in_dim(a, wsel, 0, False)

        batch = {k2: sl(v) for k2, v in wx["pool"].items()}
        batch["ts"] = batch.pop("time", None)
        L = len(s.levels)
        # row-sharded routing (precompute_batch_windows_fused(shards=n)):
        # forward gather and kernel run in per-shard islands joined by
        # all-to-alls — no table gather and no entry all-gather anywhere
        rt = wx.get("shard")
        sharded = rt is not None and batch_sharding is not None
        if split:
            Kw = wx["rows_hi"].shape[2] // L
            K_lo_w = wx["rows_lo"].shape[2] // L
            P_samp = wx["rows_hi"].shape[1]
        else:
            Kw = wx["rows_kg"].shape[2] // L
            K_lo_w = Kw
            P_samp = 0
        if not sharded:
            if split:
                rows_hi = sl(wx["rows_hi"])
                rows_lo = sl(wx["rows_lo"])
                rows_flat = jnp.concatenate(
                    [rows_hi.reshape(-1), rows_lo.reshape(-1)])
            else:
                rows_kg = sl(wx["rows_kg"])
                rows_flat = rows_kg.reshape(-1)
            # replicated copy of the entry rows for the update island (the
            # forward copies below may be batch-sharded)
            rows_isl = rows_flat
        fac = {"winx": {
            "K": Kw,
            "split": split,
            "feat_dims": tuple(sh[1] for sh in feat_shapes),
            "kidx": sl(wx["kidx"]).astype(jnp.int32),
            "slots": sl(wx["slots"]).astype(jnp.int32),
            "found": sl(wx["found"]),
        }}
        if batch_sharding is not None:
            # data-parallel: shard the window content + per-sample structure
            # over the batch dim; the gather/forward/backward then partition
            # across chips and the (replicated-table) entry gradients meet
            # the update island below
            def con(a):
                return jax.lax.with_sharding_constraint(a, batch_sharding)

            batch = {k2: (con(v) if v is not None else None)
                     for k2, v in batch.items()}
            if not sharded:
                if split:
                    rows_hi = con(rows_hi)
                    rows_lo = con(rows_lo)
                else:
                    rows_kg = con(rows_kg)
            fac["winx"] = dict(
                fac["winx"],
                kidx=con(fac["winx"]["kidx"]),
                slots=con(fac["winx"]["slots"]),
                found=con(fac["winx"]["found"]),
            )
        pre = (None if sharded
               else jax.tree_util.tree_map(sl, wx["pre"]))

        if sharded:
            # island 1: each table shard gathers the local rows it SERVES
            # (static per window), one all-to-all delivers them to the
            # entries' sample-owners, who assemble their local G with one
            # gather (pad entries -> the appended zero row: their
            # interpolation weights are exactly zero, so contributions
            # match the unsharded spread-row gather bit-for-bit)
            Pspec = jax.sharding.PartitionSpec
            smesh = batch_sharding.mesh
            ax = smesh.axis_names[0]
            n_sh = rt["serve_rows"].shape[1]
            M_hi_loc = (P_samp // n_sh) * L * Kw

            def isl_gather(feats, srv, rinv, wsel_):
                sr = jax.lax.dynamic_index_in_dim(srv, wsel_, 0, False)[0]
                buf = feats[jnp.clip(sr, 0, feats.shape[0] - 1)]
                recv = jax.lax.all_to_all(buf, ax, 0, 0, tiled=True)
                flat = jnp.concatenate(
                    [recv.reshape(-1, 128), jnp.zeros((1, 128), feats.dtype)])
                ri = jax.lax.dynamic_index_in_dim(rinv, wsel_, 0, False)[0]
                Gl = flat[ri]
                if split:
                    return (Gl[:M_hi_loc].reshape(-1, L * Kw, 128),
                            Gl[M_hi_loc:].reshape(-1, L * K_lo_w, 128))
                return Gl.reshape(-1, L * Kw, 128)

            G = jax.shard_map(
                isl_gather, mesh=smesh,
                in_specs=(Pspec(ax), Pspec(None, ax), Pspec(None, ax),
                          Pspec()),
                out_specs=((Pspec(ax), Pspec(ax)) if split else Pspec(ax)),
                check_vma=False,
            )(params["features"], rt["serve_rows"], rt["recv_inv"], wsel)
        elif split:
            # TWO gathers (prefix K rows + tail single rows) — ~3x fewer
            # rows than the plain fused layout (BENCH_NOTES round 4)
            G = (params["features"][rows_hi], params["features"][rows_lo])
        else:
            G = params["features"][rows_kg]  # ONE gather, all levels
        dense_params = {k: v for k, v in params.items() if k != "features"}
        (loss, aux), (g_dense, g_G) = jax.value_and_grad(
            _compute_loss_sparse, argnums=(0, 1), has_aux=True
        )(dense_params, G, (), batch, fac, k_loss, s)
        if not sharded:
            g_entries = (jnp.concatenate([g_G[0].reshape(-1, 128),
                                          g_G[1].reshape(-1, 128)])
                         if split else g_G.reshape(-1, 128))
        if s.continual_reg_on:
            # continual-learning reg folded into the entry gradients
            # (round 5): touched corner lanes are a subset of the window's
            # entry lanes, and each lane has ONE precomputed owner entry
            # (wx["cover"] bitmasks), so the dense reg gradient
            # 2*lambda*imp*(p - last) rides the entries with three row
            # gathers and zero scatters.  Parity: body_fused's dense
            # formulation / model/feature_octree.py:246-255 (touched rows
            # = batch corners, trashbin excluded via found).
            cov = sl(wx["cover"])  # (M,) int32 slot bitmask
            # one decode for all levels is sound: the fused-window
            # precompute REJECTS heterogeneous per-level feature dims
            # ("fused windows need a uniform feature dim"), so every
            # level's PACK — and hence the bit->lane expansion — is D0's
            D0 = feat_shapes[0][1]
            lanegrp = jnp.arange(128, dtype=jnp.int32) // D0
            cov_l = ((cov[:, None] >> lanegrp[None, :]) & 1).astype(
                jnp.float32)
            G_flat = (jnp.concatenate([g.reshape(-1, 128) for g in G])
                      if split else G.reshape(-1, 128)).astype(jnp.float32)
            imp_g = shadow["importance_fused"][rows_flat]
            last_g = shadow["last_fused"][rows_flat]
            diff = G_flat - last_g
            reg = jnp.sum(cov_l * imp_g * diff * diff)
            g_entries = g_entries + cov_l * (
                (2.0 * s.lambda_forget) * imp_g * diff)
            aux["reg_loss"] = reg
            aux["total_loss"] = aux["total_loss"] + s.lambda_forget * reg

        lr = lr_at_step(
            s.lr, start_iter + it, s.lr_decay_step, s.lr_iters_reduce_ratio
        )
        dense_state = OptState(
            m={k: opt_state.m[k] for k in dense_params},
            v={k: opt_state.v[k] for k in dense_params},
            step=opt_state.step,
        )
        dense_scale = {k: lr_scale_tree[k] for k in dense_params}
        dense_wd = {k: wd_tree[k] for k in dense_params}
        new_dense, dense_state = adam_update(
            dense_params, g_dense, dense_state, lr, dense_scale, dense_wd,
            b1=0.9, b2=0.99, eps=s.adam_eps,
        )
        t = dense_state.step.astype(jnp.float32)
        bc1 = 1.0 - 0.9 ** t
        bc2 = 1.0 - 0.99 ** t
        lr_scales = tuple(
            s.lr_level_reduce_ratio ** i for i in range(L)
        )
        # per-step stochastic-rounding seed for bf16 tables
        # (tpu.params_bf16); unused for f32 tables
        sr_seed = (start_iter + it).astype(jnp.int32)
        if sharded:
            # island 2: reverse all-to-all — each sample-owner sends its
            # local entry gradients to the entries' row shards (same slot
            # correspondence as the forward, one gather builds the send
            # buffer), and each shard runs the kernel over ITS R/n tiles
            # only.  Cross-chip payload: the real entries once (bf16 when
            # the kernel rounds them anyway), vs the replicated island's
            # full-entry all-gather to every chip.
            def isl_update(p_, m_, v_, *rest):
                if split:
                    (g_hi_, g_lo_, osel, pres, lvl_, wsel_, lr_, bc1_,
                     bc2_, sd_) = rest
                    parts = [g_hi_.reshape(-1, 128),
                             g_lo_.reshape(-1, 128)]
                else:
                    (g_hi_, osel, pres, lvl_, wsel_, lr_, bc1_, bc2_,
                     sd_) = rest
                    parts = [g_hi_.reshape(-1, 128)]
                g_flat = jnp.concatenate(
                    parts + [jnp.zeros((1, 128), jnp.float32)])
                os_ = jax.lax.dynamic_index_in_dim(osel, wsel_, 0, False)[0]
                send = g_flat[os_]  # (n, E, 128)
                if bf16_update:
                    send = send.astype(jnp.bfloat16)
                recv = jax.lax.all_to_all(send, ax, 0, 0, tiled=True)
                g_sh = recv.reshape(-1, 128).astype(jnp.float32)
                pre_ = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, wsel_, 0, False)[0], pres)
                # decorrelate each shard's stochastic-rounding stream
                sd_loc = sd_ + jax.lax.axis_index(ax).astype(
                    jnp.int32) * jnp.int32(7919)
                return adam_kernel.fused_adam_packed_shard(
                    p_, m_, v_, g_sh, pre_,
                    jax.lax.squeeze(lvl_, (0,)), lr_, bc1_, bc2_,
                    feat_shapes, lr_scales, n_sh, eps=s.adam_eps,
                    use_pallas=use_pallas_kernel, grads_bf16=bf16_update,
                    sr_seed=sd_loc)

            g_args = (g_G[0], g_G[1]) if split else (g_G,)
            f_n, m_n, v_n = jax.shard_map(
                isl_update, mesh=smesh,
                in_specs=(Pspec(ax),) * 3 + (Pspec(ax),) * len(g_args)
                + (Pspec(None, ax), Pspec(None, ax), Pspec(ax),
                   Pspec(), Pspec(), Pspec(), Pspec(), Pspec()),
                out_specs=(Pspec(ax),) * 3, check_vma=False,
            )(
                params["features"], opt_state.m["features"],
                opt_state.v["features"], *g_args, rt["owner_sel"],
                rt["pre"], rt["lvl"], wsel, lr, bc1, bc2, sr_seed,
            )
        elif batch_sharding is not None:
            # multi-chip: the pallas custom-call cannot be GSPMD-
            # partitioned, so the update runs REPLICATED inside a shard_map
            # island; the batch-sharded entry gradients all-gather at its
            # boundary.  winx entries may carry several corner slots per
            # 128-lane row, so the per-level path's 16x lanes_to_narrow
            # narrowing does not apply — instead the cross-chip payload is
            # halved by shipping bf16 entries whenever the kernel rounds
            # them to bf16 anyway (grads_bf16), keeping the update
            # bit-identical to the single-chip bf16 path.
            if bf16_update:
                g_entries = g_entries.astype(jnp.bfloat16)
            P = jax.sharding.PartitionSpec

            def upd_winx(p_, m_, v_, g_, rows_, pre_, lr_, bc1_, bc2_, sd_):
                return adam_kernel.fused_adam_packed_multi_pre(
                    p_, m_, v_, g_.astype(jnp.float32), rows_, pre_,
                    lr_, bc1_, bc2_, feat_shapes, lr_scales,
                    eps=s.adam_eps, use_pallas=use_pallas_kernel,
                    n_used=s.n_used, grads_bf16=bf16_update, sr_seed=sd_,
                )

            f_n, m_n, v_n = jax.shard_map(
                upd_winx, mesh=batch_sharding.mesh,
                in_specs=P(), out_specs=P(), check_vma=False,
            )(
                params["features"], opt_state.m["features"],
                opt_state.v["features"], g_entries, rows_isl,
                pre, lr, bc1, bc2, sr_seed,
            )
        else:
            f_n, m_n, v_n = adam_kernel.fused_adam_packed_multi_pre(
                params["features"],
                opt_state.m["features"],
                opt_state.v["features"],
                g_entries, rows_flat, pre,
                lr, bc1, bc2, feat_shapes, lr_scales, eps=s.adam_eps,
                use_pallas=use_pallas_kernel, n_used=s.n_used,
                grads_bf16=bf16_update,
                sr_seed=sr_seed,
            )
        params = dict(new_dense)
        params["features"] = f_n
        opt_state = OptState(
            m=dict(dense_state.m, features=m_n),
            v=dict(dense_state.v, features=v_n),
            step=dense_state.step,
        )
        return (params, opt_state, key), aux

    winx = batch_windows is not None and (
        "rows_kg" in batch_windows or "rows_hi" in batch_windows)
    if winx:
        body = body_winx
    elif mode in ("fused", "pallas"):
        body = body_fused
    elif mode == "sparse":
        body = body_sparse
    else:
        body = body_dense

    (params, opt_state, _), aux_hist = jax.lax.scan(
        body, (params, opt_state, key), jnp.arange(n_iters)
    )
    if mode == "sparse":  # split [p|m|v] back apart
        packed = params["features"]
        Ds = [sh[1] for sh in feat_shapes]
        params = dict(
            params, features=tuple(p[:, :d] for p, d in zip(packed, Ds))
        )
        opt_state = OptState(
            m=dict(opt_state.m,
                   features=tuple(p[:, d:2 * d] for p, d in zip(packed, Ds))),
            v=dict(opt_state.v,
                   features=tuple(p[:, 2 * d:] for p, d in zip(packed, Ds))),
            step=opt_state.step,
        )
    aux_mean = jax.tree_util.tree_map(lambda a: jnp.mean(a), aux_hist)
    aux_last = jax.tree_util.tree_map(lambda a: a[-1], aux_hist)
    return params, opt_state, {"mean": aux_mean, "last": aux_last}


@functools.partial(jax.jit, static_argnames=("levels", "capacities"))
def precompute_pool_lookups(tables, pool_coord, levels, capacities):
    """Resolve corner ids + found masks for EVERY pool sample.

    The hash structure is frozen for as long as the map does not grow and
    the uploaded pool does not rotate — for a batch-mode run that is the
    entire training — so the per-iteration probe-window lookups
    (~106 ns/point/level, latency-bound) collapse into (bs, 8) int32
    gathers from these arrays (measured 5.70 -> 4.46 ms/iter at the bench
    configuration; experiments/exp_iter_ablation.py ``pk_lf_pre``).
    Misses are forced to the trashbin row for a uniform convention (their
    gradients are zero either way).

    Returns a tuple per level of (corners (N, 8) int32, found (N,) bool);
    pass as ``train_chunk(..., pre_lookups=...)``.  The caller owns
    invalidation on structure growth / pool rotation.
    """
    npool = pool_coord.shape[0]
    CH = min(65536, npool)
    # the chunked map needs npool % CH == 0; pad with zeros (the padded
    # rows' lookups are discarded below) — capacities are user-settable
    # and need not be multiples of 2^16
    pad = (-npool) % CH
    coords_p = (
        jnp.concatenate(
            [pool_coord, jnp.zeros((pad, 3), pool_coord.dtype)]
        ) if pad else pool_coord
    )

    def level_pre(i, level):
        C_i = capacities[i]

        def f(c):
            corners, fnd = lookup_level(tables[i], c, level)
            return jnp.where(fnd[:, None], corners, C_i - 1), fnd

        cs = coords_p.reshape(-1, CH, 3)
        corners, fnd = jax.lax.map(f, cs)
        return corners.reshape(-1, 8)[:npool], fnd.reshape(-1)[:npool]

    return tuple(level_pre(i, lvl) for i, lvl in enumerate(levels))


@functools.partial(
    jax.jit, static_argnames=("n_valid", "settings", "feat_shapes")
)
def precompute_batch_windows(pre_lookups, n_valid: int, key, settings,
                             feat_shapes):
    """Epoch-style batch windows with the update kernel's row-only prep
    hoisted out of the iteration.

    One fixed shuffle of the ``n_valid`` pool samples is cut into
    ``bs``-sized windows; iteration ``t`` trains on window ``t % W``.
    The shuffle tail (n_valid mod bs samples) is folded into one extra
    window padded by wrapping to the shuffle's start, so EVERY pool
    sample trains each epoch.  Because each window's sample set is
    frozen, the pallas
    update's gradient-independent work — trash spreading, the entry
    argsort by packed row, and the per-tile gradient-window offsets
    (:func:`adam_kernel.entry_prep_lanes`) — is computed here ONCE per
    window instead of every iteration.

    Sampling-semantics delta vs the reference's iid randint batches:
    without-replacement epochs of one fixed permutation (standard epoch
    training; per-batch loss/optimizer math unchanged).  Opt-in via
    ``tpu.batch_windows``.

    Memory: ~(3 x M x 4 B + Mpad x 4 B) per window per level (~0.6 MB at
    bs 8192) — ~450 MB for a 2M-sample pool at ICRA scale.

    Returns {"idx": (W, bs) int32, "preps": per-level stacked EntryPrep};
    pass as ``train_chunk(..., batch_windows=...)``.  The caller owns
    invalidation: recompute whenever ``pre_lookups`` is recomputed (map
    growth / pool rotation).
    """
    s = settings
    # every sample trains each epoch: the shuffle tail gets its own window
    # padded by wrapping to the shuffle's start (ceil division)
    W = max(-(int(n_valid) // -s.bs), 1)
    perm = jax.random.permutation(key, n_valid)
    if W * s.bs > n_valid:
        reps = -((W * s.bs) // -n_valid)
        perm = jnp.tile(perm, reps)
    win_idx = perm[: W * s.bs].reshape(W, s.bs).astype(jnp.int32)
    if s.sort_batch:
        win_idx = jnp.sort(win_idx, axis=1)

    def level_windows(i):
        C_i, D_i = feat_shapes[i]
        corners_pool = pre_lookups[i][0]
        n_used_i = s.n_used[i] if s.n_used else None

        def one(idxw):
            rows = corners_pool[idxw].reshape(-1)
            return adam_kernel.entry_prep_lanes(rows, C_i, D_i, n_used_i)

        return jax.lax.map(one, win_idx)

    preps = tuple(level_windows(i) for i in range(len(s.levels)))
    return {"idx": win_idx, "preps": preps}


def estimate_windows_bytes(n_valid: int, settings, feat_shapes, dev_pool,
                           fused: bool = True, K: int = 4,
                           shards: int = 0) -> int:
    """Host-side estimate (bytes) of the device memory a window precompute
    will hold for the whole run — the driver's OOM guard: window stacks
    compete with the map tables and the pool for HBM, and the fused layout
    duplicates the pool CONTENT into (W, bs, ...) stacks.

    Accounts for (per window, summed over W = ceil(n_valid / bs)):

    * fused: the stacked batch content (every stacked pool field's
      per-sample bytes), rows_kg (L*K int32), kidx/slots (L*8 int8 each),
      found (L bool), and the global EntryPrep over M = bs*L*K entries
      (order int32 + trash bool + padded prow int32 + per-tile offsets).
    * per-level: idx (int32) plus L stacked EntryPreps over M = bs*8
      entries each.

    Slightly conservative (pads Mpad ~ 1.1x, ignores allocator rounding the
    other way).  ``K`` defaults to the worst common case; pass the real
    bucketed value when known.
    """
    s = settings
    L = len(s.levels)
    bs = s.bs
    W = max(-(int(n_valid) // -bs), 1)
    fields = ("coord", "sdf_label", "weight", "time", "normal_label",
              "origin", "sem_label")
    per_sample_content = 0
    for f in fields:
        a = dev_pool.get(f) if dev_pool is not None else None
        if a is not None:
            per_sample_content += int(
                a.dtype.itemsize * int(np.prod(a.shape[1:], dtype=np.int64))
            )
    prep_per_entry = 4 + 1 + 4 * 1.1  # order + trash + padded prow
    if fused:
        M = bs * L * K
        per_window = (
            bs * (per_sample_content + L * (K * 4 + 8 + 8 + 1))
            + M * prep_per_entry
        )
        if shards:
            # routed layout (shards=n): serve_rows + owner_sel (n*n*E
            # int32 each, E pow2 of the worst cell — modeled at ~2x the
            # mean real-entry share), recv_inv (n*M_loc), and n per-shard
            # EntryPreps over n*E entries.  Together ~3x the per-entry
            # prep term; TOTAL bytes — after parallel.mesh.
            # place_routed_windows the per-DEVICE residency is ~1/n of it
            per_window += 3.0 * M * prep_per_entry
    else:
        M = bs * 8
        per_window = bs * 4 + L * M * prep_per_entry
    return int(W * per_window)


def max_unique_prows(pre_lookups, feat_dims) -> int:
    """Max number of DISTINCT packed (R, 128) rows the 8 corners of any
    pool sample touch at any level.  Growth allocates a node's corners
    contiguously, so this is small (bench world: max 4 of 8) — it sets the
    static K of the fused-gather window mode."""
    @jax.jit
    def _m(pre):
        outs = []
        for i, (c, _) in enumerate(pre):
            pr = jnp.sort(c // (128 // feat_dims[i]), axis=1)
            nf = jnp.concatenate(
                [jnp.ones((c.shape[0], 1), bool), pr[:, 1:] != pr[:, :-1]],
                axis=1)
            outs.append(jnp.max(jnp.sum(nf, axis=1)))
        return jnp.max(jnp.stack(outs))

    return int(_m(pre_lookups))


@functools.partial(jax.jit, static_argnames=("feat_dims",))
def _pool_max_nuniq(pre_lookups, feat_dims):
    """(N,) int32 — per pool sample, the MAX over levels of the number of
    distinct packed rows its 8 corners touch (1..8).  Drives the split-K
    window layout's K_lo selection: corners shared between neighboring
    nodes make a node's rows irreducibly fragmented on found-dominated
    pools (street world: mean ~3, p99 7 — renumbering cannot fix it, both
    Morton and node-major orders measure the same ~3), while miss samples
    and sparse pools are single-row; the split sorts the heavy tail into a
    static prefix so everyone else gathers fewer rows."""
    mx = None
    for i, (c, _) in enumerate(pre_lookups):
        pr = jnp.sort(c // (128 // feat_dims[i]), axis=1)
        nun = 1 + jnp.sum(pr[:, 1:] != pr[:, :-1], axis=1)
        mx = nun if mx is None else jnp.maximum(mx, nun)
    return mx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cands",))
def _max_over_klo(nun_w, cands):
    """(len(cands),) int32 — per K_lo candidate, the worst window's count
    of samples needing more than K_lo rows (drives the split-K prefix)."""
    return jnp.stack(
        [jnp.max(jnp.sum(nun_w > c, axis=1)) for c in cands])


def choose_split_k(n_hi_all, cands, bs: int, K: int):
    """(K_lo, P) minimizing the per-level entry count M = P*K + (bs-P)*K_lo.

    ``n_hi_all[j]``: the WORST window's count of samples needing more than
    ``cands[j]`` rows (a static shape — every window shares one layout).
    P is the pow2 prefix covering that count, capped at bs/2 (the tail
    must stay the common case); the winner must cut M by >= 1/8 vs the
    plain fused layout (bs*K) to pay for the dual interpolation path.
    Returns (K, 0) — no split — when no candidate qualifies."""
    K_lo, P = K, 0
    best_m = bs * K - (bs * K) // 8
    for cand, n_hi_max in zip(cands, n_hi_all):
        Pc = 8
        while Pc < int(n_hi_max):
            Pc *= 2
        Mc = Pc * K + (bs - Pc) * cand
        if Pc <= bs // 2 and Mc < best_m:
            K_lo, P, best_m = cand, Pc, Mc
    return K_lo, P


def _route_shard_windows(rows_all, zero_all, feat_shapes, settings,
                         n_shards: int, split: bool, P: int, K: int,
                         K_lo: int):
    """Static per-window entry ROUTING for the row-sharded update (round 5).

    The epoch windows are frozen, so which chip owns each entry's gradient
    (its sample's batch shard) and which chip owns its destination row
    (its packed row's table shard) are both known at precompute time.
    This builds, per window:

    * ``serve_rows`` (n, n, E) int32 — for table-shard d serving sample-
      owner s: the LOCAL rows shard d gathers for s's entries (-1 pads);
      drives the forward's per-shard gather + all-to-all.
    * ``owner_sel`` (n, n, E) int32 — for owner s sending to shard d: the
      LOCAL entry indices whose gradients ride that all-to-all slot
      (M_loc = the appended zero-row slot for pads); the backward send
      buffer is one gather.
    * ``recv_inv`` (n, M_loc) int32 — owner s's local entry i sits at flat
      position dst*E + rank of its forward receive buffer (n*E = the
      appended zero row for pad entries).
    * ``pre`` — per-(window, shard) :func:`adam_kernel.entry_prep_local`
      over the n*E receive-order entries (pads spread over local rows).

    Only REAL entries route (pads/misses carry exactly-zero gradients by
    construction — shipping them would re-create the all-gather this
    design removes); E is the pow2 max real-entry count over every
    (window, owner, shard) cell.  Per-chip cost of the resulting island:
    gather(M/n) + 2 x all-to-all(M/n bytes) + kern(M/n entries over R/n
    tiles) — every term O(1/n), which is what kills the replicated
    island's Amdahl fraction (BENCH_NOTES round-4 projection).
    """
    s = settings
    L = len(s.levels)
    bs = s.bs
    n = n_shards
    Rs = [C * d // 128 for C, d in feat_shapes]
    R_tot = sum(Rs)
    if R_tot % n:
        raise ValueError(f"R_tot {R_tot} not divisible by {n} shards")
    R_loc = R_tot // n
    if split:
        if P % n or (bs - P) % n:
            raise ValueError(
                f"split prefix P={P} / tail {bs - P} not divisible by {n}")
        M_hi, M_lo = P * L * K, (bs - P) * L * K_lo
        M_hi_loc = (P // n) * L * K
        M_loc = M_hi_loc + ((bs - P) // n) * L * K_lo
        e_hi = np.arange(M_hi, dtype=np.int64)
        s_hi = e_hi // (L * K)
        own_hi = s_hi // (P // n)
        loc_hi = (s_hi % (P // n)) * (L * K) + e_hi % (L * K)
        e_lo = np.arange(M_lo, dtype=np.int64)
        s_lo = e_lo // (L * K_lo)
        own_lo = s_lo // ((bs - P) // n)
        loc_lo = (M_hi_loc + (s_lo % ((bs - P) // n)) * (L * K_lo)
                  + e_lo % (L * K_lo))
        owner_of = np.concatenate([own_hi, own_lo])
        local_of = np.concatenate([loc_hi, loc_lo])
    else:
        if bs % n:
            raise ValueError(f"bs {bs} not divisible by {n} shards")
        M_all = bs * L * K
        M_loc = (bs // n) * L * K
        e = np.arange(M_all, dtype=np.int64)
        samp = e // (L * K)
        owner_of = samp // (bs // n)
        local_of = (samp % (bs // n)) * (L * K) + e % (L * K)
    owner_of = jnp.asarray(owner_of, jnp.int32)
    local_of = jnp.asarray(local_of, jnp.int32)
    M = int(rows_all.shape[1])
    assert M == owner_of.shape[0], (M, owner_of.shape)

    @jax.jit
    def counts(rows_w, zero_w):
        def one(args):
            rows, zero = args
            dst = rows // R_loc
            cell = jnp.where(zero, n * n, owner_of * n + dst)
            return jnp.zeros((n * n + 1,), jnp.int32).at[cell].add(1)[:n * n]

        return jnp.max(jax.lax.map(one, (rows_w, zero_w)))

    cmax = max(int(counts(rows_all, zero_all)), 1)
    # E pads every (owner, shard) slot block to the worst cell across ALL
    # windows.  pow2 rounding costs up to 2x extra on top of that; above
    # 256 round to 256-lane multiples instead (the padding then costs
    # <= 256/cmax) — E is one static value per precompute either way, so
    # executable diversity is unchanged within a run
    E = 8
    while E < cmax and E < 256:
        E *= 2
    if cmax > 256:
        E = ((cmax + 255) // 256) * 256
    M_sh = n * E
    _, tb, w, T, lvl_np = adam_kernel.shard_geometry(feat_shapes, n, M_sh)
    spread = jnp.asarray(
        (np.arange(M_sh, dtype=np.int64) * max(R_loc - 1, 1)) // M_sh,
        jnp.int32)
    arangeM = jnp.arange(M, dtype=jnp.int32)

    def route_one(args):
        rows, zero = args
        dst = (rows // R_loc).astype(jnp.int32)
        cell = jnp.where(zero, n * n, owner_of * n + dst)
        ordi = jnp.argsort(cell)
        hints = dict(unique_indices=True, mode="promise_in_bounds")
        cs = cell.at[ordi].get(**hints)
        isnew = jnp.concatenate(
            [jnp.ones((1,), bool), cs[1:] != cs[:-1]])
        start = jax.lax.cummax(jnp.where(isnew, arangeM, 0))
        rank = arangeM - start
        valid = cs < n * n
        slot = jnp.where(valid, cs * E + rank, n * n * E)
        rows_s = rows.at[ordi].get(**hints) % R_loc
        sv = jnp.full((n * n * E + 1,), -1, jnp.int32)
        sv = sv.at[slot].set(rows_s.astype(jnp.int32))
        serve = sv[:-1].reshape(n, n, E).transpose(1, 0, 2)  # (dst, owner, E)
        ov = jnp.full((n * n * E + 1,), M_loc, jnp.int32)
        ov = ov.at[slot].set(local_of.at[ordi].get(**hints))
        owner_sel = ov[:-1].reshape(n, n, E)  # (owner, dst, E)
        tgt = jnp.where(
            valid,
            owner_of.at[ordi].get(**hints) * M_loc
            + local_of.at[ordi].get(**hints),
            n * M_loc,
        )
        ri = jnp.full((n * M_loc + 1,), M_sh, jnp.int32)
        ri = ri.at[tgt].set(((cs % n) * E + rank).astype(jnp.int32))
        recv_inv = ri[:-1].reshape(n, M_loc)

        def prep_shard(serve_d):
            rows_d = serve_d.reshape(-1)
            trash_d = rows_d < 0
            rows_f = jnp.where(trash_d, spread, rows_d)
            return adam_kernel.entry_prep_local(rows_f, trash_d, R_loc, tb, w)

        pre = jax.vmap(prep_shard)(serve)
        return {"serve_rows": serve, "owner_sel": owner_sel,
                "recv_inv": recv_inv, "pre": pre}

    @jax.jit
    def route_all(rows_w, zero_w):
        return jax.lax.map(route_one, (rows_w, zero_w))

    out = route_all(rows_all, zero_all)
    out["lvl"] = jnp.asarray(lvl_np)
    return out


def precompute_batch_windows_fused(pre_lookups, dev_pool, n_valid: int, key,
                                   settings, feat_shapes,
                                   w_bucket: bool = False,
                                   split_k: bool = False,
                                   shards: int = 0,
                                   reg_cover: bool = False):
    """Epoch windows in the fused-gather, K-deduplicated layout (the
    fastest single-chip path — experiments/exp_r3_winx.py).

    Same sampling semantics as :func:`precompute_batch_windows` (identical
    permutation given the same key), but the per-window precompute goes
    further, exploiting two round-3 measurements: TPU gathers are
    row-count-bound (~10-16 ns/row regardless of row width), and a node's
    8 corners almost always share ONE packed row.  Per window this stores:

    * the batch CONTENT itself (pool fields pre-gathered into (W, bs, ...)
      stacks — per-iteration sampling becomes a contiguous dynamic slice),
    * ``rows_kg`` (bs, L*K): the K distinct packed rows per sample per
      level, as GLOBAL rows into the levels' concatenated (R_tot, 128)
      table — the forward is ONE gather of B*L*K rows (~half of B*L*8),
    * ``kidx``/``slots`` (bs, L*8) int8: each corner's gathered-row index
      and lane slot (drives :func:`_feat_winx`),
    * ``pre``: the global :func:`adam_kernel.entry_prep_multi` row prep —
      the update is ONE :func:`adam_kernel.fused_adam_packed_multi_pre`
      kernel dispatch over all levels.

    Memory: ~230 B/sample (on par with the per-level windows prep, whose
    pre_lookups it can replace).  Data-parallel runs are supported with
    REPLICATED tables: the forward shards over the batch dim and the
    update island all-gathers the (bs, L*K, 128) entry gradients at its
    boundary (bf16 when the kernel rounds them anyway — winx entries may
    carry several corner slots per packed row, so the per-level path's
    16x lane narrowing does not apply).  Pass the result as
    ``train_chunk(..., batch_windows=...)``; invalidation contract is the
    same (recompute on growth / pool rotation).

    ``w_bucket``: round the window count W up to a power of two by tiling
    the permutation (wrapping duplicates, like the tail window) — the
    incremental driver's pool grows every frame, so an exact W would re-jit
    this precompute AND the training scan per frame; bucketing bounds the
    executable count to O(log pool) per capacity level.

    ``split_k``: the round-4 split-K layout.  Each window's samples are
    stably reordered so the few whose max-over-levels distinct-row count
    exceeds an auto-chosen K_lo occupy a static pow2 prefix of P slots;
    the prefix gathers K rows per level (``rows_hi`` (P, L*K)) and the
    tail K_lo (``rows_lo`` (bs-P, L*K_lo)) — cutting the forward gather
    and the kernel's entry count.  (K_lo, P) minimize the per-level entry
    count M = P*K + (bs-P)*K_lo over pow2 candidates, with P capped at
    bs/2 and a required >= 1/8 cut vs the plain layout: miss-heavy pools
    (the bench world: 97% of samples single-row) land at K_lo = 1 with a
    tiny prefix (~3x fewer rows, measured 3.23 -> 2.13 ms/iter);
    found-dominated pools (street/city worlds: corner sharing makes node
    rows irreducibly ~3-wide) land at K_lo = K/2 with a larger prefix
    (-25% M).  Window membership and the epoch permutation are unchanged
    (the loss is order-invariant within a batch up to f32 reassociation
    of the mean).  Falls back to the plain fused layout when no split
    cuts M by >= 1/8 under the prefix cap.

    ``reg_cover``: also store per-window ``cover`` (M,) int32 slot
    bitmasks — for every corner lane the window touches, its FIRST
    covering entry owns it; body_winx folds the continual-learning reg
    gradient 2*lambda*imp*(p - last) onto exactly the owned lanes (no
    double counting, no scatters).  Required when train_chunk runs with
    ``continual_reg_on`` and fused windows.

    ``shards``: >0 additionally precomputes the ROW-SHARDED update
    routing (:func:`_route_shard_windows`) under key ``"shard"``: with
    row-sharded tables and ``batch_sharding`` over the same n-device
    mesh, train_chunk then runs the forward gather and the kernel inside
    per-shard islands connected by all-to-alls — each chip gathers,
    reorders, matmuls, and sweeps only its R/n rows, which is the path
    that scales the flagship past the replicated island's ~2x Amdahl
    ceiling.  Requires R_tot, bs (and the split prefix) divisible by
    ``shards`` — check :func:`shard_windows_ok` first.
    """
    s = settings
    L = len(s.levels)
    feat_dims = tuple(sh[1] for sh in feat_shapes)
    if len(set(feat_dims)) != 1:
        # _feat_winx's lane grouping and the fused table's packed-row
        # arithmetic assume one feature dim across levels (always true for
        # reference configs — one cfg.feature_dim)
        raise ValueError(f"fused windows need a uniform feature dim, got "
                         f"{feat_dims}")
    # K: static, bucketed to a power of two to bound executable count as
    # the map grows (incremental use); 8 = no dedup, degrades gracefully
    k_raw = max_unique_prows(pre_lookups, feat_dims)
    K = 2
    while K < k_raw:
        K *= 2

    W = max(-(int(n_valid) // -s.bs), 1)
    if w_bucket:
        Wb = 1
        while Wb < W:
            Wb *= 2
        W = Wb
    perm = jax.random.permutation(key, n_valid)
    if W * s.bs > n_valid:
        reps = -((W * s.bs) // -n_valid)
        perm = jnp.tile(perm, reps)
    win_idx = perm[: W * s.bs].reshape(W, s.bs).astype(jnp.int32)
    if s.sort_batch:
        # same window contents as precompute_batch_windows under
        # sort_batch (order-invariant loss; keeps the two layouts'
        # batches identical for equivalence tests)
        win_idx = jnp.sort(win_idx, axis=1)

    import time as _time

    _tw = os.environ.get("SHINE_TIME_WINDOWS", "0") == "1"

    def _stamp(tag, t0):
        if _tw:
            print(f"[windows] {tag}: {_time.perf_counter() - t0:.2f}s",
                  flush=True)
        return _time.perf_counter()

    _t = _time.perf_counter()
    P, K_lo = 0, K
    if split_k:
        # K_lo: the tail gathers K_lo rows per level instead of K; the
        # prefix (sized by the WORST window, a static shape) gathers K.
        # Found-dominated pools (street/city worlds) land at K_lo = K/2
        # (corner sharing makes node rows irreducibly ~3-wide, see
        # _pool_max_nuniq); miss-heavy pools land at K_lo = 1.
        nun = _pool_max_nuniq(pre_lookups, feat_dims)
        _t = _stamp("pool_max_nuniq", _t)
        nun_w = nun[win_idx]  # (W, bs)
        cands = tuple(1 << j for j in range(K.bit_length()) if (1 << j) < K)
        # all candidates' worst-window prefix sizes in ONE dispatch + ONE
        # readback (each eager per-candidate reduction costs a tunnel
        # round trip); choose_split_k picks the entry-minimizing (K_lo, P)
        n_hi_all = np.asarray(_max_over_klo(nun_w, cands)) if cands else []
        K_lo, P = choose_split_k(n_hi_all, cands, s.bs, K)
        if P > 0 and shards:
            # sharded mode splits the prefix over chips: bump the pow2
            # prefix to at least one sample per shard (n | P, n | bs ->
            # n | bs - P; entry-count cost of the bump is negligible)
            P = max(P, shards)
        _t = _stamp("k_lo_candidates", _t)
        if P == 0:
            # no candidate cuts entries enough: use the plain fused layout
            split_k = False
            K_lo = K
        else:
            # stable: keeps each segment in the existing window order (and
            # so sorted when sort_batch is on)
            order = jnp.argsort(nun_w <= K_lo, axis=1, stable=True)
            win_idx = jnp.take_along_axis(win_idx, order, axis=1)
            if _tw:
                win_idx.block_until_ready()
            _t = _stamp("reorder", _t)
    M_entries = ((P * K + (s.bs - P) * K_lo) * L if split_k
                 else s.bs * L * K)
    Rs, Rus, roffs, _tb, _w, _rm, _lv = adam_kernel._multi_geometry(
        feat_shapes, M_entries, s.n_used)

    stack_fields = [
        f for f in ("coord", "sdf_label", "weight", "time", "normal_label",
                    "origin", "sem_label")
        if f in dev_pool and dev_pool[f] is not None
    ]

    # pre_lookups / dev_pool MUST enter the jit as ARGUMENTS: closing over
    # them embeds hundreds of MB of constants in the HLO, which the remote
    # compile service rejects (HTTP 413) and which defeats compile caching
    def prep_window(idx, pre_lu, pool_stack):
        out = {"pool": {f: pool_stack[f][idx] for f in stack_fields}}
        bs = s.bs
        rows_kg, kidx_all, slots_all, found_all, zero_all = [], [], [], [], []
        rows_hi, rows_lo, zero_hi, zero_lo, split_ok = [], [], [], [], []
        cover = (jnp.zeros((M_entries,), jnp.int32) if reg_cover else None)
        for i in range(L):
            PACK = 128 // feat_dims[i]
            corners = pre_lu[i][0][idx]
            found = pre_lu[i][1][idx]
            prow8 = (corners // PACK).astype(jnp.int32)
            slots8 = (corners % PACK).astype(jnp.int8)
            # sort-free first-occurrence dedup over the 8 corners (O(8^2)
            # elementwise beats per-sample argsort + scatters on TPU):
            # kidx[b,c] = rank of corner c's row among the sample's
            # first occurrences, in corner order
            eq = prow8[:, :, None] == prow8[:, None, :]        # (bs,8,8)
            first = jnp.argmax(eq, axis=2).astype(jnp.int32)   # min c' equal
            carange = jnp.arange(8, dtype=jnp.int32)
            is_first = first == carange[None, :]
            rank_at_first = jnp.cumsum(is_first, axis=1) - 1   # (bs,8)
            kidx8 = jnp.take_along_axis(rank_at_first, first, axis=1)
            kidx = kidx8.astype(jnp.int8)
            nuniq = jnp.sum(is_first, axis=1)
            if reg_cover:
                # reg cover: each touched (row, slot) corner lane gets ONE
                # owner entry (its first covering corner in window order);
                # body_winx folds the reg gradient onto owned lanes only
                keyc = jnp.where(
                    found[:, None],
                    prow8 * PACK + slots8.astype(jnp.int32), -1)
                flatk = keyc.reshape(-1)
                orderc = jnp.argsort(flatk)
                ks = flatk[orderc]
                firstc = jnp.concatenate(
                    [jnp.ones((1,), bool), ks[1:] != ks[:-1]]) & (ks >= 0)
                own = jnp.zeros((bs * 8,), bool).at[orderc].set(
                    firstc).reshape(bs, 8)
                samp = jnp.arange(bs, dtype=jnp.int32)[:, None]
                if split_k:
                    eid = jnp.where(
                        samp < P,
                        samp * (L * K) + i * K + kidx8,
                        P * L * K + (samp - P) * (L * K_lo)
                        + i * K_lo + kidx8)
                    k_cap = jnp.where(samp < P, K, K_lo)
                else:
                    eid = samp * (L * K) + i * K + kidx8
                    k_cap = K
                bits = jnp.where(
                    own & found[:, None] & (kidx8 < k_cap),
                    jnp.left_shift(jnp.int32(1), slots8.astype(jnp.int32)),
                    0)
                cover = cover.at[eid.reshape(-1)].add(bits.reshape(-1))
            onek = (kidx8[:, :, None]
                    == jnp.arange(K, dtype=jnp.int32)[None, None, :])
            rows_k = jnp.sum(
                jnp.where(onek & is_first[:, :, None],
                          prow8[:, :, None], 0),
                axis=1,
            )
            valid_k = (jnp.arange(K)[None, :] < nuniq[:, None]) & found[:, None]
            # pad/miss entries: zero grads, rows spread EVENLY over the
            # level's whole used head (a modulo spread leaves them bunched
            # in the first bs*K rows and overflows those tiles' windows —
            # bench: 186 tiles at >2w entries, forcing the XLA fallback).
            # All inputs are static, so the spread is computed HOST-SIDE in
            # int64 and embedded as an int32 constant: every in-graph int32
            # formulation overflows somewhere (flat * (Rus-1) directly; the
            # old quotient/remainder split in its flat * r term once
            # bs*K > ~46341 — exactly the bs 32768 configuration, where the
            # negative rows failed entry_prep_multi's coverage check and
            # silently ran the XLA fallback every iteration)
            if split_k:
                # split-K: entries per level = P*K (prefix) + (bs-P)*K_lo
                # (tail, <= K_lo distinct rows by construction of the
                # reorder); one even pad spread covers the combined set
                M_l = P * K + (bs - P) * K_lo
                spread = jnp.asarray(
                    (np.arange(M_l, dtype=np.int64) * max(Rus[i] - 1, 1))
                    // M_l,
                    dtype=jnp.int32,
                )
                sp_hi = spread[: P * K].reshape(P, K)
                sp_lo = spread[P * K:].reshape(bs - P, K_lo)
                vh, vl = valid_k[:P], valid_k[P:, :K_lo]
                rows_hi.append(
                    jnp.where(vh, rows_k[:P], sp_hi) + int(roffs[i]))
                rows_lo.append(
                    jnp.where(vl, rows_k[P:, :K_lo], sp_lo) + int(roffs[i]))
                zero_hi.append(~vh)
                zero_lo.append(~vl)
                # the tail MUST fit K_lo rows (the reorder guarantees it);
                # a violation would silently drop corner gradients
                split_ok.append(jnp.all(nuniq[P:] <= K_lo))
            else:
                spread = jnp.asarray(
                    (np.arange(bs * K, dtype=np.int64) * max(Rus[i] - 1, 1))
                    // (bs * K),
                    dtype=jnp.int32,
                ).reshape(bs, K)
                rows_g = jnp.where(valid_k, rows_k, spread) + int(roffs[i])
                rows_kg.append(rows_g)
                zero_all.append(~valid_k)
            kidx_all.append(kidx)
            slots_all.append(slots8)
            found_all.append(found)
        out["kidx"] = jnp.concatenate(kidx_all, axis=1)
        out["slots"] = jnp.concatenate(slots_all, axis=1)
        out["found"] = jnp.stack(found_all, axis=1)
        if reg_cover:
            out["cover"] = cover
        if split_k:
            out["rows_hi"] = jnp.concatenate(rows_hi, axis=1)
            out["rows_lo"] = jnp.concatenate(rows_lo, axis=1)
            out["split_ok"] = jnp.all(jnp.stack(split_ok))
            prow = jnp.concatenate([out["rows_hi"].reshape(-1),
                                    out["rows_lo"].reshape(-1)])
            zero_mask = jnp.concatenate(
                [jnp.concatenate(zero_hi, axis=1).reshape(-1),
                 jnp.concatenate(zero_lo, axis=1).reshape(-1)])
        else:
            out["rows_kg"] = jnp.concatenate(rows_kg, axis=1)
            prow = out["rows_kg"].reshape(-1)
            zero_mask = jnp.concatenate(zero_all, axis=1).reshape(-1)
        out["pre"] = adam_kernel.entry_prep_multi(
            prow, zero_mask, feat_shapes, s.n_used)
        if shards:
            # kept for the routing pass below (popped before returning)
            out["_rows"] = prow.astype(jnp.int32)
            out["_zero"] = zero_mask
        return out

    @jax.jit
    def prep_all(win_idx, pre_lu, pool_stack):
        return jax.lax.map(
            lambda idx: prep_window(idx, pre_lu, pool_stack), win_idx
        )

    out = prep_all(
        win_idx, pre_lookups, {f: dev_pool[f] for f in stack_fields}
    )
    out["idx"] = win_idx
    if shards:
        rows_all = out.pop("_rows")
        zero_all = out.pop("_zero")
        out["shard"] = _route_shard_windows(
            rows_all, zero_all, feat_shapes, s, shards, split_k, P, K,
            K_lo if split_k else K)
    return out


def pool_to_device(pool, capacity: int, settings: TrainSettings, subset=None):
    """Pad the host pool to static ``capacity`` and upload.

    Returns (device pool dict, n_valid scalar).  Ray pools keep the
    ray-major layout; ray_depth is per-ray (n/ray_sample_count entries).

    ``subset``: optional host index array — upload only those samples (the
    rotating sub-pool path for datasets larger than the device budget).
    """
    if subset is not None:
        pool = _subset_pool(pool, subset)
    n = len(pool)

    def pad(a, cap):
        if a is None:
            return None
        out_shape = (cap,) + a.shape[1:]
        out = np.zeros(out_shape, a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(out)

    dev = {
        "coord": pad(pool.coord, capacity),
        "sdf_label": pad(pool.sdf_label, capacity),
        "weight": pad(pool.weight, capacity),
        "time": pad(pool.time, capacity),
    }
    if settings.ray_loss:
        dev["sample_depth"] = pad(pool.sample_depth, capacity)
        dev["ray_depth"] = pad(pool.ray_depth, capacity // settings.ray_sample_count)
    if settings.normal_loss_on and pool.normal_label is not None:
        dev["normal_label"] = pad(pool.normal_label, capacity)
    if settings.proj_correction_on:
        dev["origin"] = pad(pool.origin, capacity)
    if settings.semantic_on and pool.sem_label is not None:
        dev["sem_label"] = pad(pool.sem_label, capacity)
    return dev, jnp.int32(n)


def _subset_pool(pool, idx):
    """Select a host-side sample subset (keeps ray-major blocks intact when
    ``idx`` is ray-aligned; point mode needs no alignment)."""
    import copy as _copy

    sub = _copy.copy(pool)
    for f in ("coord", "sdf_label", "normal_label", "sem_label", "weight",
              "sample_depth", "origin", "time"):
        a = getattr(pool, f)
        if a is not None and a.shape[0] == len(pool):
            setattr(sub, f, a[idx])
    return sub


def empty_shadow(features) -> Dict[str, Any]:
    """Placeholder shadow tables when continual learning is off."""
    zero = tuple(jnp.zeros((1, f.shape[1]), f.dtype) for f in features)
    return {"importance": zero, "last_frame": zero}
