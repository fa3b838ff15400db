"""Smoke matrix: train_chunk compiles and stays finite under flag combos."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state
from tests.test_trainer import make_sphere_pool, default_cfg, build

COMBOS = [
    dict(time_conditioned=True),
    dict(loss_weight_on=True),
    dict(main_loss_type="sdf_l1", ekional_loss_on=True),
    dict(main_loss_type="sdf_l2", normal_loss_on=False),
    dict(proj_correction_on=True, normal_loss_on=False),
    dict(ekional_loss_on=True, proj_correction_on=True),
    dict(opt_adam=False),  # SGD fallback (dense path)
    dict(feature_update="dense", consistency_loss_on=True),
    dict(consistency_loss_on=True),  # fused path: off-batch near lookups
    dict(feature_update="sparse", consistency_loss_on=True),  # dense fallback
    dict(lr_iters_reduce_ratio=0.5, lr_decay_step=(2,)),
    dict(feature_update="pallas", consistency_loss_on=True),
    dict(feature_update="pallas", fuse_update_levels=True),
    dict(feature_update="pallas", sort_batch=True, _n_used=True),
    dict(feature_update="pallas", _moments_bf16=True, _n_used=True),
    # epoch-window sampling x bf16 update x used-rows sweep
    dict(feature_update="pallas", _moments_bf16=True, _n_used=True,
         _batch_windows=True),
    # fused-gather window layout (winx) x bf16 x used-rows; and with
    # eikonal (coordinate gradients through _feat_winx)
    dict(feature_update="pallas", _moments_bf16=True, _n_used=True,
         _batch_windows=True, _windows_fused=True),
    dict(feature_update="pallas", ekional_loss_on=True, _n_used=True,
         _batch_windows=True, _windows_fused=True),
    # winx + semantic head; and the full production stack (bf16 tables)
    dict(feature_update="pallas", semantic_on=True, _n_used=True,
         _batch_windows=True, _windows_fused=True),
    dict(feature_update="pallas", _moments_bf16=True, _n_used=True,
         _batch_windows=True, _windows_fused=True, _params_bf16=True),
    # ray (rendering) loss through the pallas update path
    dict(feature_update="pallas", _ray=True),
    # time conditioning and projective-label correction through winx
    dict(feature_update="pallas", time_conditioned=True, _n_used=True,
         _batch_windows=True, _windows_fused=True),
    dict(feature_update="pallas", proj_correction_on=True, _n_used=True,
         _batch_windows=True, _windows_fused=True),
    # measured-normal supervision through winx (pool carries normals)
    dict(feature_update="pallas", normal_loss_on=True, weight_n=0.01,
         _normals=True, _n_used=True, _batch_windows=True,
         _windows_fused=True),
]


@pytest.mark.parametrize("combo", COMBOS, ids=[str(sorted(c)) for c in COMBOS])
def test_flag_combo_trains_finite(combo):
    import dataclasses

    combo = dict(combo)
    moments_bf16 = combo.pop("_moments_bf16", False)
    with_n_used = combo.pop("_n_used", False)
    with_windows = combo.pop("_batch_windows", False)
    windows_fused = combo.pop("_windows_fused", False)
    params_bf16 = combo.pop("_params_bf16", False)
    ray = combo.pop("_ray", False)
    with_normals = combo.pop("_normals", False)
    if ray:
        # ray-major pool: reuse the trainer test's dr-mode construction
        from tests.test_trainer import make_ray_pool

        pool, surf, ray_cfg_kw = make_ray_pool()
        combo.update(ray_loss=True, main_loss_type="dr")
    else:
        ray_cfg_kw = {}
    pool, surf = (pool, surf) if ray else make_sphere_pool(800, seed=13)
    if with_normals:
        import numpy as _np

        # unit sphere: the outward direction IS the surface normal
        n = pool.coord / _np.maximum(
            _np.linalg.norm(pool.coord, axis=1, keepdims=True), 1e-9)
        pool.normal_label = n.astype(_np.float32)
    if combo.get("semantic_on"):
        import numpy as _np

        pool.sem_label = _np.random.default_rng(1).integers(
            0, 20, pool.coord.shape[0]).astype(_np.int32)
    cfg = default_cfg(bs=128 if ray else 512, **ray_cfg_kw)
    if combo.get("time_conditioned"):
        cfg.time_conditioned = True
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, **combo
    )
    if with_n_used:
        settings = dataclasses.replace(
            settings, n_used=trainer.used_rows_for(grid))
    if params_bf16:
        params = dict(params, features=tuple(
            f.astype(jnp.bfloat16) for f in params["features"]))
    if moments_bf16:
        opt_state = init_opt_state(params, moments_bf16=True)
    pre_lookups = batch_windows = None
    if with_windows:
        caps = tuple(f.shape[0] for f in params["features"])
        pre_lookups = trainer.precompute_pool_lookups(
            tuple(grid.tables), dev_pool["coord"], tuple(grid.levels), caps
        )
        feat_shapes = tuple(tuple(f.shape) for f in params["features"])
        if windows_fused:
            batch_windows = trainer.precompute_batch_windows_fused(
                pre_lookups, dev_pool, int(n_valid), jax.random.PRNGKey(3),
                settings, feat_shapes,
            )
            pre_lookups = None  # winx needs no per-iteration lookups
        else:
            batch_windows = trainer.precompute_batch_windows(
                pre_lookups, int(n_valid), jax.random.PRNGKey(3), settings,
                feat_shapes,
            )
    shadow = trainer.empty_shadow(params["features"])
    params, opt_state, aux = trainer.train_chunk(
        params, opt_state, tuple(grid.tables), dev_pool, shadow,
        n_valid, jnp.int32(0), jax.random.PRNGKey(0), settings, 3,
        pre_lookups=pre_lookups, batch_windows=batch_windows,
    )
    assert np.isfinite(float(aux["mean"]["total_loss"])), combo
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.all(np.isfinite(np.asarray(leaf))), combo


def test_moments_bf16_gated_on_resolved_mode():
    """cfg.moments_bf16 with a config that resolves AWAY from pallas
    (continual-reg) must not produce a bf16 carry — the incre driver's
    gate uses the resolved mode, not the requested one."""
    pool, surf = make_sphere_pool(400, seed=17)
    cfg = default_cfg(bs=256)
    grid, settings, params, _, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", continual_reg_on=True,
    )
    assert trainer.resolve_feature_update(
        settings, tuple(tuple(f.shape) for f in params["features"])
    ) != "pallas"
    # pallas without blockers resolves to pallas
    settings2 = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, feature_update="pallas",
    )
    assert trainer.resolve_feature_update(
        settings2, tuple(tuple(f.shape) for f in params["features"])
    ) == "pallas"
