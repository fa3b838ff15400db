"""End-to-end trainer tests on a synthetic sphere world (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.ops.hashgrid import HashGridHost
from shine_mapping_tpu.ops.query import query_feature
from shine_mapping_tpu.models import decoder
from shine_mapping_tpu.data.dataset import SamplePool
from shine_mapping_tpu.train import trainer, importance
from shine_mapping_tpu.train.optimizer import init_opt_state


def make_sphere_pool(n_rays=4000, seed=0, radius=0.5):
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_rays, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    disp = rng.uniform(-0.04, 0.04, (n_rays, 1))
    surf = dirs * (radius + disp)
    free = dirs * rng.uniform(0.2, 0.45, (n_rays, 1))
    coord = np.concatenate([surf, free]).astype(np.float32)
    sdf = np.concatenate(
        [disp[:, 0], np.linalg.norm(free, axis=1) - radius]
    ).astype(np.float32)
    weight = np.concatenate([np.ones(n_rays), -np.ones(n_rays)]).astype(np.float32)
    pool = SamplePool(
        coord=coord,
        sdf_label=sdf,
        weight=weight,
        sample_depth=np.zeros_like(sdf),
        ray_depth=np.zeros(n_rays, np.float32),
        origin=np.zeros((coord.shape[0], 3), np.float32),
        time=np.zeros(coord.shape[0], np.float32),
    )
    return pool, surf


def default_cfg(**kw):
    cfg = SHINEConfig()
    cfg.tree_level_world = 5
    cfg.tree_level_feat = 3
    cfg.leaf_vox_size = 0.5
    cfg.bs = 1024
    cfg.lr = 0.01
    for k, v in kw.items():
        setattr(cfg, k, v)
    cfg.derive()
    # scale math not needed for the synthetic [-1,1] world:
    cfg.scale = 1.0
    return cfg


def build(cfg, pool, surf, seed=0, **settings_overrides):
    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=cfg.seed,
        init_node_capacity=1 << 12,
        init_corner_capacity=1 << 12,
    )
    grid.update(surf)
    settings = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, **settings_overrides
    )
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(seed))
    opt_state = init_opt_state(params)
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 14, settings)
    return grid, settings, params, opt_state, dev_pool, n_valid


def run_chunks(grid, settings, params, opt_state, dev_pool, n_valid, iters=300, chunk=100):
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(1)
    aux = None
    for start in range(0, iters, chunk):
        key, k = jax.random.split(key)
        params, opt_state, aux = trainer.train_chunk(
            params, opt_state, tuple(grid.tables), dev_pool, shadow,
            n_valid, jnp.int32(start), k, settings, chunk,
        )
    return params, opt_state, aux


def test_bce_training_learns_sphere():
    pool, surf = make_sphere_pool()
    cfg = default_cfg()
    grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    params, _, aux = run_chunks(grid, settings, params, opt_state, dev_pool, n_valid)
    assert float(aux["mean"]["total_loss"]) < 0.45

    # learned field: logit ordering across the surface along many rays
    rng = np.random.default_rng(9)
    dirs = rng.standard_normal((300, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    def pred_at(r):
        pts = jnp.asarray((dirs * r).astype(np.float32))
        f = query_feature(pts, grid.tables, list(params["features"]), grid.levels, True)
        return np.asarray(decoder.sdf(params["geo"], f))

    front, back = pred_at(0.46), pred_at(0.54)
    assert (back > front).mean() > 0.95


def test_l1_and_l2_losses_run():
    pool, surf = make_sphere_pool(1000)
    for lt in ("sdf_l1", "sdf_l2"):
        cfg = default_cfg(main_loss_type=lt)
        grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
        params, _, aux = run_chunks(
            grid, settings, params, opt_state, dev_pool, n_valid, iters=50, chunk=50
        )
        assert np.isfinite(float(aux["mean"]["total_loss"]))


def test_eikonal_loss_training():
    pool, surf = make_sphere_pool(1500)
    cfg = default_cfg(ekional_loss_on=True, weight_e=0.1)
    grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    params, _, aux = run_chunks(
        grid, settings, params, opt_state, dev_pool, n_valid, iters=100, chunk=50
    )
    assert np.isfinite(float(aux["mean"]["eikonal_loss"]))
    assert float(aux["mean"]["total_loss"]) < 1.5


def test_continual_reg_penalizes_drift():
    pool, surf = make_sphere_pool(1500)
    cfg = default_cfg()
    grid, settings0, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    # first frame training
    params, opt_state, _ = run_chunks(
        grid, settings0, params, opt_state, dev_pool, n_valid, iters=100, chunk=50
    )
    # snapshot as "last frame", give uniform importance
    # snapshot must COPY: params is donated to train_chunk, so aliasing the
    # same buffers in shadow would be a use-after-donate
    shadow = {
        "importance": tuple(jnp.ones_like(f) for f in params["features"]),
        "last_frame": tuple(jnp.array(f, copy=True) for f in params["features"]),
    }
    settings_reg = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05,
        continual_reg_on=True, lambda_forget=1e5, loss_reduction="sum",
    )
    def params_copy():
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)

    p2, o2, aux = trainer.train_chunk(
        params_copy(), init_opt_state(params), tuple(grid.tables), dev_pool, shadow,
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings_reg, 50,
    )
    assert float(aux["mean"]["reg_loss"]) >= 0
    # with huge lambda, features should barely move
    drift = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(p2["features"], params["features"])
    )
    settings_noreg = trainer.TrainSettings.from_config(
        cfg, grid.levels, sigma_sigmoid=0.05, loss_reduction="sum",
    )
    p3, _, _ = trainer.train_chunk(
        params_copy(), init_opt_state(params), tuple(grid.tables), dev_pool,
        trainer.empty_shadow(params["features"]),
        n_valid, jnp.int32(0), jax.random.PRNGKey(2), settings_noreg, 50,
    )
    drift_noreg = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(p3["features"], params["features"])
    )
    assert drift < drift_noreg


def test_freeze_decoder():
    pool, surf = make_sphere_pool(1000)
    cfg = default_cfg()
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, freeze_decoder=True
    )
    import copy
    geo_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), params["geo"])
    params, _, _ = run_chunks(
        grid, settings, params, opt_state, dev_pool, n_valid, iters=50, chunk=50
    )
    for k in geo_before:
        np.testing.assert_array_equal(np.asarray(params["geo"][k]), geo_before[k])
    # features still trained
    assert not grid.is_empty()


def make_ray_pool(n_rays=512, a_n=7, seed=11):
    """Ray-major pool for dr-mode tests: (pool, surface points, cfg kw)."""
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_rays, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radius = 0.5
    # samples along each ray, ray-major
    ratios = np.sort(rng.uniform(0.3, 1.1, (n_rays, a_n)), axis=1)
    coords = (dirs[:, None, :] * (ratios * radius)[:, :, None]).reshape(-1, 3)
    depths = (ratios * radius).reshape(-1)
    pool = SamplePool(
        coord=coords.astype(np.float32),
        sdf_label=np.zeros(n_rays * a_n, np.float32),
        weight=np.ones(n_rays * a_n, np.float32),
        sample_depth=depths.astype(np.float32),
        ray_depth=np.full(n_rays, radius, np.float32),
        origin=np.zeros((n_rays * a_n, 3), np.float32),
        time=np.zeros(n_rays * a_n, np.float32),
    )
    kw = dict(surface_sample_n=5, free_sample_n=2, clearance_sample_n=0)
    return pool, (dirs * radius), kw


def test_ray_rendering_loss_training():
    n_rays, a_n = 512, 7
    pool, _, _ = make_ray_pool(n_rays, a_n)
    dirs = pool.coord.reshape(n_rays, a_n, 3)[:, -1, :]
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radius = 0.5
    cfg = default_cfg(ray_loss=True, main_loss_type="dr", bs=128)
    cfg.surface_sample_n, cfg.free_sample_n, cfg.clearance_sample_n = 5, 2, 0
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, dirs * radius
    )
    assert settings.ray_sample_count == a_n
    params, _, aux = run_chunks(
        grid, settings, params, opt_state, dev_pool, n_valid, iters=60, chunk=30
    )
    assert np.isfinite(float(aux["mean"]["total_loss"]))


def test_importance_accumulation():
    pool, surf = make_sphere_pool(800)
    cfg = default_cfg()
    grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    params, _, _ = run_chunks(
        grid, settings, params, opt_state, dev_pool, n_valid, iters=50, chunk=50
    )
    grid.features = list(params["features"])
    importance.cal_feature_importance(
        grid, params["geo"], pool.coord, pool.sdf_label,
        sigma=0.05, bs=512, down_rate=2, loss_reduction="sum",
    )
    imp0 = np.asarray(grid.importance_weight[0])
    assert np.any(imp0 > 0)
    assert np.all(imp0[-1] == 0)  # trashbin row zero
    assert np.all(imp0 >= 0)
