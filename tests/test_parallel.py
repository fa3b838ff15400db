"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state
from tests.test_trainer import make_sphere_pool, default_cfg, build


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    pool, surf = make_sphere_pool(2000)
    cfg = default_cfg(bs=1024)
    grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(0)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    # single-device run
    p1, o1, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings, 5,
    )

    # 8-device data-parallel run
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    p_sh = jax.device_put(copy(params), repl)
    o_sh = jax.device_put(init_opt_state(params), repl)
    pool_sh = jax.device_put(dev_pool, repl)
    tables_sh = jax.device_put(tuple(grid.tables), repl)
    shadow_sh = jax.device_put(shadow, repl)
    p8, o8, aux8 = trainer.train_chunk(
        p_sh, o_sh, tables_sh, pool_sh, shadow_sh,
        jax.device_put(n_valid, repl), jnp.int32(0), key, settings, 5,
        batch_sharding=batch_sh,
    )

    # same PRNG stream + same math => same losses and params up to
    # reduction-order float noise (sharded segment-sums reassociate adds,
    # then Adam's rsqrt amplifies ulp-level diffs over the 5 steps)
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)
    ):
        a, b = np.asarray(a), np.asarray(b)
        mismatch = np.mean(np.abs(a - b) > 2e-4)
        assert mismatch < 0.01, f"{mismatch:.4f} of elements diverged"
        np.testing.assert_allclose(a, b, atol=5e-2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_row_sharded_layout_survives_capacity_doublings():
    """Giant-map layout through the DRIVER code path
    (parallel.mesh.place_training_state(table_sharding='rows')): gradients
    flowing through the cross-shard gathers match the replicated run, and
    the layout stays correct across >= 2 feature-table capacity doublings
    (growth -> re-place -> train)."""
    from shine_mapping_tpu.cli.common import pad_opt_state_features
    from shine_mapping_tpu.parallel import mesh as pmesh
    from shine_mapping_tpu.train.optimizer import OptState

    pool, surf = make_sphere_pool(1200, radius=0.35)
    cfg = default_cfg(bs=512)
    from shine_mapping_tpu.ops.hashgrid import HashGridHost

    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=cfg.seed,
        init_node_capacity=1 << 9,
        init_corner_capacity=1 << 9,  # tiny: growth forces doublings
    )
    grid.update(surf)
    settings = trainer.TrainSettings.from_config(cfg, grid.levels, sigma_sigmoid=0.05)
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    opt_state = init_opt_state(params)
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 13, settings)

    dp_mesh = pmesh.make_data_mesh(8)
    batch_sh = pmesh.batch_sharded(dp_mesh)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p_repl, o_repl = copy(params), init_opt_state(params)
    p_rows, o_rows = copy(params), init_opt_state(params)
    caps = [grid.host_levels[0].corner_capacity]
    rng = np.random.default_rng(11)

    for rnd in range(3):
        shadow = trainer.empty_shadow(p_repl["features"])
        key = jax.random.PRNGKey(rnd)
        tables = tuple(grid.tables)
        p_repl, o_repl, aux_r = trainer.train_chunk(
            p_repl, o_repl, tables, dev_pool, shadow,
            n_valid, jnp.int32(0), key, settings, 2,
        )
        pr, orr, tb, pl, sh = pmesh.place_training_state(
            dp_mesh, p_rows, o_rows, tables, dev_pool, shadow,
            table_sharding="rows",
        )
        pr, orr, aux_s = trainer.train_chunk(
            pr, orr, tb, pl, sh, n_valid, jnp.int32(0), key, settings, 2,
            batch_sharding=batch_sh,
        )
        np.testing.assert_allclose(
            float(aux_r["mean"]["total_loss"]), float(aux_s["mean"]["total_loss"]),
            rtol=1e-4,
        )
        for a, b in zip(p_repl["features"], pr["features"]):
            a, b = np.asarray(a), np.asarray(b)
            assert np.mean(np.abs(a - b) > 2e-4) < 0.01
        p_rows = copy(jax.tree_util.tree_map(np.asarray, pr))
        o_rows = OptState(
            m=copy(jax.tree_util.tree_map(np.asarray, orr.m)),
            v=copy(jax.tree_util.tree_map(np.asarray, orr.v)),
            step=jnp.asarray(np.asarray(orr.step)),
        )

        # grow the map with a new region -> capacity may double
        extra = rng.standard_normal((1500, 3))
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        extra *= 0.55 + 0.12 * rnd
        grid.features = list(p_repl["features"])
        grid.update(extra)
        caps.append(grid.host_levels[0].corner_capacity)
        new_feats = tuple(grid.features)
        p_repl = dict(p_repl, features=new_feats)
        o_repl = pad_opt_state_features(o_repl, p_repl)
        # rows copy must track the same grown features
        p_rows = dict(p_rows, features=tuple(jnp.asarray(np.asarray(f)) for f in new_feats))
        o_rows = pad_opt_state_features(o_rows, p_rows)

    assert caps[-1] >= 4 * caps[0], f"expected >=2 doublings, got {caps}"
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry_test", "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pallas_mode_sharded_matches_single_device():
    """feature_update='pallas' composes with the data-parallel mesh: the
    kernel update runs replicated inside a shard_map island fed by narrow
    all-gathered entries (trainer body_fused), and must track the
    single-device pallas run like the fused path does."""
    pool, surf = make_sphere_pool(1500, seed=13)
    cfg = default_cfg(bs=1024)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas", ekional_loss_on=True
    )
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(2)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p1, o1, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings, 5,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    p8, o8, aux8 = trainer.train_chunk(
        jax.device_put(copy(params), repl),
        jax.device_put(init_opt_state(params), repl),
        jax.device_put(tuple(grid.tables), repl),
        jax.device_put(dev_pool, repl),
        jax.device_put(shadow, repl),
        jax.device_put(n_valid, repl), jnp.int32(0), key, settings, 5,
        batch_sharding=batch_sh,
    )
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)
    ):
        a, b = np.asarray(a), np.asarray(b)
        mismatch = np.mean(np.abs(a - b) > 2e-4)
        assert mismatch < 0.01, f"{mismatch:.4f} of elements diverged"
        np.testing.assert_allclose(a, b, atol=5e-2)
    # the trashbin row stays exactly zero through the sharded update
    for f in p8["features"]:
        assert np.all(np.asarray(f[-1]) == 0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("layout", ["replicated", "rows"])
def test_sparse_mode_sharded_matches_single_device(layout):
    """feature_update='sparse' (lazy touched-rows Adam — the compact-
    gradient multi-chip path, BENCH_NOTES round-2 plan #4) under data
    parallelism: the global segment-sum + unique-row scatter is GSPMD-
    partitioned (the all-gathered payload is the ~B*8-entry segment list,
    not a dense grad table) and must track the single-device sparse run —
    for replicated AND row-sharded (giant-map) tables."""
    from shine_mapping_tpu.parallel import mesh as pmesh

    pool, surf = make_sphere_pool(1500, seed=17)
    cfg = default_cfg(bs=1024)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="sparse"
    )
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(4)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p1, o1, aux1 = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings, 5,
    )

    dp_mesh = pmesh.make_data_mesh(8)
    p_sh, o_sh, tables_sh, pool_sh, shadow_sh = pmesh.place_training_state(
        dp_mesh, copy(params), init_opt_state(params), tuple(grid.tables),
        dev_pool, shadow, table_sharding=layout,
    )
    p8, o8, aux8 = trainer.train_chunk(
        p_sh, o_sh, tables_sh, pool_sh, shadow_sh,
        n_valid, jnp.int32(0), key, settings, 5,
        batch_sharding=pmesh.batch_sharded(dp_mesh),
    )
    np.testing.assert_allclose(
        float(aux1["mean"]["total_loss"]), float(aux8["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(p1["features"], p8["features"]):
        a, b = np.asarray(a), np.asarray(b)
        mismatch = np.mean(np.abs(a - b) > 2e-4)
        assert mismatch < 0.01, f"{mismatch:.4f} of elements diverged"
        np.testing.assert_allclose(a, b, atol=5e-2)
        # lazy Adam must keep the trashbin row exactly zero
        assert np.all(b[-1] == 0)
    # moments agree too (lazy-Adam state is part of the contract)
    for a, b in zip(o1.m["features"], o8.m["features"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


def test_graft_entry_compiles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry_test2", "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >1 virtual device")
def test_pallas_update_rejects_row_sharded_tables():
    """feature_update 'pallas' + table_sharding 'rows' would all-gather the
    giant tables into the replicated kernel island every iteration — the
    trainer must reject the combination with a clear message."""
    from shine_mapping_tpu.parallel import mesh as pmesh
    from tests.test_trainer import build, default_cfg, make_sphere_pool

    pool, surf = make_sphere_pool(800, seed=3)
    cfg = default_cfg(bs=256)
    grid, settings, params, opt_state, dev_pool, n_valid = build(
        cfg, pool, surf, feature_update="pallas"
    )
    dp_mesh = pmesh.make_data_mesh(2)
    shadow = trainer.empty_shadow(params["features"])
    params, opt_state, tables, dev_pool, shadow = pmesh.place_training_state(
        dp_mesh, params, opt_state, tuple(grid.tables), dev_pool, shadow,
        table_sharding="rows",
    )
    with pytest.raises(ValueError, match="replicated feature tables"):
        trainer.train_chunk(
            params, opt_state, tables, dev_pool, shadow,
            n_valid, jnp.int32(0), jax.random.PRNGKey(0), settings, 2,
            batch_sharding=pmesh.batch_sharded(dp_mesh),
        )
