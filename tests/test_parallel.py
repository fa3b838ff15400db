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
def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry_test", "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


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
