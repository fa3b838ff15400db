"""Config YAML round-trips, logger, and sharded-table correctness."""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.config import SHINEConfig


def test_all_shipped_configs_load():
    paths = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "config", "*", "*.yaml")))
    assert len(paths) >= 14
    for p in paths:
        cfg = SHINEConfig().load(p)
        assert cfg.scale > 0
        assert cfg.mc_query_level == cfg.tree_level_world - cfg.tree_level_feat + 1
        assert cfg.infer_bs == cfg.bs * 16


def test_tpu_section_typo_rejected_and_num_workers_wired(tmp_path):
    """The tpu: section is first-party, so a typoed perf knob must fail
    loudly instead of silently benching the default; num_workers drives
    the pipelined data phase and must come through from YAML."""
    import yaml

    base = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "config", "maicity", "*batch*.yaml")))[0]
    args = yaml.safe_load(open(base))

    args["setting"]["num_workers"] = 3
    args["tpu"] = {"feature_update": "pallas"}
    ok = tmp_path / "ok.yaml"
    yaml.safe_dump(args, open(ok, "w"))
    cfg = SHINEConfig().load(str(ok))
    assert cfg.num_workers == 3
    assert cfg.feature_update == "pallas"

    args["tpu"] = {"feature_updat": "pallas"}
    bad = tmp_path / "bad.yaml"
    yaml.safe_dump(args, open(bad, "w"))
    with pytest.raises(ValueError, match="feature_updat"):
        SHINEConfig().load(str(bad))


def test_world_scale_matches_reference_formula():
    cfg = SHINEConfig()
    cfg.leaf_vox_size = 0.2
    cfg.tree_level_world = 12
    cfg.calculate_world_scale()
    # utils/config.py:372-374: world_size = leaf * 2^(levels-1)
    assert cfg.world_size == 0.2 * 2 ** 11
    assert cfg.scale == 1.0 / cfg.world_size


def test_metrics_logger_jsonl(tmp_path):
    from shine_mapping_tpu.utils.metrics_logger import MetricsLogger

    lg = MetricsLogger(str(tmp_path), wandb_on=False)
    lg.log({"iter": 1, "loss/total_loss": 0.5})
    lg.log({"iter": 2, "loss/total_loss": jnp.float32(0.25)})
    lg.close()
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss/total_loss"] == 0.5
    assert recs[1]["loss/total_loss"] == 0.25


def test_phase_timer():
    from shine_mapping_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a", sync=jnp.ones(4)):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_row_sharded_feature_tables_train():
    """Giant-map layout: feature tables row-sharded over the data axis.

    Correctness-only check on the CPU mesh: the jitted step compiles and
    matches the replicated run (XLA inserts the cross-chip gathers /
    reduce-scatters for the sharded tables automatically).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state
    from tests.test_trainer import make_sphere_pool, default_cfg, build

    pool, surf = make_sphere_pool(1500)
    cfg = default_cfg(bs=1024)
    grid, settings, params, opt_state, dev_pool, n_valid = build(cfg, pool, surf)
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(0)

    def copy(p):
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), p)

    p_ref, _, aux_ref = trainer.train_chunk(
        copy(params), init_opt_state(params), tuple(grid.tables), dev_pool,
        shadow, n_valid, jnp.int32(0), key, settings, 3,
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data", None))
    p_sh = copy(params)
    p_sh["features"] = tuple(jax.device_put(f, rows) for f in p_sh["features"])
    o_sh = init_opt_state(p_sh)
    tables_sh = tuple(
        type(t)(
            keys=jax.device_put(t.keys, NamedSharding(mesh, P("data", None))),
            corner_idx=jax.device_put(t.corner_idx, rows),
        )
        for t in grid.tables
    )
    pool_sh = jax.device_put(dev_pool, repl)
    p2, _, aux2 = trainer.train_chunk(
        p_sh, o_sh, tables_sh, pool_sh, jax.device_put(shadow, repl),
        jax.device_put(n_valid, repl), jnp.int32(0), key, settings, 3,
        batch_sharding=NamedSharding(mesh, P("data")),
    )
    np.testing.assert_allclose(
        float(aux_ref["mean"]["total_loss"]), float(aux2["mean"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(p_ref["features"], p2["features"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.mean(np.abs(a - b) > 2e-4) < 0.01
