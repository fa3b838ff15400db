"""Ablate the REAL train_chunk (pallas mode) by monkeypatching pieces.

Variants (distinct n_iters force fresh jit traces):
  full       : unmodified pallas-mode train_chunk
  no_update  : fused_adam_packed -> identity (no kernel, no prep)
  no_gather  : gather_rows_packed -> broadcast zeros (keeps the rest)
  no_lookup  : lookup_level -> constant corners/found
  fused_ref  : feature_update='fused' for comparison

  timeout 1800 python experiments/exp_trainer_ablate.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.data.dataset import SamplePool
from shine_mapping_tpu.ops.hashgrid import HashGridHost
from shine_mapping_tpu.ops import hashgrid, adam_kernel
from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    cfg = SHINEConfig()
    cfg.tree_level_world = 12
    cfg.tree_level_feat = 3
    cfg.leaf_vox_size = 0.2
    cfg.bs = 8192
    cfg.lr = 0.01
    cfg.derive()

    rng = np.random.default_rng(0)
    n_surf = 400_000
    xy = rng.uniform(-0.9, 0.9, (n_surf, 2))
    z = 0.08 * np.sin(4 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    band = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    band = band + rng.normal(0, 0.003, band.shape)

    grid = HashGridHost(
        max_level=12, featured_level_num=3, feature_dim=8, feature_std=0.05,
        seed=0, init_node_capacity=1 << 19, init_corner_capacity=1 << 19,
    )
    grid.update(band)

    n_pool = 2_000_000
    coord = np.repeat(band, 5, axis=0)[:n_pool].astype(np.float32)
    coord += rng.normal(0, 0.01, coord.shape).astype(np.float32)
    pool = SamplePool(
        coord=coord,
        sdf_label=rng.normal(0, 0.01, n_pool).astype(np.float32),
        weight=np.where(rng.random(n_pool) < 0.7, 1.0, -1.0).astype(np.float32),
        sample_depth=np.zeros(n_pool, np.float32),
        ray_depth=np.zeros(n_pool // 7 + 1, np.float32),
        origin=np.zeros((n_pool, 3), np.float32),
        time=np.zeros(n_pool, np.float32),
    )
    s0 = trainer.TrainSettings.from_config(cfg, grid.levels)
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 21, s0)
    tables = tuple(grid.tables)

    orig_fused_adam = adam_kernel.fused_adam_packed
    orig_gather = adam_kernel.gather_rows_packed
    orig_lookup = trainer.lookup_level

    def run(mode, n_iters, label, patch=None):
        settings = trainer.TrainSettings.from_config(
            cfg, grid.levels, feature_update=mode
        )
        params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        opt_state = init_opt_state(params)
        shadow = trainer.empty_shadow(params["features"])
        key = jax.random.PRNGKey(1)
        try:
            if patch == "no_update":
                adam_kernel.fused_adam_packed = (
                    lambda p, m, v, rows, grads, lr, bc1, bc2, C, D, **kw:
                    (p + jnp.float32(1e-12) * grads[0, 0], m, v)
                )
            elif patch == "no_gather":
                adam_kernel.gather_rows_packed = (
                    lambda p128, rows, D:
                    jnp.zeros(rows.shape + (D,), p128.dtype)
                    + p128[0, 0] * 0.0
                )
            elif patch == "no_lookup":
                def fake_lookup(table, coords, level):
                    n = coords.shape[0]
                    c = jnp.zeros((n, 8), jnp.int32) + jnp.arange(8)[None, :]
                    return c, jnp.ones((n,), bool)
                trainer.lookup_level = fake_lookup
            times = []
            for rep in range(4):
                key, k = jax.random.split(key)
                t0 = time.perf_counter()
                params, opt_state, aux = trainer.train_chunk(
                    params, opt_state, tables, dev_pool, shadow,
                    n_valid, jnp.int32(rep * n_iters), k, settings, n_iters,
                )
                loss = float(aux["mean"]["total_loss"])
                t1 = time.perf_counter()
                times.append((t1 - t0) / n_iters)
            log(f"{label:10s}: {min(times[1:])*1e3:8.3f} ms/iter (loss {loss:.4f})")
        finally:
            adam_kernel.fused_adam_packed = orig_fused_adam
            adam_kernel.gather_rows_packed = orig_gather
            trainer.lookup_level = orig_lookup

    run("pallas", 40, "full")
    run("pallas", 41, "no_update", patch="no_update")
    run("pallas", 42, "no_gather", patch="no_gather")
    run("pallas", 43, "no_lookup", patch="no_lookup")
    run("fused", 44, "fused_ref")


if __name__ == "__main__":
    main()
