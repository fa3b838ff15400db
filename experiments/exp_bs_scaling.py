"""Batch-size scaling of the pallas training path (bench-scale world).

Round-1 measured the dense/scatter path asymptote at ~285k pts/s (the
0.107 us/entry scatter tax).  The one-hot-matmul kernel pays no per-entry
scatter, so throughput should keep climbing with bs until the MXU matmul
or gather bandwidth saturates.  Sweeps bs for feature_update=pallas
(+ optional bf16 moments), same world as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import SamplePool
    from shine_mapping_tpu.ops.hashgrid import HashGridHost
    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state

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
    surf = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    band = surf + rng.normal(0, 0.003, surf.shape)

    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=0,
        init_node_capacity=1 << 19,
        init_corner_capacity=1 << 19,
    )
    grid.update(band)

    n_pool = 2_000_000
    coord = np.repeat(band, 5, axis=0)[:n_pool].astype(np.float32)
    coord += rng.normal(0, 0.01, coord.shape).astype(np.float32)
    sdf = rng.normal(0, 0.01, n_pool).astype(np.float32)
    weight = np.where(rng.random(n_pool) < 0.7, 1.0, -1.0).astype(np.float32)
    pool = SamplePool(
        coord=coord,
        sdf_label=sdf,
        weight=weight,
        sample_depth=np.zeros(n_pool, np.float32),
        ray_depth=np.zeros(n_pool // 7 + 1, np.float32),
        origin=np.zeros((n_pool, 3), np.float32),
        time=np.zeros(n_pool, np.float32),
    )

    dev_pool, n_valid = trainer.pool_to_device(
        pool, 1 << 21, trainer.TrainSettings.from_config(cfg, grid.levels)
    )
    tables = tuple(grid.tables)
    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features),
    )
    hint = trainer.used_rows_for(grid, granularity=64)

    bf16m = os.environ.get("SHINE_BS_BF16M", "1") == "1"
    rows = []
    # bs 524288 exceeds single-chip HBM (the (bs*8, 128) lanerow gather
    # intermediates alone are 2.1 GB/level) — measured OOM at 16.27/15.75G
    for bs in (8192, 32768, 131072):
        cfg.bs = bs
        settings = trainer.TrainSettings.from_config(
            cfg, grid.levels, feature_update="pallas", n_used=hint,
        )
        params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        opt_state = init_opt_state(params, moments_bf16=bf16m)
        shadow = trainer.empty_shadow(params["features"])
        key = jax.random.PRNGKey(1)
        n_iters = max(50, min(300, 2_500_000 // bs))
        times = []
        for rep in range(3):
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, aux = trainer.train_chunk(
                params, opt_state, tables, dev_pool, shadow, n_valid,
                jnp.int32(rep * n_iters), k, settings, n_iters,
                pre_lookups=pre_lookups,
            )
            loss = float(aux["mean"]["total_loss"])
            dt = time.perf_counter() - t0
            assert np.isfinite(loss)
            times.append(dt)
            print(f"[bs] {bs} rep {rep}: {dt / n_iters * 1e3:.2f} ms/iter",
                  flush=True)
        best = min(times[1:])
        rows.append((bs, best / n_iters * 1e3, n_iters * bs / best))
    print(f"\nbf16 moments: {bf16m}")
    print(f"{'bs':>8} {'ms/iter':>9} {'points/s':>12}")
    for bs, ms, pps in rows:
        print(f"{bs:>8} {ms:>9.2f} {pps:>12,.0f}")


if __name__ == "__main__":
    main()
