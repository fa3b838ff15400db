"""Round 4: isolate the 271 s `precompute` phase of demo_tpu_batch.

Reuses the demo's preserved world (pass its tmpdir as argv[1]), builds
the pool through the same dataset path, then times:
  make_pre (precompute_pool_lookups)   x2
  precompute_batch_windows_fused(split_k=True)   x2  (in-process warm)

Run with JAX_EXPLAIN_CACHE_MISSES / persistent-cache logging to see
whether the 4-minute cost is a remote compile that the persistent cache
fails to serve across processes.

  timeout 1200 python experiments/exp_r4_precompute_cost2.py /tmp/demo_tpu_XXXX
"""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_explain_cache_misses", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    out = sys.argv[1]
    cfg_path = os.path.join(out, "cfg.yaml")
    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import LiDARDataset
    from shine_mapping_tpu.ops.hashgrid import HashGridHost
    from shine_mapping_tpu.train import trainer

    log(f"devices: {jax.devices()}")
    cfg = SHINEConfig()
    cfg.load(cfg_path)
    t0 = time.perf_counter()
    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim, feature_std=cfg.feature_std,
        seed=cfg.seed,
        init_node_capacity=1 << 15, init_corner_capacity=1 << 15)
    ds = LiDARDataset(cfg, grid)
    ds.process_frames_pipelined(ds.frame_ids(), 4)
    n = len(ds.pool)
    log(f"world built in {time.perf_counter() - t0:.1f}s; pool {n}")

    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64))
    cap = 1
    while cap < n:
        cap *= 2
    dev_pool, n_valid = trainer.pool_to_device(ds.pool, cap, s)
    feat_shapes = tuple(tuple(f.shape) for f in grid.features)
    tables = tuple(grid.tables)
    for rep in range(2):
        t0 = time.perf_counter()
        pre = trainer.precompute_pool_lookups(
            tables, dev_pool["coord"], tuple(grid.levels),
            tuple(f.shape[0] for f in grid.features))
        jax.block_until_ready(pre[0][0])
        log(f"lookups rep {rep}: {time.perf_counter() - t0:.2f}s")

    for rep in range(2):
        t0 = time.perf_counter()
        wx = trainer.precompute_batch_windows_fused(
            pre, dev_pool, n, jax.random.PRNGKey(7), s, feat_shapes,
            split_k=True)
        t1 = time.perf_counter()
        _ = float(wx["pre"].ok[-1])
        jax.block_until_ready(wx["rows_hi"] if "rows_hi" in wx
                              else wx["rows_kg"])
        dt = time.perf_counter() - t0
        keyinfo = (f"P={wx['rows_hi'].shape[1]}" if "rows_hi" in wx
                   else "fallback")
        log(f"split rep {rep}: dispatch {t1 - t0:.2f}s, "
            f"materialized {dt:.2f}s  W={wx['idx'].shape[0]} {keyinfo}")


if __name__ == "__main__":
    main()
