"""On-chip A/B of tpu.batch_windows: epoch-window sampling with the update
kernel's row-only prep (argsort + searchsorted + trash spread) precomputed
per window vs the live per-iteration prep.

Two checks:
1. EXACTNESS — for a handful of windows, the stacked EntryPrep computed by
   precompute_batch_windows must equal entry_prep_lanes re-run live on the
   same rows (field-by-field; jnp.argsort is stable, so orders match
   exactly).  This is the contract that makes the windows path produce
   bit-identical updates for identical batches.
2. TIMING — interleaved A/B chunks in ONE process (tunnel latency drifts
   between runs; template experiments/exp_fuse_ab.py): pallas_bf16m with
   iid sampling vs pallas_bf16m with batch windows, same world as bench.py.

Run: timeout 1800 python experiments/exp_batch_windows.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from bench import build_bench_world
from shine_mapping_tpu.ops import adam_kernel
from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state


def main():
    cfg, grid, pool, n_pool = build_bench_world()
    settings = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 21, settings)
    tables = tuple(grid.tables)
    feat_shapes = tuple(tuple(f.shape) for f in grid.features)
    caps = tuple(f.shape[0] for f in grid.features)

    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels), caps
    )
    t0 = time.perf_counter()
    win = trainer.precompute_batch_windows(
        pre_lookups, n_pool, jax.random.PRNGKey(7), settings, feat_shapes
    )
    _ = float(win["preps"][-1].ok[-1])
    print(f"window precompute ({n_pool // cfg.bs} windows): "
          f"{time.perf_counter() - t0:.2f} s")

    # -------- 1. exactness: stacked prep == live prep on the same rows
    for wsel in (0, 3, int(n_pool // cfg.bs) - 1):
        idx = win["idx"][wsel]
        for i in range(len(settings.levels)):
            rows = pre_lookups[i][0][idx].reshape(-1)
            live = adam_kernel.entry_prep_lanes(
                rows, feat_shapes[i][0], feat_shapes[i][1],
                settings.n_used[i] if settings.n_used else None,
            )
            stored = jax.tree_util.tree_map(
                lambda a: a[wsel], win["preps"][i]
            )
            for f in adam_kernel.EntryPrep._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(live, f)),
                    np.asarray(getattr(stored, f)),
                    err_msg=f"window {wsel} level {i} field {f}",
                )
            assert bool(stored.ok), f"window {wsel} level {i}: ok=False"
    print("exactness: stored EntryPrep == live prep (all fields), ok=True")

    # -------- 2. interleaved A/B timing, bf16 update mode
    n_iters = 300

    def make_state():
        params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        return params, init_opt_state(params, moments_bf16=True)

    st_a = make_state()  # iid sampling
    st_b = make_state()  # epoch windows
    shadow = trainer.empty_shadow(st_a[0]["features"])
    key = jax.random.PRNGKey(1)
    times = {"iid": [], "win": []}
    for rep in range(5):
        for name, bw in (("iid", None), ("win", win)):
            params, opt_state = st_a if name == "iid" else st_b
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, aux = trainer.train_chunk(
                params, opt_state, tables, dev_pool, shadow,
                n_valid, jnp.int32(rep * n_iters), k, settings, n_iters,
                pre_lookups=pre_lookups, batch_windows=bw,
            )
            loss = float(aux["mean"]["total_loss"])
            dt = time.perf_counter() - t0
            if name == "iid":
                st_a = (params, opt_state)
            else:
                st_b = (params, opt_state)
            times[name].append(dt)
            print(f"rep {rep} {name}: {dt / n_iters * 1e3:.2f} ms/iter "
                  f"loss {loss:.4f}", flush=True)
    for name, ts in times.items():
        best = min(ts[1:]) / n_iters * 1e3
        print(f"{name}: best {best:.2f} ms/iter "
              f"-> {cfg.bs / best * 1000:.0f} pts/s")


if __name__ == "__main__":
    main()
