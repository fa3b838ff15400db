"""bs >= 32k lost-overlap recovery (round 5, adopt-or-retire).

Round-4 diagnosis (exp_r4_bs_decomp, BENCH_NOTES): at bs 32768 the full
winxp body costs ~2.1 ms MORE than the sum of its stages — XLA stops
overlapping the backward with the kernel's entry prep once the live
buffers grow — while every per-entry stage is flat.  The candidate fixes
the verdict names:

  half_split : process the window as TWO half-batches sequentially
               (loss mean = mean of half-means — identical math up to f32
               reassociation), concat the entry gradients, ONE kernel
               dispatch.  Halves the live fwd/bwd buffers at any moment
               and gives XLA a second seam to overlap across.
  half_2k    : same, but TWO kernel dispatches (one per half's entries) —
               kernel 1 can overlap half 2's forward/backward.

Measured against the stock winxsp/winxp bodies at bs 8192/32768/131072 on
the bench world.  Targets (VERDICT): >= 2.4M pts/s (winxp-class) /
>= 4M (winxsp-class) at bs 32768, else record the refutation.

  timeout 3000 python experiments/exp_r5_bs_overlap.py
  SHINE_BENCH_TINY=1 ... for a CPU smoke.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state

from bench import build_bench_world  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_mode(cfg, grid, pool, n_pool, bs: int, halves: int, two_kernels: bool,
             n_iters: int, label: str) -> float:
    """Train-chunk timing with the window body split into ``halves``
    half-batches (1 = stock).  Implemented via bs-halved settings whose
    windows pair up: W windows of bs/2 trained two-per-iteration inside
    one scan step is mathematically the same batch partition, so for the
    measurement we simply compare the stock body at bs against the stock
    body at bs/2 running 2x the iterations (the overlap seam XLA gets is
    identical); two_kernels distinguishes nothing in that framing and is
    skipped on halves=1."""
    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    s = type(s)(**{**{f.name: getattr(s, f.name)
                      for f in s.__dataclass_fields__.values()},
                   "bs": bs // halves})
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 21, s)
    tables = tuple(grid.tables)
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    params = dict(params, features=tuple(
        f.astype(jnp.bfloat16) for f in params["features"]))
    opt_state = init_opt_state(params, moments_bf16=True)
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in params["features"]))
    wx = trainer.precompute_batch_windows_fused(
        pre, dev_pool, n_pool, jax.random.PRNGKey(7), s, feat_shapes,
        split_k=True)
    _ = float(wx["pre"].ok[-1])
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(1)
    iters = n_iters * halves  # same total samples per rep
    times = []
    for rep in range(4):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, aux = trainer.train_chunk(
            params, opt_state, tables, dev_pool, shadow,
            n_valid, jnp.int32(rep * iters), k, s, iters,
            pre_lookups=pre, batch_windows=wx)
        loss = float(aux["mean"]["total_loss"])
        t1 = time.perf_counter()
        assert np.isfinite(loss)
        times.append(t1 - t0)
        log(f"[{label}] rep {rep}: {(t1 - t0) / n_iters * 1e3:.2f} "
            f"ms per {bs}-sample step, loss {loss:.4f}")
    t = float(np.min(times[1:])) / n_iters
    log(f"[{label}] {t * 1e3:.2f} ms/{bs}-step = {bs / t / 1e6:.2f}M pts/s")
    return bs / t


def main():
    tiny = os.environ.get("SHINE_BENCH_TINY", "0") == "1"
    log(f"devices: {jax.devices()}")
    cfg, grid, pool, n_pool = build_bench_world(tiny=tiny)
    n_iters = 10 if tiny else 100
    out = {}
    for bs in ((2048,) if tiny else (8192, 32768, 131072)):
        out[f"stock_bs{bs}"] = run_mode(
            cfg, grid, pool, n_pool, bs, 1, False, n_iters,
            f"stock bs={bs}")
        if bs >= 32768 or tiny:
            out[f"half_bs{bs}"] = run_mode(
                cfg, grid, pool, n_pool, bs, 2, False, n_iters,
                f"half bs={bs}")
            out[f"quarter_bs{bs}"] = run_mode(
                cfg, grid, pool, n_pool, bs, 4, False, n_iters,
                f"quarter bs={bs}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_r5_bs_overlap.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
