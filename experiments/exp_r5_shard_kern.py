"""Measure the row-sharded window update's per-shard primitives (round 5).

No multi-chip hardware exists behind this tunnel, so the weak-scaling
projection for the routed layout (BENCH_NOTES round 5) is built from
SINGLE-CHIP measurements of each per-shard term, exactly as round 4's
projection measured the replicated island:

  local      : the batch-sharded part at bs/chip = 8192 (slice + gathers +
               fwd + bwd), unchanged from exp_r4_winxs_ablate.
  serve(n)   : ONE shard's forward serve gather — (n, E) rows from its
               (R/n, 128) slice — plus the owner-side (M_loc,) recv
               assembly gather.  Measured here per n.
  kern(n)    : ONE shard's fused_adam_packed_shard — reorder + one-hot
               matmul over its n*E received entries + dense sweep of its
               R/n rows.  Measured here per n (the term that was the
               replicated island's Amdahl fraction: there every chip paid
               kern(M_global) + sweep(R)).
  A2A(n)     : 2 x all-to-all of the real entries — PROJECTED from payload
               bytes at an assumed ICI bandwidth (50 GB/s one-way,
               v5e-class; substitute the measured number on real hardware).

  timeout 3000 python experiments/exp_r5_shard_kern.py
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
from shine_mapping_tpu.ops import adam_kernel

from bench import build_bench_world, build_street_world  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(fn, env, n_iters, reps=3, label=""):
    @jax.jit
    def chunk(env):
        def body(c, it):
            return c + fn(it, env), 0.0

        c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_iters))
        return c

    times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        c = chunk(env)
        _ = float(c)
        t1 = time.perf_counter()
        if rep > 0:
            times.append((t1 - t0) / n_iters)
    t = float(np.min(times))
    log(f"{label:24s}: {t * 1e3:8.3f} ms/iter")
    return t


def timed_update(update, carry_init, env, n_iters, reps=3, label=""):
    @jax.jit
    def chunk(carry, env):
        def body(c, it):
            return update(c, it, env), 0.0

        c, _ = jax.lax.scan(body, carry, jnp.arange(n_iters))
        return c

    carry = carry_init
    times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        carry = chunk(carry, env)
        _ = float(jax.tree_util.tree_leaves(carry)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep > 0:
            times.append((t1 - t0) / n_iters)
    t = float(np.min(times))
    log(f"{label:24s}: {t * 1e3:8.3f} ms/iter")
    return t


def measure_world(world_name: str, tiny: bool, shard_counts=(2, 4, 8)):
    build = build_street_world if world_name == "street" else build_bench_world
    cfg, grid, pool, n_pool = build(tiny=tiny)
    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    dev_pool, n_valid = trainer.pool_to_device(
        pool, 1 << (16 if tiny else 21), s)
    tables = tuple(grid.tables)
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in params["features"]),
    )
    fused = jnp.concatenate(
        [jnp.asarray(f).reshape(-1, 128) for f in params["features"]])
    fused_bf16 = fused.astype(jnp.bfloat16)
    R_tot = fused.shape[0]
    out = {"world": world_name, "R_tot": int(R_tot)}
    n_iters = 20 if tiny else 200

    for n in shard_counts:
        if not trainer.shard_windows_ok(s, feat_shapes, n):
            log(f"n={n}: not shardable, skipping")
            continue
        wx = trainer.precompute_batch_windows_fused(
            pre, dev_pool, int(n_pool), jax.random.PRNGKey(7), s,
            feat_shapes, split_k=True, shards=n)
        rt = wx["shard"]
        E = int(rt["serve_rows"].shape[3])
        M_sh = n * E
        M_loc = int(rt["recv_inv"].shape[2])
        R_loc = R_tot // n
        # window 0's REAL routed entries, summed over ALL shards (per
        # shard it is ~1/n of this; E pads each (owner, shard) cell to
        # the worst case, so M_sh = n*E >= real/n)
        real = int(np.asarray((rt["serve_rows"][0] >= 0).sum()))
        rec = {"E": E, "M_sh_per_shard": M_sh, "M_loc": M_loc,
               "real_entries_w0_all_shards": real}
        log(f"[{world_name}] n={n}: E={E} M_sh={M_sh} M_loc={M_loc} "
            f"real(w0, all shards)={real}")

        # shard 0's local table slice + its routing arrays
        p_loc = fused_bf16[:R_loc]
        m_loc = jnp.zeros((R_loc, 128), jnp.bfloat16)
        v_loc = jnp.zeros((R_loc, 128), jnp.bfloat16)
        srv0 = rt["serve_rows"][:, 0]           # (W, n, E)
        rinv0 = rt["recv_inv"][:, 0]            # (W, M_loc)
        pre0 = jax.tree_util.tree_map(lambda a: a[:, 0], rt["pre"])
        lvl0 = rt["lvl"][0]
        W = srv0.shape[0]

        # serve gather + owner assembly (the island-1 compute, no a2a)
        def serve_body(it, env):
            fb, srv, rinv = env
            wsel = jnp.mod(it, W)
            sr = jax.lax.dynamic_index_in_dim(srv, wsel, 0, False)
            buf = fb[jnp.clip(sr, 0, fb.shape[0] - 1)]
            flat = jnp.concatenate(
                [buf.reshape(-1, 128), jnp.zeros((1, 128), fb.dtype)])
            ri = jax.lax.dynamic_index_in_dim(rinv, wsel, 0, False)
            G = flat[ri]
            return jnp.sum(G[0].astype(jnp.float32))

        rec["serve_ms"] = 1e3 * timed_scan(
            serve_body, (p_loc, srv0, rinv0), n_iters,
            label=f"serve+assemble n={n}")

        # per-shard kernel: reorder + matmul over M_sh entries + sweep R/n
        g_fake = jax.random.normal(
            jax.random.PRNGKey(1), (M_sh, 128), jnp.float32) * 1e-3
        lr_scales = tuple(
            s.lr_level_reduce_ratio ** i for i in range(len(s.levels)))

        def kern_body(carry, it, env):
            p_, m_, v_ = carry
            g_, pre_all, lvl_ = env
            wsel = jnp.mod(it, W)
            pre_ = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, wsel, 0, False),
                pre_all)
            return adam_kernel.fused_adam_packed_shard(
                p_, m_, v_, g_, pre_, lvl_, jnp.float32(0.01),
                jnp.float32(0.1), jnp.float32(0.01), feat_shapes,
                lr_scales, n, eps=s.adam_eps,
                use_pallas=adam_kernel.on_tpu(), grads_bf16=True,
                sr_seed=it.astype(jnp.int32))

        rec["kern_ms"] = 1e3 * timed_update(
            kern_body, (p_loc, m_loc, v_loc), (g_fake, pre0, lvl0),
            n_iters, label=f"kern_shard n={n}")
        ok_frac = float(np.asarray(pre0.ok, np.float32).mean())
        rec["pre_ok_frac"] = ok_frac
        if ok_frac < 1.0:
            log(f"  WARNING: {1 - ok_frac:.1%} of shard-0 preps not ok "
                "(XLA fallback in those windows)")
        out[f"n{n}"] = rec
    return out


def main():
    tiny = os.environ.get("SHINE_BENCH_TINY", "0") == "1"
    log(f"devices: {jax.devices()}")
    results = []
    for world in ("bench", "street"):
        results.append(measure_world(world, tiny))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_r5_shard_kern.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
