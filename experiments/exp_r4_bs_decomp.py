"""Round-4 item 4: decompose winxp batch-size scaling (8k/32k/131k).

Round-3 recorded 2.56M pts/s @ bs 8192 but 2.17M @ bs 32768 for the
fused-window flagship — with fixed costs amortized away, per-point cost
should be FLAT, so some per-entry term got *worse* per entry.  This
ablation times each stage of the winx iteration at several batch sizes
(same world, same pool, fresh windows per bs) so the curvature can be
attributed:

  win_slice   : window content slices (grows ~linear in bs — stack bytes)
  win_gather  : + the ONE (B, L*K) fused-table gather (linear in rows)
  win_fwd     : + winx interp + MLP + BCE forward
  win_bwd     : + value_and_grad wrt (dense, G)
  win_full    : + ONE multi-level kernel dispatch   [= production]
  kern_only   : kernel alone on fixed grads

Also prints pre.ok per bs (the silent-XLA-fallback trap: ADVICE r3 found
the pad-spread int32 overflow fired exactly at bs 32768).

  timeout 3000 python experiments/exp_r4_bs_decomp.py
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

from shine_mapping_tpu.train import trainer, losses
from shine_mapping_tpu.models import decoder
from shine_mapping_tpu.ops import adam_kernel

from bench import build_bench_world  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, carry_init, env, n_iters=100, reps=3, label=""):
    @jax.jit
    def chunk(carry, env):
        def body(c, it):
            return fn(c, it, env), 0.0

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
    log(f"  {label:10s}: {t * 1e3:8.3f} ms/iter")
    return t


def run_bs(cfg, grid, dev_pool, n_pool, tables, pre_lookups, bs, n_iters):
    cfg.bs = bs
    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    L = len(s.levels)
    D = feat_shapes[0][1]
    geo0 = params["geo"]
    t0 = time.perf_counter()
    wx = trainer.precompute_batch_windows_fused(
        pre_lookups, dev_pool, n_pool, jax.random.PRNGKey(7), s, feat_shapes)
    ok = bool(np.all(np.asarray(wx["pre"].ok)))
    t_pre = time.perf_counter() - t0
    W = int(wx["rows_kg"].shape[0])
    K = int(wx["rows_kg"].shape[-1]) // L
    M = bs * L * K
    log(f"bs={bs}: W={W} K={K} entries/iter={M} "
        f"precompute {t_pre:.2f}s pre.ok={ok}")
    # tiny worlds legitimately overflow tile windows (bs*K pads over a
    # few-thousand-row map); at bench scale a False here is the silent-
    # XLA-fallback perf trap and must fail loudly (ADVICE r3)
    if os.environ.get("SHINE_BENCH_TINY", "0") != "1":
        assert ok, "pad-spread coverage violated -> silent XLA fallback"

    # tables bf16 (winxp production)
    packedf = tuple(jnp.asarray(np.asarray(f).reshape(-1, 128))
                    for f in params["features"])
    fused0 = jnp.concatenate(packedf, axis=0).astype(jnp.bfloat16)
    zerosBf = jnp.zeros_like(fused0, jnp.bfloat16)
    env = dict(wx=wx, geo=geo0)
    lr_scales = tuple(s.lr_level_reduce_ratio ** i for i in range(L))

    def slices(it, env):
        wx = env["wx"]
        wsel = jnp.mod(it, W)

        def sl(a):
            return jax.lax.dynamic_index_in_dim(a, wsel, 0, False)

        batch = {k: sl(v) for k, v in wx["pool"].items()}
        rows_kg = sl(wx["rows_kg"])
        winx = {
            "K": K,
            "feat_dims": (D,) * L,
            "kidx": sl(wx["kidx"]).astype(jnp.int32),
            "slots": sl(wx["slots"]).astype(jnp.int32),
            "found": sl(wx["found"]),
        }
        pre = jax.tree_util.tree_map(sl, wx["pre"])
        return batch, rows_kg, winx, pre

    out = {"bs": bs, "entries": M, "precompute_s": round(t_pre, 2)}

    def v_slice(carry, it, env):
        acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        return acc + batch["coord"][0, 0] + rows_kg[0, 0] + pre.offs[0]

    out["slice"] = timed(v_slice, jnp.float32(0), env,
                         n_iters=n_iters, label="win_slice")

    def v_gather(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg].astype(jnp.float32)
        return ft, acc + G[0, 0, 0]

    out["gather"] = timed(v_gather, (fused0, jnp.float32(0)), env,
                          n_iters=n_iters, label="win_gather")

    def loss_of(G, batch, winx, env):
        f = trainer._feat_winx(batch["coord"], G, winx, s)
        pred = decoder.sdf(env["geo"], f)
        return losses.sdf_bce_loss(
            pred, batch["sdf_label"], s.sigma_sigmoid,
            jnp.abs(batch["weight"]), s.loss_weight_on, s.loss_reduction)

    def v_fwd(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg].astype(jnp.float32)
        return ft, acc + loss_of(G, batch, winx, env)

    out["fwd"] = timed(v_fwd, (fused0, jnp.float32(0)), env,
                       n_iters=n_iters, label="win_fwd")

    def v_bwd(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg].astype(jnp.float32)
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        return ft, acc + loss + g[0, 0, 0]

    out["bwd"] = timed(v_bwd, (fused0, jnp.float32(0)), env,
                       n_iters=n_iters, label="win_bwd")

    def v_full(carry, it, env):
        ft, m, v, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg].astype(jnp.float32)
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        ft, m, v = adam_kernel.fused_adam_packed_multi_pre(
            ft, m, v, g.reshape(-1, 128), rows_kg.reshape(-1), pre,
            jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
            feat_shapes, lr_scales, eps=s.adam_eps, use_pallas=adam_kernel.on_tpu(),
            n_used=s.n_used, grads_bf16=True,
            sr_seed=it.astype(jnp.int32))
        return ft, m, v, acc + loss

    out["full"] = timed(v_full, (fused0, zerosBf, zerosBf, jnp.float32(0)),
                        env, n_iters=n_iters, label="win_full")

    pre0 = jax.tree_util.tree_map(lambda a: a[0], wx["pre"])
    rows0 = wx["rows_kg"][0].reshape(-1)
    rng = np.random.default_rng(0)
    gfix = jnp.asarray(rng.normal(size=(rows0.shape[0], 128))
                       .astype(np.float32))
    env2 = dict(env, pre0=pre0, rows0=rows0, gfix=gfix)

    def v_kern(carry, it, env):
        ft, m, v, acc = carry
        ft, m, v = adam_kernel.fused_adam_packed_multi_pre(
            ft, m, v, env["gfix"] * (1.0 + acc * 0),
            env["rows0"], env["pre0"],
            jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
            feat_shapes, lr_scales, eps=s.adam_eps, use_pallas=adam_kernel.on_tpu(),
            n_used=s.n_used, grads_bf16=True,
            sr_seed=it.astype(jnp.int32))
        return ft, m, v, acc + ft[0, 0].astype(jnp.float32)

    out["kern"] = timed(v_kern, (fused0, zerosBf, zerosBf, jnp.float32(0)),
                        env2, n_iters=n_iters, label="kern_only")

    out["pts_per_s"] = round(bs / out["full"], 1)
    for k in ("slice", "gather", "fwd", "bwd", "full", "kern"):
        out[k] = round(out[k] * 1e3, 3)
    return out


def main():
    log(f"devices: {jax.devices()}")
    tiny = os.environ.get("SHINE_BENCH_TINY", "0") == "1"
    cfg, grid, pool, n_pool = build_bench_world(tiny=tiny)
    s0 = trainer.TrainSettings.from_config(cfg, grid.levels)
    dev_pool, n_valid = trainer.pool_to_device(
        pool, 1 << (16 if tiny else 21), s0)
    tables = tuple(grid.tables)
    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features))

    sweep = (((1024, 5), (4096, 5)) if tiny
             else ((8192, 100), (32768, 50), (131072, 20)))
    results = []
    for bs, n_iters in sweep:
        results.append(run_bs(cfg, grid, dev_pool, n_pool, tables,
                              pre_lookups, bs, n_iters))
    import json
    log("\nper-point breakdown (us/point):")
    log(f"{'bs':>8} {'slice':>7} {'gather':>7} {'fwd':>7} {'bwd':>7} "
        f"{'kern':>7} {'full':>7} {'pts/s':>10}")
    for r in results:
        b = r["bs"]
        log(f"{b:>8} {r['slice'] / b * 1e3:7.3f} "
            f"{(r['gather'] - r['slice']) / b * 1e3:7.3f} "
            f"{(r['fwd'] - r['gather']) / b * 1e3:7.3f} "
            f"{(r['bwd'] - r['fwd']) / b * 1e3:7.3f} "
            f"{r['kern'] / b * 1e3:7.3f} {r['full'] / b * 1e3:7.3f} "
            f"{r['pts_per_s']:>10}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
