"""Decompose the 3.5 ms/iter winx iteration (round-3 production path).

  win_slice   : window slices only (batch content + rows/kidx/slots/pre)
  win_gather  : + the ONE (B, L*K) fused-table gather
  win_fwd     : + winx interpolation + MLP + BCE loss
  win_bwd     : + value_and_grad wrt (dense, G)
  win_kernel  : full body (= production)            [reference point]
  kern_only   : fused_adam_packed_multi_pre alone on fixed grads

  timeout 3000 python experiments/exp_r3_winx_ablate.py
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
    log(f"{label:10s}: {t*1e3:7.3f} ms/iter")
    return t


def main():
    log(f"devices: {jax.devices()}")
    cfg, grid, pool, n_pool = build_bench_world()
    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 21, s)
    tables = tuple(grid.tables)
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    L = len(s.levels)
    D = feat_shapes[0][1]
    geo0 = params["geo"]
    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features))
    wx = trainer.precompute_batch_windows_fused(
        pre_lookups, dev_pool, n_pool, jax.random.PRNGKey(7), s, feat_shapes)
    W = int(wx["rows_kg"].shape[0])
    K = int(wx["rows_kg"].shape[-1]) // L
    log(f"W={W} K={K}")

    packed = tuple(jnp.asarray(np.asarray(f).reshape(-1, 128))
                   for f in params["features"])
    fused0 = jnp.concatenate(packed, axis=0)
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

    def v_slice(carry, it, env):
        acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        return acc + batch["coord"][0, 0] + rows_kg[0, 0] + pre.offs[0]

    timed(v_slice, jnp.float32(0), env, label="win_slice")

    def v_gather(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg]
        return ft, acc + G[0, 0, 0]

    timed(v_gather, (fused0, jnp.float32(0)), env, label="win_gather")

    def loss_of(G, batch, winx, env):
        f = trainer._feat_winx(batch["coord"], G, winx, s)
        pred = decoder.sdf(env["geo"], f)
        return losses.sdf_bce_loss(
            pred, batch["sdf_label"], s.sigma_sigmoid,
            jnp.abs(batch["weight"]), s.loss_weight_on, s.loss_reduction)

    def v_fwd(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg]
        return ft, acc + loss_of(G, batch, winx, env)

    timed(v_fwd, (fused0, jnp.float32(0)), env, label="win_fwd")

    def v_bwd(carry, it, env):
        ft, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg]
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        return ft, acc + loss + g[0, 0, 0]

    timed(v_bwd, (fused0, jnp.float32(0)), env, label="win_bwd")

    def v_full(carry, it, env):
        ft, m, v, acc = carry
        batch, rows_kg, winx, pre = slices(it, env)
        G = ft[rows_kg]
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        ft, m, v = adam_kernel.fused_adam_packed_multi_pre(
            ft, m, v, g.reshape(-1, 128), rows_kg.reshape(-1), pre,
            jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
            feat_shapes, lr_scales, eps=s.adam_eps, use_pallas=True,
            n_used=s.n_used, grads_bf16=True)
        return ft, m, v, acc + loss

    timed(v_full, (fused0, zerosBf, zerosBf, jnp.float32(0)), env,
          label="win_full")

    # kernel alone on fixed grads (one window's prep)
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
            feat_shapes, lr_scales, eps=s.adam_eps, use_pallas=True,
            n_used=s.n_used, grads_bf16=True)
        return ft, m, v, acc + ft[0, 0]

    timed(v_kern, (fused0, zerosBf, zerosBf, jnp.float32(0)), env2,
          label="kern_only")


if __name__ == "__main__":
    main()
