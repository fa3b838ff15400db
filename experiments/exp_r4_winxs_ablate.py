"""Decompose the 2.13 ms/iter split-K (winxsp) iteration — round 4.

  win_slice   : window slices (content + split structure + pre)
  win_gather  : + the TWO gathers (prefix (P, L*K) + tail (bs-P, L*K_lo))
  win_fwd     : + split interp + MLP + BCE forward
  win_bwd     : + value_and_grad wrt (dense, (G_hi, G_lo))
  win_full    : + ONE multi-level kernel dispatch   [= production]
  kern_only   : fused_adam_packed_multi_pre alone on fixed grads

  timeout 3000 python experiments/exp_r4_winxs_ablate.py
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
    log(f"{label:10s}: {t * 1e3:8.3f} ms/iter")
    return t


def main():
    log(f"devices: {jax.devices()}")
    tiny = os.environ.get("SHINE_BENCH_TINY", "0") == "1"
    cfg, grid, pool, n_pool = build_bench_world(tiny=tiny)
    if tiny:
        # small enough that the tiny world's multi-row fraction still
        # fits the bs/4 prefix cap (smoke of the full split path)
        cfg.bs = 256
    s = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas",
        n_used=trainer.used_rows_for(grid, granularity=64),
    )
    dev_pool, n_valid = trainer.pool_to_device(
        pool, 1 << (16 if tiny else 21), s)
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
        pre_lookups, dev_pool, n_pool, jax.random.PRNGKey(7), s, feat_shapes,
        split_k=True)
    if "rows_hi" not in wx:
        # the tiny world is found-dominated (noise ~ voxel size) and
        # legitimately exceeds the prefix cap; the split path itself is
        # CPU-covered by tests/test_batch_windows.py::test_winxs_*
        assert tiny, "split fell back at bench scale"
        log("tiny world: split fell back (expected); smoke done")
        return
    W = int(wx["rows_hi"].shape[0])
    P = int(wx["rows_hi"].shape[1])
    K = int(wx["rows_hi"].shape[-1]) // L
    K_lo = int(wx["rows_lo"].shape[-1]) // L
    M = (P * K + (s.bs - P) * K_lo) * L
    log(f"W={W} P={P} K={K} K_lo={K_lo} entries/iter={M} "
        f"(plain winx: {s.bs * L * K})")

    packed = tuple(jnp.asarray(np.asarray(f).reshape(-1, 128))
                   for f in params["features"])
    fused0 = jnp.concatenate(packed, axis=0).astype(jnp.bfloat16)
    zerosBf = jnp.zeros_like(fused0, jnp.bfloat16)
    env = dict(wx=wx, geo=geo0)
    lr_scales = tuple(s.lr_level_reduce_ratio ** i for i in range(L))

    def slices(it, env):
        wx = env["wx"]
        wsel = jnp.mod(it, W)

        def sl(a):
            return jax.lax.dynamic_index_in_dim(a, wsel, 0, False)

        batch = {k: sl(v) for k, v in wx["pool"].items()}
        rows_hi = sl(wx["rows_hi"])
        rows_lo = sl(wx["rows_lo"])
        winx = {
            "K": K,
            "split": True,
            "feat_dims": (D,) * L,
            "kidx": sl(wx["kidx"]).astype(jnp.int32),
            "slots": sl(wx["slots"]).astype(jnp.int32),
            "found": sl(wx["found"]),
        }
        pre = jax.tree_util.tree_map(sl, wx["pre"])
        return batch, rows_hi, rows_lo, winx, pre

    def v_slice(carry, it, env):
        acc = carry
        batch, rows_hi, rows_lo, winx, pre = slices(it, env)
        return acc + batch["coord"][0, 0] + rows_hi[0, 0] + rows_lo[0, 0] + pre.offs[0]

    timed(v_slice, jnp.float32(0), env, label="win_slice")

    def v_gather(carry, it, env):
        ft, acc = carry
        batch, rows_hi, rows_lo, winx, pre = slices(it, env)
        G_hi = ft[rows_hi].astype(jnp.float32)
        G_lo = ft[rows_lo].astype(jnp.float32)
        return ft, acc + G_hi[0, 0, 0] + G_lo[0, 0, 0]

    timed(v_gather, (fused0, jnp.float32(0)), env, label="win_gather")

    def loss_of(G, batch, winx, env):
        f = trainer._feat_winx_split(batch["coord"], G[0], G[1], winx, s)
        pred = decoder.sdf(env["geo"], f)
        return losses.sdf_bce_loss(
            pred, batch["sdf_label"], s.sigma_sigmoid,
            jnp.abs(batch["weight"]), s.loss_weight_on, s.loss_reduction)

    def v_fwd(carry, it, env):
        ft, acc = carry
        batch, rows_hi, rows_lo, winx, pre = slices(it, env)
        G = (ft[rows_hi], ft[rows_lo])
        return ft, acc + loss_of(G, batch, winx, env)

    timed(v_fwd, (fused0, jnp.float32(0)), env, label="win_fwd")

    def v_bwd(carry, it, env):
        ft, acc = carry
        batch, rows_hi, rows_lo, winx, pre = slices(it, env)
        G = (ft[rows_hi], ft[rows_lo])
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        return ft, acc + loss + g[0][0, 0, 0]

    timed(v_bwd, (fused0, jnp.float32(0)), env, label="win_bwd")

    def v_full(carry, it, env):
        ft, m, v, acc = carry
        batch, rows_hi, rows_lo, winx, pre = slices(it, env)
        G = (ft[rows_hi], ft[rows_lo])
        loss, g = jax.value_and_grad(loss_of)(G, batch, winx, env)
        g_entries = jnp.concatenate(
            [g[0].reshape(-1, 128), g[1].reshape(-1, 128)])
        rows_flat = jnp.concatenate(
            [rows_hi.reshape(-1), rows_lo.reshape(-1)])
        ft, m, v = adam_kernel.fused_adam_packed_multi_pre(
            ft, m, v, g_entries, rows_flat, pre,
            jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
            feat_shapes, lr_scales, eps=s.adam_eps,
            use_pallas=adam_kernel.on_tpu(),
            n_used=s.n_used, grads_bf16=True,
            sr_seed=it.astype(jnp.int32))
        return ft, m, v, acc + loss

    timed(v_full, (fused0, zerosBf, zerosBf, jnp.float32(0)), env,
          label="win_full")

    pre0 = jax.tree_util.tree_map(lambda a: a[0], wx["pre"])
    rows0 = jnp.concatenate([wx["rows_hi"][0].reshape(-1),
                             wx["rows_lo"][0].reshape(-1)])
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
            feat_shapes, lr_scales, eps=s.adam_eps,
            use_pallas=adam_kernel.on_tpu(),
            n_used=s.n_used, grads_bf16=True,
            sr_seed=it.astype(jnp.int32))
        return ft, m, v, acc + ft[0, 0].astype(jnp.float32)

    timed(v_kern, (fused0, zerosBf, zerosBf, jnp.float32(0)), env2,
          label="kern_only")


if __name__ == "__main__":
    main()
