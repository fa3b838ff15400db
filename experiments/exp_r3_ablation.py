"""Round-3 ablation: where do the 6.97 ms/iter of pallas_bf16m_win go?

Decomposes the CURRENT production iteration (windows + precomputed
lookups + bf16 moments/grads) at bench scale, then measures the
candidate optimizations:

  win_batch     : window select + pool gathers + corner/found gathers
  win_fwdg      : + forward lanerow gathers (3 levels)
  win_fwd       : + lanefold + MLP + BCE loss (no grad)
  win_bwd       : + value_and_grad wrt (dense, G_list)   [current]
  win_reorder   : + gradient reorder + bf16 cast (kernel feed prep)
  win_full      : the full body incl. kernel              [current]
  kern_only     : kernel alone on precomputed sorted grads (sweep floor)

  bwd_feat      : value_and_grad wrt (dense, feat) only — the backward
                  stops at the (B, D) feature; per-entry gradients are
                  reconstructed manually (g128[m] = w[m] * g_feat[b_m]
                  lane-placed), SORTED, bf16 — feeding the kernel with
                  no (B,8,128) materialization and no (M,128) reorder
  full_direct   : full body with the direct construction

  gfused        : forward gather from the 3 levels CONCATENATED into one
                  (R_tot, 128) table — one (B, 24) lanerow gather
  gbf16         : forward lanerow gather from a bf16 table copy

  timeout 3000 python experiments/exp_r3_ablation.py
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
from shine_mapping_tpu.train.optimizer import init_opt_state
from shine_mapping_tpu.models import decoder
from shine_mapping_tpu.ops.interp import corner_weights
from shine_mapping_tpu.ops import adam_kernel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
    log(f"{label:12s}: {t*1e3:7.3f} ms/iter")
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
    levels = s.levels
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    D = feat_shapes[0][1]
    PACK = 128 // D
    geo0 = params["geo"]

    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features),
    )
    t0 = time.perf_counter()
    windows = trainer.precompute_batch_windows(
        pre_lookups, n_pool, jax.random.PRNGKey(7), s, feat_shapes)
    _ = float(windows["preps"][-1].ok[-1])
    log(f"window precompute: {time.perf_counter() - t0:.2f} s "
        f"({windows['idx'].shape[0]} windows)")

    packed = tuple(jnp.asarray(np.asarray(f).reshape(-1, 128))
                   for f in params["features"])
    zerosB = tuple(jnp.zeros_like(p, jnp.bfloat16) for p in packed)

    env = dict(tables=tables, pool=dev_pool, geo=geo0, windows=windows,
               pre=pre_lookups)
    W = int(windows["idx"].shape[0])

    def win_batch(it, env):
        wsel = jnp.mod(it, W)
        idx = env["windows"]["idx"][wsel]
        b = {
            "coord": env["pool"]["coord"][idx],
            "sdf_label": env["pool"]["sdf_label"][idx],
            "weight": env["pool"]["weight"][idx],
        }
        corners = [env["pre"][i][0][idx] for i in range(3)]
        found = [env["pre"][i][1][idx] for i in range(3)]
        return b, corners, found, wsel

    def v_batch(carry, it, env):
        acc = carry
        b, corners, found, _ = win_batch(it, env)
        return acc + jnp.sum(b["coord"][0]) + corners[0][0, 0]

    timed(v_batch, jnp.float32(0), env, label="win_batch")

    def v_fwdg(carry, it, env):
        pk, acc = carry
        b, corners, found, _ = win_batch(it, env)
        tot = jnp.float32(0)
        for i in range(3):
            G = adam_kernel.gather_lanerows(pk[i], corners[i], D)
            tot = tot + G[0, 0, 0]
        return pk, acc + tot

    timed(v_fwdg, (packed, jnp.float32(0)), env, label="win_fwdg")

    def fwd_loss(G_list, b, w_found, slots, env):
        f = None
        for i in range(3):
            contrib = adam_kernel.lanefold(G_list[i], slots[i], w_found[i], D)
            f = contrib if f is None else f + contrib
        pred = decoder.sdf(env["geo"], f)
        return losses.sdf_bce_loss(pred, b["sdf_label"], s.sigma_sigmoid,
                                   jnp.abs(b["weight"]), s.loss_weight_on,
                                   s.loss_reduction)

    def fwd_parts(pk, it, env):
        b, corners, found, wsel = win_batch(it, env)
        w_found, slots, G_list = [], [], []
        for i in range(3):
            w = corner_weights(b["coord"], levels[i], s.poly_int_on)
            w_found.append(jnp.where(found[i][:, None], w, 0.0))
            slots.append(corners[i] % PACK)
            G_list.append(adam_kernel.gather_lanerows(pk[i], corners[i], D))
        return b, corners, w_found, slots, G_list, wsel

    def v_fwd(carry, it, env):
        pk, acc = carry
        b, corners, w_found, slots, G_list, _ = fwd_parts(pk, it, env)
        loss = fwd_loss(G_list, b, w_found, slots, env)
        return pk, acc + loss

    timed(v_fwd, (packed, jnp.float32(0)), env, label="win_fwd")

    def v_bwd(carry, it, env):
        pk, acc = carry
        b, corners, w_found, slots, G_list, _ = fwd_parts(pk, it, env)
        loss, g_G = jax.value_and_grad(fwd_loss)(G_list, b, w_found, slots, env)
        return pk, acc + loss + g_G[0][0, 0, 0]

    timed(v_bwd, (packed, jnp.float32(0)), env, label="win_bwd")

    def v_reorder(carry, it, env):
        pk, acc = carry
        b, corners, w_found, slots, G_list, wsel = fwd_parts(pk, it, env)
        loss, g_G = jax.value_and_grad(fwd_loss)(G_list, b, w_found, slots, env)
        tot = loss
        for i in range(3):
            pre_i = jax.tree_util.tree_map(
                lambda a: a[wsel], env["windows"]["preps"][i])
            g128 = g_G[i].reshape(-1, 128)
            gs = g128.at[pre_i.order].get(
                unique_indices=True, mode="promise_in_bounds")
            gs = jnp.where(pre_i.trash[:, None], 0.0, gs)
            g_hi = gs.astype(jnp.bfloat16)
            tot = tot + g_hi[0, 0].astype(jnp.float32)
        return pk, acc + tot

    timed(v_reorder, (packed, jnp.float32(0)), env, label="win_reorder")

    def full_body(carry, it, env, direct: bool):
        pk, m, v, acc = carry
        b, corners, w_found, slots, G_list, wsel = fwd_parts(pk, it, env)
        if direct:
            def loss_of_feat(feat, b):
                pred = decoder.sdf(env["geo"], feat)
                return losses.sdf_bce_loss(
                    pred, b["sdf_label"], s.sigma_sigmoid,
                    jnp.abs(b["weight"]), s.loss_weight_on, s.loss_reduction)

            f = None
            for i in range(3):
                contrib = adam_kernel.lanefold(
                    G_list[i], slots[i], w_found[i], D)
                f = contrib if f is None else f + contrib
            loss, g_feat = jax.value_and_grad(loss_of_feat)(f, b)
        else:
            loss, g_G = jax.value_and_grad(fwd_loss)(
                G_list, b, w_found, slots, env)
        new_p, new_m, new_v = [], [], []
        for i in range(3):
            C_i, D_i = feat_shapes[i]
            pre_i = jax.tree_util.tree_map(
                lambda a: a[wsel], env["windows"]["preps"][i])
            if direct:
                # manual sorted lane-aligned bf16 grads from (w, g_feat)
                order = pre_i.order
                b_s = order // 8
                w_s = w_found[i].reshape(-1)[order]
                slot_s = slots[i].reshape(-1)[order]
                gf_s = g_feat[b_s]  # (M, D)
                lane = jnp.arange(128, dtype=jnp.int32)
                selm = (lane[None, :] // D_i) == slot_s[:, None]
                g128 = jnp.where(
                    selm, w_s[:, None] * jnp.tile(gf_s, (1, PACK)), 0.0)
                g128 = jnp.where(pre_i.trash[:, None], 0.0, g128)
                # hand the kernel PRE-SORTED grads: pass pre with identity
                # order (grads already sorted)
                pre_sorted = adam_kernel.EntryPrep(
                    order=jnp.arange(order.shape[0], dtype=order.dtype),
                    trash=jnp.zeros_like(pre_i.trash),
                    prow_p=pre_i.prow_p, offs=pre_i.offs, ok=pre_i.ok)
                rows = corners[i].reshape(-1)  # unused content-wise
                p_n, m_n, v_n = adam_kernel.fused_adam_packed(
                    pk[i], m[i], v[i], rows, g128,
                    jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
                    C_i, D_i, use_pallas=True, lanes=True,
                    n_used=s.n_used[i], grads_bf16=True, pre=pre_sorted)
            else:
                p_n, m_n, v_n = adam_kernel.fused_adam_packed(
                    pk[i], m[i], v[i], corners[i].reshape(-1),
                    g_G[i].reshape(-1, 128),
                    jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
                    C_i, D_i, use_pallas=True, lanes=True,
                    n_used=s.n_used[i], grads_bf16=True, pre=pre_i)
            new_p.append(p_n)
            new_m.append(m_n)
            new_v.append(v_n)
        return tuple(new_p), tuple(new_m), tuple(new_v), acc + loss

    timed(lambda c, it, env: full_body(c, it, env, False),
          (packed, zerosB, zerosB, jnp.float32(0)), env, label="win_full")
    timed(lambda c, it, env: full_body(c, it, env, True),
          (packed, zerosB, zerosB, jnp.float32(0)), env, label="full_direct")

    # kernel only: fixed sorted bf16-able grads + pre (the sweep floor)
    g_fixed = []
    for i in range(3):
        M = s.bs * 8
        rng = np.random.default_rng(i)
        g = np.zeros((M, 128), np.float32)
        g[:, :D] = rng.normal(size=(M, D)).astype(np.float32)
        g_fixed.append(jnp.asarray(g))
    pre0 = [jax.tree_util.tree_map(lambda a: a[0], windows["preps"][i])
            for i in range(3)]
    corners0 = [pre_lookups[i][0][windows["idx"][0]] for i in range(3)]
    env2 = dict(env, g_fixed=tuple(g_fixed), pre0=tuple(pre0),
                corners0=tuple(corners0))

    def v_kern(carry, it, env):
        pk, m, v, acc = carry
        new_p, new_m, new_v = [], [], []
        for i in range(3):
            C_i, D_i = feat_shapes[i]
            p_n, m_n, v_n = adam_kernel.fused_adam_packed(
                pk[i], m[i], v[i], env["corners0"][i].reshape(-1),
                env["g_fixed"][i] * (1.0 + acc * 0),
                jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
                C_i, D_i, use_pallas=True, lanes=True,
                n_used=s.n_used[i], grads_bf16=True, pre=env["pre0"][i])
            new_p.append(p_n)
            new_m.append(m_n)
            new_v.append(v_n)
        return tuple(new_p), tuple(new_m), tuple(new_v), acc + new_p[0][0, 0]

    timed(v_kern, (packed, zerosB, zerosB, jnp.float32(0)), env2,
          label="kern_only")

    # ---- forward-gather variants
    roffs = []
    off = 0
    for C_i, D_i in feat_shapes:
        roffs.append(off)
        off += C_i * D_i // 128
    fused_tab = jnp.concatenate(packed, axis=0)

    def v_gfused(carry, it, env):
        ft, acc = carry
        b, corners, found, _ = win_batch(it, env)
        allc = jnp.concatenate(
            [corners[i] + roffs[i] * PACK for i in range(3)], axis=1)
        G = adam_kernel.gather_lanerows(ft, allc, D)  # (B, 24, 128)
        return ft, acc + G[0, 0, 0]

    timed(v_gfused, (fused_tab, jnp.float32(0)), env, label="gfused")

    bf16_tabs = tuple(p.astype(jnp.bfloat16) for p in packed)

    def v_gbf16(carry, it, env):
        bt, acc = carry
        b, corners, found, _ = win_batch(it, env)
        tot = jnp.float32(0)
        for i in range(3):
            G = adam_kernel.gather_lanerows(bt[i], corners[i], D)
            tot = tot + G[0, 0, 0].astype(jnp.float32)
        return bt, acc + tot

    timed(v_gbf16, (bf16_tabs, jnp.float32(0)), env, label="gbf16")

    # narrow (C, D) gather through a free reshape of the packed table
    def v_gnarrow(carry, it, env):
        pk, acc = carry
        b, corners, found, _ = win_batch(it, env)
        tot = jnp.float32(0)
        for i in range(3):
            C_i, D_i = feat_shapes[i]
            nf = pk[i].reshape(C_i, D_i)
            tot = tot + jnp.sum(nf[corners[i]][0, 0])
        return pk, acc + tot

    timed(v_gnarrow, (packed, jnp.float32(0)), env, label="gnarrow")


if __name__ == "__main__":
    main()
