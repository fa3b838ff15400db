"""Prototype the round-3 "winx" iteration and A/B it against win_full.

Key round-3 measurement (exp_r3_ablation.py): gathers are row-count-bound
(~10-16 ns/row regardless of row width), and a node's 8 corners almost
always share ONE packed (R, 128) row (bench world: mean 1.3, max 4 unique
packed rows per sample per level) because growth allocates a node's
corners contiguously.  So:

* forward: gather K=4 packed rows per sample per level — (B, L*K) rows
  from the CONCATENATED (R_tot, 128) table in ONE gather (98k rows vs
  196k in three gathers; measured 3.13 -> ~1.0 ms),
* interpolation: corner weights accumulate into per-(sample, row) weight
  masks (w_k) before multiplying the gathered rows — same math, grouped
  by row,
* backward: d loss/d G is (B, L*K, 128) lane-aligned with HALF the
  entries; ONE fused_adam_packed_multi_pre kernel dispatch updates all
  levels (global argsort precomputed per window),
* batch prep: window batches are pre-gathered into (W, bs, ...) stacks —
  per-iteration "sampling" is a contiguous dynamic slice, not gathers.

  timeout 3000 python experiments/exp_r3_winx.py
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
from shine_mapping_tpu.ops.interp import corner_weights
from shine_mapping_tpu.ops import adam_kernel

from bench import build_bench_world  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    L = len(levels)
    feat_shapes = tuple(tuple(f.shape) for f in params["features"])
    D = feat_shapes[0][1]
    PACK = 128 // D
    geo0 = params["geo"]
    bs = s.bs

    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features),
    )

    # ---- K: max unique packed rows per (sample, level) over the pool
    @jax.jit
    def max_uniq(pre):
        def per_level(c):
            pr = jnp.sort(c // PACK, axis=1)
            nf = jnp.concatenate(
                [jnp.ones((c.shape[0], 1), bool), pr[:, 1:] != pr[:, :-1]],
                axis=1)
            return jnp.max(jnp.sum(nf, axis=1))

        return jnp.max(jnp.stack([per_level(pre[i][0]) for i in range(L)]))

    K = int(max_uniq(pre_lookups))
    log(f"K (max unique packed rows/sample/level) = {K}")

    Rs, Rus, roffs, tb, w_geom, rowmap_np, lvl_np = (
        adam_kernel._multi_geometry(feat_shapes, bs * L * K, s.n_used))
    log(f"geometry: tb={tb} w={w_geom} Rus={Rus} T={rowmap_np.shape[0]}")

    # ---- window precompute (K-dedup + stacked batches + global EntryPrep)
    W = max(-(n_pool // -bs), 1)
    perm = jax.random.permutation(jax.random.PRNGKey(7), n_pool)
    if W * bs > n_pool:
        reps = -((W * bs) // -n_pool)
        perm = jnp.tile(perm, reps)
    win_idx = perm[: W * bs].reshape(W, bs).astype(jnp.int32)

    def prep_window(idx):
        out = {}
        out["coord"] = dev_pool["coord"][idx]
        out["sdf_label"] = dev_pool["sdf_label"][idx]
        out["weight"] = dev_pool["weight"][idx]
        rows_kg, kidx_all, slots_all, found_all, zero_all = [], [], [], [], []
        for i in range(L):
            corners = pre_lookups[i][0][idx]        # (bs, 8)
            found = pre_lookups[i][1][idx]          # (bs,)
            prow8 = (corners // PACK).astype(jnp.int32)
            slots8 = (corners % PACK).astype(jnp.int8)
            order8 = jnp.argsort(prow8, axis=1)
            sp = jnp.take_along_axis(prow8, order8, axis=1)
            newf = jnp.concatenate(
                [jnp.ones((bs, 1), bool), sp[:, 1:] != sp[:, :-1]], axis=1)
            kpos = jnp.cumsum(newf, axis=1) - 1     # (bs, 8) sorted order
            nuniq = kpos[:, -1] + 1
            bidx = jnp.arange(bs)[:, None]
            kidx = jnp.zeros((bs, 8), jnp.int8).at[bidx, order8].set(
                kpos.astype(jnp.int8))
            rows_k = jnp.zeros((bs, K), jnp.int32).at[bidx, kpos].set(sp)
            valid_k = (jnp.arange(K)[None, :] < nuniq[:, None]) & found[:, None]
            # pads spread EVENLY over the level's used rows (zero grads,
            # balanced tile windows — a modulo spread bunches them in the
            # first bs*K rows and overflows those tiles)
            flat = jnp.arange(bs * K, dtype=jnp.int32).reshape(bs, K)
            q, r = divmod(max(Rus[i] - 1, 1), bs * K)
            spread = flat * q + (flat * r) // (bs * K)
            rows_g = jnp.where(valid_k, rows_k, spread) + int(roffs[i])
            rows_kg.append(rows_g)
            kidx_all.append(kidx)
            slots_all.append(slots8)
            found_all.append(found)
            zero_all.append(~valid_k)
        rows_kg = jnp.concatenate(rows_kg, axis=1)          # (bs, L*K)
        prow_g = rows_kg.reshape(-1)
        zero_mask = jnp.concatenate(zero_all, axis=1).reshape(-1)
        pre = adam_kernel.entry_prep_multi(
            prow_g, zero_mask, feat_shapes, s.n_used)
        out["rows_kg"] = rows_kg
        out["kidx"] = jnp.concatenate(kidx_all, axis=1)     # (bs, L*8)
        out["slots"] = jnp.concatenate(slots_all, axis=1)   # (bs, L*8)
        out["found"] = jnp.stack(found_all, axis=1)         # (bs, L)
        out["pre"] = pre
        return out

    @jax.jit
    def prep_all(win_idx):
        return jax.lax.map(prep_window, win_idx)

    t0 = time.perf_counter()
    winx = prep_all(win_idx)
    _ = float(winx["pre"].ok[-1])
    log(f"winx precompute: {time.perf_counter() - t0:.2f} s ({W} windows)")
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(winx))
    log(f"winx memory: {nbytes/1e6:.0f} MB")

    packed = tuple(jnp.asarray(np.asarray(f).reshape(-1, 128))
                   for f in params["features"])
    fused0 = jnp.concatenate(packed, axis=0)
    zerosBf = jnp.zeros_like(fused0, jnp.bfloat16)
    lanegrp = jnp.arange(128, dtype=jnp.int32) // D
    lr_scales = tuple(s.lr_level_reduce_ratio ** i for i in range(L))

    def winx_body(carry, it, env):
        ft, m, v, acc = carry
        wx = env["winx"]
        wsel = jnp.mod(it, W)
        sl = lambda a: jax.lax.dynamic_index_in_dim(a, wsel, 0, False)
        coords = sl(wx["coord"])
        sdf_label = sl(wx["sdf_label"])
        weight = sl(wx["weight"])
        rows_kg = sl(wx["rows_kg"])
        kidx = sl(wx["kidx"]).astype(jnp.int32)
        slots = sl(wx["slots"]).astype(jnp.int32)
        found = sl(wx["found"])
        pre = jax.tree_util.tree_map(sl, wx["pre"])

        G = ft[rows_kg]  # (bs, L*K, 128) — ONE gather for all levels

        def loss_of(G):
            f = None
            for i in range(L):
                w8 = corner_weights(coords, levels[i], s.poly_int_on)
                w8 = jnp.where(found[:, i][:, None], w8, 0.0)
                sl_i = slots[:, i * 8:(i + 1) * 8]
                ki = kidx[:, i * 8:(i + 1) * 8]
                w_m = jnp.where(
                    lanegrp[None, None, :] == sl_i[:, :, None],
                    w8[:, :, None], 0.0)                      # (bs,8,128)
                onek = (ki[:, :, None]
                        == jnp.arange(K)[None, None, :]).astype(jnp.float32)
                w_k = jnp.einsum("bcl,bck->bkl", w_m, onek)   # (bs,K,128)
                c128 = jnp.einsum(
                    "bkl,bkl->bl", w_k, G[:, i * K:(i + 1) * K])
                fi = c128.reshape(bs, PACK, D).sum(axis=1)
                f = fi if f is None else f + fi
            pred = decoder.sdf(env["geo"], f)
            return losses.sdf_bce_loss(
                pred, sdf_label, s.sigma_sigmoid, jnp.abs(weight),
                s.loss_weight_on, s.loss_reduction)

        loss, g_G = jax.value_and_grad(loss_of)(G)
        ft, m, v = adam_kernel.fused_adam_packed_multi_pre(
            ft, m, v, g_G.reshape(-1, 128), rows_kg.reshape(-1), pre,
            jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
            feat_shapes, lr_scales, eps=s.adam_eps,
            use_pallas=adam_kernel.on_tpu(),
            n_used=s.n_used, grads_bf16=True)
        return (ft, m, v, acc + loss)

    env = dict(winx=winx, geo=geo0)

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
        return t, carry

    t_winx, carry_winx = timed(
        winx_body, (fused0, zerosBf, zerosBf, jnp.float32(0)), env,
        label="winx_full")

    # ---- correctness: one 50-iter chunk vs the per-level windows path
    # (same batches, same init) — compare final tables
    windows = trainer.precompute_batch_windows(
        pre_lookups, n_pool, jax.random.PRNGKey(7), s, feat_shapes)
    # identical permutation? precompute_batch_windows uses PRNGKey(7) and
    # the same construction, so win_idx must match
    assert np.array_equal(np.asarray(windows["idx"]), np.asarray(win_idx)), \
        "window permutations diverged"

    def ref_body(carry, it, env):
        pk, m, v, acc = carry
        wx = env["windows"]
        wsel = jnp.mod(it, W)
        idx = wx["idx"][wsel]
        b = {
            "coord": dev_pool["coord"][idx],
            "sdf_label": dev_pool["sdf_label"][idx],
            "weight": dev_pool["weight"][idx],
        }
        corners = [pre_lookups[i][0][idx] for i in range(L)]
        found = [pre_lookups[i][1][idx] for i in range(L)]
        slots = [c % PACK for c in corners]
        G_list = [adam_kernel.gather_lanerows(pk[i], corners[i], D)
                  for i in range(L)]

        def loss_of(G_list):
            f = None
            for i in range(L):
                w8 = corner_weights(b["coord"], levels[i], s.poly_int_on)
                w8 = jnp.where(found[i][:, None], w8, 0.0)
                c = adam_kernel.lanefold(G_list[i], slots[i], w8, D)
                f = c if f is None else f + c
            pred = decoder.sdf(env["geo"], f)
            return losses.sdf_bce_loss(
                pred, b["sdf_label"], s.sigma_sigmoid, jnp.abs(b["weight"]),
                s.loss_weight_on, s.loss_reduction)

        loss, g_G = jax.value_and_grad(loss_of)(G_list)
        new_p, new_m, new_v = [], [], []
        for i in range(L):
            C_i, D_i = feat_shapes[i]
            pre_i = jax.tree_util.tree_map(
                lambda a: a[wsel], env["windows"]["preps"][i])
            p_n, m_n, v_n = adam_kernel.fused_adam_packed(
                pk[i], m[i], v[i], corners[i].reshape(-1),
                g_G[i].reshape(-1, 128),
                jnp.float32(0.01), jnp.float32(0.5), jnp.float32(0.5),
                C_i, D_i, use_pallas=adam_kernel.on_tpu(), lanes=True,
                n_used=s.n_used[i], grads_bf16=True, pre=pre_i)
            new_p.append(p_n)
            new_m.append(m_n)
            new_v.append(v_n)
        return (tuple(new_p), tuple(new_m), tuple(new_v), acc + loss)

    env2 = dict(windows=windows, geo=geo0)
    zerosB = tuple(jnp.zeros_like(p, jnp.bfloat16) for p in packed)
    t_ref, carry_ref = timed(
        ref_body, (packed, zerosB, zerosB, jnp.float32(0)), env2,
        label="ref_full")

    # compare
    ft_x = carry_winx[0]
    p_ref_cat = jnp.concatenate(carry_ref[0], axis=0)
    d = np.asarray(jnp.abs(ft_x - p_ref_cat))
    scale = np.asarray(jnp.abs(p_ref_cat)).max()
    log(f"max |p_winx - p_ref| = {d.max():.3e} (scale {scale:.3e}); "
        f"loss winx {float(carry_winx[3]):.4f} vs ref {float(carry_ref[3]):.4f}")
    log(f"SPEEDUP: {t_ref/t_winx:.2f}x ({t_ref*1e3:.2f} -> {t_winx*1e3:.2f} "
        f"ms/iter)")


if __name__ == "__main__":
    main()
