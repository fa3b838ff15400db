"""Bisect the pallas-in-trainer regression (184 ms/iter vs 3.1 ms/level).

Variants (packed carry, one level, bench scale):
  kernel     : kernel alone, precomputed sorted inputs (expect ~3.1)
  prep       : + per-iter argsort/permute/g128/searchsorted prep
  cond       : + the lax.cond overflow fallback
  gatherview : + a (B,8) gather through the reshaped (C,8) view
  full3      : all of it x 3 levels (the trainer's actual work)

  timeout 1800 python experiments/exp_pallas_trainer.py
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

from shine_mapping_tpu.ops import adam_kernel


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, carry, env, label, n=50, reps=3):
    @jax.jit
    def chunk(carry, env):
        def body(c, _):
            return fn(c, env), 0.0
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    c = carry
    times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        c = chunk(c, env)
        _ = float(jax.tree_util.tree_leaves(c)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep:
            times.append((t1 - t0) / n)
    log(f"{label:11s}: {min(times)*1e3:8.3f} ms/iter")


def main():
    log(f"devices: {jax.devices()}")
    C, D, M = 1 << 22, 8, 65536
    B = 8192
    PACK = 128 // D
    R = C // PACK
    tb, w = adam_kernel.choose_tiles(C, D, M)
    log(f"tb={tb} w={w}")
    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, C - 1, M).astype(np.int32)
    rows_sorted = np.sort(rows_np)
    grads_np = rng.normal(size=(M, D)).astype(np.float32)

    p = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
    m = jnp.zeros((R, 128), jnp.float32)
    v = jnp.zeros((R, 128), jnp.float32)
    lr = jnp.float32(1e-4)
    bc = jnp.float32(0.5)

    # precomputed kernel inputs (sorted)
    prow = (rows_sorted // PACK).astype(np.int32)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = np.full((1, Mpad), -1, np.int32)
    prow_p[0, :M] = prow
    lane = np.arange(128)
    mask = (lane[None, :] // D) == (rows_sorted % PACK)[:, None]
    g128 = np.zeros((Mpad, 128), np.float32)
    g128[:M] = np.where(mask, np.tile(grads_np, (1, PACK)), 0.0)
    T = R // tb
    wstart = np.searchsorted(prow, np.arange(T) * tb)
    offs = np.minimum(wstart // w, Mpad // w - 2).astype(np.int32)

    env = dict(
        rows=jnp.asarray(rows_np), grads=jnp.asarray(grads_np),
        prow_p=jnp.asarray(prow_p),
        g_hi=jnp.asarray(g128).astype(jnp.bfloat16),
        g_lo=(jnp.asarray(g128) - jnp.asarray(g128).astype(jnp.bfloat16).astype(jnp.float32)).astype(jnp.bfloat16),
        offs=jnp.asarray(offs),
        scal=jnp.array([1e-4, 0.5, 0.5, 0.0], jnp.float32),
    )

    def v_kernel(carry, env):
        p, m, v = carry
        return tuple(adam_kernel._pallas_update(
            p, m, v, env["prow_p"], env["g_hi"], env["g_lo"], env["offs"],
            env["scal"], tb, w, 0.9, 0.99, 1e-15,
        ))

    timed(v_kernel, (p, m, v), env, "kernel")

    def prep(rows, grads):
        order = jnp.argsort(rows)
        hints = dict(unique_indices=True, mode="promise_in_bounds")
        rows_s = rows.at[order].get(**hints)
        grads_s = grads.at[order].get(**hints)
        prow = (rows_s // PACK).astype(jnp.int32)
        lane = jnp.arange(128, dtype=jnp.int32)
        g_rep = jnp.tile(grads_s, (1, PACK))
        mask = (lane[None, :] // D) == (rows_s % PACK)[:, None].astype(jnp.int32)
        g128 = jnp.where(mask, g_rep, 0.0)
        g_hi = g128.astype(jnp.bfloat16)
        g_lo = (g128 - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
        g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
        g_lo = jnp.concatenate([g_lo, pad_g], axis=0)
        prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
        bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
        ws = jnp.searchsorted(prow, bounds).astype(jnp.int32)
        offs = jnp.minimum(ws[:-1] // w, Mpad // w - 2).astype(jnp.int32)
        ok = jnp.all(ws[1:] <= offs * w + 2 * w)
        return prow_p, g_hi, g_lo, offs, ok

    def v_prep(carry, env):
        p, m, v = carry
        prow_p, g_hi, g_lo, offs, ok = prep(env["rows"], env["grads"])
        return tuple(adam_kernel._pallas_update(
            p, m, v, prow_p, g_hi, g_lo, offs, env["scal"],
            tb, w, 0.9, 0.99, 1e-15,
        ))

    timed(v_prep, (p, m, v), env, "prep")

    def v_cond(carry, env):
        p, m, v = carry
        return tuple(adam_kernel.fused_adam_packed(
            p, m, v, env["rows"], env["grads"], lr, bc, bc, C, D,
            use_pallas=True,
        ))

    timed(v_cond, (p, m, v), env, "cond")

    def v_gatherview(carry, env):
        p, m, v = carry
        fv = p.reshape(C, D)
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = fv[idx]
        g2 = env["grads"] + G.reshape(-1, D) * 1e-9
        return tuple(adam_kernel.fused_adam_packed(
            p, m, v, env["rows"], g2, lr, bc, bc, C, D, use_pallas=True,
        ))

    timed(v_gatherview, (p, m, v), env, "gatherview")

    def v_gatherpacked(carry, env):
        # the real trainer's formulation: lane-row gather (no reshape view)
        # feeding the same p that the kernel updates
        p, m, v = carry
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = adam_kernel.gather_rows_packed(p, idx, D)
        g2 = env["grads"] + G.reshape(-1, D) * 1e-9
        return tuple(adam_kernel.fused_adam_packed(
            p, m, v, env["rows"], g2, lr, bc, bc, C, D, use_pallas=True,
        ))

    timed(v_gatherpacked, (p, m, v), env, "gatherpacked")

    def v_gathercopy(carry, env):
        # explicit unpacked copy for the gather: pay a clean bandwidth-bound
        # (C,D) materialization instead of whatever layout dance the fused
        # gather forces
        p, m, v = carry
        pview = jax.lax.optimization_barrier(p).reshape(C, D)
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = pview[idx]
        g2 = env["grads"] + G.reshape(-1, D) * 1e-9
        return tuple(adam_kernel.fused_adam_packed(
            p, m, v, env["rows"], g2, lr, bc, bc, C, D, use_pallas=True,
        ))

    timed(v_gathercopy, (p, m, v), env, "gathercopy")

    def v_gather_nocond(carry, env):
        # tala gather + raw kernel, NO lax.cond: isolates whether the cond's
        # XLA branch (reshape(C,D) + scatter) is what forces the per-iter
        # relayout of p
        p, m, v = carry
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = adam_kernel.gather_rows_packed(p, idx, D)
        g2h = env["g_hi"] + (jnp.sum(G) * 1e-12).astype(jnp.bfloat16)
        return tuple(adam_kernel._pallas_update(
            p, m, v, env["prow_p"], g2h, env["g_lo"], env["offs"],
            env["scal"], tb, w, 0.9, 0.99, 1e-15,
        ))

    timed(v_gather_nocond, (p, m, v), env, "gather_nocond")

    def packed_xla_update(p, m, v, prow, g128v, lr, bc1, bc2):
        # fallback that never leaves the packed (R,128) world: scatter the
        # pre-built lane-placed gradient rows at prow, then sweep
        gd = jnp.zeros_like(p).at[prow].add(g128v)
        m2 = 0.9 * m + 0.1 * gd
        v2 = 0.99 * v + 0.01 * gd * gd
        p2 = p - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + 1e-15)
        return p2, m2, v2

    def v_gather_cond2(carry, env):
        # tala gather + cond whose BOTH branches stay packed-(R,128)
        p, m, v = carry
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = adam_kernel.gather_rows_packed(p, idx, D)
        g2h = env["g_hi"] + (jnp.sum(G) * 1e-12).astype(jnp.bfloat16)
        ok = jnp.all(env["offs"] >= 0)

        def do_p(args):
            p, m, v = args
            return tuple(adam_kernel._pallas_update(
                p, m, v, env["prow_p"], g2h, env["g_lo"], env["offs"],
                env["scal"], tb, w, 0.9, 0.99, 1e-15,
            ))

        def do_x(args):
            p, m, v = args
            g128v = (g2h.astype(jnp.float32) + env["g_lo"].astype(jnp.float32))
            return packed_xla_update(
                p, m, v, env["prow_p"][0], g128v, lr, bc, bc)

        return jax.lax.cond(ok, do_p, do_x, (p, m, v))

    timed(v_gather_cond2, (p, m, v), env, "gather_cond2")


if __name__ == "__main__":
    main()


def main2():
    """Round-3 gather-anomaly isolation (run after main)."""
    log(f"devices: {jax.devices()}")
    C, D, M = 1 << 22, 8, 65536
    B = 8192
    PACK = 128 // D
    R = C // PACK
    tb, w = adam_kernel.choose_tiles(C, D, M)
    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, C - 1, M).astype(np.int32)
    rows_sorted = np.sort(rows_np)
    prow = (rows_sorted // PACK).astype(np.int32)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = np.full((1, Mpad), -1, np.int32)
    prow_p[0, :M] = prow
    g128 = np.zeros((Mpad, 128), np.float32)
    T = R // tb
    offs = np.minimum(
        np.searchsorted(prow, np.arange(T) * tb) // w, Mpad // w - 2
    ).astype(np.int32)
    env = dict(
        rows=jnp.asarray(rows_np),
        prow_p=jnp.asarray(prow_p),
        g_hi=jnp.asarray(g128).astype(jnp.bfloat16),
        g_lo=jnp.asarray(g128).astype(jnp.bfloat16),
        offs=jnp.asarray(offs),
        scal=jnp.array([1e-4, 0.5, 0.5, 0.0], jnp.float32),
    )
    p = jnp.zeros((R, 128), jnp.float32)
    m = jnp.zeros((R, 128), jnp.float32)
    v = jnp.zeros((R, 128), jnp.float32)

    def v_gather_nodep(carry, env):
        # gather result does NOT feed the kernel: if this is fast, the slow
        # part is the dependency/hazard, not the gather op itself
        p, m, v, acc = carry
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = adam_kernel.gather_rows_packed(p, idx, D)
        out = adam_kernel._pallas_update(
            p, m, v, env["prow_p"], env["g_hi"], env["g_lo"], env["offs"],
            env["scal"], tb, w, 0.9, 0.99, 1e-15,
        )
        return (*out, acc + jnp.sum(G)), None

    def timed2(fn, carry, env, label, n=50, reps=3):
        @jax.jit
        def chunk(carry, env):
            def body(c, _):
                return fn(c, env)
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c
        c = carry
        times = []
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            c = chunk(c, env)
            _ = float(jax.tree_util.tree_leaves(c)[0].reshape(-1)[0])
            t1 = time.perf_counter()
            if rep:
                times.append((t1 - t0) / n)
        log(f"{label:14s}: {min(times)*1e3:8.3f} ms/iter")

    timed2(v_gather_nodep, (p, m, v, jnp.float32(0)), env, "gather_nodep")

    # kernel variant that ALSO emits a separate copy of the updated p for
    # the next iteration's gather to read (breaks the in-place hazard)
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel4(offs_ref, scal_ref, p_ref, m_ref, v_ref,
                 prow0_ref, prow1_ref, g0h_ref, g0l_ref, g1h_ref, g1l_ref,
                 po_ref, mo_ref, vo_ref, pc_ref, *, tb, w, b1, b2, eps,
                 copy_dtype):
        t = pl.program_id(0)
        lr = scal_ref[0]
        bc1 = scal_ref[1]
        bc2 = scal_ref[2]
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0) + t * tb
        A0 = (prow0_ref[:] == s_ids).astype(jnp.bfloat16)
        A1 = (prow1_ref[:] == s_ids).astype(jnp.bfloat16)
        gtile = (
            jnp.dot(A0, g0h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A0, g0l_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1h_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(A1, g1l_ref[:], preferred_element_type=jnp.float32)
        )
        m_new = b1 * m_ref[:] + (1.0 - b1) * gtile
        v_new = b2 * v_ref[:] + (1.0 - b2) * gtile * gtile
        p_new = p_ref[:] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        po_ref[:] = p_new
        mo_ref[:] = m_new
        vo_ref[:] = v_new
        pc_ref[:] = p_new.astype(copy_dtype)

    def pallas4(p128, m128, v128, prow_p, g_hi, g_lo, offs, scal, copy_dtype):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t])),
                pl.BlockSpec((1, w), lambda t, offs, scal: (0, offs[t] + 1)),
                pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t], 0)),
                pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t], 0)),
                pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0)),
                pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
                pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel4, tb=tb, w=w, b1=0.9, b2=0.99,
                              eps=1e-15, copy_dtype=copy_dtype),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((R, 128), copy_dtype)],
            input_output_aliases={2: 0, 3: 1, 4: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(offs, scal, p128, m128, v128, prow_p, prow_p, g_hi, g_lo, g_hi, g_lo)

    for dt, name in ((jnp.float32, "pcopy_f32"), (jnp.bfloat16, "pcopy_bf16")):
        pc0 = jnp.zeros((R, 128), dt)

        def v_pcopy(carry, env, dt=dt):
            p, m, v, pc = carry
            idx = env["rows"][: B * 8].reshape(B, 8)
            G = adam_kernel.gather_rows_packed(pc, idx, D)  # reads the COPY
            g2h = env["g_hi"] + (jnp.sum(G) * 1e-12).astype(jnp.bfloat16)
            out = pallas4(p, m, v, env["prow_p"], g2h, env["g_lo"],
                          env["offs"], env["scal"], dt)
            return tuple(out), None

        timed2(v_pcopy, (p, m, v, pc0), env, name)


if __name__ == "__main__":
    import sys as _s
    if "--round3" in _s.argv:
        main2()
    else:
        main()
