"""Per-iteration cost of the pallas-update PREP, hoist-proofed.

Earlier isolated numbers were invalid: rows/grads were loop-invariant so
XLA hoisted the whole prep out of the scan.  Here every variant derives
rows from the carry (cheap xor) so nothing can hoist.

  sortonly : argsort + two permutation gathers
  g128     : + lane expansion + bf16 hi/lo
  pad      : + pad concats + searchsorted + offsets + ok
  kernel   : + pallas kernel (no cond)
  cond     : + lax.cond(ok, pallas, xla)
  xlaref   : explicit scatter + dense adam (the fused-mode cost)

  timeout 1800 python experiments/exp_prep_bisect.py
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


C, D, M = 1 << 22, 8, 65536
PACK = 128 // D
R = C // PACK
tb, w = adam_kernel.choose_tiles(C, D, M)
T = R // tb
Mpad = ((M + w - 1) // w) * w + w


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
    log(f"{label:9s}: {min(times)*1e3:8.3f} ms/iter")


def dep_rows(env, p):
    # depend on the carry so nothing hoists; value unchanged (xor 0)
    z = (p[0, 0] * 0.0).astype(jnp.int32)
    return env["rows"] ^ z


def sort_part(rows, grads):
    order = jnp.argsort(rows)
    hints = dict(unique_indices=True, mode="promise_in_bounds")
    rows_s = rows.at[order].get(**hints)
    grads_s = grads.at[order].get(**hints)
    return rows_s, grads_s


def g128_part(rows_s, grads_s):
    prow = (rows_s // PACK).astype(jnp.int32)
    lane = jnp.arange(128, dtype=jnp.int32)
    g_rep = jnp.tile(grads_s, (1, PACK))
    mask = (lane[None, :] // D) == (rows_s % PACK)[:, None].astype(jnp.int32)
    g128 = jnp.where(mask, g_rep, 0.0)
    g_hi = g128.astype(jnp.bfloat16)
    g_lo = (g128 - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return prow, g_hi, g_lo


def pad_part(prow, g_hi, g_lo):
    pad_g = jnp.zeros((Mpad - M, 128), jnp.bfloat16)
    g_hi = jnp.concatenate([g_hi, pad_g], axis=0)
    g_lo = jnp.concatenate([g_lo, pad_g], axis=0)
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    bounds = jnp.arange(T + 1, dtype=jnp.int32) * tb
    ws = jnp.searchsorted(prow, bounds).astype(jnp.int32)
    offs = jnp.minimum(ws[:-1] // w, Mpad // w - 2).astype(jnp.int32)
    ok = jnp.all(ws[1:] <= offs * w + 2 * w)
    return prow_p, g_hi, g_lo, offs, ok


def main():
    log(f"devices: {jax.devices()}  tb={tb} w={w}")
    rng = np.random.default_rng(0)
    env = dict(
        rows=jnp.asarray(rng.integers(0, C - 1, M).astype(np.int32)),
        grads=jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)),
        scal=jnp.array([1e-4, 0.5, 0.5, 0.0], jnp.float32),
    )
    p = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
    m = jnp.zeros((R, 128), jnp.float32)
    v = jnp.zeros((R, 128), jnp.float32)
    lr = jnp.float32(1e-4)
    bc = jnp.float32(0.5)

    def v_sortonly(carry, env):
        p, m, vv = carry
        rows_s, grads_s = sort_part(dep_rows(env, p), env["grads"])
        return p + grads_s[0, 0] * 1e-12 + rows_s[0] * 0.0, m, vv

    timed(v_sortonly, (p, m, v), env, "sortonly")

    def v_g128(carry, env):
        p, m, vv = carry
        rows_s, grads_s = sort_part(dep_rows(env, p), env["grads"])
        prow, g_hi, g_lo = g128_part(rows_s, grads_s)
        touch = g_hi[0, 0].astype(jnp.float32) + g_lo[0, 0].astype(jnp.float32)
        return p + touch * 1e-12 + prow[0] * 0.0, m, vv

    timed(v_g128, (p, m, v), env, "g128")

    def v_pad(carry, env):
        p, m, vv = carry
        rows_s, grads_s = sort_part(dep_rows(env, p), env["grads"])
        prow, g_hi, g_lo = g128_part(rows_s, grads_s)
        prow_p, g_hi, g_lo, offs, ok = pad_part(prow, g_hi, g_lo)
        touch = (g_hi[0, 0].astype(jnp.float32) + offs[0].astype(jnp.float32)
                 + ok.astype(jnp.float32))
        return p + touch * 1e-12, m, vv

    timed(v_pad, (p, m, v), env, "pad")

    def v_kernel(carry, env):
        p, m, vv = carry
        rows_s, grads_s = sort_part(dep_rows(env, p), env["grads"])
        prow, g_hi, g_lo = g128_part(rows_s, grads_s)
        prow_p, g_hi, g_lo, offs, ok = pad_part(prow, g_hi, g_lo)
        return tuple(adam_kernel._pallas_update(
            p, m, vv, prow_p, g_hi, g_lo, offs, env["scal"],
            tb, w, 0.9, 0.99, 1e-15,
        ))

    timed(v_kernel, (p, m, v), env, "kernel")

    def v_cond(carry, env):
        p, m, vv = carry
        return tuple(adam_kernel.fused_adam_packed(
            p, m, vv, dep_rows(env, p), env["grads"], lr, bc, bc, C, D,
            use_pallas=True,
        ))

    timed(v_cond, (p, m, v), env, "cond")

    def v_xlaref(carry, env):
        p, m, vv = carry
        return adam_kernel._xla_update(
            p, m, vv, dep_rows(env, p), env["grads"], lr, bc, bc,
            C, D, 0.9, 0.99, 1e-15,
        )

    timed(v_xlaref, (p, m, v), env, "xlaref")


if __name__ == "__main__":
    main()
