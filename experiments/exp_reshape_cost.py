"""Is (C,8)<->(C/16,128) reshape a physical relayout copy on TPU?

And: how fast is the pallas fused kernel when p,m,v stay packed (R,128)
across the scan (no reshapes at the boundary)?

  timeout 580 python experiments/exp_reshape_cost.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.exp_pallas_debug import fused, PACK, D


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(chunk, carry, label, reps=3):
    times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        carry = chunk(carry)
        _ = float(jax.tree_util.tree_leaves(carry)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep:
            times.append((t1 - t0) / 50)
    log(f"{label}: {min(times)*1e3:7.3f} ms/iter")
    return carry


def main():
    log(f"devices: {jax.devices()}")
    C = 1 << 22
    R = C // PACK
    M = 65536
    tb, w = 512, 256
    rng = np.random.default_rng(0)
    p = jnp.array(rng.normal(size=(C, D)).astype(np.float32))

    # 1. reshape round-trip + add
    @jax.jit
    def chunk_reshape(p):
        def body(p, _):
            q = p.reshape(R, 128)
            q = q + 1e-9
            return q.reshape(C, D), 0.0
        p, _ = jax.lax.scan(body, p, None, length=50)
        return p

    timed(chunk_reshape, p, "reshape (C,8)->(R,128)->back + eps")

    # 2. same add without reshape
    @jax.jit
    def chunk_plain(p):
        def body(p, _):
            return p + 1e-9, 0.0
        p, _ = jax.lax.scan(body, p, None, length=50)
        return p

    timed(chunk_plain, p, "plain add (C,8)")

    @jax.jit
    def chunk_plain_packed(q):
        def body(q, _):
            return q + 1e-9, 0.0
        q, _ = jax.lax.scan(body, q, None, length=50)
        return q

    timed(chunk_plain_packed, jnp.array(np.asarray(p).reshape(R, 128)),
          "plain add (R,128)")

    # 3. pallas kernel with packed carry (kernel input stays (R,128))
    tb = int(os.environ.get("TB", tb))
    w = int(os.environ.get("W", w))
    rows = np.sort(rng.integers(0, C - 1, M)).astype(np.int32)
    grads = rng.normal(size=(M, D)).astype(np.float32)
    prow = (rows // PACK).astype(np.int32)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = np.full((1, Mpad), -1, np.int32)
    prow_p[0, :M] = prow
    lane = np.arange(128)
    mask = (lane[None, :] // D) == (rows % PACK)[:, None]
    g128 = np.zeros((Mpad, 128), np.float32)
    g128[:M] = np.where(mask, np.tile(grads, (1, PACK)), 0.0)
    g_hi = jnp.asarray(g128).astype(jnp.bfloat16)
    g_lo = (jnp.asarray(g128) - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    T = R // tb
    wstart = np.searchsorted(prow, np.arange(T) * tb)
    offs = jnp.asarray(np.minimum(wstart // w, Mpad // w - 2).astype(np.int32))
    prow_j = jnp.asarray(prow_p)
    scal = jnp.array([1e-4, 0.5, 0.5, 0.0], jnp.float32)

    @jax.jit
    def chunk_pallas(carry):
        def body(c, _):
            p, m, v = c
            out = fused(p, m, v, prow_j, g_hi, g_lo, offs, scal, tb, w,
                        "dot_bf16")
            return out, 0.0
        c, _ = jax.lax.scan(body, carry, None, length=50)
        return c

    # fused() reshapes (C,D)->(R,128) internally and back; to keep packed
    # carry, wrap: carry packed, view as (C,D) at the boundary — the two
    # reshapes should cancel if they are metadata-only
    @jax.jit
    def chunk_pallas_packed(carry):
        def body(c, _):
            p, m, v = c  # (R,128)
            po, mo, vo = fused(p.reshape(C, D), m.reshape(C, D), v.reshape(C, D),
                               prow_j, g_hi, g_lo, offs, scal, tb, w, "dot_bf16")
            return (po.reshape(R, 128), mo.reshape(R, 128), vo.reshape(R, 128)), 0.0
        c, _ = jax.lax.scan(body, carry, None, length=50)
        return c

    m0 = jnp.zeros((C, D), jnp.float32)
    v0 = jnp.zeros((C, D), jnp.float32)
    if os.environ.get("WITH_C8"):
        timed(chunk_pallas, (p, m0, v0), "pallas dot_bf16 (C,8) carry")
    pk = jnp.array(np.asarray(p).reshape(R, 128))
    mk = jnp.zeros((R, 128), jnp.float32)
    vk = jnp.zeros((R, 128), jnp.float32)
    timed(chunk_pallas_packed, (pk, mk, vk),
          f"pallas dot_bf16 packed tb={tb} w={w}")


if __name__ == "__main__":
    main()
