"""Isolate what makes the one-hot fused-Adam Pallas kernel slow.

Variants at bench scale (C=4.2M rows, M=65536 entries, per level):
  copy      : stream p in->out only (pure pipeline rate)
  sweep     : p,m,v in -> Adam with g=0 -> p,m,v out
  +window   : add the g window DMAs (dynamic offsets), unused
  +onehot   : add one-hot build, no matmul (sum instead)
  +dot_bf16 : full kernel, hi/lo bf16 matmul (exact for 0/1 A)
  +dot_hi   : full kernel, HIGHEST precision f32 dot (round-1 version)

  timeout 1800 python experiments/exp_pallas_debug.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B1, B2, EPS = 0.9, 0.99, 1e-15
D = 8
PACK = 128 // D


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_kernel(tb, w, variant):
    def kernel(offs_ref, scal_ref, p_ref, m_ref, v_ref,
               prow0_ref, prow1_ref, g0h_ref, g0l_ref, g1h_ref, g1l_ref,
               po_ref, mo_ref, vo_ref):
        t = pl.program_id(0)
        lr = scal_ref[0]
        bc1 = scal_ref[1]
        bc2 = scal_ref[2]
        if variant == "copy":
            po_ref[:] = p_ref[:]
            mo_ref[:] = m_ref[:]
            vo_ref[:] = v_ref[:]
            return
        if variant == "sweep":
            gtile = jnp.zeros((tb, 128), jnp.float32)
        elif variant == "window":
            # touch the windows so DMAs happen, but no one-hot work
            touch = (
                jnp.sum(g0h_ref[:].astype(jnp.float32))
                + jnp.sum(g1h_ref[:].astype(jnp.float32))
                + jnp.sum(prow0_ref[:].astype(jnp.float32))
                + jnp.sum(prow1_ref[:].astype(jnp.float32))
            )
            gtile = jnp.zeros((tb, 128), jnp.float32) + touch * 0.0
        else:
            s_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0) + t * tb
            A0 = (prow0_ref[:] == s_ids)
            A1 = (prow1_ref[:] == s_ids)
            if variant == "onehot":
                gtile = (
                    jnp.sum(A0.astype(jnp.float32), axis=1, keepdims=True)
                    + jnp.sum(A1.astype(jnp.float32), axis=1, keepdims=True)
                ) * jnp.zeros((tb, 128), jnp.float32)
            elif variant == "dot_bf16":
                A0b = A0.astype(jnp.bfloat16)
                A1b = A1.astype(jnp.bfloat16)
                gtile = (
                    jnp.dot(A0b, g0h_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(A0b, g0l_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(A1b, g1h_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(A1b, g1l_ref[:], preferred_element_type=jnp.float32)
                )
            else:  # dot_hi
                A0f = A0.astype(jnp.float32)
                A1f = A1.astype(jnp.float32)
                g0 = g0h_ref[:].astype(jnp.float32) + g0l_ref[:].astype(jnp.float32)
                g1 = g1h_ref[:].astype(jnp.float32) + g1l_ref[:].astype(jnp.float32)
                gtile = (
                    jnp.dot(A0f, g0, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    + jnp.dot(A1f, g1, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
                )
        m_new = B1 * m_ref[:] + (1 - B1) * gtile
        v_new = B2 * v_ref[:] + (1 - B2) * gtile * gtile
        po_ref[:] = p_ref[:] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
        mo_ref[:] = m_new
        vo_ref[:] = v_new

    return kernel


@functools.partial(jax.jit, static_argnames=("tb", "w", "variant"))
def fused(p, m, v, prow_p, g_hi, g_lo, offs, scal, tb, w, variant):
    C = p.shape[0]
    R = C // PACK
    T = R // tb
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
        ],
    )
    po, mo, vo = pl.pallas_call(
        make_kernel(tb, w, variant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(offs, scal, p.reshape(R, 128), m.reshape(R, 128), v.reshape(R, 128),
      prow_p, prow_p, g_hi, g_lo, g_hi, g_lo)
    return po.reshape(C, D), mo.reshape(C, D), vo.reshape(C, D)


def main():
    log(f"devices: {jax.devices()}")
    C = 1 << 22
    M = 65536
    tb = int(os.environ.get("TB", 256))
    w = int(os.environ.get("W", 256))
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, C - 1, M)).astype(np.int32)
    grads = rng.normal(size=(M, D)).astype(np.float32)

    # host-side prep of the kernel inputs (timed separately)
    prow = (rows // PACK).astype(np.int32)
    R = C // PACK
    T = R // tb
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = np.full((1, Mpad), -1, np.int32)
    prow_p[0, :M] = prow
    g128 = np.zeros((Mpad, 128), np.float32)
    lane = np.arange(128)
    mask = (lane[None, :] // D) == (rows % PACK)[:, None]
    g128[:M] = np.where(mask, np.tile(grads, (1, PACK)), 0.0)
    g_hi = jnp.asarray(g128).astype(jnp.bfloat16)
    g_lo = (jnp.asarray(g128) - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    wstart = np.searchsorted(prow, np.arange(T) * tb)
    offs = np.minimum(wstart // w, Mpad // w - 2).astype(np.int32)

    p = jnp.array(rng.normal(size=(C, D)).astype(np.float32))
    m = jnp.zeros((C, D), jnp.float32)
    v = jnp.zeros((C, D), jnp.float32)
    prow_j = jnp.asarray(prow_p)
    offs_j = jnp.asarray(offs)
    scal = jnp.array([1e-4, 0.5, 0.5, 0.0], jnp.float32)

    # correctness of dot_bf16 vs numpy dense
    po, mo, vo = fused(p, m, v, prow_j, g_hi, g_lo, offs_j, scal, tb, w, "dot_bf16")
    gd = np.zeros((C, D), np.float32)
    np.add.at(gd, rows, grads)
    m_ref = (1 - B1) * gd
    v_ref = (1 - B2) * gd * gd
    p_ref = np.asarray(p) - 1e-4 * (m_ref / 0.5) / (np.sqrt(v_ref / 0.5) + EPS)
    err_p = float(np.max(np.abs(np.asarray(po) - p_ref)))
    err_m = float(np.max(np.abs(np.asarray(mo) - m_ref)))
    log(f"correctness dot_bf16: p {err_p:.3e} m {err_m:.3e}")

    import os as _os
    variants = _os.environ.get(
        "VARIANTS", "copy,sweep,window,dot_bf16"
    ).split(",")
    for variant in variants:
        @jax.jit
        def chunk(p, m, v, n=50, variant=variant):
            def body(c, _):
                p, m, v = c
                return fused(p, m, v, prow_j, g_hi, g_lo, offs_j, scal,
                             tb, w, variant), 0.0
            (p, m, v), _ = jax.lax.scan(body, (p, m, v), None, length=n)
            return p, m, v

        times = []
        pp, mm, vv = p, m, v
        for rep in range(4):
            t0 = time.perf_counter()
            pp, mm, vv = chunk(pp, mm, vv)
            _ = float(pp[0, 0])
            t1 = time.perf_counter()
            if rep:
                times.append((t1 - t0) / 50)
        log(f"{variant:9s}: {min(times)*1e3:7.3f} ms/level")


if __name__ == "__main__":
    main()
