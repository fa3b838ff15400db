"""Round-2 perf experiment: Pallas fused scatter+Adam kernel vs XLA.

The round-1 cost model (BENCH_NOTES.md): dense path = 3x7 ms grad scatter
+ 3x2.4 ms Adam sweep + ~7 ms forward.  The XLA scatter is entry-bound
(0.107 us/entry) while the sweep is bandwidth-bound (~390 GB/s achieved).

Idea: replace {scatter dense grad table -> Adam sweep} with ONE Pallas
kernel that sweeps the table tiles (pipelined BlockSpecs) and *forms* each
tile's gradient in VMEM via a one-hot MXU matmul over the tile's sorted
gradient entries (no scatter anywhere).  Predicted ~2 ms/level instead of
9.4 ms/level.

Run under timeout on the real chip:
  timeout 600 python experiments/exp_fused_adam.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B1, B2 = 0.9, 0.99
EPS = 1e-15
D = 8
PACK = 128 // D  # corner rows per 128-lane row


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- reference


def xla_scatter_adam(p, m, v, rows, grads, lr, bc1, bc2):
    """Reference: dense grad table via scatter-add, then dense Adam sweep."""
    g = jnp.zeros_like(p).at[rows].add(grads)
    m = B1 * m + (1 - B1) * g
    v = B2 * v + (1 - B2) * g * g
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
    return p, m, v


# ---------------------------------------------------------------- pallas


def _fused_kernel(offs_ref, scal_ref, p_ref, m_ref, v_ref,
                  prow0_ref, prow1_ref, g0_ref, g1_ref,
                  po_ref, mo_ref, vo_ref, *, tb: int, w: int):
    t = pl.program_id(0)
    lr = scal_ref[0]
    bc1 = scal_ref[1]
    bc2 = scal_ref[2]
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, w), 0) + t * tb
    # one-hot over each window block separately (Mosaic dislikes 1D concat)
    A0 = (prow0_ref[:] == s_ids).astype(jnp.float32)  # (TB, W) via (1,W) bcast
    A1 = (prow1_ref[:] == s_ids).astype(jnp.float32)
    gtile = jnp.dot(A0, g0_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    gtile = gtile + jnp.dot(A1, g1_ref[:], preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    m_new = B1 * m_ref[:] + (1 - B1) * gtile
    v_new = B2 * v_ref[:] + (1 - B2) * gtile * gtile
    po_ref[:] = p_ref[:] - lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
    mo_ref[:] = m_new
    vo_ref[:] = v_new


@functools.partial(jax.jit, static_argnames=("tb", "w"))
def pallas_fused_adam(p, m, v, rows_sorted, grads_sorted, lr, bc1, bc2,
                      tb: int = 256, w: int = 256):
    """rows_sorted ascending (duplicates fine); grads_sorted (M, 8)."""
    C = p.shape[0]
    R = C // PACK
    T = R // tb
    M = rows_sorted.shape[0]

    prow = (rows_sorted // PACK).astype(jnp.int32)
    lane = jnp.arange(128, dtype=jnp.int32)
    g_rep = jnp.tile(grads_sorted, (1, PACK))  # (M,128): g_rep[k,l]=g[k,l%8]
    mask = (lane[None, :] // D) == (rows_sorted % PACK)[:, None].astype(jnp.int32)
    g128 = jnp.where(mask, g_rep, 0.0)

    # pad to multiple of w plus one spare block; prow lane-major (1, Mpad)
    Mpad = ((M + w - 1) // w) * w + w
    prow_p = jnp.full((1, Mpad), -1, jnp.int32).at[0, :M].set(prow)
    g128_p = jnp.zeros((Mpad, 128), g128.dtype).at[:M].set(g128)

    wstart = jnp.searchsorted(prow, jnp.arange(T, dtype=jnp.int32) * tb)
    offs = jnp.minimum(wstart // w, Mpad // w - 2).astype(jnp.int32)
    scal = jnp.stack([lr, bc1, bc2, jnp.float32(0)]).astype(jnp.float32)

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
            pl.BlockSpec((w, 128), lambda t, offs, scal: (offs[t] + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
            pl.BlockSpec((tb, 128), lambda t, offs, scal: (t, 0)),
        ],
    )
    p3 = p.reshape(R, 128)
    m3 = m.reshape(R, 128)
    v3 = v.reshape(R, 128)
    po, mo, vo = pl.pallas_call(
        functools.partial(_fused_kernel, tb=tb, w=w),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * 3,
    )(offs, scal, p3, m3, v3, prow_p, prow_p, g128_p, g128_p)
    return po.reshape(C, D), mo.reshape(C, D), vo.reshape(C, D)


# ---------------------------------------------------------------- harness


def timed_scan(fn, carry_init, n_iters, reps=3, label=""):
    """Chained scan + readback fence (the only reliable timing here)."""

    @jax.jit
    def chunk(carry):
        def body(c, _):
            return fn(c), 0.0
        c, _ = jax.lax.scan(body, carry, None, length=n_iters)
        return c

    carry = carry_init
    times = []
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        carry = chunk(carry)
        # readback fence
        _ = float(jax.tree_util.tree_leaves(carry)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep > 0:
            times.append((t1 - t0) / n_iters)
        log(f"  [{label}] rep {rep}: {(t1 - t0) / n_iters * 1e3:.3f} ms/iter")
    return float(np.min(times))


def main():
    log(f"devices: {jax.devices()}")
    C = 1 << 22  # 4.19M corner rows (bench scale)
    M = 65536    # bs 8192 x 8 corners
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    # --- correctness (small) ---
    Cs = 1 << 14
    rows_s = np.sort(rng.integers(0, Cs - 1, 4096)).astype(np.int32)
    rows_s[-64:] = Cs - 1  # trashbin tail
    grads_s = rng.normal(size=(4096, D)).astype(np.float32)
    grads_s[-64:] = 0.0
    p0 = rng.normal(size=(Cs, D)).astype(np.float32)
    m0 = rng.normal(size=(Cs, D)).astype(np.float32) * 0.1
    v0 = np.abs(rng.normal(size=(Cs, D))).astype(np.float32) * 0.01
    lr = jnp.float32(0.01)
    bc1 = jnp.float32(1 - B1 ** 5)
    bc2 = jnp.float32(1 - B2 ** 5)
    ref = xla_scatter_adam(jnp.array(p0), jnp.array(m0), jnp.array(v0),
                           jnp.array(rows_s), jnp.array(grads_s), lr, bc1, bc2)
    got = pallas_fused_adam(jnp.array(p0), jnp.array(m0), jnp.array(v0),
                            jnp.array(rows_s), jnp.array(grads_s), lr, bc1, bc2,
                            tb=64, w=256)
    errs = {}
    for name, a, b in zip("pmv", ref, got):
        errs[name] = float(jnp.max(jnp.abs(a - b)))
        log(f"correctness {name}: max|err| = {errs[name]:.3e}")
    assert all(e < 1e-5 for e in errs.values()), errs
    log("correctness OK")

    # --- primitive re-verification on this round's chip ---
    rows = np.sort(rng.integers(0, C - 1, M)).astype(np.int32)
    grads = rng.normal(size=(M, D)).astype(np.float32)
    p = jnp.array(rng.normal(size=(C, D)).astype(np.float32))
    m = jnp.zeros((C, D), jnp.float32)
    v = jnp.zeros((C, D), jnp.float32)
    rows_j = jnp.array(rows)
    grads_j = jnp.array(grads)

    def scatter_only(carry):
        p, = carry
        return (p.at[rows_j].add(grads_j * 1e-6),)

    t = timed_scan(scatter_only, (p,), 50, label="xla scatter 65k->4.2Mx8")
    log(f"XLA scatter: {t*1e3:.3f} ms ({t/M*1e9:.1f} ns/entry)")

    def xla_full(carry):
        p, m, v = carry
        return xla_scatter_adam(p, m, v, rows_j, grads_j, lr, bc1, bc2)

    t_xla = timed_scan(xla_full, (p, m, v), 50, label="xla scatter+adam")
    log(f"XLA scatter+adam sweep: {t_xla*1e3:.3f} ms/level")

    def sort_gather(carry):
        r, g = carry
        o = jnp.argsort(r)
        return r[o], g[o]

    t_sg = timed_scan(sort_gather, (jnp.array(rng.permutation(rows)), grads_j),
                      50, label="argsort+permgather 65k")
    log(f"argsort + (65k,8) perm gather: {t_sg*1e3:.3f} ms")

    # --- pallas kernel at bench scale ---
    for tb, w in [(256, 256), (128, 128), (512, 512), (256, 512)]:
        try:
            def pallas_full(carry, tb=tb, w=w):
                p, m, v = carry
                return pallas_fused_adam(p, m, v, rows_j, grads_j, lr, bc1, bc2,
                                         tb=tb, w=w)

            tp = timed_scan(pallas_full, (p, m, v), 50,
                            label=f"pallas tb={tb} w={w}")
            log(f"PALLAS fused tb={tb} w={w}: {tp*1e3:.3f} ms/level "
                f"(XLA {t_xla*1e3:.3f})")
        except Exception as e:
            log(f"PALLAS tb={tb} w={w} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
