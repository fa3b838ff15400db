"""Which scatter+Adam formulations does XLA fuse to the bandwidth floor?

Round-2 finding: explicit `zeros.at[sorted_rows].add(g)` feeding a dense
Adam sweep runs at 2.14 ms/level (438 GB/s) — vs the 9.4 ms/level the
round-1 trainer paid (autodiff scatter + separate sweep).  This experiment
isolates which ingredient enables the fusion.

  timeout 900 python experiments/exp_fusion_shapes.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B1, B2, EPS = 0.9, 0.99, 1e-15
D = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(fn, carry_init, n_iters=50, reps=3, label=""):
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
        _ = float(jax.tree_util.tree_leaves(carry)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep > 0:
            times.append((t1 - t0) / n_iters)
    t = float(np.min(times))
    log(f"{label}: {t*1e3:.3f} ms/iter")
    return t


def adam(p, m, v, g, lr, bc1, bc2):
    m = B1 * m + (1 - B1) * g
    v = B2 * v + (1 - B2) * g * g
    p = p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
    return p, m, v


def main():
    log(f"devices: {jax.devices()}")
    C = 1 << 22
    B = 8192
    rng = np.random.default_rng(0)
    corners = rng.integers(0, C - 1, (B, 8)).astype(np.int32)
    rows_flat = corners.reshape(-1)
    rows_sorted = np.sort(rows_flat)
    grads = rng.normal(size=(B, 8, D)).astype(np.float32)
    gflat = grads.reshape(-1, D)

    p = jnp.array(rng.normal(size=(C, D)).astype(np.float32))
    m = jnp.zeros((C, D), jnp.float32)
    v = jnp.zeros((C, D), jnp.float32)
    lr = jnp.float32(1e-4)
    bc1 = jnp.float32(1 - B1 ** 5)
    bc2 = jnp.float32(1 - B2 ** 5)

    rs = jnp.array(rows_sorted)
    rf = jnp.array(rows_flat)
    c2 = jnp.array(corners)
    gf = jnp.array(gflat)
    g2 = jnp.array(grads)

    def mk(rows, g, **hints):
        def step(carry):
            p, m, v = carry
            gd = jnp.zeros_like(p).at[rows].add(g, **hints)
            return adam(p, m, v, gd, lr, bc1, bc2)
        return step

    timed_scan(mk(rs, gf), (p, m, v), label="sorted flat (M,)")
    timed_scan(mk(rf, gf), (p, m, v), label="UNSORTED flat (M,)")
    timed_scan(mk(c2, g2), (p, m, v), label="UNSORTED 2d (B,8)")
    timed_scan(mk(rs, gf, indices_are_sorted=True, mode="promise_in_bounds"),
               (p, m, v), label="sorted flat + hints")

    # autodiff-produced scatter: grad of a gather-based loss
    def loss_fn(p, idx, tgt):
        G = p[idx]                       # (B,8,D) gather
        pred = jnp.sum(G, axis=(1, 2))   # fake decode
        return jnp.mean((pred - tgt) ** 2)

    tgt = jnp.array(rng.normal(size=(B,)).astype(np.float32))

    def autodiff_step(carry):
        p, m, v = carry
        gd = jax.grad(loss_fn)(p, c2, tgt)
        return adam(p, m, v, gd, lr, bc1, bc2)

    timed_scan(autodiff_step, (p, m, v), label="autodiff scatter + adam")

    # dense sweep only (no scatter) — the floor
    def sweep_only(carry):
        p, m, v = carry
        return adam(p, m, v, p * 1e-8, lr, bc1, bc2)

    timed_scan(sweep_only, (p, m, v), label="adam sweep only (g=f(p))")

    # scatter entry-count scaling: half the entries
    half = jnp.array(rows_sorted[::2].copy())
    ghalf = jnp.array(gflat[::2].copy())
    timed_scan(mk(half, ghalf), (p, m, v), label="sorted flat M/2 entries")


if __name__ == "__main__":
    main()
