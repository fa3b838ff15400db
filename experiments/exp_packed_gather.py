"""How to gather (B,8,D) corner rows from a packed (R,128) table?

Variants (one level, bench scale, packed carry):
  native   : gather from a true (C,D) array (the 1.4 ms reference)
  view     : gather through p128.reshape(C,D) (XLA materializes a copy?)
  tala     : lane-row gather + take_along_axis lane select (per-elem gather)
  maskedsum: lane-row gather + reshape/mask/sum lane select (pure VPU)

  timeout 1500 python experiments/exp_packed_gather.py
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
    log(f"{label:10s}: {min(times)*1e3:8.3f} ms/iter")


def main():
    log(f"devices: {jax.devices()}")
    C, D, B = 1 << 22, 8, 8192
    PACK = 128 // D
    R = C // PACK
    rng = np.random.default_rng(0)
    pCD = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    p128 = jnp.asarray(np.asarray(pCD).reshape(R, 128))
    corners = jnp.asarray(rng.integers(0, C - 1, (B, 8)).astype(np.int32))
    env = dict(corners=corners)

    def v_native(carry, env):
        p, acc = carry
        G = p[env["corners"]]
        return p, acc + jnp.sum(G[0, 0])

    timed(v_native, (pCD, jnp.float32(0)), env, "native")

    def v_view(carry, env):
        p, acc = carry  # p is (R,128)
        G = p.reshape(C, D)[env["corners"]]
        return p, acc + jnp.sum(G[0, 0])

    timed(v_view, (p128, jnp.float32(0)), env, "view")

    def v_tala(carry, env):
        p, acc = carry
        rows = env["corners"]
        lanerows = p[rows // PACK]  # (B,8,128)
        lane0 = (rows % PACK) * D
        idx = lane0[..., None] + jnp.arange(D, dtype=rows.dtype)
        G = jnp.take_along_axis(lanerows, idx, axis=-1)
        return p, acc + jnp.sum(G[0, 0])

    timed(v_tala, (p128, jnp.float32(0)), env, "tala")

    def v_maskedsum(carry, env):
        p, acc = carry
        rows = env["corners"]
        lanerows = p[rows // PACK]  # (B,8,128)
        sub = lanerows.reshape(B, 8, PACK, D)
        sel = ((rows % PACK)[..., None]
               == jnp.arange(PACK, dtype=rows.dtype)).astype(p.dtype)
        G = jnp.sum(sub * sel[..., None], axis=2)
        return p, acc + jnp.sum(G[0, 0])

    timed(v_maskedsum, (p128, jnp.float32(0)), env, "maskedsum")


if __name__ == "__main__":
    main()
