"""Hash-lookup restructure: fewer/fatter gathers vs the current 3-gather
per-level lookup (key_a win + key_b win + corner rows = 10 ms/iter for 3
levels at bench scale — the #1 forward cost).

Variants per level (N=8192 points):
  base   : current lookup_level (2x (N,16) key gathers + (N,8) corner rows)
  merged : interleaved keys (S,2) -> one (N,16,2) gather + corner rows
  fusedP : single (N,P,12) slot-row gather, in-register hit select, P=16/8/4

  timeout 580 python experiments/exp_lookup.py
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

from shine_mapping_tpu.ops.hashgrid import LevelTable, lookup_level
from shine_mapping_tpu.ops.morton import quantize_points


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_H1 = np.uint32(2654435761)
_H2 = np.uint32(805459861)
_H3 = np.uint32(3674653429)


def timed(fn, carry, label, n=100, reps=3):
    @jax.jit
    def chunk(carry, env):
        def body(c, _):
            return fn(c, env), 0.0
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    times = []
    c = carry
    for rep in range(reps + 1):
        t0 = time.perf_counter()
        c = chunk(c, ENV)
        _ = float(jax.tree_util.tree_leaves(c)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        if rep:
            times.append((t1 - t0) / n)
    log(f"{label:22s}: {min(times)*1e3:7.3f} ms/iter (3 levels)")


ENV = {}


def main():
    global ENV
    log(f"devices: {jax.devices()}")
    S = 1 << 21
    N = 8192
    LEVELS = (12, 11, 10)
    rng = np.random.default_rng(0)

    tables = []
    slots12 = []
    keys2 = []
    for _ in LEVELS:
        ka = rng.integers(0, 2**32, S, dtype=np.uint32)
        kb = rng.integers(0, 2**31, S, dtype=np.uint32)
        ci = rng.integers(0, 4_000_000, (S, 8), dtype=np.int32)
        tables.append(LevelTable(
            key_a=jnp.asarray(ka), key_b=jnp.asarray(kb), corner_idx=jnp.asarray(ci)
        ))
        k2 = np.stack([ka.view(np.int32), kb.view(np.int32)], axis=1)
        keys2.append(jnp.asarray(k2))
        s12 = np.zeros((S, 12), np.int32)
        s12[:, 0] = ka.view(np.int32)
        s12[:, 1] = kb.view(np.int32)
        s12[:, 2:10] = ci
        slots12.append(jnp.asarray(s12))

    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (1 << 16, 3)).astype(np.float32))
    pool = {"c": coords}
    ENV = dict(tables=tuple(tables), keys2=tuple(keys2),
               slots12=tuple(slots12), pool=pool)

    mask_u = jnp.uint32(S - 1)

    def sample(k):
        idx = jax.random.randint(k, (N,), 0, 1 << 16)
        return ENV["pool"]["c"][idx]

    def hashes(c, level):
        q = quantize_points(c, level).astype(jnp.uint32)
        qa = (q[:, 0] << jnp.uint32(16)) | q[:, 1]
        qb = q[:, 2]
        h = ((q[:, 0] * _H1) ^ (q[:, 1] * _H2) ^ (q[:, 2] * _H3)) & mask_u
        return qa, qb, h

    def v_base(carry, env):
        key, acc = carry
        key, k = jax.random.split(key)
        c = sample(k)
        tot = jnp.int32(0)
        for i, lvl in enumerate(LEVELS):
            corners, found = lookup_level(env["tables"][i], c, lvl)
            tot = tot + corners[0, 0] + found[0].astype(jnp.int32)
        return key, acc + tot.astype(jnp.float32)

    def v_merged(carry, env):
        key, acc = carry
        key, k = jax.random.split(key)
        c = sample(k)
        tot = jnp.int32(0)
        for i, lvl in enumerate(LEVELS):
            qa, qb, h = hashes(c, lvl)
            win = (h[:, None] + jnp.arange(16, dtype=jnp.uint32)[None, :]) & mask_u
            win = win.astype(jnp.int32)
            kk = env["keys2"][i][win]  # (N,16,2)
            hit = (kk[:, :, 0].astype(jnp.uint32) == qa[:, None]) & (
                kk[:, :, 1].astype(jnp.uint32) == qb[:, None]
            )
            found = jnp.any(hit, axis=1)
            slot = jnp.take_along_axis(
                win, jnp.argmax(hit, axis=1)[:, None], axis=1
            )[:, 0]
            corners = env["tables"][i].corner_idx[slot]
            tot = tot + corners[0, 0] + found[0].astype(jnp.int32)
        return key, acc + tot.astype(jnp.float32)

    def make_fused(P):
        def v_fused(carry, env):
            key, acc = carry
            key, k = jax.random.split(key)
            c = sample(k)
            tot = jnp.int32(0)
            for i, lvl in enumerate(LEVELS):
                qa, qb, h = hashes(c, lvl)
                win = (h[:, None] + jnp.arange(P, dtype=jnp.uint32)[None, :]) & mask_u
                win = win.astype(jnp.int32)
                rowsw = env["slots12"][i][win]  # (N,P,12)
                hit = (rowsw[:, :, 0].astype(jnp.uint32) == qa[:, None]) & (
                    rowsw[:, :, 1].astype(jnp.uint32) == qb[:, None]
                )
                found = jnp.any(hit, axis=1)
                sel = jnp.argmax(hit, axis=1)
                corners = jnp.take_along_axis(
                    rowsw[:, :, 2:10], sel[:, None, None], axis=1
                )[:, 0, :]
                tot = tot + corners[0, 0] + found[0].astype(jnp.int32)
            return key, acc + tot.astype(jnp.float32)
        return v_fused

    carry0 = (jax.random.PRNGKey(0), jnp.float32(0))
    timed(v_base, carry0, "base (3 gathers)")
    timed(v_merged, carry0, "merged keys (2 gathers)")
    for P in (16, 8, 4):
        timed(make_fused(P), carry0, f"fused slot rows P={P}")


if __name__ == "__main__":
    main()
