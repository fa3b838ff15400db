"""Dump optimized HLO of the gather+kernel scan to find the per-iter copy."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
from shine_mapping_tpu.ops import adam_kernel

C, D, M, B = 1 << 22, 8, 65536, 8192
PACK = 128 // D
R = C // PACK
tb, w = adam_kernel.choose_tiles(C, D, M)
rng = np.random.default_rng(0)
rows_np = rng.integers(0, C - 1, M).astype(np.int32)
rows_sorted = np.sort(rows_np)
prow = (rows_sorted // PACK).astype(np.int32)
Mpad = ((M + w - 1) // w) * w + w
prow_p = np.full((1, Mpad), -1, np.int32); prow_p[0, :M] = prow
g128 = np.zeros((Mpad, 128), np.float32)
T = R // tb
offs = np.minimum(np.searchsorted(prow, np.arange(T) * tb) // w, Mpad // w - 2).astype(np.int32)
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

@jax.jit
def chunk(carry, env):
    def body(c, _):
        p, m, v = c
        idx = env["rows"][: B * 8].reshape(B, 8)
        G = adam_kernel.gather_rows_packed(p, idx, D)
        g2h = env["g_hi"] + (jnp.sum(G) * 1e-12).astype(jnp.bfloat16)
        out = adam_kernel._pallas_update(
            p, m, v, env["prow_p"], g2h, env["g_lo"], env["offs"],
            env["scal"], tb, w, 0.9, 0.99, 1e-15,
        )
        return tuple(out), 0.0
    c, _ = jax.lax.scan(body, carry, None, length=8)
    return c

txt = chunk.lower((p, m, v), env).compile().as_text()
import re
for ln in txt.splitlines():
    if re.search(r"copy|transpose|bitcast-convert", ln) and "fusion" not in ln:
        print(ln.strip()[:220])
print("== total lines:", len(txt.splitlines()))
open("/tmp/hlo_gather.txt", "w").write(txt)
