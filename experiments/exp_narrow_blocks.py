"""Does Mosaic accept (n, 8) blocks on a (C, 8) f32 array, and at what
bandwidth? If viable, the Adam kernel can run on UNPACKED tables and the
forward gather stays native-narrow (no packed-lane-row gather penalty)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")

C, D = 1 << 22, 8
TB = 8192  # rows per tile -> same bytes as (512,128)
T = C // TB

def sweep_kernel(p_ref, o_ref):
    o_ref[:] = p_ref[:] * 0.5 + 1.0

def run():
    p = jnp.ones((C, D), jnp.float32)
    f = pl.pallas_call(
        sweep_kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((TB, D), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((TB, D), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((C, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    @jax.jit
    def chunk(p):
        def body(c, _):
            return f(c), 0.0
        c, _ = jax.lax.scan(body, p, None, length=50)
        return c
    c = chunk(p)
    _ = float(c[0, 0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = chunk(c)
        _ = float(c[0, 0])
        times.append((time.perf_counter() - t0) / 50)
    ms = min(times) * 1e3
    gbps = 2 * C * D * 4 / (ms / 1e3) / 1e9
    print(f"narrow-block sweep: {ms:.3f} ms/iter ({gbps:.0f} GB/s)")

run()
