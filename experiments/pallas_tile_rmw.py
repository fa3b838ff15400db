"""Pallas tile-RMW scatter experiment (round 1, measured and rejected).

A pipelined read-modify-write kernel applying sorted unique 512B-tile
updates to an HBM table — the candidate replacement for XLA's scatter in
the feature-table update path.  Measured on the round-1 TPU (v5e-lite via
axon tunnel):

    pallas tile-RMW 32768 tiles (512B): 13.7 ms (419 ns/tile)
    XLA scatter-add of the same job:     4.6 ms (142 ns/tile)

The scalar fori_loop + per-iteration semaphore waits dominate; XLA's
scatter is already at this chip's floor.  Kept as the starting point for
round-2 variants (loop unrolling, multi-queue DMA) on other hardware.
See BENCH_NOTES.md.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 262144   # table tiles (4.2M rows / 16)
N = 32768    # tile jobs per call (~unique touched tiles)
PIPE = 16

def rmw_kernel(tiles_ref, deltas_ref, table_ref, out_ref, scratch, rsem, wsem):
    def read_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(tiles_ref[i], 1), :], scratch.at[pl.ds(slot, 1), :], rsem.at[slot])
    def write_dma(slot, i):
        return pltpu.make_async_copy(
            scratch.at[pl.ds(slot, 1), :], out_ref.at[pl.ds(tiles_ref[i], 1), :], wsem.at[slot])
    for k in range(PIPE):
        read_dma(k, k).start()
    def body(i, _):
        slot = jax.lax.rem(i, PIPE)
        read_dma(slot, i).wait()
        scratch[pl.ds(slot, 1), :] = scratch[pl.ds(slot, 1), :] + deltas_ref[pl.ds(i, 1), :]
        write_dma(slot, i).start()
        @pl.when(i + PIPE < N)
        def _():
            write_dma(slot, i).wait()
            read_dma(slot, i + PIPE).start()
        @pl.when(i + PIPE >= N)
        def _():
            write_dma(slot, i).wait()
        return 0
    jax.lax.fori_loop(0, N, body, 0)

@jax.jit
def rmw(table, tiles, deltas):
    return pl.pallas_call(
        rmw_kernel,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((PIPE, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((PIPE,)),
            pltpu.SemaphoreType.DMA((PIPE,)),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tiles, deltas, table)

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((T, 128)).astype(np.float32))
tiles = jnp.asarray(np.sort(rng.choice(T, N, replace=False)).astype(np.int32))
deltas = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32))

out = rmw(table, tiles, deltas)
ref = np.asarray(table).copy()
ref[np.asarray(tiles)] += np.asarray(deltas)
err = float(jnp.max(jnp.abs(out - jnp.asarray(ref))))
print("correctness max err:", err, flush=True)

acc = table
_ = float(rmw(acc, tiles, deltas)[0, 0])
t0 = time.perf_counter()
reps = 10
for _ in range(reps):
    acc = rmw(acc, tiles, deltas)
_ = float(acc[0, 0])
dt = (time.perf_counter() - t0) / reps * 1000
print(f"pallas tile-RMW {N} tiles (512B): {dt:.3f} ms  ({dt*1e6/N:.1f} ns/tile)", flush=True)

# compare: XLA scatter-add of same job
@jax.jit
def xla_rmw(table, tiles, deltas):
    return table.at[tiles].add(deltas, indices_are_sorted=True, unique_indices=True, mode="promise_in_bounds")
acc = table
_ = float(xla_rmw(acc, tiles, deltas)[0, 0])
t0 = time.perf_counter()
for _ in range(reps):
    acc = xla_rmw(acc, tiles, deltas)
_ = float(acc[0, 0])
dt = (time.perf_counter() - t0) / reps * 1000
print(f"XLA scatter same job: {dt:.3f} ms", flush=True)
