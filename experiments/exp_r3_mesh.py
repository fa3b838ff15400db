"""On-chip A/B: octree-tiled mesh inference, direct vs node-lattice.

The direct path pays one hash probe + 8 corner-row gathers PER POINT per
level (row-count-bound, ~16 ns/row); the lattice path probes only each
block's nested fine-node lattice (73 cells per 4096-point block at ICRA
shapes) and selects per-point features with exact one-hot MXU matmuls.
Outputs are bit-compared (tests/test_mesher.py pins equality on CPU).

  timeout 1800 python experiments/exp_r3_mesh.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from shine_mapping_tpu.mesher import (
    _infer_node_blocks, _infer_node_blocks_lattice, _bucket_chunks)
from shine_mapping_tpu.models import decoder
from bench import build_bench_world


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    cfg, grid, pool, n_pool = build_bench_world()
    geo = decoder.init_decoder_params(jax.random.PRNGKey(0), cfg.feature_dim)
    query_level = cfg.mc_query_level
    nodes = grid.get_octree_nodes(query_level)
    # a realistic reconstruction slice: ~50k blocks (~26M queries at 0.1 m)
    # — the full bench world at full density is ~200M queries and overflows
    # single-chip HBM with the direct path's output buffers
    nodes = nodes[:49152]
    log(f"query_level={query_level} nodes={nodes.shape[0]} "
        f"levels={grid.levels}")
    node_res = 2.0 ** (1 - query_level)
    vpn = int(np.ceil(node_res / cfg.scale / 0.1))  # 0.1 m mc res
    mc_res_scaled = node_res / vpn
    block = vpn ** 3
    npb = max(1, cfg.infer_bs // block)
    K = _bucket_chunks(math.ceil(nodes.shape[0] / npb))
    origins = (nodes - 0.5 * (node_res - mc_res_scaled)).astype(np.float32)
    pad = K * npb - nodes.shape[0]
    if pad:
        origins = np.concatenate(
            [origins, np.full((pad, 3), 3.0, np.float32)], axis=0)
    dev_origins = jnp.asarray(origins.reshape(K, npb, 3))
    args = (geo, geo, tuple(grid.features), tuple(grid.tables), dev_origins,
            jnp.float32(mc_res_scaled), jnp.float32(0.0))
    tail = (tuple(grid.levels), grid.polynomial_interpolation, 0, False,
            False)
    n_pts = K * npb * block
    log(f"vpn={vpn} npb={npb} K={K} points={n_pts/1e6:.1f}M")

    for name, fn in (
        ("direct ", lambda: _infer_node_blocks(*args, K, npb, vpn, *tail)),
        ("lattice", lambda: _infer_node_blocks_lattice(
            *args, K, npb, vpn, query_level, *tail)),
    ):
        outs = []
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            sdf, _, mask = fn()
            s = float(jnp.sum(sdf)) + float(jnp.sum(mask))
            times.append(time.perf_counter() - t0)
            outs = (np.asarray(sdf), np.asarray(mask))
        t = min(times[1:])
        log(f"{name}: {t:8.3f} s  ({n_pts/t/1e6:.1f}M pts/s)  checksum {s:.1f}")
        if name.startswith("direct"):
            ref = outs
    np.testing.assert_array_equal(ref[1], outs[1])
    d = np.abs(ref[0] - outs[0]).max()
    log(f"max |sdf diff| = {d:.2e}")


if __name__ == "__main__":
    main()
