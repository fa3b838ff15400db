"""Shared driver plumbing for the batch / incremental CLIs."""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np
import jax

# Some TPU platform plugins ignore the JAX_PLATFORMS env var; honor it
# explicitly so `JAX_PLATFORMS=cpu python -m shine_mapping_tpu.cli...` works
# everywhere (e.g. to keep a debug run off the TPU).
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# persistent compile cache: per-frame/per-capacity executables are reused
# across runs instead of recompiling (remote TPU compiles take 10-60 s each).
# Threshold 0: even sub-second eager-op executables persist — a fresh driver
# process otherwise pays ~100 x ~0.6 s of remote round trips re-compiling
# trivial scatter/broadcast ops that the 1 s default refuses to cache
# (measured: the demo's precompute phase dropped ~60 s).  CPU-forced runs
# (tests, CI) keep the 1 s threshold: local compiles are fast and the
# 0-threshold would flood the shared cache dir with per-shape trivia.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
    _min_ct = 1.0 if os.environ.get("JAX_PLATFORMS", "") == "cpu" else 0.0
    jax.config.update("jax_persistent_cache_min_compile_time_secs", _min_ct)
except Exception:
    pass

import jax.numpy as jnp

from ..config import SHINEConfig
from ..ops.hashgrid import HashGridHost
from ..train import trainer
from ..utils import checkpoint as ckpt


def build_grid(cfg: SHINEConfig) -> HashGridHost:
    return HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        polynomial_interpolation=cfg.poly_int_on,
        leaf_vox_size=cfg.leaf_vox_size,
        seed=cfg.seed,
        init_node_capacity=cfg.init_node_capacity,
        init_corner_capacity=cfg.init_corner_capacity,
    )


def maybe_load_model(cfg: SHINEConfig, grid: HashGridHost):
    """Load a pretrained model BEFORE the data phase — mirrors
    shine_batch.py:45-55 incl. the 'feature_octree' branch: a full .npz
    checkpoint restores the whole map structure (which then keeps growing
    from new frames); otherwise only the decoders load.

    Returns (grid, decoder_params_or_None, freeze_decoder, opt_state_or_None,
    start_iter).  A full checkpoint restores the optimizer moments and the
    iteration counter so a resumed run continues the Adam trajectory and LR
    schedule instead of restarting them (the reference discards both,
    shine_batch.py:45-55 — fixed here, not reproduced).
    """
    if not (cfg.load_model and cfg.model_path and os.path.exists(cfg.model_path)):
        return grid, None, False, None, 0
    if cfg.model_path.endswith(".npz"):
        d = np.load(cfg.model_path, allow_pickle=False)
        if any(k.startswith("grid_") for k in d.files):
            # structure the params skeleton for decoder restore
            import jax as _jax

            from ..train import trainer as _trainer
            from ..train.optimizer import init_opt_state

            skeleton = _trainer.init_params(cfg, grid, _jax.random.PRNGKey(0))
            grid2, params2, opt_state, iters = ckpt.load_checkpoint(
                cfg.model_path, skeleton, init_opt_state(skeleton)
            )
            grid2.print_detail()
            print(f"Full checkpoint loaded (iter {iters})")
            dec = {k: params2[k] for k in ("geo", "sem") if k in params2}
            return grid2, dec, True, opt_state, iters
        dec = ckpt.load_decoders(cfg.model_path, {})
        print("Pretrained decoder loaded")
        return grid, dec, True, None, 0
    if cfg.model_path.endswith(".pth"):
        dec = ckpt.load_decoders(cfg.model_path, {})
        print("Pretrained decoder loaded")
        return grid, dec, True, None, 0
    return grid, None, False, None, 0


def pad_opt_state_features(opt_state, params):
    """Grow the restored optimizer's feature-moment tables to the current
    (possibly doubled) capacities; new rows start at zero like fresh Adam."""
    from ..train.optimizer import OptState

    def pad_like(o, p):
        if o.shape == p.shape:
            return o
        return jnp.zeros_like(p).at[: o.shape[0]].set(o)

    m = dict(opt_state.m)
    v = dict(opt_state.v)
    m["features"] = tuple(
        pad_like(o, p) for o, p in zip(m["features"], params["features"])
    )
    v["features"] = tuple(
        pad_like(o, p) for o, p in zip(v["features"], params["features"])
    )
    return OptState(m=m, v=v, step=opt_state.step)


def pool_capacity_for(n: int, minimum: int) -> int:
    cap = max(minimum, 1024)
    while cap < n:
        cap *= 2
    return cap


def event_boundaries(total_iters: int, freqs, chunk: int):
    """Yield (start, n_iters) chunks that never cross a save/mesh boundary."""
    events = set()
    for f in freqs:
        if f and f > 0:
            events.update(range(f, total_iters + 1, f))
    events.add(total_iters)
    start = 0
    for e in sorted(events):
        while start < e:
            n = min(chunk, e - start)
            yield start, n
            start += n


def device_local(tree):
    """Host-local view of a (possibly multi-host global) pytree.

    Replicated global arrays localize to this host's full copy; row-sharded
    tables cannot be localized on one host — mesh/checkpoint with
    ``table_sharding: replicated`` (or gather explicitly) in that case.
    """

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            shard = x.addressable_shards[0]
            if shard.data.shape != x.shape:
                raise ValueError(
                    "cannot localize a row-sharded table on one host; use "
                    "tpu.table_sharding: replicated for meshing/checkpointing"
                )
            return shard.data
        return x

    return jax.tree_util.tree_map(f, tree)


def sync_features_to_grid(grid: HashGridHost, params) -> None:
    import jax.numpy as jnp

    # bf16 map mode (tpu.params_bf16): the host mirror stays f32 so growth,
    # checkpointing (npz) and meshing see a plain-float table (bf16 -> f32
    # is exact; casting back on upload round-trips bit-identically)
    grid.features = [
        f.astype(jnp.float32) if f.dtype == jnp.bfloat16 else f
        for f in device_local(params["features"])
    ]


def refresh_params_features(grid: HashGridHost, params):
    params = dict(params)
    params["features"] = tuple(grid.features)
    return params
