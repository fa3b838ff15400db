"""Device-mesh construction and sharding layouts for data-parallel training.

The reference is strictly single-process single-GPU (no torch.distributed /
NCCL anywhere — see SURVEY.md §2.4); multi-chip scaling here is a new
TPU-native design:

* mesh axis ``data``: the per-iteration sample batch is sharded across
  chips (``PartitionSpec('data')`` on the batch dim).
* parameters, optimizer state, hash tables and sample pools are replicated;
  XLA inserts the gradient all-reduce over ICI automatically when the
  batch-sharded backward meets replicated parameters.
* multi-host: ``initialize_distributed`` wires ``jax.distributed`` so the
  same code spans hosts (DCN only carries the host-side data loading).

For maps too large to replicate, shard the feature tables over ``data`` by
rows (`shard_tables_by_rows`): lookups then gather cross-chip (XLA emits
all-to-alls); gradients reduce-scatter back.  Replication is preferred while
tables fit — they are MBs to low GBs (reference's own memory math,
model/feature_octree.py:296-297).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op when single-process).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly for CPU fake-cluster tests.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=None if process_id is None or process_id < 0 else process_id,
        )


def setup_distributed(cfg) -> tuple[int, int]:
    """Driver entry: bring up ``jax.distributed`` from the config's ``tpu:``
    section (``coordinator`` / ``num_processes`` / ``process_id``; TPU-pod
    env autodetect when they are unset) and return
    (process_index, process_count).

    Must run before any other JAX call in the process.  Single-process runs
    (num_processes <= 1 and no pod env) are a no-op returning (0, 1).
    """
    n = int(getattr(cfg, "num_processes", 0) or 0)
    if n > 1:
        initialize_distributed(
            coordinator=getattr(cfg, "coordinator", "") or None,
            num_processes=n,
            process_id=int(getattr(cfg, "process_id", -1)),
        )
    elif os.environ.get("SHINE_POD_AUTODETECT") == "1":
        # TPU pod slice with everything discoverable from the environment;
        # opt-in (single-chip dev tunnels export misleading TPU_* vars)
        jax.distributed.initialize()
    else:
        # an external launcher may have called jax.distributed.initialize()
        # before the driver — honor its rank/world in that case
        try:
            from jax._src import distributed as _dist

            externally_up = _dist.global_state.client is not None
        except Exception:  # pragma: no cover - jax internals moved
            externally_up = False
        if not externally_up:
            # single-process: do NOT query jax.process_index() — it
            # initializes a backend, and platform plugins that hook
            # get_backend (axon) then force their own device bring-up even
            # under jax_platforms=cpu (observed hanging driver startup when
            # the TPU tunnel is down)
            return 0, 1
    return jax.process_index(), jax.process_count()


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (the sample batch) over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_tables_by_rows(mesh: Mesh) -> NamedSharding:
    """Row-shard feature tables over chips (for maps too big to replicate)."""
    return NamedSharding(mesh, P("data", None))


def place_routed_windows(mesh: Mesh, wx: dict) -> dict:
    """Place a routed fused-window precompute so per-device residency
    scales 1/n (round 5): the batch-content stacks, per-sample structure,
    and rows shard over the SAMPLE axis (axis 1 of the (W, bs, ...)
    stacks), the routing/prep arrays over their shard axis, and the
    shard-local tile map over shards.  The GLOBAL EntryPrep (``pre``) is
    dropped — the routed body never reads it, and it is the largest
    single array in the precompute.

    Without this, every array sits wherever the precompute left it and a
    real multi-chip run replicates the whole window memory per chip.
    """
    samp = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in wx.items():
        if k == "pre":
            continue  # unused by the routed body; W x Mpad of it is big
        if k == "shard":
            rt = dict(v)
            rt["lvl"] = jax.device_put(rt["lvl"],
                                       NamedSharding(mesh, P("data")))
            for kk in ("serve_rows", "owner_sel", "recv_inv"):
                rt[kk] = jax.device_put(rt[kk], samp)
            rt["pre"] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, samp), rt["pre"])
            out[k] = rt
        elif k == "pool":
            out[k] = {f: jax.device_put(a, samp) for f, a in v.items()}
        elif k in ("rows_hi", "rows_lo", "rows_kg", "kidx", "slots",
                   "found", "cover", "idx"):
            out[k] = jax.device_put(v, samp)
        else:
            out[k] = jax.device_put(v, repl)
    return out


def place_training_state(
    mesh: Mesh, params, opt_state, tables, pool, shadow,
    table_sharding: str = "replicated",
):
    """Place all training state with the canonical DP layout.

    ``table_sharding``:
    * "replicated" — everything replicated; batch-sharded backward meets
      replicated params and XLA all-reduces gradients over ICI.
    * "rows" — the feature tables (params["features"] and their optimizer
      moments / shadow tables) are row-sharded over the ``data`` axis
      (giant-map layout): lookups all-gather rows, gradient scatters
      reduce-scatter back.  Hash tables and pools stay replicated.

    Returns the placed pytrees; the batch itself is sharded inside the
    jitted step via ``train_chunk(..., batch_sharding=batch_sharded(mesh))``.
    """
    repl = replicated(mesh)
    if table_sharding == "rows":
        rows = shard_tables_by_rows(mesh)
        new_params = dict(
            jax.device_put({k: v for k, v in params.items() if k != "features"}, repl)
        )
        new_params["features"] = tuple(
            jax.device_put(f, rows) for f in params["features"]
        )
        params = new_params
        m = dict(jax.device_put({k: v for k, v in opt_state.m.items() if k != "features"}, repl))
        v = dict(jax.device_put({k: v2 for k, v2 in opt_state.v.items() if k != "features"}, repl))
        m["features"] = tuple(jax.device_put(f, rows) for f in opt_state.m["features"])
        v["features"] = tuple(jax.device_put(f, rows) for f in opt_state.v["features"])
        opt_state = type(opt_state)(m=m, v=v, step=jax.device_put(opt_state.step, repl))
        shadow = {
            k: tuple(
                jax.device_put(f, rows if f.shape[0] > 1 else repl) for f in t
            )
            for k, t in shadow.items()
        }
        return (
            params,
            opt_state,
            jax.device_put(tables, repl),
            jax.device_put(pool, repl),
            shadow,
        )
    return (
        jax.device_put(params, repl),
        jax.device_put(opt_state, repl),
        jax.device_put(tables, repl),
        jax.device_put(pool, repl),
        jax.device_put(shadow, repl),
    )
