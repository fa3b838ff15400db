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
            process_id=process_id,
        )


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


def place_training_state(mesh: Mesh, params, opt_state, tables, pool, shadow):
    """Place all training state with the canonical DP layout.

    Returns the placed pytrees; the batch itself is sharded inside the
    jitted step via ``train_chunk(..., batch_sharding=batch_sharded(mesh))``.
    """
    repl = replicated(mesh)
    return (
        jax.device_put(params, repl),
        jax.device_put(opt_state, repl),
        jax.device_put(tables, repl),
        jax.device_put(pool, repl),
        jax.device_put(shadow, repl),
    )
