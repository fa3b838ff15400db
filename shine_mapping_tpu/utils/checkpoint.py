"""Checkpoint save / load.

Parity target: reference ``save_checkpoint`` / ``save_decoder``
(utils/tools.py:200-230): persist the whole map structure (features +
indexing), decoder params, optimizer state and iteration counter; plus the
decoders-only export used to ship pretrained decoders.  Stored as a single
``.npz`` (no pickled modules) so checkpoints round-trip the growable
structure deterministically.

Also supports importing the reference's torch ``.pth`` decoder checkpoints
(pretrained/geo_decoder_8dim.pth) via models.decoder.load_torch_decoder.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[prefix + "__treedef"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8
    )
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            # npz has no bfloat16: persist the bit pattern (tpu.moments_bf16)
            out[f"{prefix}__{i}__bf16"] = arr.view(np.uint16)
        else:
            out[f"{prefix}__{i}"] = arr


def _unflatten(prefix: str, like: Any, d) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = []
    for i in range(len(leaves)):
        key = f"{prefix}__{i}"
        if key in d:
            restored.append(jnp.asarray(d[key]))
        else:
            restored.append(jnp.asarray(d[key + "__bf16"].view(jnp.bfloat16)))
    return treedef.unflatten(restored)


def save_checkpoint(
    path: str,
    grid,
    params: Dict[str, Any],
    opt_state,
    iters: int,
) -> None:
    """Full training checkpoint: map structure + params + optimizer state."""
    out: Dict[str, np.ndarray] = {"iters": np.int64(iters)}
    for k, v in grid.state_dict().items():
        out["grid_" + k] = np.asarray(v)
    _flatten("params", params, out)
    _flatten("optm", opt_state.m, out)
    _flatten("optv", opt_state.v, out)
    out["optstep"] = np.asarray(opt_state.step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # uncompressed: the payload is dominated by near-random float feature
    # tables + moments that zlib cannot shrink (~20%), while compression
    # burned ~60 s of the city demo's wall on the host; matches the
    # reference's uncompressed torch.save (utils/tools.py:200-213).
    # np.load reads both formats, so old checkpoints stay loadable.
    np.savez(path, **out)


def load_checkpoint(path: str, params_like, opt_state_like=None):
    """Restore (grid, params, opt_state, iters) from a checkpoint.

    ``params_like`` provides the pytree structure (shapes may differ if the
    map grew — feature tables come from the checkpoint itself).
    """
    from ..ops.hashgrid import HashGridHost
    from ..train.optimizer import OptState

    d = np.load(path, allow_pickle=False)
    grid_state = {
        k[len("grid_"):]: d[k] for k in d.files if k.startswith("grid_")
    }
    grid = HashGridHost.from_state_dict(grid_state)
    params = _unflatten("params", params_like, d)
    # features come from the grid (authoritative shapes)
    params["features"] = tuple(grid.features)
    opt_state = None
    if opt_state_like is not None and any(
            k.startswith("optm__") for k in d.files):
        m = _unflatten("optm", opt_state_like.m, d)
        v = _unflatten("optv", opt_state_like.v, d)
        opt_state = OptState(m=m, v=v, step=jnp.asarray(d["optstep"]))
    return grid, params, opt_state, int(d["iters"])


def save_decoders(path: str, params: Dict[str, Any]) -> None:
    """Decoders-only export (utils/tools.py:216-230).

    Stored with explicit per-weight keys (``geo.w0`` etc.) so they load
    without a params skeleton.
    """
    out: Dict[str, np.ndarray] = {}
    for grp in ("geo", "sem"):
        if grp in params:
            for k, v in params[grp].items():
                out[f"{grp}.{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **out)


def load_decoders(path: str, params: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load decoders into (a copy of) an existing params pytree, or into a
    fresh dict when ``params`` is None/empty."""
    new = dict(params or {})
    if path.endswith(".pth"):  # reference torch checkpoint interop
        from ..models.decoder import load_torch_decoder

        new["geo"] = load_torch_decoder(path, "geo_decoder")
        try:
            new["sem"] = load_torch_decoder(path, "sem_decoder")
        except KeyError:
            pass
        return new
    d = np.load(path, allow_pickle=False)
    for grp in ("geo", "sem"):
        loaded = {
            k.split(".", 1)[1]: jnp.asarray(d[k])
            for k in d.files
            if k.startswith(grp + ".")
        }
        if loaded:
            new[grp] = loaded
    return new
