"""Shallow MLP decoder (geometry + semantics) as plain JAX pytrees.

Parity target: reference ``Decoder`` (model/decoder.py:9-101) — a
``mlp_level``-deep ReLU MLP over the summed grid feature with a 1-dim SDF
head (sign-flipped vs. the true SDF) and a ``sem_class_count+1`` log-softmax
semantic head; optional time conditioning appends the timestamp to the input
(model/decoder.py:65-81).

Params are a flat dict pytree so the in-repo Adam can apply per-group weight
decay (reference utils/tools.py:57-83 applies weight decay only to the MLPs).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def init_decoder_params(
    key: jax.Array,
    feature_dim: int,
    hidden_dim: int = 32,
    mlp_level: int = 2,
    sem_class_count: int = 20,
    bias_on: bool = True,
    time_conditioned: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Kaiming-uniform init matching torch.nn.Linear defaults.

    torch initializes weight ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) and bias
    the same — reproduced so decoder statistics match the reference at init.
    """
    in_dim = feature_dim + (1 if time_conditioned else 0)
    params: Params = {}
    dims = [in_dim] + [hidden_dim] * mlp_level
    keys = jax.random.split(key, mlp_level + 2)
    for i in range(mlp_level):
        bound = 1.0 / np.sqrt(dims[i])
        params[f"w{i}"] = jax.random.uniform(
            keys[i], (dims[i], dims[i + 1]), dtype, -bound, bound
        )
        params[f"b{i}"] = (
            jax.random.uniform(keys[i], (dims[i + 1],), dtype, -bound, bound)
            if bias_on
            else jnp.zeros((dims[i + 1],), dtype)
        )
    bound = 1.0 / np.sqrt(hidden_dim)
    params["w_out"] = jax.random.uniform(
        keys[-2], (hidden_dim, 1), dtype, -bound, bound
    )
    params["b_out"] = (
        jax.random.uniform(keys[-2], (1,), dtype, -bound, bound)
        if bias_on
        else jnp.zeros((1,), dtype)
    )
    params["w_sem"] = jax.random.uniform(
        keys[-1], (hidden_dim, sem_class_count + 1), dtype, -bound, bound
    )
    params["b_sem"] = (
        jax.random.uniform(keys[-1], (sem_class_count + 1,), dtype, -bound, bound)
        if bias_on
        else jnp.zeros((sem_class_count + 1,), dtype)
    )
    return params


def _hidden(params: Params, feature: jnp.ndarray) -> jnp.ndarray:
    h = feature
    i = 0
    while f"w{i}" in params:
        h = jax.nn.relu(h @ params[f"w{i}"] + params[f"b{i}"])
        i += 1
    return h


def sdf(params: Params, feature: jnp.ndarray) -> jnp.ndarray:
    """(N,D) feature -> (N,) sdf logits (opposite sign to true SDF).

    Reference model/decoder.py:49-63.
    """
    h = _hidden(params, feature)
    return (h @ params["w_out"] + params["b_out"])[..., 0]


def time_conditioned_sdf(
    params: Params, feature: jnp.ndarray, ts: jnp.ndarray
) -> jnp.ndarray:
    """SDF conditioned on a per-sample timestamp (model/decoder.py:65-81)."""
    x = jnp.concatenate([feature, ts.reshape(-1, 1)], axis=1)
    return sdf(params, x)


def occupancy(params: Params, feature: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid-squashed sdf logits (model/decoder.py:84-86)."""
    return jax.nn.sigmoid(sdf(params, feature))


def sem_label_prob(params: Params, feature: jnp.ndarray) -> jnp.ndarray:
    """(N, n_class+1) log-softmax semantic logits (model/decoder.py:89-97)."""
    h = _hidden(params, feature)
    return jax.nn.log_softmax(h @ params["w_sem"] + params["b_sem"], axis=1)


def sem_label(params: Params, feature: jnp.ndarray) -> jnp.ndarray:
    """Argmax semantic class (model/decoder.py:99-101)."""
    return jnp.argmax(sem_label_prob(params, feature), axis=1)


# --------------------------------------------------------------------------
# torch checkpoint interop (reference ships pretrained/geo_decoder_8dim.pth)


def params_from_torch_state_dict(state: dict) -> Params:
    """Convert a reference ``Decoder.state_dict()`` to our params dict.

    Layout per reference model/decoder.py:29-37: ``layers.{i}.weight/bias``
    (out,in), ``lout.weight/bias``, ``nclass_out.weight/bias``.  Torch stores
    (out,in); we store (in,out).
    """
    params: Params = {}
    i = 0
    while f"layers.{i}.weight" in state:
        params[f"w{i}"] = jnp.asarray(np.asarray(state[f"layers.{i}.weight"]).T)
        if f"layers.{i}.bias" in state:
            params[f"b{i}"] = jnp.asarray(np.asarray(state[f"layers.{i}.bias"]))
        else:
            params[f"b{i}"] = jnp.zeros(params[f"w{i}"].shape[1])
        i += 1
    params["w_out"] = jnp.asarray(np.asarray(state["lout.weight"]).T)
    params["b_out"] = jnp.asarray(np.asarray(state["lout.bias"]))
    if "nclass_out.weight" in state:
        params["w_sem"] = jnp.asarray(np.asarray(state["nclass_out.weight"]).T)
        params["b_sem"] = jnp.asarray(np.asarray(state["nclass_out.bias"]))
    return params


def load_torch_decoder(path: str, key: str = "geo_decoder") -> Params:
    """Load a reference .pth checkpoint's decoder weights (CPU torch)."""
    import torch  # lazy: torch is only needed for interop

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    if key in loaded:
        state = loaded[key]
    elif any(hasattr(v, "detach") for v in loaded.values()):
        state = loaded  # the file IS a bare state_dict
    else:
        raise KeyError(f"{key} not found in {path}")
    state = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return params_from_torch_state_dict(state)
