"""In-repo Adam/SGD with parameter groups and step LR decay.

Parity targets:
* ``setup_optimizer`` (reference utils/tools.py:57-83): Adam with
  betas=(0.9, 0.99), eps=1e-15; weight decay applied **only** to the MLP
  decoders; per-level feature-grid learning rates scaled by
  ``lr_level_reduce_ratio`` (finest level gets the base LR); the learnable
  rendering sigma joins only when ``ray_loss``.
* ``step_lr_decay`` (utils/tools.py:135-155): multiply the LR by
  ``lr_iters_reduce_ratio`` each time the iteration counter crosses an entry
  of ``lr_decay_step``.

Implemented as pure functions over pytrees so the whole update jits and
shards (collectives over data-parallel gradients are inserted by pjit
upstream of this module).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class OptState(NamedTuple):
    m: Any  # first-moment pytree (same structure as params)
    v: Any  # second-moment pytree
    step: jnp.ndarray  # int32 scalar


def init_opt_state(params: Any, moments_bf16: bool = False) -> OptState:
    """Zero Adam state.  With ``moments_bf16`` the FEATURE tables' moments
    are stored bfloat16 (compute stays f32 inside the update kernels) —
    halves the m/v HBM traffic of the dense sweep; decoder/sigma moments
    stay f32.  Opt-in via ``tpu.moments_bf16`` (pallas mode only)."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    zeros_v = jax.tree_util.tree_map(jnp.zeros_like, params)
    if moments_bf16 and isinstance(params, dict) and "features" in params:
        def bf16_feats(t):
            return tuple(jnp.zeros(f.shape, jnp.bfloat16) for f in t)

        zeros = dict(zeros, features=bf16_feats(params["features"]))
        zeros_v = dict(zeros_v, features=bf16_feats(params["features"]))
    return OptState(m=zeros, v=zeros_v, step=jnp.zeros((), jnp.int32))


def lr_at_step(
    base_lr: float, iteration: jnp.ndarray, decay_steps: Sequence[int], reduce: float
) -> jnp.ndarray:
    """LR after step decay: base * reduce^(#decay steps passed).

    Matches reference ``step_lr_decay`` (utils/tools.py:135-155), which fires
    when ``iteration == s`` and keeps the reduced LR afterwards.
    """
    passed = jnp.zeros((), jnp.int32)
    for s in decay_steps:
        passed = passed + (iteration >= s).astype(jnp.int32)
    return base_lr * (reduce ** passed.astype(jnp.float32))


def adam_update(
    params: Any,
    grads: Any,
    state: OptState,
    lr: jnp.ndarray,
    lr_scale_tree: Any,
    wd_tree: Any,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-15,
) -> tuple[Any, OptState]:
    """One Adam step with per-leaf LR scaling and decoupled-L2 weight decay.

    ``lr_scale_tree`` / ``wd_tree`` are pytrees of python floats matching the
    params structure (group config).  Weight decay is applied torch-style:
    grad += wd * param (reference uses torch.optim.Adam ``weight_decay``).
    """
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def leaf(p, g, m, v, scale, wd):
        g = g + wd * p if wd else g
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * (g * g)
        mhat = m / bc1
        vhat = v / bc2
        new_p = p - lr * scale * mhat / (jnp.sqrt(vhat) + eps)
        return new_p, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    flat_s = treedef.flatten_up_to(lr_scale_tree)
    flat_w = treedef.flatten_up_to(wd_tree)
    out = [leaf(*args) for args in zip(flat_p, flat_g, flat_m, flat_v, flat_s, flat_w)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, OptState(m=new_m, v=new_v, step=step)


def sgd_update(
    params: Any,
    grads: Any,
    state: OptState,
    lr: jnp.ndarray,
    lr_scale_tree: Any,
    wd_tree: Any,
    momentum: float = 0.9,
) -> tuple[Any, OptState]:
    """SGD+momentum fallback (reference utils/tools.py:81: optim.SGD(momentum=0.9))."""
    step = state.step + 1

    def leaf(p, g, m, _v, scale, wd):
        g = g + wd * p if wd else g
        m = momentum * m + g
        return p - lr * scale * m, m, _v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat = [
        leaf(*args)
        for args in zip(
            flat_p,
            treedef.flatten_up_to(grads),
            treedef.flatten_up_to(state.m),
            treedef.flatten_up_to(state.v),
            treedef.flatten_up_to(lr_scale_tree),
            treedef.flatten_up_to(wd_tree),
        )
    ]
    new_p = treedef.unflatten([o[0] for o in flat])
    new_m = treedef.unflatten([o[1] for o in flat])
    return new_p, OptState(m=new_m, v=state.v, step=step)


def make_group_trees(params: Any, level_lr_ratio: float, weight_decay: float):
    """Build (lr_scale_tree, wd_tree) for the canonical param structure.

    ``params`` is a dict with keys ``geo``, ``sem`` (decoder dicts),
    ``features`` (tuple of per-level tables, bottom-up: finest first) and
    ``sigma``.  Per reference utils/tools.py:57-83: decoders get weight
    decay; featured level i (finest = 0) gets lr * ratio**i.
    """

    def const_tree(subtree, value):
        return jax.tree_util.tree_map(lambda _: value, subtree)

    lr_scale = {}
    wd = {}
    for k, v in params.items():
        if k in ("geo", "sem"):
            lr_scale[k] = const_tree(v, 1.0)
            wd[k] = const_tree(v, weight_decay)
        elif k == "features":
            if isinstance(v, (tuple, list)):
                lr_scale[k] = tuple(
                    const_tree(f, float(level_lr_ratio ** i))
                    for i, f in enumerate(v)
                )
                wd[k] = tuple(const_tree(f, 0.0) for f in v)
            else:
                # packed single-array layout (pallas fuse_update_levels):
                # the feature update bypasses adam_update, so these entries
                # are unused — and enumerate() over a jnp array would unroll
                # one traced slice PER PACKED ROW at trace time
                lr_scale[k] = const_tree(v, 1.0)
                wd[k] = const_tree(v, 0.0)
        else:  # sigma and anything else: base lr, no decay
            lr_scale[k] = const_tree(v, 1.0)
            wd[k] = const_tree(v, 0.0)
    return lr_scale, wd
