"""Fused multi-level feature query: hash lookup + gather + interpolate + sum.

TPU-native replacement for reference ``FeatureOctree.query_feature`` /
``query_feature_with_indices`` (model/feature_octree.py:222-244).  One pure
jittable function: per featured level, locate the containing node in the hash
table (vectorized probing), gather the 8 corner feature rows, weight them by
trilinear / smoothstep coefficients and accumulate across levels.  Misses
contribute zero for that level (the reference's trashbin semantics,
model/feature_octree.py:231-233).

Differentiation:
* w.r.t. the feature tables — gather transpose (scatter-add), handled by XLA.
* w.r.t. the query coordinates — flows through the interpolation weights
  (exactly like the reference, where autograd reaches coords only via
  ``interpolat``); enables Eikonal / normal losses via ``jax.grad``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .hashgrid import LevelTable, lookup_level
from .interp import corner_weights, corner_weights_np
from .morton import CORNER_OFFSETS, quantize_points_np


def query_feature(
    coords: jnp.ndarray,
    tables: Sequence[LevelTable],
    features: Sequence[jnp.ndarray],
    levels: Tuple[int, ...],
    poly_on: bool = True,
) -> jnp.ndarray:
    """(N,3) coords -> (N,D) hierarchically-summed interpolated features."""
    feat, _, _ = query_feature_with_aux(coords, tables, features, levels, poly_on)
    return feat


def query_feature_with_aux(
    coords: jnp.ndarray,
    tables: Sequence[LevelTable],
    features: Sequence[jnp.ndarray],
    levels: Tuple[int, ...],
    poly_on: bool = True,
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """Full query also returning per-level corner rows and found masks.

    Returns:
        feat: (N, D) summed feature.
        corners_per_level: list of (N, 8) int32 rows (bottom-up order),
            the analogue of reference ``hierarchical_indices``
            (model/feature_octree.py:199-218) used by the continual-learning
            regularizer and the marching-cubes mask.
        found_per_level: list of (N,) bool.
    """
    n = coords.shape[0]
    dim = features[0].shape[1]
    feat = jnp.zeros((n, dim), dtype=features[0].dtype)
    corners_per_level: List[jnp.ndarray] = []
    found_per_level: List[jnp.ndarray] = []
    for i, level in enumerate(levels):  # static unroll over featured levels
        corners, found = lookup_level(tables[i], coords, level)
        w = corner_weights(coords, level, poly_on)  # (N, 8)
        w = jnp.where(found[:, None], w, 0.0)
        gathered = features[i][corners]  # (N, 8, D)
        feat = feat + jnp.einsum("nc,ncd->nd", w.astype(gathered.dtype), gathered)
        corners_per_level.append(corners)
        found_per_level.append(found)
    return feat, corners_per_level, found_per_level


# --------------------------------------------------------------------------
# numpy golden model (tests): direct transcription of the reference math


def query_feature_np(
    coords: np.ndarray,
    host_levels,
    features: Sequence[np.ndarray],
    levels: Tuple[int, ...],
    poly_on: bool = True,
) -> np.ndarray:
    """Slow dict-based transcription of reference ``query_feature``.

    ``host_levels`` are ``hashgrid._HostLevel`` objects; this uses their
    insertion-ordered node lists to emulate the reference's per-level
    dictionaries (model/feature_octree.py:199-234) for verification.
    """
    n = coords.shape[0]
    dim = features[0].shape[1]
    out = np.zeros((n, dim), dtype=np.float64)
    for i, level in enumerate(levels):
        hl = host_levels[i]
        lut = {}
        for k in range(hl.n_nodes):
            key = tuple(hl.node_coords[k])
            lut[key] = hl.node_corner_rows[k]
        q = quantize_points_np(coords, level)
        w = corner_weights_np(coords, level, poly_on)
        f = np.asarray(features[i])
        for p in range(n):
            rows = lut.get(tuple(q[p]))
            if rows is None:
                continue  # miss -> zero contribution (trashbin)
            out[p] += (w[p][:, None] * f[rows]).sum(axis=0)
    return out
