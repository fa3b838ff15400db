"""Trilinear / smoothstep-polynomial interpolation weights.

Parity target: reference ``FeatureOctree.interpolat``
(model/feature_octree.py:172-196).  Given query points in the [-1, 1] cube
and an octree level, produce the 8 corner weights in the corner order of
``ops/morton.CORNER_OFFSETS`` (x is the highest bit: p4..p7 carry tx).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def corner_weights(x: jnp.ndarray, level: int, polynomial_on: bool = True) -> jnp.ndarray:
    """(N,3) points in [-1,1] -> (N,8) interpolation weights at ``level``.

    Matches reference model/feature_octree.py:172-196: fractional cell
    coordinate, optional smoothstep 3t^2-2t^3 remap, and the p0..p7 product
    ordering (z fastest, x slowest).
    """
    coords = (2.0 ** level) * (x * 0.5 + 0.5)
    d = coords - jnp.floor(coords)
    if polynomial_on:
        d = 3.0 * d * d - 2.0 * d * d * d
    tx, ty, tz = d[..., 0], d[..., 1], d[..., 2]
    ox, oy, oz = 1.0 - tx, 1.0 - ty, 1.0 - tz
    w = jnp.stack(
        [
            ox * oy * oz,
            ox * oy * tz,
            ox * ty * oz,
            ox * ty * tz,
            tx * oy * oz,
            tx * oy * tz,
            tx * ty * oz,
            tx * ty * tz,
        ],
        axis=-1,
    )
    return w


def corner_weights_np(x: np.ndarray, level: int, polynomial_on: bool = True) -> np.ndarray:
    """Numpy transcription used as the golden reference in tests."""
    coords = (2.0 ** level) * (x * 0.5 + 0.5)
    d = coords - np.floor(coords)
    if polynomial_on:
        d = 3.0 * d ** 2 - 2.0 * d ** 3
    tx, ty, tz = d[..., 0], d[..., 1], d[..., 2]
    ox, oy, oz = 1.0 - tx, 1.0 - ty, 1.0 - tz
    return np.stack(
        [
            ox * oy * oz,
            ox * oy * tz,
            ox * ty * oz,
            ox * ty * tz,
            tx * oy * oz,
            tx * oy * tz,
            tx * ty * oz,
            tx * ty * tz,
        ],
        axis=-1,
    )
