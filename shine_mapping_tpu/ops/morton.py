"""Morton (Z-order) codecs and voxel quantization.

TPU-native replacement for kaolin's SPC helpers used by the reference:
``quantize_points`` (reference model/feature_octree.py:88),
``points_to_morton`` / ``morton_to_points`` (reference
model/feature_octree.py:89,97) and ``points_to_corners`` (reference
model/feature_octree.py:131).

Design note: the hot device path in this framework never touches Morton codes
— the hash-grid keys are packed integer voxel coordinates (see
``ops/hashgrid.py``), because 3D-interleaved 63-bit codes would need int64
emulation on TPU.  Morton codes are kept (numpy, host-side) for: checkpoint
compatibility / parity tests against the reference semantics, and a canonical
ordering for per-level node exports.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def quantize_points_np(x: np.ndarray, level: int) -> np.ndarray:
    """Float points in [-1, 1] -> integer voxel coords at ``level``.

    Matches kaolin ``quantize_points`` semantics (floor of the scaled
    coordinate, clipped to the grid): used by reference
    model/feature_octree.py:88,203.
    """
    res = 2 ** level
    q = np.floor((x * 0.5 + 0.5) * res).astype(np.int32)
    return np.clip(q, 0, res - 1)


def quantize_points(x: jnp.ndarray, level: int) -> jnp.ndarray:
    """jnp version of :func:`quantize_points_np` (device-side)."""
    res = 2 ** level
    q = jnp.floor((x * 0.5 + 0.5) * res).astype(jnp.int32)
    return jnp.clip(q, 0, res - 1)


def _part1by2(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of v so there are 2 zero bits between each."""
    v = v.astype(np.uint64) & np.uint64(0x1FFFFF)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def _compact1by2(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x1249249249249249)
    v = (v ^ (v >> np.uint64(2))) & np.uint64(0x10C30C30C30C30C3)
    v = (v ^ (v >> np.uint64(4))) & np.uint64(0x100F00F00F00F00F)
    v = (v ^ (v >> np.uint64(8))) & np.uint64(0x1F0000FF0000FF)
    v = (v ^ (v >> np.uint64(16))) & np.uint64(0x1F00000000FFFF)
    v = (v ^ (v >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return v


def points_to_morton_np(p: np.ndarray) -> np.ndarray:
    """Integer (N,3) voxel coords -> (N,) int64 Morton codes.

    Bit-interleave order matches kaolin ``points_to_morton`` (x highest):
    reference model/feature_octree.py:89.
    """
    p = np.asarray(p)
    code = (
        (_part1by2(p[..., 0]) << np.uint64(2))
        | (_part1by2(p[..., 1]) << np.uint64(1))
        | _part1by2(p[..., 2])
    )
    return code.astype(np.int64)


def morton_to_points_np(code: np.ndarray) -> np.ndarray:
    """(N,) int64 Morton codes -> (N,3) int32 voxel coords (inverse)."""
    code = np.asarray(code).astype(np.uint64)
    x = _compact1by2(code >> np.uint64(2))
    y = _compact1by2(code >> np.uint64(1))
    z = _compact1by2(code)
    return np.stack([x, y, z], axis=-1).astype(np.int32)


CORNER_OFFSETS = np.array(
    [
        [0, 0, 0],
        [0, 0, 1],
        [0, 1, 0],
        [0, 1, 1],
        [1, 0, 0],
        [1, 0, 1],
        [1, 1, 0],
        [1, 1, 1],
    ],
    dtype=np.int32,
)
"""Order of a voxel's 8 corners.

Must agree with the interpolation-weight order p0..p7 in ``ops/interp.py``
(reference model/feature_octree.py:186-195): index bit 2 = x, bit 1 = y,
bit 0 = z.  This is also kaolin's ``points_to_corners`` order (reference
model/feature_octree.py:131 relies on it).
"""


def points_to_corners_np(p: np.ndarray) -> np.ndarray:
    """(N,3) voxel coords -> (N,8,3) corner coords (node corners at level+1 grid)."""
    return p[:, None, :] + CORNER_OFFSETS[None, :, :]
