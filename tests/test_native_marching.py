"""Native C++ marching-tetrahedra vs the numpy reference implementation."""

import numpy as np
import pytest

from shine_mapping_tpu.ops.marching import (
    marching_tetrahedra,
    marching_tetrahedra_native,
    vertex_normals,
)
from tests.test_marching import sphere_grid


@pytest.fixture(scope="module")
def native_available():
    out = marching_tetrahedra_native(np.ones((4, 4, 4)), 0.0)
    if out is None:
        pytest.skip("native marching lib unavailable (no compiler)")
    return True


def _mesh_stats(verts, faces):
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    vol = np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0
    return area, vol


def test_native_matches_numpy_geometry(native_available):
    sdf, spacing, origin = sphere_grid(n=32)
    # f32 for BOTH paths: near-zero field values would otherwise flip their
    # inside/outside classification between f32 (C++) and f64 (numpy)
    sdf = sdf.astype(np.float32)
    v_np, f_np = marching_tetrahedra(sdf, 0.0, spacing=spacing, origin=origin,
                                     prefer_native=False)
    v_na, f_na = marching_tetrahedra_native(sdf, 0.0, spacing=spacing, origin=origin)
    # identical vertex SETS (ordering differs by construction)
    key_np = np.lexsort((v_np[:, 2], v_np[:, 1], v_np[:, 0]))
    key_na = np.lexsort((v_na[:, 2], v_na[:, 1], v_na[:, 0]))
    # (the native path interpolates in f32, numpy in f64 -> 1e-6-level diffs)
    np.testing.assert_allclose(v_np[key_np], v_na[key_na], atol=1e-5)
    assert f_np.shape[0] == f_na.shape[0]
    # same surface area and enclosed volume (orientation consistent)
    a1, vol1 = _mesh_stats(v_np, f_np)
    a2, vol2 = _mesh_stats(v_na, f_na)
    np.testing.assert_allclose(a1, a2, rtol=1e-5)
    np.testing.assert_allclose(abs(vol1), abs(vol2), rtol=1e-5)
    np.testing.assert_allclose(abs(vol1), 4 / 3 * np.pi * 0.6 ** 3, rtol=0.05)


def test_native_mask(native_available):
    sdf, spacing, origin = sphere_grid(n=24)
    mask = np.ones(sdf.shape, bool)
    mask[: sdf.shape[0] // 2] = False
    v, f = marching_tetrahedra_native(sdf, 0.0, mask=mask, spacing=spacing, origin=origin)
    assert v.shape[0] > 0
    assert np.all(v[:, 0] >= -0.08)


def test_native_orientation_outward(native_available):
    sdf, spacing, origin = sphere_grid(n=24)
    v, f = marching_tetrahedra_native(sdf, 0.0, spacing=spacing, origin=origin)
    n = vertex_normals(v, f)
    radial = v / np.linalg.norm(v, axis=1, keepdims=True)
    assert np.mean(np.einsum("ij,ij->i", n, radial) > 0) > 0.99


def test_default_dispatch_prefers_native(native_available):
    sdf, spacing, origin = sphere_grid(n=16)
    v1, f1 = marching_tetrahedra(sdf, 0.0, spacing=spacing, origin=origin)
    assert v1.shape[0] > 0
