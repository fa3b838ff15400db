"""Marching-tetrahedra iso-surface tests against analytic fields."""

import numpy as np

from shine_mapping_tpu.ops.marching import marching_tetrahedra, vertex_normals


def sphere_grid(n=48, radius=0.6, extent=1.0):
    ax = np.linspace(-extent, extent, n)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - radius
    spacing = ax[1] - ax[0]
    return sdf, spacing, np.array([-extent, -extent, -extent])


def test_sphere_surface_accuracy():
    sdf, spacing, origin = sphere_grid()
    verts, faces = marching_tetrahedra(sdf, 0.0, spacing=spacing, origin=origin)
    assert verts.shape[0] > 1000 and faces.shape[0] > 1000
    r = np.linalg.norm(verts, axis=1)
    # vertices lie on the sphere within a fraction of a voxel
    assert np.max(np.abs(r - 0.6)) < spacing
    assert np.mean(np.abs(r - 0.6)) < 0.2 * spacing


def test_sphere_watertight_and_oriented():
    sdf, spacing, origin = sphere_grid(n=32)
    verts, faces = marching_tetrahedra(sdf, 0.0, spacing=spacing, origin=origin)
    # every edge appears exactly twice => closed 2-manifold
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    keys = np.sort(edges, axis=1)
    packed = keys[:, 0].astype(np.int64) * verts.shape[0] + keys[:, 1]
    _, counts = np.unique(packed, return_counts=True)
    assert np.all(counts == 2)
    # normals point outward (+field direction): dot(normal, radial) > 0
    n = vertex_normals(verts, faces)
    radial = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    agree = np.einsum("ij,ij->i", n, radial)
    assert np.mean(agree > 0) > 0.99
    # signed volume ~ sphere volume
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    vol = np.abs(np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.6 ** 3, rtol=0.05)


def test_mask_excludes_cells():
    sdf, spacing, origin = sphere_grid(n=32)
    mask = np.ones(sdf.shape, dtype=bool)
    mask[: sdf.shape[0] // 2] = False  # mask away half the volume
    verts, faces = marching_tetrahedra(sdf, 0.0, mask=mask, spacing=spacing, origin=origin)
    assert verts.shape[0] > 0
    assert np.all(verts[:, 0] >= -0.05)  # only the +x hemisphere remains


def test_empty_and_degenerate():
    sdf = np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(sdf, 0.0)
    assert verts.shape == (0, 3) and faces.shape == (0, 3)
    verts, faces = marching_tetrahedra(-np.ones((8, 8, 8)), 0.0)
    assert verts.shape == (0, 3)
    verts, faces = marching_tetrahedra(np.zeros((1, 5, 5)), 0.0)
    assert verts.shape == (0, 3)


def test_plane_flatness():
    n = 24
    ax = np.linspace(0, 1, n)
    x = np.meshgrid(ax, ax, ax, indexing="ij")[0]
    sdf = x - 0.5
    verts, faces = marching_tetrahedra(sdf, 0.0, spacing=ax[1] - ax[0])
    assert verts.shape[0] > 0
    np.testing.assert_allclose(verts[:, 0], 0.5, atol=1e-9)
