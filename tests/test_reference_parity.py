"""Cross-implementation parity against the ACTUAL reference code.

Runs /root/reference's FeatureOctree + Decoder (torch CPU, kaolin shimmed
by experiments/ref_harness) and our JAX stack on the SAME map structure
with IDENTICAL features and decoder weights, and asserts the predicted SDF
fields and spatial gradients agree — the BASELINE.md quality gate
("match reference SDF field ... per-point gradients allclose given
identical features")."""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from experiments import ref_harness
from shine_mapping_tpu.ops.hashgrid import HashGridHost
from shine_mapping_tpu.ops.morton import morton_to_points_np
from shine_mapping_tpu.ops.query import query_feature
from shine_mapping_tpu.models import decoder as our_decoder

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def worlds():
    fo, dec, loss = ref_harness.load_reference()
    rng = np.random.default_rng(0)
    n = 3000
    dirs = rng.standard_normal((n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    surf = (dirs * (0.5 + rng.uniform(-0.05, 0.05, (n, 1)))).astype(np.float32)

    cfg_ref = ref_harness.RefConfig(
        tree_level_world=6, tree_level_feat=3, leaf_vox_size=0.5
    )
    octree = fo.FeatureOctree(cfg_ref)
    octree.update(torch.from_numpy(surf))

    grid = HashGridHost(
        max_level=6, featured_level_num=3, feature_dim=8, feature_std=0.05,
        seed=0, init_node_capacity=1 << 12, init_corner_capacity=1 << 12,
    )
    grid.update(surf)
    return fo, dec, octree, grid, surf


def _pack64(q):
    q = q.astype(np.int64)
    return (q[:, 0] << 32) | (q[:, 1] << 16) | q[:, 2]


def transfer_features(octree, grid):
    """Copy the reference's (random-init) corner features into our tables,
    matching corners by integer coordinate."""
    feat_num = octree.featured_level_num
    for i in range(feat_num):  # i=0 -> finest (our level order)
        current_level = octree.max_level - i
        ref_feats = octree.hier_features[feat_num - 1 - i].detach().numpy()
        lut = octree.corners_lookup_tables[current_level]
        mortons = np.array(list(lut.keys()), dtype=np.int64)
        ref_rows = np.array(list(lut.values()), dtype=np.int64)
        coords = morton_to_points_np(mortons)
        keys = _pack64(coords)
        hl = grid.host_levels[i]
        pos = np.searchsorted(hl.corner_keys_sorted, keys)
        assert np.all(hl.corner_keys_sorted[pos] == keys), "corner set mismatch"
        our_rows = hl.corner_rows_sorted[pos]
        ours = np.array(grid.features[i])
        ours[our_rows] = ref_feats[ref_rows]
        ours[-1] = 0.0
        grid.features[i] = jnp.asarray(ours)


def test_structure_identical(worlds):
    """Same surface points -> same corner sets per level."""
    fo, dec, octree, grid, surf = worlds
    for i in range(3):
        current_level = octree.max_level - i
        n_ref = len(octree.corners_lookup_tables[current_level])
        assert n_ref == grid.host_levels[i].n_corners
        n_ref_nodes = len(octree.nodes_lookup_tables[current_level])
        assert n_ref_nodes == grid.host_levels[i].n_nodes


def test_sdf_field_and_gradient_parity(worlds):
    fo, dec, octree, grid, surf = worlds
    transfer_features(octree, grid)

    cfg_ref = ref_harness.RefConfig(
        tree_level_world=6, tree_level_feat=3, leaf_vox_size=0.5
    )
    geo_ref = dec.Decoder(cfg_ref, is_geo_encoder=True)
    tmp = "/tmp/ref_parity_decoder.pth"
    torch.save({"geo_decoder": geo_ref.state_dict()}, tmp)
    geo_ours = our_decoder.load_torch_decoder(tmp, "geo_decoder")

    rng = np.random.default_rng(1)
    m = 1024
    # queries: mix of in-map (near surface) and out-of-map points
    near = surf[rng.integers(0, surf.shape[0], m // 2)] + rng.normal(
        0, 0.02, (m // 2, 3)
    ).astype(np.float32)
    far = rng.uniform(-1, 1, (m - m // 2, 3)).astype(np.float32)
    queries = np.concatenate([near, far]).astype(np.float32)

    # reference field + gradient
    q_t = torch.from_numpy(queries)
    q_t.requires_grad_(True)
    feat_ref = octree.query_feature(q_t)
    sdf_ref = geo_ref.sdf(feat_ref)
    g_ref = torch.autograd.grad(sdf_ref.sum(), q_t)[0].detach().numpy()
    sdf_ref = sdf_ref.detach().numpy()

    # our field + gradient
    tables = tuple(grid.tables)
    feats = list(grid.features)
    levels = tuple(grid.levels)

    def ours(c):
        f = query_feature(c, tables, feats, levels, True)
        return our_decoder.sdf(geo_ours, f)

    sdf_ours = np.asarray(ours(jnp.asarray(queries)))
    g_ours = np.asarray(
        jax.grad(lambda c: jnp.sum(ours(c)))(jnp.asarray(queries))
    )

    np.testing.assert_allclose(sdf_ours, sdf_ref, atol=2e-5)
    np.testing.assert_allclose(g_ours, g_ref, atol=2e-4)


def test_bce_loss_parity(worlds):
    """Our BCE training loss equals the reference's sdf_bce_loss on the
    same predictions/labels."""
    fo, dec, octree, grid, surf = worlds
    sys.path.insert(0, "/root/reference")
    import importlib

    ref_loss = importlib.import_module("utils.loss")
    from shine_mapping_tpu.train import losses as our_losses

    rng = np.random.default_rng(2)
    pred = rng.normal(0, 1, 512).astype(np.float32)
    label = rng.normal(0, 0.05, 512).astype(np.float32)
    sigma = 0.05
    ref = float(ref_loss.sdf_bce_loss(
        torch.from_numpy(pred), torch.from_numpy(label), sigma, None, "mean"
    ))
    ours = float(our_losses.sdf_bce_loss(
        jnp.asarray(pred), jnp.asarray(label), sigma
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
