"""Run the REFERENCE implementation (/root/reference) on this machine.

The reference needs kaolin (CUDA) for five SPC ops; this harness injects a
torch/numpy shim implementing exactly those ops (bit-compatible with our
ops/morton, which is golden-tested against kaolin's documented semantics)
so the reference's own FeatureOctree / Decoder / losses run unmodified on
torch CPU.  Used to MEASURE the reference (its host-side ``get_indices``
dict-lookup floor and full CPU training step) instead of estimating it,
and for cross-implementation parity tests.

Nothing from /root/reference is copied — its modules are imported and
executed in place.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF = "/root/reference"

sys.path.insert(0, _REPO)

from shine_mapping_tpu.ops import morton as our_morton  # noqa: E402


# ---------------------------------------------------------------- kaolin shim


def _quantize_points(x: torch.Tensor, level: int) -> torch.Tensor:
    q = our_morton.quantize_points_np(x.detach().cpu().numpy(), level)
    return torch.from_numpy(q.astype(np.int16)).to(x.device)


def _points_to_morton(points: torch.Tensor) -> torch.Tensor:
    p = points.detach().cpu().numpy().astype(np.int64)
    m = our_morton.points_to_morton_np(p)
    return torch.from_numpy(m).to(points.device)


def _morton_to_points(morton: torch.Tensor) -> torch.Tensor:
    m = morton.detach().cpu().numpy().astype(np.int64)
    p = our_morton.morton_to_points_np(m)
    return torch.from_numpy(p.astype(np.int16)).to(morton.device)


def _points_to_corners(points: torch.Tensor) -> torch.Tensor:
    p = points.detach().cpu().numpy().astype(np.int64)
    offs = np.asarray(our_morton.CORNER_OFFSETS, dtype=np.int64)  # (8, 3)
    corners = p[:, None, :] + offs[None, :, :]
    return torch.from_numpy(corners.astype(np.int16)).to(points.device)


class _Spc:
    def __init__(self, point_hierarchies, pyramids):
        self.point_hierarchies = point_hierarchies
        self.pyramids = pyramids


def _unbatched_pointcloud_to_spc(points: torch.Tensor, level: int) -> _Spc:
    """Structured point cloud: per-level sorted-unique quantized coords,
    concatenated top-down, with the (2, level+2) count/offset pyramid."""
    q = our_morton.quantize_points_np(points.detach().cpu().numpy(), level)
    q = q.astype(np.int64)
    per_level = []
    for li in range(level + 1):
        ql = q >> (level - li)
        m = our_morton.points_to_morton_np(ql)
        mu = np.unique(m)
        per_level.append(our_morton.morton_to_points_np(mu))
    counts = np.array([p.shape[0] for p in per_level] + [0], dtype=np.int64)
    offsets = np.zeros(level + 2, dtype=np.int64)
    offsets[1:] = np.cumsum(counts[:-1])
    hier = torch.from_numpy(
        np.concatenate(per_level, axis=0).astype(np.int16)
    ).to(points.device)
    pyr = torch.from_numpy(np.stack([counts, offsets], axis=0)[None]).int()
    return _Spc(hier, pyr)


def _install_kaolin_shim() -> None:
    if "kaolin" in sys.modules:
        return
    kal = types.ModuleType("kaolin")
    ops = types.ModuleType("kaolin.ops")
    spc = types.ModuleType("kaolin.ops.spc")
    conv = types.ModuleType("kaolin.ops.conversions")
    spc.quantize_points = _quantize_points
    spc.points_to_morton = _points_to_morton
    spc.morton_to_points = _morton_to_points
    spc.points_to_corners = _points_to_corners
    conv.unbatched_pointcloud_to_spc = _unbatched_pointcloud_to_spc
    ops.spc = spc
    ops.conversions = conv
    kal.ops = ops
    sys.modules["kaolin"] = kal
    sys.modules["kaolin.ops"] = ops
    sys.modules["kaolin.ops.spc"] = spc
    sys.modules["kaolin.ops.conversions"] = conv


class RefConfig:
    """Duck-typed stand-in for the reference SHINEConfig fields the model
    stack reads (utils/config.py defaults)."""

    def __init__(self, tree_level_world=12, tree_level_feat=3, leaf_vox_size=0.2,
                 feature_dim=8, feature_std=0.05, poly_int_on=True,
                 geo_mlp_level=2, geo_mlp_hidden_dim=32, geo_mlp_bias_on=True,
                 sem_class_count=20, time_conditioned=False):
        self.tree_level_world = tree_level_world
        self.tree_level_feat = tree_level_feat
        self.leaf_vox_size = leaf_vox_size
        self.feature_dim = feature_dim
        self.feature_std = feature_std
        self.poly_int_on = poly_int_on
        self.device = "cpu"
        self.dtype = torch.float32
        self.geo_mlp_level = geo_mlp_level
        self.geo_mlp_hidden_dim = geo_mlp_hidden_dim
        self.geo_mlp_bias_on = geo_mlp_bias_on
        self.sem_mlp_level = geo_mlp_level
        self.sem_mlp_hidden_dim = geo_mlp_hidden_dim
        self.sem_mlp_bias_on = geo_mlp_bias_on
        self.sem_class_count = sem_class_count
        self.time_conditioned = time_conditioned
        self.logistic_gaussian_ratio = 0.55
        self.sigma_sigmoid_m = 0.1
        self.scale = 1.0


def load_reference():
    """Import the reference's model/loss modules (kaolin shimmed).

    Returns (feature_octree_module, decoder_module, loss_module).
    """
    _install_kaolin_shim()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import importlib

    fo = importlib.import_module("model.feature_octree")
    dec = importlib.import_module("model.decoder")
    loss = importlib.import_module("utils.loss")
    return fo, dec, loss
