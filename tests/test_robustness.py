"""Regression tests for review-found edge cases (round-2 deep review)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_mapping_tpu.ops.hashgrid import HashGridHost, lookup_level
from shine_mapping_tpu.train import trainer
from tests.test_trainer import make_sphere_pool, default_cfg, build


def _mk_grid(max_level=4, feat_levels=2):
    return HashGridHost(
        max_level=max_level, featured_level_num=feat_levels, feature_dim=8,
        feature_std=0.05, seed=0,
        init_node_capacity=1 << 10, init_corner_capacity=1 << 10,
    )


def test_update_hole_fill_new_node_zero_new_corners():
    """A frame can add a NODE whose 8 corners all already exist (a hole
    voxel surrounded by allocated neighbors) — update() must record the
    node without crashing on the empty feature-init scatter."""
    grid = _mk_grid(max_level=3, feat_levels=1)
    vox = 2.0 / 2 ** 3
    # 3x3x3 shell of voxel centers around the origin, center missing
    centers = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) != (0, 0, 0):
                    centers.append([(d + 0.5) * vox for d in (dx, dy, dz)])
    grid.update(np.asarray(centers, np.float32))
    n_nodes0 = grid.host_levels[0].n_nodes
    n_corners0 = grid.host_levels[0].n_corners
    # the hole: its 8 corners are exactly the shell's inner corners
    grid.update(np.asarray([[0.5 * vox] * 3], np.float32))
    assert grid.host_levels[0].n_nodes == n_nodes0 + 1
    assert grid.host_levels[0].n_corners == n_corners0
    # and the new node resolves on device
    corners, found = lookup_level(
        grid.tables[0], jnp.asarray([[0.5 * vox] * 3], jnp.float32), 3
    )
    assert bool(found[0])


def test_missed_lookups_mask_to_trashbin_in_trainer():
    """Out-of-map queries must report the TRASHBIN row to row-identity
    consumers (continual-reg touched mask, sparse segments) — the raw
    lookup returns an arbitrary slot's rows on a miss."""
    pool, surf = make_sphere_pool(800, seed=3)
    cfg = default_cfg(bs=128)
    grid, settings, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    # far outside the mapped sphere: every level misses
    coords = jnp.asarray(
        np.full((64, 3), 0.97, np.float32) * np.array([1, -1, 1], np.float32)
    )
    _, _, corners, found = trainer._forward_sdf(
        params, tuple(grid.tables), coords, jnp.zeros((64,)), settings
    )
    for i in range(len(settings.levels)):
        C_i = params["features"][i].shape[0]
        miss = ~np.asarray(found[i])
        assert miss.any(), "test points must actually miss"
        np.testing.assert_array_equal(
            np.asarray(corners[i])[miss], C_i - 1
        )


def test_continual_reg_ignores_missed_lookups():
    """Regularizer contribution of an all-miss batch is exactly zero even
    with nonzero importance on every real corner."""
    pool, surf = make_sphere_pool(800, seed=5)
    cfg = default_cfg(bs=128)
    grid, settings, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    shadow = {
        "importance": tuple(
            jnp.ones_like(f) for f in params["features"]
        ),
        "last_frame": tuple(
            f + 0.5 for f in params["features"]  # every row penalizable
        ),
    }
    coords = jnp.asarray(np.full((64, 3), -0.97, np.float32))
    _, _, corners, found = trainer._forward_sdf(
        params, tuple(grid.tables), coords, jnp.zeros((64,)), settings
    )
    assert not any(bool(jnp.any(f)) for f in found)
    # trashbin importance is nonzero here on purpose: the trashbin's
    # feature/last-frame rows are zero in real runs, but a masked-to-trash
    # corner with importance 1 would still contribute (0.5^2) if touched —
    # so zero the trash importance like cal_feature_importance does
    shadow["importance"] = tuple(
        imp.at[-1].set(0.0) for imp in shadow["importance"]
    )
    reg = trainer._continual_reg(params, shadow, corners, settings)
    assert float(reg) == 0.0


@pytest.mark.parametrize("npool", [100_000, 65_536, 1_000])
def test_precompute_pool_lookups_any_capacity(npool):
    """Pool capacities need not be multiples of 2^16."""
    pool, surf = make_sphere_pool(1000, seed=7)
    cfg = default_cfg(bs=128)
    grid, settings, params, _, dev_pool, n_valid = build(cfg, pool, surf)
    rng = np.random.default_rng(1)
    coords = jnp.asarray(
        surf[rng.integers(0, surf.shape[0], npool)].astype(np.float32)
    )
    caps = tuple(f.shape[0] for f in params["features"])
    pre = trainer.precompute_pool_lookups(
        tuple(grid.tables), coords, tuple(grid.levels), caps
    )
    for i, lvl in enumerate(grid.levels):
        assert pre[i][0].shape == (npool, 8)
        assert pre[i][1].shape == (npool,)
        # agrees with direct lookups
        c_ref, f_ref = lookup_level(grid.tables[i], coords[:512], lvl)
        c_ref = jnp.where(f_ref[:, None], c_ref, caps[i] - 1)
        np.testing.assert_array_equal(
            np.asarray(pre[i][0][:512]), np.asarray(c_ref)
        )


def test_make_group_trees_packed_features_layout():
    """The fused (single concatenated array) layout must not unroll one
    traced slice per packed row."""
    from shine_mapping_tpu.train.optimizer import make_group_trees

    params = {
        "geo": {"w": jnp.zeros((4, 4))},
        "features": jnp.zeros((1 << 16, 128)),  # packed layout
        "sigma": jnp.ones(()),
    }
    import time

    t0 = time.perf_counter()
    lr_scale, wd = make_group_trees(params, 0.5, 0.01)
    assert time.perf_counter() - t0 < 1.0  # enumerate() would take minutes
    assert lr_scale["features"] == 1.0
    assert wd["features"] == 0.0


def test_max_level_16_rejected():
    with pytest.raises(ValueError, match="overflow"):
        _mk_grid(max_level=16, feat_levels=2)


def test_natural_sort_key_mixed_boundary():
    """Names diverging at a digit/non-digit boundary must not raise
    (int-vs-str list comparison) and digits still order numerically."""
    from shine_mapping_tpu.data.dataset import natural_sort_key

    names = ["scan.bin", "scan1.bin", "scan10.bin", "scan9.bin", "a2", "a"]
    out = sorted(names, key=natural_sort_key)  # must not raise
    assert out.index("scan9.bin") < out.index("scan10.bin")
    assert out.index("a") < out.index("a2")


def test_pipelined_matches_sequential_pool():
    """Bounded-window pipelined ingest integrates frames in order and
    produces the same pool as worker-rng sequential processing."""
    import os
    from tests import synth
    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import LiDARDataset

    import tempfile

    root = tempfile.mkdtemp(prefix="pipe_seq_")
    synth.make_kitti_dataset(root, n_frames=5)
    cfg = SHINEConfig()
    cfg.name = "pipe"
    cfg.output_root = root
    cfg.pc_path = os.path.join(root, "velodyne")
    cfg.pose_path = os.path.join(root, "poses.txt")
    cfg.calib_path = os.path.join(root, "calib.txt")
    cfg.begin_frame, cfg.end_frame, cfg.every_frame = 0, 5, 1
    cfg.first_frame_ref = False
    cfg.vox_down_m = 0.12
    cfg.tree_level_world, cfg.tree_level_feat = 9, 2
    cfg.leaf_vox_size = 0.5
    cfg.derive()

    def run(workers):
        ds = LiDARDataset(cfg, None)
        if workers > 1:
            ds.process_frames_pipelined(ds.frame_ids(), workers)
        else:
            # per-frame rngs, like the pipelined path, for comparability
            for fid in ds.frame_ids():
                ds._integrate_frame(ds.load_and_sample(fid), False)
        return ds.pool

    p1 = run(1)
    p3 = run(3)
    np.testing.assert_array_equal(p1.coord, p3.coord)
    np.testing.assert_array_equal(p1.weight, p3.weight)
