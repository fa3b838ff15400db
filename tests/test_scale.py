"""Moderate-scale stress: longer drive, deeper tree, bigger tables.

Opt-in (several minutes on CPU): SHINE_RUN_SCALE_TESTS=1 pytest tests/test_scale.py
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SHINE_RUN_SCALE_TESTS"),
    reason="scale stress test is opt-in (SHINE_RUN_SCALE_TESTS=1); passes in ~6 min",
)

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.cli.common import build_grid
from shine_mapping_tpu.data.dataset import LiDARDataset
from shine_mapping_tpu.train import trainer
from shine_mapping_tpu.train.optimizer import init_opt_state
from tests import synth


def test_long_drive_scale(tmp_path):
    """Multi-frame drive at world level 12: growth across many frames,
    capacity doubling under load, training + lookup still correct."""
    root = str(tmp_path / "world")
    synth.make_kitti_dataset(root, n_frames=12)

    cfg = SHINEConfig()
    cfg.name = "scale"
    cfg.output_root = str(tmp_path / "out")
    cfg.pc_path = root + "/velodyne"
    cfg.pose_path = root + "/poses.txt"
    cfg.calib_path = root + "/calib.txt"
    cfg.begin_frame, cfg.end_frame, cfg.every_frame = 0, 100, 1
    cfg.first_frame_ref = False
    cfg.pc_radius, cfg.min_range, cfg.min_z = 25.0, 0.5, -3.0
    cfg.rand_downsample, cfg.vox_down_m = False, 0.05
    cfg.tree_level_world, cfg.tree_level_feat, cfg.leaf_vox_size = 12, 3, 0.15
    cfg.bs = 4096
    cfg.init_node_capacity = 1 << 14  # force a couple of doubling cycles
    cfg.init_corner_capacity = 1 << 14
    cfg.derive()

    grid = build_grid(cfg)
    dataset = LiDARDataset(cfg, grid)
    n = dataset.process_frames_pipelined(dataset.frame_ids(), workers=4)
    assert n == len(dataset.pool)
    assert len(dataset.pool) > 100_000

    # tables grew well past the initial capacities
    assert grid.host_levels[0].n_corners > (1 << 14)
    assert grid.host_levels[0].node_capacity > (1 << 14)
    detail = grid.print_detail()
    assert "voxel corners" in detail

    # every surface sample's node must be found at the finest level
    from shine_mapping_tpu.ops.hashgrid import lookup_level

    surf = dataset.pool.coord[dataset.pool.weight > 0][:50_000]
    _, found = lookup_level(grid.tables[0], jnp.asarray(surf), grid.levels[0])
    assert float(np.asarray(found).mean()) > 0.999

    # a short training run stays finite at this scale
    settings = trainer.TrainSettings.from_config(cfg, grid.levels)
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    dev_pool, n_valid = trainer.pool_to_device(
        dataset.pool, 1 << 19, settings
    )
    params, _, aux = trainer.train_chunk(
        params, init_opt_state(params), tuple(grid.tables), dev_pool,
        trainer.empty_shadow(params["features"]), n_valid, jnp.int32(0),
        jax.random.PRNGKey(1), settings, 30,
    )
    assert np.isfinite(float(aux["mean"]["total_loss"]))
