"""Rotating device sub-pools for datasets larger than the device budget."""

import os

import numpy as np

from tests import synth
from tests.test_e2e import small_cfg


def test_batch_driver_with_pool_rotation(tmp_path):
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    root = str(tmp_path / "world")
    synth.make_kitti_dataset(root, n_frames=4)
    cfg = small_cfg(root, str(tmp_path))
    cfg.iters = 120
    cfg.scan_chunk = 40
    # force rotation: budget far below the pool size
    cfg.max_device_pool = 1 << 14
    cfg.pool_rotate_iters = 40
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    assert os.path.exists(run_path + "/model/model_final.npz")
    # training still learned something sensible
    import json

    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    losses = [r["loss/total_loss"] for r in recs]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_subset_pool_helper():
    from shine_mapping_tpu.train.trainer import _subset_pool
    from shine_mapping_tpu.data.dataset import SamplePool

    n = 100
    pool = SamplePool(
        coord=np.arange(n * 3, dtype=np.float32).reshape(n, 3),
        sdf_label=np.arange(n, dtype=np.float32),
        weight=np.ones(n, np.float32),
        sample_depth=np.zeros(n, np.float32),
        ray_depth=np.zeros(10, np.float32),  # different length: untouched
        origin=np.zeros((n, 3), np.float32),
        time=np.zeros(n, np.float32),
    )
    idx = np.array([5, 1, 99])
    sub = _subset_pool(pool, idx)
    np.testing.assert_array_equal(sub.sdf_label, [5, 1, 99])
    assert sub.coord.shape == (3, 3)
    assert sub.ray_depth.shape == (10,)  # non-sample-aligned fields kept
    assert len(pool) == n  # original untouched


def test_batch_driver_pool_rotation_with_fused_windows(tmp_path, capsys):
    """Rotation invalidates the fused-window precompute: the driver must
    rebuild the stacks/preps for every sub-pool and keep training sound
    (the production perf path intersected with the giant-dataset path)."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    root = str(tmp_path / "world")
    synth.make_kitti_dataset(root, n_frames=4)
    cfg = small_cfg(root, str(tmp_path))
    cfg.iters = 120
    cfg.scan_chunk = 40
    cfg.max_device_pool = 1 << 14
    cfg.pool_rotate_iters = 40
    cfg.feature_update = "pallas"
    cfg.moments_bf16 = True
    cfg.batch_windows = True
    cfg.params_bf16 = True
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    out = capsys.readouterr().out
    assert "rotating" in out and "bf16 map mode" in out
    assert "prerequisites unmet" not in out
    import json

    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    losses = [r["loss/total_loss"] for r in recs]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])
