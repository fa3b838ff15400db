"""End-to-end driver tests on the synthetic KITTI-layout world."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.data import io
from shine_mapping_tpu.eval.metrics import eval_mesh, sample_points_uniformly
from tests import synth


def small_cfg(root: str, out: str) -> SHINEConfig:
    cfg = SHINEConfig()
    cfg.name = "synth"
    cfg.output_root = out
    cfg.pc_path = os.path.join(root, "velodyne")
    cfg.pose_path = os.path.join(root, "poses.txt")
    cfg.calib_path = os.path.join(root, "calib.txt")
    cfg.begin_frame = 0
    cfg.end_frame = 100
    cfg.every_frame = 1
    cfg.first_frame_ref = False
    cfg.pc_radius = 20.0
    cfg.min_range = 0.5
    cfg.min_z = -3.0
    cfg.rand_downsample = False
    cfg.vox_down_m = 0.08
    cfg.tree_level_world = 10
    cfg.tree_level_feat = 3
    cfg.leaf_vox_size = 0.3
    cfg.bs = 2048
    cfg.iters = 400
    cfg.lr = 0.02
    cfg.scan_chunk = 100
    cfg.save_freq_iters = 0
    cfg.vis_freq_iters = 0  # only final mesh
    cfg.mesh_freq_frame = 100
    cfg.mc_res_m = 0.15
    cfg.mc_vis_level = 1
    cfg.surface_sample_n = 4
    cfg.free_sample_n = 2
    cfg.o3d_vis_on = False
    cfg.wandb_vis_on = False
    cfg.continual_learning_reg = False
    cfg.window_replay_on = False
    cfg.init_node_capacity = 1 << 14
    cfg.init_corner_capacity = 1 << 14
    cfg.init_pool_capacity = 1 << 18
    cfg.derive()
    return cfg


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_kitti"))
    synth.make_kitti_dataset(root, n_frames=5)
    return root


def test_batch_driver_end_to_end(synth_root, tmp_path):
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)

    # training artifacts exist
    assert os.path.exists(run_path + "/model/model_final.npz")
    assert os.path.exists(run_path + "/map/pc_map_down.ply")
    assert os.path.exists(run_path + "/metrics.jsonl")

    # phase timers recorded in the metrics stream
    import json

    with open(run_path + "/metrics.jsonl") as f:
        rec = json.loads(f.readlines()[-1])
    assert "phase(s)/data" in rec and "phase(s)/train" in rec
    assert rec["phase(s)/train"] > 0 and rec["phase(s)/data"] > 0

    # reconstruct final mesh
    from shine_mapping_tpu.mesher import Mesher

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh_path = run_path + "/mesh/final.ply"
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, mesh_path, "", False, False
    )
    assert mesh.vertices.shape[0] > 500, "mesh too small"

    # score against the analytic ground truth
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


@pytest.mark.parametrize("fused", [False, True])
def test_batch_driver_epoch_windows_end_to_end(synth_root, tmp_path, capsys,
                                               fused):
    """tpu.batch_windows (epoch-window sampling + precomputed kernel prep)
    through the full batch driver: same quality gates as iid sampling.
    ``fused`` covers both window layouts — per-level (the DP path) and the
    fused-gather winx layout (the single-chip default)."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.windows_fused = fused
    cfg.vis_freq_iters = cfg.iters  # final mesh
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    assert "batch_windows requested but prerequisites unmet" not in capsys.readouterr().out

    mesh_path = run_path + f"/mesh/mesh_iter_{cfg.iters}.ply"
    assert os.path.exists(mesh_path)
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


def test_batch_driver_profile_trace(synth_root, tmp_path):
    """tpu.profile_dir captures a jax.profiler trace of one steady-state
    training chunk."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 200
    cfg.profile_dir = str(tmp_path / "profout")
    run_shine_mapping_batch(cfg=cfg)
    import glob

    files = [f for f in glob.glob(cfg.profile_dir + "/**/*", recursive=True)
             if os.path.isfile(f)]
    assert any(f.endswith(".pb") or f.endswith(".json.gz") for f in files), files


def test_batch_driver_time_conditioned_meshing(synth_root, tmp_path):
    """Time-conditioned runs mesh once per EVEN timestamp at each vis
    event (reference shine_batch.py:248-264)."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.time_conditioned = True
    cfg.iters = 100
    cfg.vis_freq_iters = 100
    cfg.mc_res_m = 0.3  # coarse: 3 meshes per event
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    for ts in (0, 2, 4):
        path = run_path + f"/mesh/mesh_iter_100_ts_{ts}.ply"
        assert os.path.exists(path), path
    assert not os.path.exists(run_path + "/mesh/mesh_iter_100_ts_1.ply")


def test_incremental_driver_end_to_end(synth_root, tmp_path):
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 60
    cfg.continual_learning_reg = True
    cfg.freeze_after_frame = 3
    cfg.mesh_freq_frame = 100  # skip periodic meshing except frame 0
    cfg.mc_with_octree = True
    run_path, grid, params = run_shine_mapping_incremental(cfg=cfg)
    assert os.path.exists(run_path + "/model/model_final.npz")
    # importance accumulated
    assert float(np.asarray(grid.importance_weight[0]).max()) > 0

    from shine_mapping_tpu.mesher import Mesher

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, run_path + "/mesh/final.ply", "", False, False
    )
    assert mesh.vertices.shape[0] > 300


def test_incremental_continual_reg_windows_fast_path(synth_root, tmp_path,
                                                     monkeypatch, capsys):
    """The continual-reg mode on the fused-window fast path (round 5):
    forcing the work-ratio gate open, the driver must take the per-frame
    windows WITH the reg fold (not demote to 'fused'), accumulate
    importance, and land quality comparable to the demoted path."""
    from shine_mapping_tpu.cli import shine_incre

    monkeypatch.setattr(shine_incre, "PRECOMPUTE_WORK_RATIO", 0.0)
    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 60
    cfg.continual_learning_reg = True
    cfg.lambda_forget = 1e3
    cfg.freeze_after_frame = 3
    cfg.mesh_freq_frame = 100
    cfg.batch_windows = True
    cfg.windows_fused = True
    cfg.feature_update = "pallas"
    cfg.moments_bf16 = True
    run_path, grid, params = run_shine_mapping_incremental_with_cfg(cfg)
    out = capsys.readouterr().out
    assert "with reg fold" in out
    assert float(np.asarray(grid.importance_weight[0]).max()) > 0
    import json

    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    assert all(np.isfinite(r["loss/total_loss"]) for r in recs)
    assert any("loss/reg_loss" in r for r in recs[1:])

    from shine_mapping_tpu.mesher import Mesher

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, run_path + "/mesh/final.ply",
        "", False, False)
    assert mesh.vertices.shape[0] > 300


def run_shine_mapping_incremental_with_cfg(cfg):
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    return run_shine_mapping_incremental(cfg=cfg)


def test_incremental_precompute_lookups_matches_live(synth_root, tmp_path, monkeypatch):
    """The incremental driver's per-frame lookup precompute (applied between
    growth steps when iters x bs clears the work-ratio gate) must reproduce
    the live-probe run."""
    from shine_mapping_tpu.cli import shine_incre

    def run(precompute: bool, out: str):
        cfg = small_cfg(synth_root, str(tmp_path / out))
        cfg.iters = 40
        cfg.window_replay_on = True
        cfg.window_radius = 15.0
        cfg.mesh_freq_frame = 100
        cfg.precompute_lookups = precompute
        return shine_incre.run_shine_mapping_incremental(cfg=cfg)

    monkeypatch.setattr(shine_incre, "PRECOMPUTE_WORK_RATIO", 0.0)
    _, _, params_pre = run(True, "pre")
    _, _, params_live = run(False, "live")
    for a, b in zip(params_pre["features"], params_live["features"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_window_replay_ray_mode_pool_stays_aligned(synth_root, tmp_path):
    """Ray-mode window replay must keep coord/sample_depth/ray_depth in
    lockstep (the reference's own 'FIX ME' desync,
    dataset/lidar_dataset.py:247-250, is fixed here, not reproduced)."""
    from shine_mapping_tpu.data.dataset import LiDARDataset
    from shine_mapping_tpu.ops.hashgrid import HashGridHost

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.ray_loss = True
    cfg.main_loss_type = "dr"
    cfg.window_replay_on = True
    cfg.window_radius = 8.0  # small enough that frames drop old rays
    cfg.derive()
    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=cfg.seed,
        init_node_capacity=cfg.init_node_capacity,
        init_corner_capacity=cfg.init_corner_capacity,
    )
    ds = LiDARDataset(cfg, grid)
    rsc = ds.ray_sample_count
    assert rsc == cfg.surface_sample_n + cfg.clearance_sample_n + cfg.free_sample_n
    sizes = []
    for frame_id in range(3):
        ds.process_frame(frame_id)
        p = ds.pool
        assert p.coord.shape[0] % rsc == 0
        assert p.coord.shape[0] == p.sample_depth.shape[0]
        assert p.coord.shape[0] == p.ray_depth.shape[0] * rsc
        assert p.coord.shape[0] == p.weight.shape[0]
        sizes.append(p.coord.shape[0])
        # per-ray consistency: every sample of a ray shares its origin
        org = p.origin.reshape(-1, rsc, 3)
        assert np.allclose(org, org[:, :1, :])
    # the window filter actually dropped something by frame 3
    assert sizes[-1] < sizes[0] * 3


def test_incremental_window_replay_end_to_end(synth_root, tmp_path):
    """Replay-mode incremental mapping (window filter, no continual reg)."""
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 60
    cfg.continual_learning_reg = False
    cfg.window_replay_on = True
    cfg.window_radius = 15.0
    cfg.freeze_after_frame = 2
    cfg.mesh_freq_frame = 100
    run_path, grid, params = run_shine_mapping_incremental(cfg=cfg)
    assert os.path.exists(run_path + "/model/model_final.npz")

    # metrics stream recorded one line per frame with the loss + timings
    import json

    with open(run_path + "/metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 5
    assert all("loss/total_loss" in r and "timing(s)/mapping" in r for r in recs)

    from shine_mapping_tpu.mesher import Mesher

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, run_path + "/mesh/final.ply", "", False, False
    )
    assert mesh.vertices.shape[0] > 300


def test_batch_driver_deterministic(synth_root, tmp_path):
    """Same seed + sequential data phase => bit-identical learned maps
    (reference determinism hooks: utils/tools.py:50-52, seed 42)."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    feats = []
    for run in range(2):
        cfg = small_cfg(synth_root, str(tmp_path / f"r{run}"))
        cfg.iters = 100
        _, grid, params = run_shine_mapping_batch(cfg=cfg)
        feats.append([np.asarray(f) for f in params["features"]])
    for a, b in zip(feats[0], feats[1]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("update_mode,bf16m,windows,pbf16",
                         [("fused", False, False, False),
                          ("pallas", True, False, False),
                          ("pallas", True, True, False),
                          ("pallas", True, True, True)])
def test_resume_from_full_checkpoint(synth_root, tmp_path, update_mode,
                                     bf16m, windows, pbf16):
    """True resume: a run interrupted at iter 100 and resumed to 200 must
    reproduce the uninterrupted 200-iter run — optimizer moments, iteration
    counter, and (fold_in-keyed) batch draws all continue.  (The reference
    restarts Adam and the LR schedule on load, shine_batch.py:45-55.)
    The bf16 variant additionally exercises the uint16-bit-pattern moment
    serialization through the real driver; the params_bf16 variant covers
    bf16 TABLES across the resume (the checkpoint's f32 features are the
    exact upcast, so the restore-time cast back is bit-identical and the
    SR seed continues from the absolute iteration)."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    # uninterrupted reference run: 200 iters, checkpoint written at 100
    cfg = small_cfg(synth_root, str(tmp_path / "full"))
    cfg.iters = 200
    cfg.save_freq_iters = 100
    cfg.feature_update = update_mode
    cfg.moments_bf16 = bf16m
    cfg.batch_windows = windows  # windows: resume continues the epoch seq
    cfg.params_bf16 = pbf16
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    n_corners_0 = grid.host_levels[0].n_corners
    if pbf16:
        assert params["features"][0].dtype == jnp.bfloat16

    # resumed run: restart from the iter-100 checkpoint, continue to 200
    cfg2 = small_cfg(synth_root, str(tmp_path / "resumed"))
    cfg2.iters = 200
    cfg2.load_model = True
    cfg2.model_path = run_path + "/model/model_iter_100.npz"
    cfg2.feature_update = update_mode
    cfg2.moments_bf16 = bf16m
    cfg2.batch_windows = windows
    cfg2.params_bf16 = pbf16
    run_path2, grid2, params2 = run_shine_mapping_batch(cfg=cfg2)
    if pbf16:
        # the resumed run must KEEP the bf16 map (no silent f32 downgrade)
        assert params2["features"][0].dtype == jnp.bfloat16

    # restored structure grew from (identical) frames -> same corner count
    assert grid2.host_levels[0].n_corners == n_corners_0
    # continuity: decoders kept TRAINING after resume (not frozen) and the
    # resumed trajectory matches the uninterrupted one
    np.testing.assert_allclose(
        np.asarray(params2["geo"]["w0"]), np.asarray(params["geo"]["w0"]),
        rtol=1e-4, atol=1e-5,
    )
    for a, b in zip(params["features"], params2["features"]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5
        )

    # loss continuity in the metrics stream: resumed run's first record is
    # at iter 200 only (100..200), and not worse than the run-1 checkpoint
    import json

    with open(run_path + "/metrics.jsonl") as f:
        recs1 = [json.loads(l) for l in f]
    with open(run_path2 + "/metrics.jsonl") as f:
        recs2 = [json.loads(l) for l in f]
    assert recs2[0]["iter"] == 200
    loss_at_100 = next(r for r in recs1 if r["iter"] == 100)["loss/total_loss"]
    assert recs2[0]["loss/total_loss"] < loss_at_100 * 1.05


def test_pipelined_data_phase_matches_sequential(synth_root, tmp_path):
    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import LiDARDataset
    from shine_mapping_tpu.cli.common import build_grid

    cfg = small_cfg(synth_root, str(tmp_path))
    g1 = build_grid(cfg)
    d1 = LiDARDataset(cfg, g1)
    for f in d1.frame_ids():
        d1.process_frame(f)

    g2 = build_grid(cfg)
    d2 = LiDARDataset(cfg, g2)
    d2.process_frames_pipelined(d2.frame_ids(), workers=4)

    # near-identical structure (deterministic preprocessing; sampler RNG
    # streams differ by design, shifting band samples at voxel boundaries)
    for h1, h2 in zip(g1.host_levels, g2.host_levels):
        assert abs(h1.n_nodes - h2.n_nodes) < 0.03 * h1.n_nodes + 8
    assert abs(len(d1.pool) - len(d2.pool)) < 0.01 * len(d1.pool) + 1
    # pools cover the same region
    np.testing.assert_allclose(
        d1.pool.coord.mean(axis=0), d2.pool.coord.mean(axis=0), atol=5e-4
    )


def test_checkpoint_roundtrip_after_training(synth_root, tmp_path):
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch
    from shine_mapping_tpu.utils import checkpoint as ckpt
    from shine_mapping_tpu.train.optimizer import init_opt_state
    from shine_mapping_tpu.mesher import _infer_chunk  # reuse jitted query
    import jax.numpy as jnp

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 100
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)

    grid2, params2, opt2, iters = ckpt.load_checkpoint(
        run_path + "/model/model_final.npz", params, init_opt_state(params)
    )
    assert iters == 100
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-0.3, 0.3, (256, 3)).astype(np.float32))
    from shine_mapping_tpu.ops.query import query_feature

    f1 = np.asarray(query_feature(q, grid.tables, list(params["features"]), grid.levels, True))
    f2 = np.asarray(query_feature(q, grid2.tables, list(params2["features"]), grid2.levels, True))
    np.testing.assert_allclose(f1, f2, atol=1e-6)


def test_batch_driver_params_bf16_end_to_end(synth_root, tmp_path, capsys):
    """tpu.params_bf16 (bfloat16 feature tables + stochastic-rounding
    update — half map memory) through the full batch driver: same quality
    gates as the f32 table."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.moments_bf16 = True
    cfg.params_bf16 = True
    cfg.vis_freq_iters = cfg.iters  # final mesh
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    out = capsys.readouterr().out
    assert "bf16 map mode" in out
    import jax.numpy as jnp
    assert params["features"][0].dtype == jnp.bfloat16
    # host mirror upcast for meshing/checkpointing
    assert grid.features[0].dtype == jnp.float32

    mesh_path = run_path + f"/mesh/mesh_iter_{cfg.iters}.ply"
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


def test_batch_driver_icra_losses_windows_end_to_end(synth_root, tmp_path):
    """The ICRA'23 repro loss configuration (eikonal on) through the full
    production stack (windows_fused + moments_bf16 + params_bf16): the
    coordinate-gradient pass must ride the fused-window path e2e."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.moments_bf16 = True
    cfg.params_bf16 = True
    cfg.ekional_loss_on = True
    cfg.weight_e = 0.1
    cfg.vis_freq_iters = cfg.iters
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)

    import json
    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    assert "loss/eikonal_loss" in recs[-1]
    mesh_path = run_path + f"/mesh/mesh_iter_{cfg.iters}.ply"
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


def test_batch_driver_windows_hbm_guard(synth_root, tmp_path, capsys):
    """A window precompute that would blow the HBM budget must degrade to
    iid batches (with a message) instead of OOMing mid-run."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 100
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.windows_hbm_budget_gb = 1e-6  # force the guard
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    out = capsys.readouterr().out
    assert "per-level window layout" in out
    assert "falling back to iid batches" in out
    import json
    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    assert np.isfinite(recs[-1]["loss/total_loss"])


def test_batch_driver_winx_data_parallel_end_to_end(synth_root, tmp_path,
                                                    capsys):
    """The flagship fused-window layout (winx + bf16 tables) under an
    8-device data-parallel mesh through the REAL batch driver: the driver
    must keep the winx path (not fall back to per-level windows) and land
    the same quality gates as single-chip."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.mesh_shape = 8
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.moments_bf16 = True
    cfg.params_bf16 = True  # only enabled when the winx layout is active
    cfg.vis_freq_iters = cfg.iters
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    out = capsys.readouterr().out
    assert "data-parallel over 8 devices" in out
    assert "bf16 map mode" in out  # proves use_winx held under DP
    assert params["features"][0].dtype == jnp.bfloat16

    mesh_path = run_path + f"/mesh/mesh_iter_{cfg.iters}.ply"
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


def test_batch_driver_routed_row_sharded_windows_end_to_end(
        synth_root, tmp_path, capsys):
    """The round-5 routed row-sharded windows through the REAL batch
    driver: tables row-sharded over the 8-device mesh, the window
    precompute routes entries to their row shards, and the two all-to-all
    islands run each chip's R/8 update — quality matches the replicated
    path's gates."""
    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.mesh_shape = 8
    cfg.table_sharding = "rows"
    cfg.feature_update = "pallas"
    cfg.batch_windows = True
    cfg.vis_freq_iters = cfg.iters
    run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
    out = capsys.readouterr().out
    assert "data-parallel over 8 devices" in out
    assert "routed row-sharded windows over 8 chips" in out

    mesh_path = run_path + f"/mesh/mesh_iter_{cfg.iters}.ply"
    gt = synth.gt_surface_points(100_000)
    gt_path = str(tmp_path / "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(
        mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
        truncation_acc=0.4, truncation_com=2.0, mesh_sample_point=300_000,
    )
    print({k: round(v, 4) for k, v in m.items()})
    assert m["Chamfer_L1 (m)"] < 0.15, m
    assert m["F-score (%)"] > 75.0, m


def test_incremental_driver_fused_windows_end_to_end(synth_root, tmp_path,
                                                     capsys):
    """Per-frame fused epoch windows (tpu.batch_windows in the INCREMENTAL
    driver, VERDICT r3 item 5): the work-ratio predicate engages once
    iters*bs clears the pool capacity, W buckets to a power of two, and
    replay-mode quality holds."""
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    cfg = small_cfg(synth_root, str(tmp_path))
    # clear the PRECOMPUTE_WORK_RATIO predicate: iters*bs >= 4*131072
    cfg.iters = 300
    cfg.bs = 2048
    cfg.continual_learning_reg = False
    cfg.window_replay_on = True
    cfg.window_radius = 15.0
    cfg.freeze_after_frame = 2
    cfg.mesh_freq_frame = 100
    cfg.feature_update = "pallas"
    cfg.moments_bf16 = True
    cfg.batch_windows = True
    run_path, grid, params = run_shine_mapping_incremental(cfg=cfg)
    out = capsys.readouterr().out
    assert "per-frame fused epoch windows on" in out
    import json
    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    assert all(np.isfinite(r["loss/total_loss"]) for r in recs)
    # replay-mode quality sanity: the learned field reconstructs
    from shine_mapping_tpu.mesher import Mesher

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh = mesher.recon_octree_mesh(
        cfg.mc_query_level, cfg.mc_res_m, run_path + "/mesh/final.ply", "",
        False, False,
    )
    assert mesh.vertices.shape[0] > 300


def test_incremental_driver_eikonal_end_to_end(synth_root, tmp_path):
    """Incremental mapping with the eikonal term: per-frame pools contain
    all-levels-missed free-space samples whose point gradients are exactly
    zero — the safe-norm backward must keep every frame finite."""
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 40
    cfg.continual_learning_reg = False
    cfg.window_replay_on = True
    cfg.window_radius = 15.0
    cfg.ekional_loss_on = True
    cfg.weight_e = 0.1
    cfg.mesh_freq_frame = 100
    run_path, grid, params = run_shine_mapping_incremental(cfg=cfg)
    import json

    recs = [json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    assert all(np.isfinite(r["loss/total_loss"]) for r in recs)
    assert all(np.isfinite(r["loss/eikonal_loss"]) for r in recs)


def test_incremental_driver_offscreen_vis(synth_root, tmp_path):
    """o3d_vis_on without Open3D in the image: the visualizer renders
    offscreen PNG frames (scan + pose axes + latest mesh) into the run
    dir — the headless draw path, exercised through the real driver."""
    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    cfg = small_cfg(synth_root, str(tmp_path))
    cfg.iters = 30
    cfg.end_frame = 2
    cfg.o3d_vis_on = True
    cfg.mesh_freq_frame = 1
    cfg.mc_with_octree = True
    run_path, grid, params = run_shine_mapping_incremental(cfg=cfg)
    import glob

    frames = sorted(glob.glob(os.path.join(run_path, "vis", "vis_*.png")))
    assert len(frames) >= 2, frames
    from PIL import Image

    img = np.asarray(Image.open(frames[-1]))
    assert img.ndim == 3 and img.shape[2] == 3
    # something was drawn (not a blank background)
    assert (img == 255).all(axis=2).mean() < 0.98
