"""END-TO-END quality comparison: this framework vs the reference.

Runs BOTH implementations' full mapping pipelines on the SAME synthetic
LiDAR world (tests/synth.py) with the SAME training pool, then meshes both
trained SDF fields with the same marching-tetrahedra + evaluation stack
and scores Chamfer-L1 / F-score against the analytic ground truth.

The reference side executes the reference's OWN code (/root/reference:
FeatureOctree, Decoder, sdf_bce_loss, setup_optimizer, step_lr_decay) on
torch CPU via the kaolin shim in experiments/ref_harness.py; only the
outer frame/batch driver loop is provided here (its shine_batch.py is a
CLI script wired to Open3D dataset I/O that does not exist in this image).
Identical hyperparameters, identical sample pool, identical meshing grid
and mask, identical eval protocol — the one remaining degree of freedom is
each side's own random init + batch order, which is the SGD noise floor.

Writes experiments/ref_e2e.json and prints a summary.

No network egress exists for MaiCity/NCD in this image (BASELINE.md), so
the synthetic world stands in for the real-data quality row; the workload
shape (LiDAR scans -> SDF pool -> batch mapping -> meshing -> eval) is the
reference's own (shine_batch.py:66-258).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import types

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "experiments"))

import ref_harness  # noqa: E402  (experiments/)


def _stub_module(name: str) -> None:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def make_config(root: str, out: str):
    """The shared experiment configuration (our SHINEConfig)."""
    from shine_mapping_tpu.config import SHINEConfig

    cfg = SHINEConfig()
    cfg.name = "ref_e2e"
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
    cfg.iters = 800
    cfg.lr = 0.02
    cfg.scan_chunk = 200
    cfg.save_freq_iters = 0
    cfg.vis_freq_iters = 0
    cfg.mesh_freq_frame = 100
    cfg.mc_res_m = 0.15
    cfg.mc_vis_level = 1
    cfg.mc_mask_on = True
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


def build_world_and_pool(cfg):
    """Our data pipeline: synthetic frames -> preprocessed sample pool."""
    from shine_mapping_tpu.data.dataset import LiDARDataset
    from shine_mapping_tpu.ops.hashgrid import HashGridHost

    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=42,
        init_node_capacity=cfg.init_node_capacity,
        init_corner_capacity=cfg.init_corner_capacity,
    )
    dataset = LiDARDataset(cfg, grid)
    for fid in dataset.frame_ids():
        dataset.process_frame(fid)
    return grid, dataset


def run_ours(cfg, grid, dataset, windows: bool = False, tag: str = "ours",
             winxp: bool = False, split_k: bool = False):
    """Train + mesh with this framework; returns (mesh_path, seconds).

    ``windows=True`` exercises the tpu.batch_windows sampling mode (epoch
    windows + precomputed kernel prep) so its documented sampling delta
    gets a quality row against the reference too; ``winxp=True`` runs the
    full round-3 production stack on top (fused-window layout + bf16
    moments + bf16 tables with stochastic rounding); ``split_k=True``
    adds the round-4 split-K window layout (the full round-4 stack)."""
    import jax
    import jax.numpy as jnp

    from shine_mapping_tpu.mesher import Mesher
    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state

    settings = trainer.TrainSettings.from_config(
        cfg, grid.levels, feature_update="pallas" if windows else "fused"
    )
    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    if winxp:
        params = dict(params, features=tuple(
            f.astype(jnp.bfloat16) for f in params["features"]))
    opt_state = init_opt_state(params, moments_bf16=winxp)
    shadow = trainer.empty_shadow(params["features"])
    dev_pool, n_valid = trainer.pool_to_device(
        dataset.pool, cfg.init_pool_capacity, settings
    )
    tables = tuple(grid.tables)
    pre_lookups = batch_windows = None
    if windows:
        caps = tuple(f.shape[0] for f in params["features"])
        pre_lookups = trainer.precompute_pool_lookups(
            tables, dev_pool["coord"], tuple(grid.levels), caps
        )
        feat_shapes = tuple(tuple(f.shape) for f in params["features"])
        if winxp:
            batch_windows = trainer.precompute_batch_windows_fused(
                pre_lookups, dev_pool, int(n_valid),
                jax.random.PRNGKey(5157), settings, feat_shapes,
                split_k=split_k,
            )
            pre_lookups = None
        else:
            batch_windows = trainer.precompute_batch_windows(
                pre_lookups, int(n_valid), jax.random.PRNGKey(5157),
                settings, feat_shapes,
            )
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    done = 0
    while done < cfg.iters:
        n = min(cfg.scan_chunk, cfg.iters - done)
        key, k = jax.random.split(key)
        params, opt_state, aux = trainer.train_chunk(
            params, opt_state, tables, dev_pool, shadow, n_valid,
            jnp.int32(done), k, settings, n,
            pre_lookups=pre_lookups, batch_windows=batch_windows,
        )
        done += n
    loss = float(aux["mean"]["total_loss"])
    t_train = time.perf_counter() - t0
    print(f"[{tag}] trained {cfg.iters} iters in {t_train:.1f}s "
          f"(loss {loss:.4f})", flush=True)

    from shine_mapping_tpu.cli.common import sync_features_to_grid

    sync_features_to_grid(grid, params)
    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesh_path = os.path.join(cfg.output_root, f"{tag}.ply")
    t0 = time.perf_counter()
    mesher.recon_bbx_mesh(dataset.map_bbx, cfg.mc_res_m, mesh_path, "",
                          estimate_sem=False)
    t_mesh = time.perf_counter() - t0
    return mesh_path, t_train, t_mesh, mesher


def run_reference(cfg, dataset, mesher):
    """Train the REFERENCE implementation on the identical pool, then mesh
    its field on the identical query grid with the identical mc + mask."""
    import torch

    # utils.tools imports wandb + open3d at module level; neither exists in
    # this image and neither is touched by the functions used here
    _stub_module("wandb")
    _stub_module("open3d")
    fo_mod, dec_mod, loss_mod = ref_harness.load_reference()
    import importlib

    tools = importlib.import_module("utils.tools")
    ref_cfg_mod = importlib.import_module("utils.config")

    rc = ref_cfg_mod.SHINEConfig()
    rc.device = "cpu"
    rc.tree_level_world = cfg.tree_level_world
    rc.tree_level_feat = cfg.tree_level_feat
    rc.leaf_vox_size = cfg.leaf_vox_size
    rc.feature_dim = cfg.feature_dim
    rc.feature_std = cfg.feature_std
    rc.poly_int_on = cfg.poly_int_on
    rc.geo_mlp_level = cfg.geo_mlp_level
    rc.geo_mlp_hidden_dim = cfg.geo_mlp_hidden_dim
    rc.geo_mlp_bias_on = cfg.geo_mlp_bias_on
    rc.scale = cfg.scale
    rc.world_size = cfg.world_size
    rc.semantic_on = False
    rc.ray_loss = False
    rc.lr = cfg.lr
    rc.lr_level_reduce_ratio = cfg.lr_level_reduce_ratio
    rc.lr_iters_reduce_ratio = cfg.lr_iters_reduce_ratio
    rc.lr_decay_step = list(cfg.lr_decay_step)
    rc.weight_decay = cfg.weight_decay
    rc.adam_eps = cfg.adam_eps
    rc.bs = cfg.bs
    rc.iters = cfg.iters
    rc.loss_weight_on = cfg.loss_weight_on
    rc.loss_reduction = cfg.loss_reduction
    rc.main_loss_type = cfg.main_loss_type
    rc.logistic_gaussian_ratio = cfg.logistic_gaussian_ratio
    rc.sigma_sigmoid_m = cfg.sigma_sigmoid_m

    torch.manual_seed(0)
    octree = fo_mod.FeatureOctree(rc)
    geo_mlp = dec_mod.Decoder(rc, is_geo_encoder=True,
                              is_time_conditioned=False)

    pool = dataset.pool
    surf = pool.coord[pool.weight > 0].astype(np.float32)
    octree.update(torch.from_numpy(surf), incremental_on=False)

    octree_feat = list(octree.parameters())
    geo_param = list(geo_mlp.parameters())
    sigma_size = torch.nn.Parameter(torch.ones(1) * 1.0)
    sigma_sigmoid = (rc.logistic_gaussian_ratio * rc.sigma_sigmoid_m
                     * rc.scale)
    opt = tools.setup_optimizer(rc, octree_feat, geo_param, None, sigma_size)

    coord_all = torch.from_numpy(pool.coord.astype(np.float32))
    sdf_all = torch.from_numpy(pool.sdf_label.astype(np.float32))
    w_all = torch.from_numpy(pool.weight.astype(np.float32))
    n_pool = coord_all.shape[0]

    g = torch.Generator().manual_seed(1)
    cur_base_lr = rc.lr
    decay_steps = list(rc.lr_decay_step)
    t0 = time.perf_counter()
    for it in range(rc.iters):
        cur_base_lr = tools.step_lr_decay(
            opt, cur_base_lr, it, decay_steps, rc.lr_iters_reduce_ratio
        )
        idx = torch.randint(0, n_pool, (rc.bs,), generator=g)
        coord = coord_all[idx]
        sdf_label = sdf_all[idx]
        weight = torch.abs(w_all[idx])
        feature = octree.query_feature(coord)
        pred = geo_mlp.sdf(feature)
        loss = loss_mod.sdf_bce_loss(
            pred, sdf_label, sigma_sigmoid, weight,
            rc.loss_weight_on, rc.loss_reduction,
        )
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        if (it + 1) % 200 == 0:
            print(f"[ref ] iter {it + 1}/{rc.iters} loss "
                  f"{float(loss):.4f}", flush=True)
    t_train = time.perf_counter() - t0
    print(f"[ref ] trained {rc.iters} iters in {t_train:.1f}s", flush=True)

    # mesh the reference field on the IDENTICAL grid with the IDENTICAL
    # observed-region mask (the two octrees are built from the same surface
    # samples; corner counts agree — tests/test_reference_parity.py)
    coord_q, voxel_num_xyz, voxel_origin = mesher.get_query_from_bbx(
        dataset.map_bbx, cfg.mc_res_m
    )
    _, _, mc_mask = mesher.query_points(
        coord_q, cfg.infer_bs, query_sdf=False, query_sem=False,
        query_mask=True,
    )
    t0 = time.perf_counter()
    sdf_ref = np.zeros(coord_q.shape[0], np.float64)
    with torch.no_grad():
        for head in range(0, coord_q.shape[0], 65536):
            chunk = torch.from_numpy(
                coord_q[head:head + 65536].astype(np.float32)
            )
            f = octree.query_feature(chunk)
            sdf_ref[head:head + 65536] = geo_mlp.sdf(f).numpy()
    mc_sdf, _, mc_mask3 = mesher.assign_to_bbx(
        sdf_ref, None, mc_mask, voxel_num_xyz
    )
    verts, faces = mesher.mc_mesh(mc_sdf, mc_mask3, cfg.mc_res_m,
                                  voxel_origin)
    mesh_path = os.path.join(cfg.output_root, "reference.ply")
    mesher._finalize_mesh(verts, faces, mesh_path, estimate_sem=False,
                          estimate_normal=True, filter_isolated_mesh=True,
                          filter_free_space_vertices=False)
    t_mesh = time.perf_counter() - t0
    return mesh_path, t_train, t_mesh


def main() -> None:
    # in-process CPU backend for the jax side (CLAUDE.md: env var is
    # ignored by the axon plugin) unless the caller wants the TPU
    if os.environ.get("SHINE_REF_E2E_TPU", "0") != "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from shine_mapping_tpu.data import io
    from shine_mapping_tpu.eval.metrics import eval_mesh
    from tests import synth

    out = tempfile.mkdtemp(prefix="ref_e2e_")
    root = os.path.join(out, "kitti")
    synth.make_kitti_dataset(root, n_frames=5)
    cfg = make_config(root, out)

    grid, dataset = build_world_and_pool(cfg)
    print(f"[setup] pool {len(dataset.pool)} samples, "
          f"corners/level {[int(hl.n_corners) for hl in grid.host_levels]}",
          flush=True)

    init_feats = [np.asarray(f).copy() for f in grid.features]
    ours_mesh, ours_train_s, ours_mesh_s, mesher = run_ours(
        cfg, grid, dataset
    )
    # second "ours" pass: the tpu.batch_windows sampling mode, from the
    # same initial features (sync_features_to_grid mutated them)
    import jax.numpy as jnp

    grid.features = [jnp.asarray(f) for f in init_feats]
    win_mesh, win_train_s, win_mesh_s, _ = run_ours(
        cfg, grid, dataset, windows=True, tag="ours_windows"
    )
    # third "ours" pass: the FULL round-3 production stack (fused windows
    # + bf16 moments + bf16 tables), same initial features
    grid.features = [jnp.asarray(f) for f in init_feats]
    wxp_mesh, wxp_train_s, wxp_mesh_s, _ = run_ours(
        cfg, grid, dataset, windows=True, tag="ours_winxp", winxp=True
    )
    # fourth "ours" pass: the FULL round-4 stack (+ split-K windows)
    grid.features = [jnp.asarray(f) for f in init_feats]
    wxs_mesh, wxs_train_s, wxs_mesh_s, _ = run_ours(
        cfg, grid, dataset, windows=True, tag="ours_winxsp", winxp=True,
        split_k=True,
    )
    ref_mesh, ref_train_s, ref_mesh_s = run_reference(cfg, dataset, mesher)

    gt = synth.gt_surface_points(100_000)
    gt_path = os.path.join(out, "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))

    eval_kw = dict(down_sample_res=0.05, threshold=0.2, truncation_acc=0.4,
                   truncation_com=2.0, mesh_sample_point=300_000)
    m_ours = eval_mesh(ours_mesh, gt_path, **eval_kw)
    m_win = eval_mesh(win_mesh, gt_path, **eval_kw)
    m_wxp = eval_mesh(wxp_mesh, gt_path, **eval_kw)
    m_wxs = eval_mesh(wxs_mesh, gt_path, **eval_kw)
    m_ref = eval_mesh(ref_mesh, gt_path, **eval_kw)

    result = {
        "world": {"frames": 5, "pool": int(len(dataset.pool)),
                  "corners_per_level": [int(hl.n_corners) for hl in grid.host_levels]},
        "config": {"bs": cfg.bs, "iters": cfg.iters, "lr": cfg.lr,
                   "leaf_vox_size": cfg.leaf_vox_size,
                   "mc_res_m": cfg.mc_res_m},
        "ours": {
            "chamfer_l1_m": m_ours["Chamfer_L1 (m)"],
            "f_score_pct": m_ours["F-score (%)"],
            "mae_acc_m": m_ours.get("MAE_accuracy (m)"),
            "train_s": round(ours_train_s, 2),
            "mesh_s": round(ours_mesh_s, 2),
            "points_per_s": round(cfg.iters * cfg.bs / ours_train_s, 1),
        },
        "ours_windows": {
            "chamfer_l1_m": m_win["Chamfer_L1 (m)"],
            "f_score_pct": m_win["F-score (%)"],
            "mae_acc_m": m_win.get("MAE_accuracy (m)"),
            "train_s": round(win_train_s, 2),
            "mesh_s": round(win_mesh_s, 2),
            "points_per_s": round(cfg.iters * cfg.bs / win_train_s, 1),
            # this row exists for the QUALITY comparison of the epoch-window
            # sampling delta; on CPU the pallas update runs its (slower) XLA
            # fallback, so its timing says nothing about the TPU kernel
            "note": "CPU timing = pallas XLA fallback; quality row only",
        },
        "ours_winxp": {
            "chamfer_l1_m": m_wxp["Chamfer_L1 (m)"],
            "f_score_pct": m_wxp["F-score (%)"],
            "mae_acc_m": m_wxp.get("MAE_accuracy (m)"),
            "train_s": round(wxp_train_s, 2),
            "mesh_s": round(wxp_mesh_s, 2),
            "points_per_s": round(cfg.iters * cfg.bs / wxp_train_s, 1),
            # full round-3 production stack (fused windows + bf16 moments +
            # bf16 tables/stochastic rounding); quality row only on CPU
            "note": "CPU timing = XLA fallbacks; quality row only",
        },
        "ours_winxsp": {
            "chamfer_l1_m": m_wxs["Chamfer_L1 (m)"],
            "f_score_pct": m_wxs["F-score (%)"],
            "mae_acc_m": m_wxs.get("MAE_accuracy (m)"),
            "train_s": round(wxs_train_s, 2),
            "mesh_s": round(wxs_mesh_s, 2),
            "points_per_s": round(cfg.iters * cfg.bs / wxs_train_s, 1),
            # full round-4 stack (split-K fused windows + bf16 tables);
            # quality row only on CPU
            "note": "CPU timing = XLA fallbacks; quality row only",
        },
        "reference": {
            "chamfer_l1_m": m_ref["Chamfer_L1 (m)"],
            "f_score_pct": m_ref["F-score (%)"],
            "mae_acc_m": m_ref.get("MAE_accuracy (m)"),
            "train_s": round(ref_train_s, 2),
            "mesh_s": round(ref_mesh_s, 2),
            "points_per_s": round(cfg.iters * cfg.bs / ref_train_s, 1),
        },
    }
    out_json = os.path.join(_REPO, "experiments", "ref_e2e.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
