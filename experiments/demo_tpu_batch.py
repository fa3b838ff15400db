"""Flagship TPU demonstration: full batch-mapping run at ICRA'23 scale.

Generates a dense synthetic LiDAR sequence (20 frames x ~57k points), then
drives the REAL batch CLI (shine_mapping_tpu.cli.shine_batch) on the TPU
with the ICRA maicity_batch hyperparameters (leaf 0.2 m, world level 12,
bs 8192, 20k iters) and the production fast path (feature_update: pallas,
moments_bf16, precompute_lookups), meshes at 0.1 m, and scores the mesh
against the analytic ground truth.

Prints a one-screen summary; writes experiments/demo_tpu_batch.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CFG_TMPL = """\
setting:
  name: demo_tpu
  output_root: {out}
  pc_path: {root}/velodyne
  pose_path: {root}/poses.txt
  calib_path: {root}/calib.txt
  load_model: false
  model_path: ''
  first_frame_ref: false
  begin_frame: 0
  end_frame: 100
  every_frame: 1
  device: tpu
  gpu_id: '0'
process:
  min_range_m: 0.5
  pc_radius_m: 30.0
  min_z_m: -3.0
  rand_downsample: false
  vox_down_m: 0.05
  rand_down_r: 0.2
sampler:
  surface_sample_range_m: 0.15
  surface_sample_n: 3
  free_sample_begin_ratio: 0.3
  free_sample_end_dist_m: 0.8
  free_sample_n: 3
octree:
  leaf_vox_size: 0.2
  tree_level_world: 12
  tree_level_feat: 3
  feature_dim: 8
  poly_int_on: true
  octree_from_surface_samples: true
decoder:
  mlp_level: 2
  mlp_hidden_dim: 32
  freeze_after_frame: 0
loss:
  ray_loss: false
  main_loss_type: sdf_bce
  sigma_sigmoid_m: 0.05
  loss_weight_on: false
  behind_dropoff_on: false
  ekional_loss_on: false
  weight_e: 0.1
continual:
  continual_learning_reg: false
  lambda_forget: 0
  window_replay_on: false
  window_radius_m: 0
optimizer:
  iters: 20000
  batch_size: 8192
  learning_rate: 0.01
  weight_decay: 1.0e-07
eval:
  wandb_vis_on: false
  o3d_vis_on: false
  vis_freq_iters: 20000
  save_freq_iters: 0
  mesh_freq_frame: 100
  mc_res_m: 0.1
  mc_with_octree: false
  mc_local: false
  mc_vis_level: 1
  save_map: false
tpu:
  feature_update: pallas
  moments_bf16: true
  precompute_lookups: true
  batch_windows: {windows}
  params_bf16: {params_bf16}
"""


def make_dense_dataset(root: str, n_frames: int = 20, seed: int = 0) -> None:
    from tests import synth

    rng = np.random.default_rng(seed)
    pc_dir = os.path.join(root, "velodyne")
    os.makedirs(pc_dir, exist_ok=True)
    poses = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [i * 0.5, 0.0, 1.5]
        poses.append(T)
        pts = synth.simulate_scan(T, n_az=900, n_el=64, rng=rng)
        pts = pts.astype(np.float32)
        scan = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), np.float32)], axis=1)
        scan.tofile(os.path.join(pc_dir, f"{i:06d}.bin"))
    with open(os.path.join(root, "calib.txt"), "w") as f:
        eye = " ".join(str(v) for v in np.eye(4)[:3].reshape(-1))
        f.write(f"Tr: {eye}\n")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        for T in poses:
            f.write(" ".join(str(v) for v in T[:3].reshape(-1)) + "\n")


def main() -> None:
    out = tempfile.mkdtemp(prefix="demo_tpu_")
    root = os.path.join(out, "kitti")
    t0 = time.perf_counter()
    make_dense_dataset(root)
    print(f"[demo] dataset written in {time.perf_counter() - t0:.1f}s",
          flush=True)

    cfg_path = os.path.join(out, "cfg.yaml")
    # the production fast path is the DEFAULT (epoch windows + split-K +
    # bf16 tables — what the headline bench measures); set
    # SHINE_DEMO_WINDOWS=0 / SHINE_DEMO_PARAMS_BF16=0 for the iid / f32
    # ablation runs
    windows = os.environ.get("SHINE_DEMO_WINDOWS", "1") == "1"
    params_bf16 = os.environ.get("SHINE_DEMO_PARAMS_BF16", "1") == "1"
    with open(cfg_path, "w") as f:
        f.write(CFG_TMPL.format(out=out, root=root,
                                windows="true" if windows else "false",
                                params_bf16="true" if params_bf16 else "false"))

    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    t0 = time.perf_counter()
    run_shine_mapping_batch(cfg_path)
    total_s = time.perf_counter() - t0
    print(f"[demo] full batch run: {total_s:.1f}s", flush=True)

    # locate artifacts
    run_dir = None
    for d in sorted(os.listdir(out)):
        if d.startswith("demo_tpu"):
            run_dir = os.path.join(out, d)
    meshes = []
    mesh_dir = os.path.join(run_dir, "mesh")
    if os.path.isdir(mesh_dir):
        meshes = sorted(os.listdir(mesh_dir))
    assert meshes, f"no mesh produced in {run_dir}"
    mesh_path = os.path.join(mesh_dir, meshes[-1])

    from tests import synth
    from shine_mapping_tpu.data import io
    from shine_mapping_tpu.eval.metrics import eval_mesh

    gt = synth.gt_surface_points(300_000, x_range=(-5, 15), r=14.0)
    gt_path = os.path.join(out, "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    m = eval_mesh(mesh_path, gt_path, down_sample_res=0.02, threshold=0.1,
                  truncation_acc=0.2, truncation_com=2.0,
                  mesh_sample_point=1_000_000)

    result = {
        "total_wall_s": round(total_s, 1),
        "mesh": mesh_path,
        "chamfer_l1_m": m["Chamfer_L1 (m)"],
        "mae_accuracy_m": m.get("MAE_accuracy (m)"),
        "precision_pct": m.get("Precision [Accuracy] (%)"),
        "recall_pct": m.get("Recall [Completeness] (%)"),
        "f_score_pct": m["F-score (%)"],
    }
    with open(os.path.join(_REPO, "experiments", "demo_tpu_batch.json"),
              "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
