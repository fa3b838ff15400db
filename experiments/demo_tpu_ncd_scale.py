"""TPU demonstration: Newer-College-style quad mapping (round 5).

The reference's second headline dataset (NCD quad) is an indoor/outdoor
handheld scan with strong vertical structure and a loop — a regime the
MaiCity-style street proxies never test.  This demo drives the REAL batch
CLI on the synthetic college quad (tests/synth_ncd.py: walled court, inner
chapel, covered archway the trajectory walks through, closed loop,
every_frame: 3) with ncd_batch.yaml hyperparameters (bs 4096, 20k iters,
sigma 0.1 m, surface range 0.3 m, octree-tiled meshing at 10 cm) and
scores with the NCD protocol: 2 cm sampling, 20 cm inlier threshold,
truncation 0.4 / 2.0 m (reference eval/evaluator.py:53-56).

Writes experiments/demo_tpu_ncd_scale.json.
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
  name: demo_ncd
  output_root: {out}
  pc_path: {root}/velodyne
  pose_path: {root}/poses.txt
  calib_path: {root}/calib.txt
  load_model: false
  model_path: ''
  first_frame_ref: false
  begin_frame: 0
  end_frame: 1000
  every_frame: 3
  device: tpu
  gpu_id: '0'
process:
  min_range_m: 1.5
  pc_radius_m: 50.0
  min_z_m: -10.0
  rand_downsample: false
  vox_down_m: 0.05
  rand_down_r: 0.2
sampler:
  surface_sample_range_m: 0.3
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
  sigma_sigmoid_m: 0.1
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
  batch_size: 4096
  learning_rate: 0.01
  weight_decay: 1.0e-07
eval:
  wandb_vis_on: false
  o3d_vis_on: false
  vis_freq_iters: 20000
  save_freq_iters: 0
  mesh_freq_frame: 1
  mc_res_m: 0.1
  mc_with_octree: true
  mc_local: false
  mc_vis_level: 1
  save_map: false
tpu:
  feature_update: pallas
  moments_bf16: true
  precompute_lookups: true
  batch_windows: true
  params_bf16: true
"""


def main() -> None:
    from tests import synth_ncd

    out = tempfile.mkdtemp(prefix="demo_ncd_")
    root = os.path.join(out, "kitti")
    t0 = time.perf_counter()
    n_frames = 90
    bmin, bmax = synth_ncd.make_quad_dataset(root, n_frames=n_frames)
    print(f"[ncd] quad written in {time.perf_counter() - t0:.1f}s "
          f"({n_frames} frames, every 3rd processed)", flush=True)
    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TMPL.format(out=out, root=root))

    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    t0 = time.perf_counter()
    run_shine_mapping_batch(cfg_path)
    total_s = time.perf_counter() - t0
    print(f"[ncd] full batch run: {total_s:.1f}s", flush=True)

    run_dir = None
    for d in sorted(os.listdir(out)):
        if d.startswith("demo_ncd") and os.path.isdir(os.path.join(out, d)):
            run_dir = os.path.join(out, d)
    meshes = sorted(os.listdir(os.path.join(run_dir, "mesh")))
    assert meshes, f"no mesh produced in {run_dir}"
    mesh_path = os.path.join(run_dir, "mesh", meshes[-1])

    recs = [json.loads(l) for l in open(run_dir + "/metrics.jsonl")]
    steady = [r["samples_per_s"] for r in recs if "samples_per_s" in r][1:]

    from shine_mapping_tpu.data import io
    from shine_mapping_tpu.eval.metrics import eval_mesh

    t0 = time.perf_counter()
    gt = synth_ncd.quad_gt_points(bmin, bmax, n_frames, every=5)
    gt_path = os.path.join(out, "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    t_gt = time.perf_counter() - t0
    # NCD protocol: 2 cm sampling, 20 cm threshold, trunc 0.4 / 2.0
    m = eval_mesh(mesh_path, gt_path, down_sample_res=0.02, threshold=0.2,
                  truncation_acc=0.4, truncation_com=2.0,
                  mesh_sample_point=1_000_000)

    result = {
        "protocol": "NCD (20 cm threshold, trunc 0.4/2.0, 2 cm sampling)",
        "frames_processed": (n_frames + 2) // 3,
        "total_wall_s": round(total_s, 1),
        "train_samples_per_s_median": round(float(np.median(steady)), 1),
        "gt_gen_s": round(t_gt, 1),
        "hbm_peak_live_gb": recs[-1].get("hbm/peak_live_gb"),
        "mesh": mesh_path,
        "chamfer_l1_m": m["Chamfer_L1 (m)"],
        "mae_accuracy_m": m.get("MAE_accuracy (m)"),
        "precision_pct": m.get("Precision [Accuracy] (%)"),
        "recall_pct": m.get("Recall [Completeness] (%)"),
        "f_score_pct": m["F-score (%)"],
    }
    with open(os.path.join(_REPO, "experiments", "demo_tpu_ncd_scale.json"),
              "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
