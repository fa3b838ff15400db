"""TPU demonstration: incremental CONTINUAL-LEARNING-REG mapping (round 5).

The reference's signature incremental mode (shine_incre.py:155-157,
utils/incre_learning.py): per frame, the pool holds ONLY the current
frame, a regularizer pulls batch-touched features toward their last-frame
values weighted by accumulated importance, and importance is re-estimated
over the frame after its inner iterations.  Round-4 left this mode locked
out of every fast path (demoted to 'fused', ~13x off flagship, no on-chip
wall-clock); round 5 folds the reg gradient into the fused-window entry
gradients (trainer.body_winx reg fold), so the same demo world now runs
reg mode on the flagship iteration.

20 frames, kitti_incre_reg-shaped hyperparameters (lambda 1e6, decoder
freeze at 20 => never within this demo, 50+ iters/frame scaled up to match
the replay demo's per-frame work), final mesh + eval vs analytic GT.
Writes experiments/demo_tpu_incre_reg.json.  Compare wall-clock against
demo_tpu_incre.json (replay mode; the VERDICT gate is <= ~2x it).
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

from demo_tpu_batch import make_dense_dataset  # noqa: E402

CFG_TMPL = """\
setting:
  name: demo_incre_reg
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
  poly_int_on: false
  octree_from_surface_samples: true
decoder:
  mlp_level: 2
  mlp_hidden_dim: 32
  freeze_after_frame: 5
loss:
  ray_loss: false
  main_loss_type: sdf_bce
  sigma_sigmoid_m: 0.05
  loss_weight_on: false
  behind_dropoff_on: false
  ekional_loss_on: false
  weight_e: 0.1
continual:
  continual_learning_reg: true
  lambda_forget: 1000000.0
  window_replay_on: false
  window_radius_m: 0
optimizer:
  iters: 300
  batch_size: 8192
  learning_rate: 0.01
  weight_decay: 1.0e-07
eval:
  wandb_vis_on: false
  o3d_vis_on: false
  vis_freq_iters: 0
  save_freq_iters: 0
  mesh_freq_frame: 20
  mc_res_m: 0.1
  mc_with_octree: false
  mc_local: false
  mc_vis_level: 1
  save_map: false
tpu:
  feature_update: pallas
  moments_bf16: true
  batch_windows: true
"""


def main() -> None:
    out = tempfile.mkdtemp(prefix="demo_incre_reg_")
    root = os.path.join(out, "kitti")
    make_dense_dataset(root)

    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TMPL.format(out=out, root=root))

    from shine_mapping_tpu.cli.shine_incre import run_shine_mapping_incremental

    t0 = time.perf_counter()
    run_shine_mapping_incremental(cfg_path)
    total_s = time.perf_counter() - t0
    print(f"[demo] incremental reg run: {total_s:.1f}s", flush=True)

    run_dir = None
    for d in sorted(os.listdir(out)):
        if d.startswith("demo_incre_reg") and os.path.isdir(os.path.join(out, d)):
            run_dir = os.path.join(out, d)
    mesh_dir = os.path.join(run_dir, "mesh")
    meshes = sorted(os.listdir(mesh_dir)) if os.path.isdir(mesh_dir) else []
    assert meshes, f"no mesh produced in {run_dir}"
    mesh_path = os.path.join(mesh_dir, meshes[-1])

    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    reg_frames = sum(1 for r in recs if "loss/reg_loss" in r)
    map_s = [r["timing(s)/mapping"] for r in recs]

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
        "frames": len(recs),
        "reg_frames": reg_frames,
        "mapping_s_median": round(float(np.median(map_s)), 2),
        "hbm_peak_live_gb": recs[-1].get("hbm/peak_live_gb"),
        "mesh": mesh_path,
        "chamfer_l1_m": m["Chamfer_L1 (m)"],
        "precision_pct": m.get("Precision [Accuracy] (%)"),
        "recall_pct": m.get("Recall [Completeness] (%)"),
        "f_score_pct": m["F-score (%)"],
    }
    with open(os.path.join(_REPO, "experiments", "demo_tpu_incre_reg.json"),
              "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
