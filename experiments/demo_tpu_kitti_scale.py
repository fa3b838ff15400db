"""KITTI-scale synthetic-city demonstration (round-4 VERDICT item 7).

No network egress exists in this image, so the reference's KITTI docker
demo (reference Dockerfile:39 running config/kitti/docker_kitti_batch.yaml
on the 100-frame KITTI example) gets the largest-credible proxy: a
multi-block synthetic CITY (tests/synth_city.py — street grid, buildings,
parked + MOVING cars, poles), 150 labeled frames with a turn, driven
through a docker_kitti_batch-SHAPED config (pc_radius 50 m, vox_down
0.05 m, leaf 0.2 m, world level 12, bs 4096, 20k iters, semantics ON,
moving-object filter ON) with the production fast path and a device-pool
budget small enough to force ROTATING SUB-POOLS — exercising exactly the
paths a real city sequence would: capacity doublings at scale, pool
rotation with window/lookup invalidation, semantic training, and
octree-tiled meshing of a street-scale map.

Writes experiments/demo_tpu_kitti_scale.json: quality vs dense analytic
GT, wall-clock per phase, throughput, map size, peak HBM.

Run ON THE CHIP (takes ~10-20 min warm):
    python experiments/demo_tpu_kitti_scale.py
Tiny CPU smoke (~3 min):
    SHINE_CITY_TINY=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python experiments/demo_tpu_kitti_scale.py
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
  name: demo_city
  output_root: {out}
  pc_path: {root}/velodyne
  pose_path: {root}/poses.txt
  calib_path: {root}/calib.txt
  label_path: {root}/labels
  load_model: false
  model_path: ''
  first_frame_ref: false
  begin_frame: 0
  end_frame: 10000
  every_frame: 1
  device: tpu
  gpu_id: '0'
process:
  min_range_m: 3.0
  pc_radius_m: 50.0
  min_z_m: -3.5
  rand_downsample: false
  vox_down_m: {vox}
  rand_down_r: 0.2
  semantic_on: true
  filter_moving_object: true
sampler:
  surface_sample_range_m: 0.3
  surface_sample_n: 3
  free_sample_begin_ratio: 0.3
  free_sample_end_dist_m: 0.8
  free_sample_n: 3
octree:
  leaf_vox_size: {leaf}
  tree_level_world: {world_level}
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
  iters: {iters}
  batch_size: {bs}
  learning_rate: 0.01
  weight_decay: 1.0e-07
eval:
  wandb_vis_on: false
  o3d_vis_on: false
  vis_freq_iters: {iters}
  save_freq_iters: 0
  mesh_freq_frame: 1
  mc_res_m: {mc_res}
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
  max_device_pool: {max_pool}
  pool_rotate_iters: 2000
"""


def main() -> None:
    tiny = os.environ.get("SHINE_CITY_TINY", "0") == "1"
    out = tempfile.mkdtemp(prefix="demo_city_")
    root = os.path.join(out, "kitti")
    os.makedirs(root, exist_ok=True)

    from tests import synth_city

    t0 = time.perf_counter()
    n_frames = 12 if tiny else 150
    city = synth_city.make_city_dataset(
        root, n_frames=n_frames, seed=0,
        n_az=384 if tiny else 1024, n_el=24 if tiny else 48,
        n_blocks_x=3 if tiny else 8, n_blocks_y=2 if tiny else 3,
    )
    t_gen = time.perf_counter() - t0
    # moving-object ground truth for the filter check
    n_moving_pts = 0
    n_total_pts = 0
    for f in sorted(os.listdir(os.path.join(root, "labels"))):
        raw = np.fromfile(os.path.join(root, "labels", f), np.uint32)
        n_moving_pts += int(((raw & 0xFFFF) == 252).sum())
        n_total_pts += raw.size
    print(f"[city] {n_frames} frames written in {t_gen:.1f}s; "
          f"moving-car points {n_moving_pts}/{n_total_pts} "
          f"({100 * n_moving_pts / max(n_total_pts, 1):.1f}%)", flush=True)

    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TMPL.format(
            out=out, root=root,
            vox=0.08 if tiny else 0.05,
            leaf=0.3 if tiny else 0.2,
            world_level=10 if tiny else 12,
            iters=400 if tiny else 20000,
            bs=2048 if tiny else 4096,
            mc_res=0.3 if tiny else 0.2,
            # force rotating sub-pools (the city pool is ~20M samples)
            max_pool=1 << (17 if tiny else 22),
        ))

    from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

    t0 = time.perf_counter()
    run_path, grid, params = run_shine_mapping_batch(cfg_path)
    total_s = time.perf_counter() - t0
    print(f"[city] full batch run: {total_s:.1f}s", flush=True)

    # map size + device memory
    n_corners = [hl.n_corners for hl in grid.host_levels]
    mem_stats = {}
    try:
        # the driver's HbmMonitor: real memory_stats when the platform
        # provides them, else the live-buffer census high-water mark
        from shine_mapping_tpu.utils import profiling

        if profiling.last_hbm_monitor is not None:
            mem_stats = profiling.last_hbm_monitor.report()
    except Exception:
        pass

    import glob

    meshes = sorted(glob.glob(os.path.join(run_path, "mesh", "*.ply")))
    assert meshes, f"no mesh produced in {run_path}"
    mesh_path = meshes[-1]

    from shine_mapping_tpu.data import io
    from shine_mapping_tpu.eval.metrics import eval_mesh

    t0 = time.perf_counter()
    gt = synth_city.city_gt_points(
        city, root, n_frames, every=5,
        n_az=768 if tiny else 2048, n_el=48 if tiny else 96,
        max_range=45.0)
    gt_path = os.path.join(out, "gt.ply")
    io.write_ply(gt_path, io.PointCloud(points=gt))
    t_gt = time.perf_counter() - t0
    t0 = time.perf_counter()
    m = eval_mesh(mesh_path, gt_path, down_sample_res=0.05, threshold=0.2,
                  truncation_acc=0.4, truncation_com=2.0,
                  mesh_sample_point=1_000_000 if not tiny else 300_000)
    t_eval = time.perf_counter() - t0

    import json as _json

    recs = [_json.loads(l) for l in open(run_path + "/metrics.jsonl")]
    steady = [r["samples_per_s"] for r in recs[1:]] or [recs[-1]["samples_per_s"]]
    result = {
        "tiny": tiny,
        "n_frames": n_frames,
        "moving_points_pct": round(100 * n_moving_pts / max(n_total_pts, 1), 2),
        "map_corners_per_level": n_corners,
        "map_corners_total": int(sum(n_corners)),
        "total_wall_s": round(total_s, 1),
        "train_samples_per_s_median": round(float(np.median(steady)), 1),
        "final_loss": recs[-1]["loss/total_loss"],
        "mesh": mesh_path,
        "chamfer_l1_m": m["Chamfer_L1 (m)"],
        "mae_accuracy_m": m.get("MAE_accuracy (m)"),
        "precision_pct": m.get("Precision [Accuracy] (%)"),
        "recall_pct": m.get("Recall [Completeness] (%)"),
        "f_score_pct": m["F-score (%)"],
        "gt_gen_s": round(t_gt, 1),
        "eval_s": round(t_eval, 1),
        "device_memory_stats": mem_stats,
    }
    name = "demo_tpu_kitti_scale_tiny.json" if tiny else "demo_tpu_kitti_scale.json"
    with open(os.path.join(_REPO, "experiments", name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
