"""Incremental (online) mapping driver.

Parity target: reference shine_incre.py:22-247 — per frame: grow the map,
rebuild the optimizer over the grown structure (Adam state reset, mirroring
shine_incre.py:108-109), run ``iters`` inner steps with either the window
replay pool or the continual-learning feature regularizer, update feature
importance, and periodically reconstruct the mesh.

Usage:
    python -m shine_mapping_tpu.cli.shine_incre <config.yaml>
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SHINEConfig
from ..data.dataset import LiDARDataset
from ..mesher import Mesher
from ..train import trainer
from ..train.importance import cal_feature_importance
from ..train.optimizer import init_opt_state
from ..utils import checkpoint as ckpt
from ..utils.experiment import setup_experiment, get_time
from ..utils.metrics_logger import MetricsLogger
from ..utils import profiling
from ..utils.profiling import HbmMonitor
from ..visualizer import MapVisualizer
from .common import (
    build_grid,
    maybe_load_model,
    pool_capacity_for,
    refresh_params_features,
    sync_features_to_grid,
)


# Precompute per-frame pool lookups only when the inner-loop work dwarfs
# the pool: one precompute pass costs ~one pool sweep, the saving is
# ~1.2 ms per inner iteration (BENCH_NOTES "Run-level lookup precompute").
# Typical incre configs (300 iters x 4096 bs vs a 131k-capacity pool) sit
# just past break-even; tiny test configs stay on live probes.
PRECOMPUTE_WORK_RATIO = 4.0


def run_shine_mapping_incremental(config_path: str | None = None, cfg: SHINEConfig | None = None):
    if cfg is None:
        cfg = SHINEConfig()
        if config_path is None:
            sys.exit(
                "Please provide the path to the config file.\n"
                "Try: python -m shine_mapping_tpu.cli.shine_incre xxx_config.yaml"
            )
        cfg.load(config_path)

    # multi-host bring-up must precede any other JAX call (no-op when
    # single-process)
    from ..parallel.mesh import setup_distributed

    rank, world = setup_distributed(cfg)
    primary = rank == 0

    run_path = setup_experiment(cfg, config_path, rank=rank)
    logger = MetricsLogger(
        run_path, cfg.wandb_vis_on and primary, run_name=cfg.name
    )

    grid = build_grid(cfg)
    # incremental mode rebuilds the optimizer per frame (shine_incre.py:
    # 108-109), so only the map/decoders restore — opt state is ignored
    grid, loaded_decoders, loaded_freeze, _, _ = maybe_load_model(cfg, grid)
    dataset = LiDARDataset(cfg, grid)
    # with o3d_vis_on but no Open3D in the image, the visualizer renders
    # offscreen PNG frames into the run dir instead of opening a window
    vis = (MapVisualizer(snapshot_dir=os.path.join(run_path, "vis"))
           if cfg.o3d_vis_on else None)

    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(cfg.seed))
    if loaded_decoders:
        params.update(loaded_decoders)

    if cfg.continual_learning_reg:
        cfg.loss_reduction = "sum"  # shine_incre.py:77-78

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesher.global_transform = np.linalg.inv(dataset.begin_pose_inv)

    key = jax.random.PRNGKey(cfg.seed)
    processed_frame = 0
    total_iter = 0
    freeze = loaded_freeze
    hbm = HbmMonitor()
    profiling.last_hbm_monitor = hbm

    for frame_id in dataset.frame_ids():
        if processed_frame == cfg.freeze_after_frame and not freeze:
            print("Freeze the decoder")
            freeze = True

        T0 = time.time()
        dataset.process_frame(frame_id, incremental_on=cfg.continual_learning_reg)
        params = refresh_params_features(grid, params)

        settings = trainer.TrainSettings.from_config(
            cfg, grid.levels,
            continual_reg_on=cfg.continual_learning_reg,
            freeze_decoder=freeze,
            # coarse buckets: the growing map re-jits at most 4 times per
            # capacity level for the used-rows sweep saving (each re-jit
            # costs ~10 s through the remote-compile tunnel; measured in
            # the incre demo at granularity 8: 11 of 20 frames recompiled)
            n_used=trainer.used_rows_for(grid, granularity=4),
        )
        feat_shapes = tuple(tuple(f.shape) for f in params["features"])
        capacity = pool_capacity_for(len(dataset.pool), 1 << 17)
        dev_pool, n_valid = trainer.pool_to_device(dataset.pool, capacity, settings)

        # the window-path decision comes BEFORE the optimizer init: with
        # fused windows the continual-reg mode keeps the pallas update
        # (the reg gradient rides the entry gradients — round 5), which
        # legalizes bf16 moments; without them reg resolves to 'fused'
        dp = cfg.mesh_shape > 1 or world > 1
        use_pre = (
            cfg.precompute_lookups
            and cfg.iters * cfg.bs >= PRECOMPUTE_WORK_RATIO * capacity
            # sparse/dense chunks ignore pre_lookups — don't pay a
            # full-pool sweep per frame the trainer would discard
            and trainer.resolve_feature_update(settings, feat_shapes)
            in ("fused", "pallas")
        )
        use_winx = (
            use_pre
            and cfg.batch_windows and cfg.windows_fused
            and trainer.batch_windows_ok(settings, feat_shapes)
            and (not dp or cfg.table_sharding == "replicated")
            and trainer.estimate_windows_bytes(
                int(n_valid), settings, feat_shapes, dev_pool, fused=True)
            <= cfg.windows_hbm_budget_gb * (1 << 30)
        )
        # optimizer rebuilt per frame over the grown structure; bf16
        # moments only when the RESOLVED mode is pallas (unpackable dims —
        # or continual-reg without fused windows — fall back to fused,
        # which cannot carry bf16)
        opt_state = init_opt_state(
            params,
            moments_bf16=(cfg.moments_bf16 and trainer.resolve_feature_update(
                settings, feat_shapes, winx=use_winx) == "pallas"),
        )
        if cfg.continual_learning_reg:
            shadow = {
                "importance": tuple(grid.importance_weight),
                "last_frame": tuple(
                    jnp.array(f, copy=True) for f in grid.features_last_frame
                ),
            }
        else:
            shadow = trainer.empty_shadow(params["features"])

        T1 = time.time()
        tables = tuple(grid.tables)
        batch_sharding = None
        if cfg.mesh_shape > 1 or world > 1:
            from ..parallel import mesh as pmesh

            n_dev = len(jax.devices()) if world > 1 else cfg.mesh_shape
            dp_mesh = pmesh.make_data_mesh(n_dev)
            params, opt_state, tables, dev_pool, shadow = pmesh.place_training_state(
                dp_mesh, params, opt_state, tables, dev_pool, shadow,
                table_sharding=cfg.table_sharding,
            )
            batch_sharding = pmesh.batch_sharded(dp_mesh)
            if world == 1 and cfg.infer_bs % n_dev == 0:
                mesher.dp_mesh = dp_mesh
        # the structure is frozen for this frame's inner iterations, so the
        # run-level lookup precompute applies between growth steps; its
        # recompiles share train_chunk's growth boundaries (same static
        # shapes), so no extra executables in steady state
        pre_lookups = None
        batch_windows = None
        if use_pre:
            pre_lookups = trainer.precompute_pool_lookups(
                tables, dev_pool["coord"], tuple(grid.levels),
                tuple(f.shape[0] for f in grid.features),
            )
            # per-frame epoch windows on the fused-gather layout (the
            # flagship iteration): the SAME work predicate as the lookups
            # gates it — window prep is ~2 more pool sweeps.  W is bucketed
            # to a power of two so the growing pool re-jits O(log) times,
            # not every frame.  Continual-reg frames ride the same layout:
            # reg_cover precomputes the per-entry owned-lane masks the reg
            # fold consumes (round 5 — reg used to demote to 'fused').
            if use_winx:
                # split_k's prefix size P is pow2-bucketed like W, so the
                # growing pool re-jits O(log) times on this axis too
                batch_windows = trainer.precompute_batch_windows_fused(
                    pre_lookups, dev_pool, int(n_valid),
                    jax.random.fold_in(key, 0x5157), settings, feat_shapes,
                    w_bucket=True, split_k=cfg.windows_split_k,
                    reg_cover=cfg.continual_learning_reg,
                )
                if processed_frame == 0:
                    print("per-frame fused epoch windows on "
                          f"({batch_windows['idx'].shape[0]} windows)"
                          + (" with reg fold"
                             if cfg.continual_learning_reg else ""))
                ok_frac = float(np.asarray(
                    batch_windows["pre"].ok, np.float32).mean())
                if ok_frac < 1.0:
                    print(f"WARNING: {1 - ok_frac:.1%} of window preps "
                          "exceed the kernel tile windows — those "
                          "iterations run the XLA fallback")
        key, k = jax.random.split(key)
        params, opt_state, aux = trainer.train_chunk(
            params, opt_state, tables, dev_pool, shadow,
            n_valid, jnp.int32(0), k, settings, cfg.iters,
            batch_sharding=batch_sharding,
            pre_lookups=pre_lookups,
            batch_windows=batch_windows,
        )
        jax.block_until_ready(aux["mean"]["total_loss"])
        total_iter += cfg.iters
        hbm.sample("train")
        sync_features_to_grid(grid, params)

        # feature importance for the continual-learning regularizer
        if cfg.continual_learning_reg:
            cal_feature_importance(
                grid, params["geo"], dataset.pool.coord, dataset.pool.sdf_label,
                sigma=settings.sigma_sigmoid, bs=cfg.bs,
                down_rate=cfg.cal_importance_weight_down_rate,
                loss_reduction=cfg.loss_reduction,
            )

        T2 = time.time()

        cur_mesh = None
        if primary and (
            processed_frame == 0 or (processed_frame + 1) % cfg.mesh_freq_frame == 0
        ):
            from .common import device_local

            print("Begin mesh reconstruction from the implicit map")
            mesher.geo_params = device_local(params["geo"])
            mesher.sem_params = device_local(params.get("sem"))
            mesh_path = f"{run_path}/mesh/mesh_frame_{frame_id + 1}.ply"
            map_path = f"{run_path}/map/sdf_map_frame_{frame_id + 1}.ply"
            if cfg.mc_with_octree:
                cur_mesh = mesher.recon_octree_mesh(
                    cfg.mc_query_level, cfg.mc_res_m, mesh_path, map_path,
                    cfg.save_map, cfg.semantic_on,
                )
            else:
                bbx = dataset.cur_bbx if cfg.mc_local else dataset.map_bbx
                cur_mesh = mesher.recon_bbx_mesh(
                    bbx, cfg.mc_res_m, mesh_path, map_path,
                    cfg.save_map, cfg.semantic_on,
                )
        T3 = time.time()

        rec = {("loss/" + k2): float(v) for k2, v in aux["mean"].items()}
        rec.update({
            "frame": processed_frame,
            "iter": total_iter,
            "timing(s)/preprocess": T1 - T0,
            "timing(s)/mapping": T2 - T1,
            "timing(s)/reconstruct": T3 - T2,
            "hbm/peak_live_gb": round(hbm.peak_live / 2**30, 3),
        })
        logger.log(rec)
        print(
            f"frame {frame_id}: loss {rec['loss/total_loss']:.4f} "
            f"pre {T1-T0:.2f}s map {T2-T1:.2f}s recon {T3-T2:.2f}s"
        )

        if vis is not None:
            vis.update(dataset.cur_frame_pc, dataset.cur_pose_ref, cur_mesh)

        processed_frame += 1

    sync_features_to_grid(grid, params)
    if primary:
        from .common import device_local

        ckpt.save_checkpoint(
            f"{run_path}/model/model_final.npz", grid, device_local(params),
            init_opt_state(device_local(params)), total_iter,
        )
    hrep = hbm.report()
    print(f"peak HBM (live-buffer census): {hrep['peak_live_gb']} GiB")
    logger.close()
    if vis is not None:
        vis.stop()
    return run_path, grid, params


if __name__ == "__main__":
    run_shine_mapping_incremental(sys.argv[1] if len(sys.argv) > 1 else None)
