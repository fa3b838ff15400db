"""Batch (offline) mapping driver.

Parity target: reference shine_batch.py:23-270 — accumulate and sample all
frames, grow the map structure, then optimize for ``iters`` steps with
periodic checkpointing and mesh reconstruction.

Usage:
    python -m shine_mapping_tpu.cli.shine_batch <config.yaml>
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
from ..train.optimizer import init_opt_state
from ..utils import checkpoint as ckpt
from ..utils.experiment import setup_experiment, get_time
from ..utils.metrics_logger import MetricsLogger
from ..utils import profiling
from ..utils.profiling import HbmMonitor, PhaseTimer, device_trace
from ..visualizer import MapVisualizer
from .common import (
    build_grid,
    device_local,
    event_boundaries,
    maybe_load_model,
    pool_capacity_for,
    refresh_params_features,
    sync_features_to_grid,
)


def run_shine_mapping_batch(config_path: str | None = None, cfg: SHINEConfig | None = None):
    if cfg is None:
        cfg = SHINEConfig()
        if config_path is None:
            sys.exit(
                "Please provide the path to the config file.\n"
                "Try: python -m shine_mapping_tpu.cli.shine_batch xxx_config.yaml"
            )
        cfg.load(config_path)

    # multi-host bring-up must precede any other JAX call; no-op when
    # single-process (tpu.num_processes / coordinator / process_id knobs)
    from ..parallel.mesh import setup_distributed

    rank, world = setup_distributed(cfg)
    primary = rank == 0
    if world > 1:
        print(f"multi-host: process {rank}/{world}, "
              f"{len(jax.devices())} global devices")

    run_path = setup_experiment(cfg, config_path, rank=rank)
    logger = MetricsLogger(
        run_path, cfg.wandb_vis_on and primary, run_name=cfg.name
    )

    grid = build_grid(cfg)
    # load pretrained decoders / resume a full map checkpoint BEFORE the
    # data phase so new frames grow the restored structure
    # (shine_batch.py:45-58 ordering); a full checkpoint also restores the
    # optimizer moments + iteration so the LR schedule continues
    grid, loaded_decoders, freeze, loaded_opt, start_iter = maybe_load_model(cfg, grid)
    dataset = LiDARDataset(cfg, grid)

    # with o3d_vis_on but no Open3D in the image, the visualizer renders
    # offscreen PNG frames into the run dir instead of opening a window
    vis = (MapVisualizer(snapshot_dir=os.path.join(run_path, "vis"))
           if cfg.o3d_vis_on else None)

    # ---------------------------------------------------------------- data phase
    print("Load, preprocess and sample data")
    timer = PhaseTimer()
    with timer.phase("data"):
        if world > 1 and cfg.shard_ingest:
            # shard preprocessing across processes; every process
            # integrates all frames (bit-identical to single-process)
            from ..parallel.ingest import process_frames_multihost

            process_frames_multihost(dataset, dataset.frame_ids(), rank, world)
        elif cfg.num_workers > 1:
            dataset.process_frames_pipelined(dataset.frame_ids(), cfg.num_workers)
        else:
            for frame_id in dataset.frame_ids():
                dataset.process_frame(frame_id)
    print(
        f"data phase: {timer.totals['data']:.1f} s, "
        f"pool={len(dataset.pool)} samples"
    )
    # release the accumulate buffers' doubling headroom (up to 2x pool RAM)
    dataset.finalize_pool()
    grid.print_detail()

    params = trainer.init_params(cfg, grid, jax.random.PRNGKey(cfg.seed))
    if loaded_decoders:
        params.update(loaded_decoders)
    # resume-from-checkpoint: decoders frozen only when explicitly loading a
    # pretrained decoder; a full-checkpoint resume keeps training them
    resume = loaded_opt is not None
    settings = trainer.TrainSettings.from_config(
        cfg, grid.levels, freeze_decoder=freeze and not resume,
        # batch structure is frozen after the data phase: near-exact
        # used-row hints cost one compile and skip the headroom sweep
        n_used=trainer.used_rows_for(grid, granularity=64),
    )

    mesher = Mesher(cfg, grid, params["geo"], params.get("sem"))
    mesher.global_transform = np.linalg.inv(dataset.begin_pose_inv)

    if primary:
        pc_map_path = run_path + "/map/pc_map_down.ply"
        with timer.phase("map-export"):
            dataset.write_merged_pc(pc_map_path)

    if resume:
        from .common import pad_opt_state_features

        opt_state = pad_opt_state_features(loaded_opt, params)
        print(f"Resuming from iter {start_iter} (optimizer state restored)")
    else:
        # bf16 moments only when the RESOLVED mode is pallas (unpackable
        # dims fall back to fused, which cannot carry bf16)
        feat_shapes = tuple(tuple(f.shape) for f in params["features"])
        opt_state = init_opt_state(
            params,
            moments_bf16=(cfg.moments_bf16 and trainer.resolve_feature_update(
                settings, feat_shapes) == "pallas"),
        )
    pool_rng = np.random.default_rng(cfg.seed + 1)
    rotate_pool = len(dataset.pool) > cfg.max_device_pool and not cfg.ray_loss
    with timer.phase("upload"):
        if rotate_pool:
            capacity = cfg.max_device_pool
            sub = pool_rng.integers(0, len(dataset.pool), capacity)
            dev_pool, n_valid = trainer.pool_to_device(
                dataset.pool, capacity, settings, subset=sub
            )
            print(
                f"pool {len(dataset.pool)} > device budget {capacity}: rotating "
                f"sub-pools every {cfg.pool_rotate_iters} iters"
            )
        else:
            capacity = pool_capacity_for(len(dataset.pool), cfg.init_pool_capacity)
            dev_pool, n_valid = trainer.pool_to_device(dataset.pool, capacity, settings)
    shadow = trainer.empty_shadow(params["features"])
    key = jax.random.PRNGKey(cfg.seed)
    iters_since_rotate = 0
    hbm = HbmMonitor()
    profiling.last_hbm_monitor = hbm
    hbm.sample("upload")

    # ---------------------------------------------------------------- training
    print("Begin mapping")
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
            # single-controller: meshing inference shards over the same mesh
            mesher.dp_mesh = dp_mesh
        print(
            f"data-parallel over {n_dev} devices "
            f"(tables {cfg.table_sharding})"
        )
    # the batch-mode structure is frozen for the whole run: resolve corner
    # ids for every pool sample once (invalidated only by pool rotation)
    # and per-iteration hash probes become plain gathers
    feat_shapes = tuple(tuple(f.shape) for f in grid.features)
    use_windows = (
        cfg.batch_windows
        and cfg.precompute_lookups
        and trainer.batch_windows_ok(settings, feat_shapes)
    )
    if cfg.batch_windows and not use_windows:
        print("tpu.batch_windows requested but prerequisites unmet "
              "(needs the pallas update, point loss, no consistency, "
              "precompute_lookups) — falling back to iid batches")
    # fused-gather window layout: single-chip, or data-parallel with
    # replicated tables (the update island all-gathers entry gradients).
    # HBM guard: the window stacks live for the whole run and compete with
    # the map tables and pool — degrade (fused -> per-level -> iid)
    # instead of OOMing mid-run (trainer.estimate_windows_bytes).
    windows_budget = int(cfg.windows_hbm_budget_gb * (1 << 30))
    n_live_static = capacity if rotate_pool else len(dataset.pool)
    # fused windows run single-chip, data-parallel with replicated tables
    # (the update island all-gathers entry gradients), or — the scaling
    # path — with ROW-SHARDED tables via the round-5 routed layout: the
    # window precompute routes every entry to its row shard, and each
    # chip gathers/updates only its R/n rows (shards=n below)
    n_shards = 0
    if batch_sharding is not None and cfg.table_sharding == "rows":
        nd = len(batch_sharding.mesh.devices.flat)
        if trainer.shard_windows_ok(settings, feat_shapes, nd):
            n_shards = nd
    est_fused = trainer.estimate_windows_bytes(
        n_live_static, settings, feat_shapes, dev_pool, fused=True,
        shards=n_shards)
    if rotate_pool and batch_sharding is None:
        # rotation prefetch keeps a SECOND capacity-sized pool staged in
        # HBM between rotations — charge it against the same budget (the
        # staging thread only runs single-controller, see below)
        est_fused += sum(
            a.nbytes for a in dev_pool.values() if a is not None)
    use_winx = cfg.windows_fused and (
        batch_sharding is None or cfg.table_sharding == "replicated"
        or n_shards > 0
    )
    if use_windows and use_winx and est_fused > windows_budget:
        print(
            f"fused window stacks would hold ~{est_fused / 2**30:.1f} GiB "
            f"(> tpu.windows_hbm_budget_gb {cfg.windows_hbm_budget_gb}) — "
            "using the per-level window layout"
        )
        use_winx = False
    # bf16 map mode: tables stored bfloat16, stochastic-rounding update.
    # Resume is supported: the checkpoint's f32 features are the EXACT
    # upcast of the bf16 tables (sync_features_to_grid), so casting back
    # on restore is bit-identical; the moments round-trip bf16 natively.
    use_params_bf16 = (
        cfg.params_bf16 and use_windows and use_winx
        and opt_state.m["features"][0].dtype == jnp.bfloat16
    )
    if cfg.params_bf16 and not use_params_bf16:
        print("tpu.params_bf16 requested but prerequisites unmet (needs "
              "batch_windows + windows_fused with replicated tables, "
              "moments_bf16) — keeping f32 tables")
    if use_params_bf16:
        params = dict(params, features=tuple(
            f.astype(jnp.bfloat16) for f in params["features"]))
        print("bf16 map mode: feature tables stored bfloat16 "
              "(stochastic-rounding Adam; half map memory)")

    def make_pre():
        if not cfg.precompute_lookups:
            return None
        return trainer.precompute_pool_lookups(
            tables, dev_pool["coord"], tuple(grid.levels),
            tuple(f.shape[0] for f in grid.features),
        )

    def make_windows(pre):
        # epoch windows over the CURRENT device pool (n_valid live samples);
        # the shuffle key is seed-deterministic so a resumed run rebuilds
        # the identical windows and continues the same epoch sequence
        if pre is None or not use_windows:
            return None
        n_live = capacity if rotate_pool else len(dataset.pool)
        wkey = jax.random.fold_in(key, 0x5157)
        if use_winx:
            # fused-gather window layout (one gather + one kernel dispatch
            # per iteration; same windows/batches as the per-level prep).
            # split_k: the multi-row samples reorder into a static prefix
            # and the tail gathers K_lo rows per level (~3x fewer gather
            # rows on miss-heavy pools; BENCH_NOTES round 4)
            wx = trainer.precompute_batch_windows_fused(
                pre, dev_pool, int(n_live), wkey, settings, feat_shapes,
                split_k=cfg.windows_split_k,
                shards=n_shards,
            )
            L = len(settings.levels)
            # every window's entries must fit the kernel's tile windows —
            # failures run the (correct but ~10x slower) XLA fallback
            # SILENTLY each iteration, which is exactly how the round-5
            # steep-pyramid regression hid.  Surface it.
            ok_arr = (wx["shard"]["pre"].ok if n_shards else wx["pre"].ok)
            ok_frac = float(np.asarray(ok_arr, np.float32).mean())
            if ok_frac < 1.0:
                print(f"WARNING: {1 - ok_frac:.1%} of window preps exceed "
                      "the kernel tile windows — those iterations run the "
                      "XLA fallback (report this; see BENCH_NOTES round 5)")
            if n_shards:
                # per-device window residency scales 1/n: stacks shard
                # over samples, routing over shards; the (unused) global
                # EntryPrep is dropped
                wx = pmesh.place_routed_windows(dp_mesh, wx)
                actual = sum(a.nbytes for a in
                             jax.tree_util.tree_leaves(wx))
                print(f"routed row-sharded windows over {n_shards} chips "
                      f"(E={wx['shard']['serve_rows'].shape[3]}, "
                      f"{actual / 2**30:.2f} GiB total "
                      f"~{actual / n_shards / 2**30:.2f}/chip)")
                if actual / n_shards > windows_budget:
                    print("WARNING: routed window residency exceeds "
                          "tpu.windows_hbm_budget_gb per chip — the E "
                          "padding (worst-cell pow2) outgrew the "
                          "pre-precompute estimate")
            if "rows_hi" in wx:
                P = wx["rows_hi"].shape[1]
                print(f"fused windows (split-K): W={wx['idx'].shape[0]} "
                      f"K={wx['rows_hi'].shape[-1] // L} "
                      f"K_lo={wx['rows_lo'].shape[-1] // L} P={P}")
            else:
                print(f"fused windows: W={wx['idx'].shape[0]} "
                      f"K={wx['rows_kg'].shape[-1] // L}"
                      + (" (split-K fell back: no split cuts entries 1/8+)"
                         if cfg.windows_split_k else ""))
            return wx
        est_win = trainer.estimate_windows_bytes(
            int(n_live), settings, feat_shapes, dev_pool, fused=False)
        if est_win > windows_budget:
            print(
                f"window precompute would hold ~{est_win / 2**30:.1f} GiB "
                f"(> tpu.windows_hbm_budget_gb {cfg.windows_hbm_budget_gb})"
                " — falling back to iid batches"
            )
            return None
        return trainer.precompute_batch_windows(
            pre, int(n_live), wkey, settings, feat_shapes,
        )

    # rotating sub-pools: stage the NEXT rotation's host gather + pad +
    # upload on a DAEMON worker thread while the current chunk trains
    # (the host sits idle inside the device-bound training scan; a daemon
    # thread never blocks interpreter exit even if the tunnel wedges
    # mid-upload).  The pool_rng draws keep their exact sequence — one
    # per rotation, drawn one rotation early — so the staged subsets are
    # bit-identical to the unstaged ones.  Lookups/windows stay on the
    # main thread (device compute, visible in the rotate phase).  The
    # staged pool doubles the resident pool HBM between rotations; only
    # stage when a rotation actually lies ahead.
    next_rotation = None
    chunk_starts = [
        start for start, _ in event_boundaries(
            cfg.iters, (cfg.save_freq_iters, cfg.vis_freq_iters),
            cfg.scan_chunk)
    ]
    if rotate_pool and batch_sharding is None:
        import threading

        class _Staged:
            def __init__(self, sub):
                self._out = self._err = None
                self._t = threading.Thread(
                    target=self._run, args=(sub,), daemon=True)
                self._t.start()

            def _run(self, sub):
                try:
                    self._out = trainer.pool_to_device(
                        dataset.pool, capacity, settings, sub)
                except BaseException as e:  # re-raised on the main thread
                    self._err = e

            def result(self):
                self._t.join()
                if self._err is not None:
                    raise self._err
                return self._out

        def stage_rotation(iters_done: int):
            # a rotation fires only at a scan-chunk boundary with
            # pool_rotate_iters done since the last one — stage only when
            # such a boundary actually lies ahead, else the staged
            # capacity-sized upload would sit unused in HBM to run end
            if not any(s >= iters_done + cfg.pool_rotate_iters
                       for s in chunk_starts):
                return None
            return _Staged(pool_rng.integers(0, len(dataset.pool), capacity))

        next_rotation = stage_rotation(start_iter)

    with timer.phase("precompute"):
        pre_lookups = make_pre()
        batch_windows = make_windows(pre_lookups)
    hbm.sample("precompute")
    t_train0 = time.time()
    done_iters = start_iter
    profiled = False
    for start, n in event_boundaries(
        cfg.iters, (cfg.save_freq_iters, cfg.vis_freq_iters), cfg.scan_chunk
    ):
        if start + n <= start_iter:
            continue  # already completed before the resume point
        if start < start_iter:  # straddling chunk: run only the remainder
            n -= start_iter - start
            start = start_iter
        if rotate_pool and iters_since_rotate >= cfg.pool_rotate_iters:
            with timer.phase("rotate"):
                if next_rotation is not None:
                    dev_pool, n_valid = next_rotation.result()
                    next_rotation = stage_rotation(start)
                else:
                    sub = pool_rng.integers(0, len(dataset.pool), capacity)
                    dev_pool, n_valid = trainer.pool_to_device(
                        dataset.pool, capacity, settings, subset=sub
                    )
                iters_since_rotate = 0
                pre_lookups = make_pre()  # pool contents changed
                batch_windows = make_windows(pre_lookups)
        # chunk key depends only on the chunk's start iteration, so a
        # resumed run draws the same batches an uninterrupted run would
        k = jax.random.fold_in(key, start)
        # optional deep-dive: jax.profiler trace of ONE steady-state chunk
        # (the second — the first includes compilation; a single-chunk run
        # traces its only chunk, compile included)
        trace_this = bool(
            cfg.profile_dir and primary and not profiled
            and (start > start_iter or start + n >= cfg.iters)
        )
        t0 = get_time()
        with timer.phase("train"), device_trace(
            cfg.profile_dir if trace_this else None
        ):
            params, opt_state, aux = trainer.train_chunk(
                params, opt_state, tables, dev_pool, shadow,
                n_valid, jnp.int32(start), k, settings, n,
                batch_sharding=batch_sharding,
                pre_lookups=pre_lookups,
                batch_windows=batch_windows,
            )
            t1 = get_time(aux["mean"]["total_loss"])
        if trace_this:
            profiled = True
            print(f"profiler trace written to {cfg.profile_dir}")
        iters_since_rotate += n
        done_iters = start + n
        hbm.sample("train")
        rec = {("loss/" + k2): float(v) for k2, v in aux["mean"].items()}
        rec.update({
            "iter": done_iters,
            "timing(s)/chunk": t1 - t0,
            "timing(s)/per_iter": (t1 - t0) / n,
            "samples_per_s": n * cfg.bs / max(t1 - t0, 1e-9),
        })
        rec.update({f"phase(s)/{p}": v for p, v in timer.summary().items()})
        rec["hbm/peak_live_gb"] = round(hbm.peak_live / 2**30, 3)
        logger.log(rec)
        print(
            f"iter {done_iters}/{cfg.iters} loss {rec['loss/total_loss']:.4f} "
            f"({rec['samples_per_s'] / 1e6:.2f}M samples/s)"
        )

        at_save = (
            primary and cfg.save_freq_iters > 0
            and done_iters % cfg.save_freq_iters == 0
        )
        at_mesh = (
            primary and cfg.vis_freq_iters > 0
            and done_iters % cfg.vis_freq_iters == 0
        )
        if at_save and done_iters < cfg.iters:
            sync_features_to_grid(grid, params)
            name = f"model/model_iter_{done_iters}"
            ckpt.save_checkpoint(
                f"{run_path}/{name}.npz", grid,
                device_local(params), device_local(opt_state), done_iters,
            )
            ckpt.save_decoders(
                f"{run_path}/{name}_decoders.npz", device_local(params)
            )
        if at_mesh:
            sync_features_to_grid(grid, params)
            mesher.geo_params = device_local(params["geo"])
            mesher.sem_params = device_local(params.get("sem"))
            print("Begin mesh reconstruction from the implicit map")
            with timer.phase("mesh"):
                if not cfg.time_conditioned:
                    mesh_path = f"{run_path}/mesh/mesh_iter_{done_iters}.ply"
                    map_path = f"{run_path}/map/sdf_map_iter_{done_iters}.ply"
                    if cfg.mc_with_octree:
                        cur_mesh = mesher.recon_octree_mesh(
                            cfg.mc_query_level, cfg.mc_res_m, mesh_path, map_path,
                            cfg.save_map, cfg.semantic_on,
                        )
                    else:
                        cur_mesh = mesher.recon_bbx_mesh(
                            dataset.map_bbx, cfg.mc_res_m, mesh_path, map_path,
                            cfg.save_map, cfg.semantic_on,
                        )
                    if vis is not None:
                        vis.update_mesh(cur_mesh)
                    hbm.sample("mesh")
                else:
                    # one mesh per (even) timestamp — shine_batch.py:248-264
                    for frame_id in dataset.frame_ids():
                        if frame_id % 2 != 0:
                            continue
                        mesher.ts = frame_id
                        mesh_path = (
                            f"{run_path}/mesh/mesh_iter_{done_iters}_ts_{frame_id}.ply"
                        )
                        map_path = (
                            f"{run_path}/map/sdf_map_iter_{done_iters}_ts_{frame_id}.ply"
                        )
                        if cfg.mc_with_octree:
                            mesher.recon_octree_mesh(
                                cfg.mc_query_level, cfg.mc_res_m, mesh_path, map_path,
                                cfg.save_map, cfg.semantic_on,
                            )
                        else:
                            mesher.recon_bbx_mesh(
                                dataset.map_bbx, cfg.mc_res_m, mesh_path, map_path,
                                cfg.save_map, cfg.semantic_on,
                            )

    t_train1 = time.time()
    print(f"training: {t_train1 - t_train0:.1f} s for {done_iters} iters")
    # final checkpoint
    sync_features_to_grid(grid, params)
    if primary:
        with timer.phase("checkpoint"):
            ckpt.save_checkpoint(
                f"{run_path}/model/model_final.npz", grid,
                device_local(params), device_local(opt_state), done_iters,
            )
            ckpt.save_decoders(
                f"{run_path}/model/model_final_decoders.npz",
                device_local(params)
            )
    print("phase totals(s): " + ", ".join(
        f"{p}={v:.1f}" for p, v in timer.summary().items()
    ))
    hrep = hbm.report()
    print(f"peak HBM (live-buffer census): {hrep['peak_live_gb']} GiB "
          f"{hrep['samples_gb']}")
    logger.close()
    if vis is not None:
        vis.stop()
    return run_path, grid, params


if __name__ == "__main__":
    run_shine_mapping_batch(sys.argv[1] if len(sys.argv) > 1 else None)
