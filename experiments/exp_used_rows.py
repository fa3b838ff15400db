"""Verify + time the used-rows sweep (TrainSettings.n_used).

Rows >= n_corners (capacity headroom after table doubling) never receive
gradients and keep m = v = 0, so dense Adam leaves them bit-identical;
the pallas kernel skips their tiles (in-place aliasing retains their
contents).  This experiment checks that claim ON THE REAL CHIP:

1. trains the same chunks with n_used=None (full sweep) and
   n_used=used_rows_for(grid) (head sweep) from identical state/seeds and
   asserts the resulting features/moments are EXACTLY equal (incl. the
   skipped tail rows), for both fuse_update_levels variants;
2. then times full vs head sweeps interleaved (A,B,A,B) so tunnel drift
   cancels.

Run on the TPU (bench-scale world, ~3.2M corners/level, capacity 4.2M).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world():
    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import SamplePool
    from shine_mapping_tpu.ops.hashgrid import HashGridHost

    cfg = SHINEConfig()
    cfg.tree_level_world = 12
    cfg.tree_level_feat = 3
    cfg.leaf_vox_size = 0.2
    cfg.bs = 8192
    cfg.lr = 0.01
    cfg.derive()

    rng = np.random.default_rng(0)
    n_surf = 400_000
    xy = rng.uniform(-0.9, 0.9, (n_surf, 2))
    z = 0.08 * np.sin(4 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    surf = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    band = surf + rng.normal(0, 0.003, surf.shape)

    grid = HashGridHost(
        max_level=cfg.tree_level_world,
        featured_level_num=cfg.tree_level_feat,
        feature_dim=cfg.feature_dim,
        feature_std=cfg.feature_std,
        seed=0,
        init_node_capacity=1 << 19,
        init_corner_capacity=1 << 19,
    )
    grid.update(band)

    n_pool = 2_000_000
    coord = np.repeat(band, 5, axis=0)[:n_pool].astype(np.float32)
    coord += rng.normal(0, 0.01, coord.shape).astype(np.float32)
    sdf = rng.normal(0, 0.01, n_pool).astype(np.float32)
    weight = np.where(rng.random(n_pool) < 0.7, 1.0, -1.0).astype(np.float32)
    pool = SamplePool(
        coord=coord,
        sdf_label=sdf,
        weight=weight,
        sample_depth=np.zeros(n_pool, np.float32),
        ray_depth=np.zeros(n_pool // 7 + 1, np.float32),
        origin=np.zeros((n_pool, 3), np.float32),
        time=np.zeros(n_pool, np.float32),
    )
    return cfg, grid, pool


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state

    cfg, grid, pool = build_world()
    base = trainer.TrainSettings.from_config(cfg, grid.levels,
                                             feature_update="pallas")
    dev_pool, n_valid = trainer.pool_to_device(pool, 1 << 21, base)
    tables = tuple(grid.tables)
    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features),
    )
    hint = trainer.used_rows_for(grid, granularity=64)
    caps = tuple(f.shape[0] for f in grid.features)
    print(f"n_corners {[hl.n_corners for hl in grid.host_levels]} "
          f"capacity {list(caps)} hint {list(hint)} "
          f"({100 * sum(hint) / sum(caps):.0f}% swept)", flush=True)

    def make_state():
        params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        opt_state = init_opt_state(params)
        shadow = trainer.empty_shadow(params["features"])
        return params, opt_state, shadow

    n_iters = 50

    def run(n_used, fuse, n_chunks=2):
        settings = trainer.TrainSettings.from_config(
            cfg, grid.levels, feature_update="pallas",
            fuse_update_levels=fuse, n_used=n_used,
        )
        params, opt_state, shadow = make_state()
        key = jax.random.PRNGKey(1)
        for rep in range(n_chunks):
            key, k = jax.random.split(key)
            params, opt_state, aux = trainer.train_chunk(
                params, opt_state, tables, dev_pool, shadow, n_valid,
                jnp.int32(rep * n_iters), k, settings, n_iters,
                pre_lookups=pre_lookups,
            )
        loss = float(aux["mean"]["total_loss"])
        return params, opt_state, loss

    # ---- correctness: head sweep == full sweep, bit-exact, both variants
    for fuse in (True, False):
        p_full, o_full, l_full = run(None, fuse)
        p_head, o_head, l_head = run(hint, fuse)
        for i in range(len(grid.levels)):
            for name, a, b in (
                ("p", p_full["features"][i], p_head["features"][i]),
                ("m", o_full.m["features"][i], o_head.m["features"][i]),
                ("v", o_full.v["features"][i], o_head.v["features"][i]),
            ):
                a = np.asarray(a)
                b = np.asarray(b)
                same = np.array_equal(a, b)
                print(f"fuse={fuse} level {i} {name}: "
                      f"{'EXACT' if same else 'MISMATCH'} "
                      f"maxdiff {np.abs(a - b).max():.3e}", flush=True)
                assert same, (fuse, i, name)
        print(f"fuse={fuse}: losses {l_full:.6f} vs {l_head:.6f}", flush=True)

    # ---- timing: interleaved full vs head (fused multi-level variant)
    import itertools

    n_iters_t = 300

    class V:
        def __init__(self, name, n_used):
            self.name = name
            self.settings = trainer.TrainSettings.from_config(
                cfg, grid.levels, feature_update="pallas",
                n_used=n_used,
            )
            self.params, self.opt_state, self.shadow = make_state()
            self.key = jax.random.PRNGKey(1)
            self.rep = 0
            self.times = []

        def chunk(self):
            self.key, k = jax.random.split(self.key)
            t0 = time.perf_counter()
            self.params, self.opt_state, aux = trainer.train_chunk(
                self.params, self.opt_state, tables, dev_pool, self.shadow,
                n_valid, jnp.int32(self.rep * n_iters_t), k, self.settings,
                n_iters_t, pre_lookups=pre_lookups,
            )
            loss = float(aux["mean"]["total_loss"])
            dt = time.perf_counter() - t0
            assert np.isfinite(loss)
            self.rep += 1
            print(f"[t] {self.name} rep {self.rep}: "
                  f"{dt / n_iters_t * 1e3:.2f} ms/iter", flush=True)
            return dt

    a = V("full", None)
    b = V("head", hint)
    a.chunk()
    b.chunk()
    for _ in range(4):
        a.times.append(a.chunk())
        b.times.append(b.chunk())
    for v in (a, b):
        ms = np.asarray(v.times) / n_iters_t * 1e3
        print(f"{v.name}: min {ms.min():.2f} med {np.median(ms):.2f} ms/iter "
              f"-> {n_iters_t * cfg.bs / min(v.times):,.0f} pts/s")


if __name__ == "__main__":
    main()
