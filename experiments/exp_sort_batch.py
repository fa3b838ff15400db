"""A/B: unsorted vs pool-order-sorted batch indices (gather locality).

Same world/pool as bench.py (ICRA MaiCity scale).  Both variants are
compiled first, then timed chunks ALTERNATE A,B,A,B,... so tunnel-latency
drift affects both equally.  Reports min + median ms/iter per variant.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import SamplePool
    from shine_mapping_tpu.ops.hashgrid import HashGridHost
    from shine_mapping_tpu.train import trainer
    from shine_mapping_tpu.train.optimizer import init_opt_state

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

    dev_pool, n_valid = trainer.pool_to_device(
        pool, 1 << 21, trainer.TrainSettings.from_config(cfg, grid.levels)
    )
    tables = tuple(grid.tables)
    pre_lookups = trainer.precompute_pool_lookups(
        tables, dev_pool["coord"], tuple(grid.levels),
        tuple(f.shape[0] for f in grid.features),
    )

    n_iters = 300

    class Variant:
        def __init__(self, name: str, sort: bool):
            self.name = name
            self.settings = trainer.TrainSettings.from_config(
                cfg, grid.levels, feature_update="pallas",
                sort_batch=sort,
            )
            self.bf16 = True
            params = trainer.init_params(cfg, grid, jax.random.PRNGKey(0))
            self.params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
            self.opt_state = init_opt_state(self.params, moments_bf16=True)
            self.shadow = trainer.empty_shadow(self.params["features"])
            self.key = jax.random.PRNGKey(1)
            self.rep = 0
            self.times = []

        def chunk(self) -> float:
            self.key, k = jax.random.split(self.key)
            t0 = time.perf_counter()
            self.params, self.opt_state, aux = trainer.train_chunk(
                self.params, self.opt_state, tables, dev_pool, self.shadow,
                n_valid, jnp.int32(self.rep * n_iters), k, self.settings,
                n_iters, pre_lookups=pre_lookups,
            )
            loss = float(aux["mean"]["total_loss"])  # device sync
            dt = time.perf_counter() - t0
            assert np.isfinite(loss)
            self.rep += 1
            print(f"[ab] {self.name} rep {self.rep}: "
                  f"{dt / n_iters * 1e3:.2f} ms/iter loss {loss:.4f}",
                  file=sys.stderr, flush=True)
            return dt

    a = Variant("unsorted", sort=False)
    b = Variant("sorted", sort=True)
    a.chunk()  # compile + warm
    b.chunk()
    for _ in range(5):
        a.times.append(a.chunk())
        b.times.append(b.chunk())

    for v in (a, b):
        ms = np.asarray(v.times) / n_iters * 1e3
        print(f"{v.name}: min {ms.min():.2f} med {np.median(ms):.2f} ms/iter"
              f" -> {n_iters * cfg.bs / min(v.times):,.0f} pts/s")


if __name__ == "__main__":
    main()
