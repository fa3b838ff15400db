"""Round 4: where does the city demo's 233 s data phase go?

Builds 20 city frames with the SAME generator + config template as
demo_tpu_kitti_scale (ad-hoc cfg reconstructions keep diverging on
defaults), then times, per frame: load_and_sample (host: read/crop/
downsample/sample) vs _integrate_frame (sequential: octree growth incl.
device hash-table inserts, pool append) — and the pipelined total.

  timeout 1800 python experiments/exp_r4_dataphase.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/shine_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tests import synth_city
    from shine_mapping_tpu.config import SHINEConfig
    from shine_mapping_tpu.data.dataset import LiDARDataset
    from shine_mapping_tpu.cli.common import build_grid
    from experiments.demo_tpu_kitti_scale import CFG_TMPL

    log(f"devices: {jax.devices()}")
    out = tempfile.mkdtemp(prefix="dataphase_")
    root = os.path.join(out, "kitti")
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    n_frames = int(os.environ.get("SHINE_DATAPHASE_FRAMES", "20"))
    synth_city.make_city_dataset(root, n_frames=n_frames, seed=0)
    log(f"dataset written in {time.perf_counter() - t0:.1f}s")

    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CFG_TMPL.format(out=out, root=root, vox=0.05, leaf=0.2,
                                world_level=12, iters=20000, bs=4096,
                                mc_res=0.2, max_pool=1 << 22))
    cfg = SHINEConfig()
    cfg.load(cfg_path)

    # sequential, staged
    ds = LiDARDataset(cfg, build_grid(cfg))
    t_load = t_int = 0.0
    for fid in ds.frame_ids():
        t0 = time.perf_counter()
        prep = ds.load_and_sample(fid)
        t1 = time.perf_counter()
        ds._integrate_frame(prep, False)
        t2 = time.perf_counter()
        t_load += t1 - t0
        t_int += t2 - t1
    log(f"sequential: load_and_sample {t_load:.1f}s  integrate {t_int:.1f}s "
        f"({(t_load + t_int) / n_frames:.2f}s/frame)  pool {len(ds.pool)}")

    # pipelined (fresh dataset/grid), the driver's path, in 10-frame
    # strides to expose the growth curve (pool concat / capacity doubles)
    ds2 = LiDARDataset(cfg, build_grid(cfg))
    t0 = time.perf_counter()
    fids = list(ds2.frame_ids())
    for s0 in range(0, len(fids), 10):
        t1 = time.perf_counter()
        ds2.process_frames_pipelined(fids[s0:s0 + 10], cfg.num_workers)
        log(f"  frames {s0}-{s0 + 9}: {time.perf_counter() - t1:.1f}s "
            f"pool {len(ds2.pool)}")
    log(f"pipelined({cfg.num_workers}): {time.perf_counter() - t0:.1f}s  "
        f"pool {len(ds2.pool)}")


if __name__ == "__main__":
    main()
