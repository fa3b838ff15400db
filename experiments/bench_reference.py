"""MEASURE the reference implementation (replaces round-1's estimate).

Runs /root/reference's own FeatureOctree / Decoder / loss code (kaolin
shimmed, torch CPU — no CUDA, kaolin, or Open3D exists in this image and
there is no network egress to fetch MaiCity) on the SAME MaiCity-scale
synthetic terrain world bench.py uses (ICRA'23 config shapes: bs 8192,
world level 12, 3 featured levels, ~3.2M corners/level).

Reported rows:
  t_get_indices : the reference's per-iteration HOST cost — Python-dict
      morton lookups + list->tensor conversion (its own "most
      time-consuming part", model/feature_octree.py:205-207).  This is a
      hard per-iteration floor on ANY GPU: it is synchronous and on the
      critical path (shine_batch.py:112-123).
  t_full_step   : the whole reference training iteration on torch CPU
      (get_indices + interp + MLP + BCE + backward + Adam).

Baseline derivation: ref_points_per_s = bs / t_get_indices — i.e. we grant
the reference an infinitely fast GPU that overlaps everything else.

  timeout 3000 python experiments/bench_reference.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from experiments import ref_harness


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fo, dec, loss_mod = ref_harness.load_reference()
    rng = np.random.default_rng(0)

    # SHINE_REF_WORLD=street measures the floor in the FOUND-dominated
    # regime (the street canyon bench.py's street_world rows use) so the
    # street vs_baseline divides by a denominator measured in ITS regime,
    # not the miss-dominated one (dict hits cost differently from misses)
    world = os.environ.get("SHINE_REF_WORLD", "bench")
    if world == "street":
        from bench import build_street_world

        _cfg, _grid, pool_np, n_pool_st = build_street_world()
        band = None  # grown from the pool's own band below
    # the exact world bench.py measures our implementation on
    n_surf = 400_000
    xy = rng.uniform(-0.9, 0.9, (n_surf, 2))
    z = 0.08 * np.sin(4 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    surf = np.stack([xy[:, 0], xy[:, 1], z], axis=1).astype(np.float32)
    if world == "street":
        # grow from the street pool's surface samples (weight > 0), the
        # same invariant the street world's grid was grown with
        band = pool_np.coord[pool_np.weight > 0].astype(np.float32)
    else:
        band = (surf + rng.normal(0, 0.003, surf.shape)).astype(np.float32)

    cfg = ref_harness.RefConfig(
        tree_level_world=12, tree_level_feat=3, leaf_vox_size=0.2
    )
    octree = fo.FeatureOctree(cfg)
    t0 = time.perf_counter()
    octree.update(torch.from_numpy(band))
    t1 = time.perf_counter()
    corners = [len(octree.corners_lookup_tables[12 - i]) for i in range(3)]
    log(f"reference octree built in {t1-t0:.1f}s; corners/level {corners}")

    geo = dec.Decoder(cfg, is_geo_encoder=True)
    opt = torch.optim.Adam(
        [{"params": octree.parameters(), "lr": 0.01},
         {"params": geo.parameters(), "lr": 0.01, "weight_decay": 1e-7}],
        betas=(0.9, 0.99), eps=1e-15,
    )

    bs = 8192
    if world == "street":
        # the street world's OWN pool (93% found, nuniq ~3)
        n_pool = min(500_000, n_pool_st)
        coord = np.asarray(pool_np.coord[:n_pool], np.float32)
        labels = np.asarray(pool_np.sdf_label[:n_pool], np.float32)
    else:
        n_pool = 500_000
        coord = np.repeat(band, 2, axis=0)[:n_pool]
        coord = (coord + rng.normal(0, 0.01, coord.shape)).astype(np.float32)
        labels = rng.normal(0, 0.01, n_pool).astype(np.float32)
    pool_c = torch.from_numpy(coord)
    pool_l = torch.from_numpy(labels)
    sigma = 0.055 * cfg.scale  # logistic_gaussian_ratio * sigma_sigmoid_m

    # --- host-only floor: get_indices (+ tensor conversion), as in the
    # reference hot loop (shine_batch.py:112-123 -> feature_octree:199-218)
    n_iters = 20
    ts = []
    for it in range(n_iters + 2):
        idx = torch.randint(0, n_pool, (bs,))
        batch = pool_c[idx]
        t0 = time.perf_counter()
        _ = octree.get_indices(batch)
        t1 = time.perf_counter()
        if it >= 2:
            ts.append(t1 - t0)
    t_get = float(np.median(ts))
    log(f"get_indices: {t_get*1e3:.1f} ms/iter (bs {bs} x 3 levels)")

    # --- full reference training iteration on torch CPU
    ts = []
    for it in range(n_iters + 2):
        idx = torch.randint(0, n_pool, (bs,))
        batch = pool_c[idx]
        lab = pool_l[idx]
        t0 = time.perf_counter()
        feat = octree.query_feature(batch)
        pred = geo.sdf(feat)
        l = loss_mod.sdf_bce_loss(pred, lab, sigma, None, "mean")
        opt.zero_grad(set_to_none=True)
        l.backward()
        opt.step()
        t1 = time.perf_counter()
        if it >= 2:
            ts.append(t1 - t0)
    t_full = float(np.median(ts))
    log(f"full step (torch CPU): {t_full*1e3:.1f} ms/iter")

    out = {
        "world": world,
        "bs": bs,
        "corners_per_level": corners,
        "t_get_indices_ms": round(t_get * 1e3, 2),
        "t_full_step_cpu_ms": round(t_full * 1e3, 2),
        "ref_points_per_s_host_floor": round(bs / t_get, 1),
        "ref_points_per_s_cpu_full": round(bs / t_full, 1),
    }
    print(json.dumps(out))
    name = ("ref_baseline.json" if world == "bench"
            else f"ref_baseline_{world}.json")
    with open(os.path.join(os.path.dirname(__file__), name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
