"""Multi-controller (2-process jax.distributed) test on localhost CPU.

Launches two real processes, each with 4 virtual CPU devices, that bring up
``jax.distributed`` through the driver's ``tpu:`` config knobs and run the
REAL batch driver end-to-end over the resulting 8-device global mesh.
Verifies both processes converge on identical losses (replicated-state
consistency) and that only the primary writes artifacts.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests import synth

_CHILD = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
root = sys.argv[3]; out = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shine_mapping_tpu.config import SHINEConfig
from shine_mapping_tpu.cli.shine_batch import run_shine_mapping_batch

cfg = SHINEConfig()
cfg.name = "mh"
cfg.output_root = out
cfg.pc_path = root + "/velodyne"
cfg.pose_path = root + "/poses.txt"
cfg.calib_path = root + "/calib.txt"
cfg.begin_frame, cfg.end_frame, cfg.every_frame = 0, 100, 1
cfg.first_frame_ref = False
cfg.pc_radius, cfg.min_range, cfg.min_z = 20.0, 0.5, -3.0
cfg.rand_downsample = False; cfg.vox_down_m = 0.12
cfg.tree_level_world, cfg.tree_level_feat, cfg.leaf_vox_size = 9, 3, 0.5
cfg.bs, cfg.iters, cfg.lr, cfg.scan_chunk = 1024, 60, 0.02, 30
cfg.save_freq_iters = cfg.vis_freq_iters = 0
cfg.mesh_freq_frame = 1000
cfg.surface_sample_n, cfg.free_sample_n = 3, 2
cfg.o3d_vis_on = cfg.wandb_vis_on = False
cfg.continual_learning_reg = cfg.window_replay_on = False
cfg.init_node_capacity = cfg.init_corner_capacity = 1 << 13
cfg.init_pool_capacity = 1 << 17
# multi-host knobs (the thing under test)
cfg.coordinator = f"localhost:{port}"
cfg.num_processes = 2
cfg.process_id = rank
cfg.derive()

run_path, grid, params = run_shine_mapping_batch(cfg=cfg)
print("CHILD_DONE", rank, run_path, flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("SHINE_SKIP_MULTIHOST") == "1",
    reason="multihost test disabled",
)
def test_two_process_distributed_batch_driver(tmp_path):
    root = str(tmp_path / "world")
    synth.make_kitti_dataset(root, n_frames=3)
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    script = str(tmp_path / "child.py")
    with open(script, "w") as f:
        f.write(_CHILD)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(r), str(port), root, out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out_b, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out_b.decode())
    for r, (p, text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{text[-3000:]}"
        assert f"CHILD_DONE {r}" in text

    # locate the two run dirs; both log the (replicated) losses
    runs = sorted(os.listdir(out))
    assert len(runs) == 2
    rank_dirs = {1 if "rank1" in d else 0: os.path.join(out, d) for d in runs}
    losses = {}
    for r, d in rank_dirs.items():
        with open(os.path.join(d, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        losses[r] = [rec["loss/total_loss"] for rec in recs]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    assert losses[0][-1] < losses[0][0]
    # only the primary writes model artifacts
    assert os.path.exists(os.path.join(rank_dirs[0], "model", "model_final.npz"))
    assert not os.path.exists(os.path.join(rank_dirs[1], "model", "model_final.npz"))
