"""Experiment setup: run directories, seeding, timing.

Parity target: reference ``setup_experiment`` (utils/tools.py:23-54) —
timestamped run dir with mesh/map/model subfolders and config provenance
copy — plus a device-synchronized timer replacing the reference's
``torch.cuda.synchronize`` timer (utils/tools.py:232-237).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime

import numpy as np


def setup_experiment(config, config_file: str | None = None, rank: int = 0) -> str:
    ts = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run_name = f"{config.name}_{ts}"
    if rank:  # non-primary processes keep their artifacts separate
        run_name += f"_rank{rank}"
    run_path = os.path.join(config.output_root or ".", run_name)
    for sub in ("", "mesh", "map", "model"):
        os.makedirs(os.path.join(run_path, sub), mode=0o755, exist_ok=True)
    if config_file and os.path.exists(config_file):
        shutil.copy2(config_file, run_path)
    np.random.seed(config.seed)
    return run_path


def get_time(*arrays) -> float:
    """Wall time after blocking on any pending device work for ``arrays``.

    The reference synchronizes CUDA before timing (utils/tools.py:232-237);
    here we block on the given jax arrays (or skip if none — host timing).
    """
    import jax

    for a in arrays:
        jax.block_until_ready(a)
    return time.time()
