"""Phase timing and device tracing.

Replaces the reference's manual ``torch.cuda.synchronize`` timers
(utils/tools.py:232-237) and wandb phase logs (shine_batch.py:220-225) with
a device-synced ``PhaseTimer`` plus an optional ``jax.profiler`` trace
context for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall time per named phase, syncing on given arrays.

    Usage:
        timer = PhaseTimer()
        with timer.phase("load"):
            batch = ...
        with timer.phase("train", sync=loss):
            ...
        timer.summary()  # {'load': 0.01, 'train': 1.2}
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def means(self) -> Dict[str, float]:
        return {k: v / max(self.counts[k], 1) for k, v in self.totals.items()}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
