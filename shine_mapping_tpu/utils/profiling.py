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


def live_device_bytes() -> int:
    """Per-device live-buffer accounting: the MAX over addressable devices
    of the summed sizes of all live ``jax.Array`` shards resident there.

    The axon tunnel plugin's ``Device.memory_stats()`` returns ``{}``, so
    peak-HBM telemetry falls back to this host-side census.  It counts
    PERSISTENT residency only (arrays alive in Python — tables, pools,
    window stacks, moments); scratch inside a jitted dispatch is invisible
    host-side, so treat it as a lower bound on the true high-water mark.
    """
    per_dev: Dict[object, int] = defaultdict(int)
    for a in jax.live_arrays():
        try:
            for sh in a.addressable_shards:
                per_dev[sh.device] += sh.data.nbytes
        except Exception:  # deleted/donated arrays may race the census
            pass
    return max(per_dev.values(), default=0)


class HbmMonitor:
    """Peak-HBM high-water tracking across a driver run.

    Prefers the runtime's ``memory_stats()`` (``peak_bytes_in_use``) when
    the platform provides it; otherwise records the running max of
    :func:`live_device_bytes` sampled at phase boundaries.  Drivers call
    :meth:`sample` after upload / precompute / each training chunk / mesh,
    and :meth:`report` at the end (recorded into demo JSONs — the OOM
    guard ``trainer.estimate_windows_bytes`` is validated against this).
    """

    def __init__(self) -> None:
        self.peak_live = 0
        self.samples: Dict[str, int] = {}

    def sample(self, tag: str = "") -> int:
        b = live_device_bytes()
        self.peak_live = max(self.peak_live, b)
        if tag:
            self.samples[tag] = max(self.samples.get(tag, 0), b)
        return b

    def report(self) -> Dict[str, object]:
        out: Dict[str, object] = {
            "peak_live_bytes": int(self.peak_live),
            "peak_live_gb": round(self.peak_live / 2**30, 3),
            "samples_gb": {
                k: round(v / 2**30, 3) for k, v in self.samples.items()
            },
        }
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if k in ms:
                    out[k] = int(ms[k])
        except Exception:
            pass
        return out


# the most recent driver-run monitor (demos read it after an in-process run)
last_hbm_monitor: Optional[HbmMonitor] = None


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
