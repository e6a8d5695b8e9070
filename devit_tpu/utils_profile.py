"""Profiling / tracing hooks (SURVEY.md §5.1 — the reference has only
wall-clock prints; we add real tracing on top of the same step-timing meters).

Usage:
    with trace("/tmp/devit-trace"):
        run_steps()
    # -> open in TensorBoard / Perfetto (xplane files)

    timer = StepTimer()
    for batch in ...:
        with timer:
            step(...)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; falls back to a no-op if the backend
    doesn't support profiling (e.g. the tunneled axon platform)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Wall-clock step timer with percentile summary (the TPU-side analogue of
    MetricLogger's iter/data times, dist_utils.py:114-158)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        a = np.asarray(self.times[1:] or self.times)  # drop compile step
        return (
            f"steps={len(self.times)} mean={a.mean()*1e3:.1f}ms "
            f"p50={np.percentile(a,50)*1e3:.1f}ms p95={np.percentile(a,95)*1e3:.1f}ms"
        )


def device_memory_stats() -> Optional[dict]:
    """Best-effort live/peak HBM bytes (torch.cuda.max_memory_allocated
    analogue, dist_utils.py:152-156)."""
    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                if k in stats}
    except Exception:
        return None
