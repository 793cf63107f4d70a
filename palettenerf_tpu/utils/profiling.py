"""Profiling / tracing utilities (aux subsystem, SURVEY.md §5).

The reference has only ad-hoc CUDA-event timers in its GUIs (palette/gui.py:122-134).
Here: ``jax.profiler`` trace capture (TensorBoard-viewable), a phase timer with correct
device synchronization (scalar readback — ``block_until_ready`` is unreliable through
tunneled TPU platforms), and per-step rate reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import numpy as np


def device_sync(x) -> None:
    """Reliably wait for device work producing ``x`` (host readback)."""
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


class PhaseTimer:
    """Accumulates wall-clock per named phase; ``report()`` gives ms + share."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                device_sync(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:24s} {t*1000:9.1f} ms  ({t/total*100:5.1f}%)  x{n}  "
                f"{t/n*1000:8.2f} ms/call"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/palettenerf_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard (Profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
