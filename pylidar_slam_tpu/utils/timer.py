"""Timing & profiling utilities (replaces the reference's dead
slam/common/timer.py which used the removed time.clock -- SURVEY.md 5.1).

* ``Duration`` / ``timer`` -- wall-clock scopes with aggregation.
* ``device_timer`` -- a scope that REALLY synchronizes the device before
  stopping (``np.asarray`` of a fresh result; ``block_until_ready`` does not
  synchronize through tunneled TPU backends).
* ``trace`` -- wraps ``jax.profiler.trace`` for TensorBoard-viewable traces.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class Duration:
    """Aggregates elapsed seconds per named scope."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(f"{name}: total {self.totals[name]:.3f}s over "
                         f"{self.counts[name]} calls "
                         f"({1000 * self.mean(name):.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def timer(name: str = "", log=print):
    start = time.perf_counter()
    yield
    log(f"[timer] {name}: {1000 * (time.perf_counter() - start):.2f} ms")


@contextlib.contextmanager
def device_timer(name: str = "", sync_array=None, log=print):
    """Times a scope including device completion of `sync_array` (or the
    value set on the context object's .sync attribute inside the scope)."""

    class _Ctx:
        sync = sync_array

    ctx = _Ctx()
    start = time.perf_counter()
    yield ctx
    if ctx.sync is not None:
        np.asarray(ctx.sync)  # real sync point
    log(f"[device_timer] {name}: {1000 * (time.perf_counter() - start):.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
