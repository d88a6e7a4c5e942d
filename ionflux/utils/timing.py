"""Structured per-stage timing and solve-throughput metering.

The reference's only instrumentation is an ad-hoc wall-clock probe around one
error evaluation (train-d0.py:513-519) and 400-iter progress prints.  Here:
a context-manager stage timer with a report, and a solves/sec meter for the
BASELINE throughput metric.  ``jax.profiler.trace`` can wrap any stage for
full TPU traces.

Caveat (remote axon backend): ``block_until_ready`` on one output of a
MULTI-output executable has been observed to return before the work runs
(bench.py round-4 capture bug).  When timing over that backend, prefer a
scalar-output jit or sync with a value fetch (``np.asarray``); single-array
outputs behave correctly (verified block == fetch on the solve kernels).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall time per named stage (device-synchronised)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{name:>24s}: {tot:8.3f}s over {self.counts[name]} calls"
                 for name, tot in sorted(self.totals.items(),
                                         key=lambda kv: -kv[1])]
        return "\n".join(lines)


def solves_per_sec(fn, *args, n_solves: int, reps: int = 5,
                   warmup: int = 1) -> float:
    """Measure steady-state whole-solve throughput of a compiled callable."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return n_solves * reps / (time.perf_counter() - t0)
