"""Stage timing + GFLOPS reporting.

Rebuilds the reference's SpGEMM profiling surface (mm/inc/Timings.h:4-24,
mm/src/Timings.cpp:33-64: per-stage milliseconds plus total GFLOPS) as a
context-manager based recorder, and adds device-safe timing (blocks on the
result before reading the clock — the TPU analog of the rdtsc clock in
mm/inc/common.h:18-48).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional

import jax


class Timings:
    """Accumulates named stage durations; prints a Timings.cpp-style report."""

    def __init__(self, name: str = ""):
        self.name = name
        self.stages: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, *, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                # value-forcing sync (obs/devtime): block_until_ready is
                # not honored by the axon remote tunnel
                from g4s_tpu.obs.devtime import fetch_sync
                fetch_sync(block_on)
            self.stages[name] = self.stages.get(name, 0.0) + \
                (time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self, *, flops: Optional[int] = None) -> str:
        lines = [f"=== Timings {self.name} ==="]
        for k, v in self.stages.items():
            lines.append(f"  {k:<12s} {v * 1e3:10.3f} ms")
        lines.append(f"  {'total':<12s} {self.total * 1e3:10.3f} ms")
        if flops is not None and self.total > 0:
            lines.append(f"  GFLOPS {flops / self.total / 1e9:10.3f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        d = dict(self.stages)
        d["total"] = self.total
        return d


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context — the rebuild's analog of the reference's
    TF timeline profiling (deepmd trainer.py:407-408,859) and rdtsc probes;
    view with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ConvergenceLog:
    """Per-iteration convergence reporting (the reference's
    print_convergence_progress lines, Stokes_flow_Incomp.c:129-148)."""

    def __init__(self, path=None):
        self.rows = []
        self.path = path

    def record(self, step: int, **metrics):
        self.rows.append((step, dict(metrics)))
        if self.path:
            with open(self.path, "a") as f:
                vals = " ".join(f"{k}={v:.6e}" for k, v in metrics.items())
                f.write(f"{step} {vals}\n")

    def last(self):
        return self.rows[-1] if self.rows else None
