"""Profiler hooks + roofline accounting (SURVEY §5 rebuild guidance).

The reference's observability is stage timers (mm/inc/Timings.h), rdtsc
clocks (mm/inc/common.h:18-48) and read-bandwidth probes
(mm/inc/outer_mult.h:41-171). The TPU equivalents here:

  * `trace(logdir)` — context manager around jax.profiler for on-device
    timeline capture (view with tensorboard / xprof);
  * `roofline(...)` — converts a measured kernel time plus its byte/flop
    footprint into achieved bandwidth/throughput and the fraction of the
    hardware roofline, stating which resource bounds the kernel;
  * PEAKS — per-platform peak numbers used as roofline denominators.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

# (HBM GB/s, bf16 TFLOP/s, f32 TFLOP/s) per TPU generation
PEAKS = {
    "v5e": {"hbm_gbs": 819.0, "bf16_tflops": 394.0, "f32_tflops": 98.5},
    "v5p": {"hbm_gbs": 2765.0, "bf16_tflops": 459.0, "f32_tflops": 114.75},
    "v4": {"hbm_gbs": 1228.0, "bf16_tflops": 275.0, "f32_tflops": 68.75},
    "cpu": {"hbm_gbs": 50.0, "bf16_tflops": 1.0, "f32_tflops": 1.0},
}


def detect_platform() -> str:
    import jax
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    return "cpu"


def roofline(*, seconds: float, bytes_moved: int = 0, flops: int = 0,
             dtype: str = "f32", platform: Optional[str] = None) -> dict:
    """Achieved vs peak for one measured kernel invocation.

    Returns a dict with achieved GB/s and GFLOP/s, the roofline fractions,
    and which resource binds ('memory' when arithmetic intensity is below
    the machine balance point, else 'compute')."""
    plat = platform or detect_platform()
    pk = PEAKS.get(plat, PEAKS["cpu"])
    peak_flops = pk["bf16_tflops"] if dtype == "bf16" else pk["f32_tflops"]
    gbs = bytes_moved / seconds / 1e9 if bytes_moved else 0.0
    gfs = flops / seconds / 1e9 if flops else 0.0
    ai = flops / bytes_moved if bytes_moved else float("inf")
    balance = peak_flops * 1e3 / pk["hbm_gbs"]       # flop/byte
    return {
        "platform": plat,
        "seconds": seconds,
        "achieved_gbs": round(gbs, 2),
        "achieved_gflops": round(gfs, 2),
        "frac_hbm_roofline": round(gbs / pk["hbm_gbs"], 4),
        "frac_compute_roofline": round(gfs / (peak_flops * 1e3), 4),
        "arithmetic_intensity": round(ai, 3) if ai != float("inf") else None,
        "bound": "memory" if ai < balance else "compute",
    }


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(out: dict, key: str):
    """Wall-clock a block (device work must be blocked by the caller)."""
    t0 = time.perf_counter()
    yield
    out[key] = time.perf_counter() - t0
