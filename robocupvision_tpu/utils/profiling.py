"""Profiling helpers: device traces + the analytic FLOPs report.

The reference's performance surface is wall-clock per-forward timing
(tester.py:142-144) plus the analytic ``get_computations`` op counts
(model.py:513-536). This module keeps both and adds jax.profiler traces for
real device timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 50, warmup: int = 2) -> float:
    """Average seconds per call, with device completion barriers."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_report(model, params=None, pruned: bool = False) -> str:
    """Analytic per-layer op counts for supported families (ROBO-UNet)."""
    from robocupvision_tpu.models import zoo

    if model.family != "robo_unet":
        return f"(no analytic FLOPs model for family {model.family})"
    comp = zoo.robo_unet_get_computations(model.cfg, params, pruned)
    lines = [f"  layer {i:2d}: {c / 1e6:9.2f} MFLOPs" for i, c in enumerate(comp)]
    lines.append(f"  total   : {sum(comp) / 1e6:9.2f} MFLOPs")
    return "\n".join(lines)
