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


def interval_union_length(spans: list) -> float:
    """Total length covered by (start, end) intervals, overlaps counted
    once. Device-trace events can nest (module spans enclose op spans)
    and overlap across lanes — summing durations double-counts, and the
    [first start, last end] wall span counts idle gaps (which, for sub-ms
    graphs dispatched at the tunnel's ~0.5 ms/dispatch cadence, would
    report dispatch cadence instead of device time)."""
    if not spans:
        return 0.0
    spans = sorted(spans)
    busy = 0.0
    cur_a, cur_b = spans[0]
    for a, b in spans[1:]:
        if a > cur_b:
            busy += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    return busy + (cur_b - cur_a)


def device_busy_span_us(run: Callable[[], None],
                        min_events: int) -> Optional[float]:
    """Device-track busy span of ``run()`` in microseconds, or None.

    Ground truth for rates over the axon tunnel (PERF.md "phantom
    timings": wall clocks carry RTT/dispatch noise; only the profiler's
    device track is trustworthy). Executes ``run`` — which must itself
    end with a value fetch so the device work is complete — under
    jax.profiler.trace, then parses the trace for the device process's
    busy time: the UNION length of its event intervals, not the
    [first start, last end] wall span — a sub-ms graph dispatched at the
    tunnel's ~0.5 ms/async-dispatch cadence leaves the device idle
    between frames, and the wall span would report dispatch cadence
    (~2x high) instead of device time. Returns None when tracing or
    parsing fails, or fewer than ``min_events`` device events landed
    (callers fall back to their wall number).
    """
    import glob
    import gzip
    import json
    import os
    import tempfile

    import jax

    try:
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                run()
            files = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                              recursive=True)
            if not files:
                return None
            with gzip.open(files[0], "rt") as f:
                trace = json.load(f)
        ev = trace.get("traceEvents", [])
        pid_names = {e["pid"]: str(e.get("args", {}).get("name", ""))
                     for e in ev
                     if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pids = {p for p, nm in pid_names.items()
                    if ("TPU" in nm or "/device" in nm)
                    and "host" not in nm.lower()}
        spans = [(e["ts"], e["ts"] + e.get("dur", 0.0)) for e in ev
                 if e.get("ph") == "X" and e.get("pid") in dev_pids]
        if len(spans) < min_events:
            return None
        busy = interval_union_length(spans)
        return busy if busy > 0 else None
    except Exception:
        return None


def flops_report(model, params=None, pruned: bool = False) -> str:
    """Analytic per-layer op counts for supported families (ROBO-UNet)."""
    from robocupvision_tpu.models import zoo

    if model.family != "robo_unet":
        return f"(no analytic FLOPs model for family {model.family})"
    comp = zoo.robo_unet_get_computations(model.cfg, params, pruned)
    lines = [f"  layer {i:2d}: {c / 1e6:9.2f} MFLOPs" for i, c in enumerate(comp)]
    lines.append(f"  total   : {sum(comp) / 1e6:9.2f} MFLOPs")
    return "\n".join(lines)
