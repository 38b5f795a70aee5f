"""Software-pipelined serving loop for remote-accelerator deployments.

The reference's serving shape is strictly serial: one frame in, wait, one
label map out (tester.py:142-144 wraps each forward in its own timer). On a
locally-attached device that is fine; on a remote-dispatch transport (the
axon TPU tunnel here, or any networked accelerator) every frame then pays
dispatch RTT + device compute + result readback *in sequence*, and the
wire dominates: the measured serial serving rate over this tunnel is
~25 fps while the device itself sustains ~1900 fps (PERF.md).

JAX dispatch is asynchronous: ``device_fn(x)`` returns a future-like Array
immediately; only the host fetch blocks. ``ServingPipeline`` exploits that
to keep ``depth`` frames in flight — frame t's readback overlaps frame
t+1's dispatch and compute — so steady-state throughput approaches
max(readback, compute) instead of their sum, while per-frame results still
come back strictly in submission order. Latency per frame rises by up to
``depth`` frame-times; depth=2 (the default) is the classic double-buffer.

This is a framework extension (no reference counterpart) used by
``cli/tester.py --pipeline`` and the serving benchmarks.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class ServingPipeline:
    """Keep up to ``depth`` inference calls in flight, returning results in
    submission order.

    ``device_fn``: a (jitted) function frame -> device output (any pytree).
    ``host_postprocess``: optional host-side fn applied to the fetched
    result (e.g. the packed-label numpy unpack from
    ``PackedInfer.infer_u8_packed``).
    """

    def __init__(self, device_fn: Callable, *,
                 host_postprocess: Optional[Callable] = None, depth: int = 2):
        assert depth >= 1, depth
        self.device_fn = device_fn
        self.host_postprocess = host_postprocess
        self.depth = depth
        self._inflight: deque = deque()

    def __len__(self) -> int:
        return len(self._inflight)

    def _fetch(self) -> Any:
        out = jax.device_get(self._inflight.popleft())
        if self.host_postprocess is not None:
            out = self.host_postprocess(out)
        return out

    def submit(self, frame) -> Optional[Any]:
        """Dispatch ``frame``; if the pipeline is full, block on (and
        return) the OLDEST in-flight result, else return None. The first
        ``depth`` submissions therefore return None — drain with
        :meth:`flush` at end of stream."""
        self._inflight.append(self.device_fn(frame))
        if len(self._inflight) > self.depth:
            return self._fetch()
        return None

    def flush(self) -> list:
        """Fetch every remaining in-flight result, oldest first."""
        out = []
        while self._inflight:
            out.append(self._fetch())
        return out

    def map(self, frames: Iterable) -> Iterator:
        """Stream ``frames`` through the pipeline, yielding one result per
        frame in order."""
        for frame in frames:
            got = self.submit(frame)
            if got is not None:
                yield got
        yield from self.flush()
