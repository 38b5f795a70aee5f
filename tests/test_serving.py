"""ServingPipeline: pipelined dispatch must be a pure reordering of work —
bit-identical results, strict submission order, bounded in-flight depth."""

import numpy as np

import jax
import jax.numpy as jnp

from robocupvision_tpu.utils.serving import ServingPipeline


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((4, 6, 3)).astype(np.float32)
            for _ in range(n)]


def test_pipeline_matches_serial_and_preserves_order():
    @jax.jit
    def fn(x):
        return jnp.tanh(x).sum(axis=-1)

    frames = _frames(9)
    serial = [np.asarray(fn(f)) for f in frames]
    for depth in (1, 2, 4, 16):  # incl. depth > n
        pipe = ServingPipeline(fn, depth=depth)
        got = list(pipe.map(frames))
        assert len(got) == len(frames)
        for s, g in zip(serial, got):
            np.testing.assert_array_equal(s, g)
        assert len(pipe) == 0  # fully drained


def test_pipeline_depth_bounds_inflight_and_flush_drains():
    @jax.jit
    def fn(x):
        return x * 2

    pipe = ServingPipeline(fn, depth=2)
    frames = _frames(5)
    ready = []
    for i, f in enumerate(frames):
        got = pipe.submit(f)
        assert len(pipe) <= 2
        if i < 2:
            assert got is None  # pipeline still filling
        else:
            ready.append(got)
    ready.extend(pipe.flush())
    assert len(ready) == 5 and len(pipe) == 0
    for f, g in zip(frames, ready):
        np.testing.assert_array_equal(np.asarray(f) * 2, g)


def test_pipeline_host_postprocess_and_pytree_outputs():
    @jax.jit
    def fn(x):
        return {"a": x * 2, "b": (x.sum(),)}

    # *2 then /2 is exact in float32, so the round trip must be bit-equal
    pipe = ServingPipeline(fn, depth=2,
                           host_postprocess=lambda out: out["a"] / 2)
    frames = _frames(4)
    got = list(pipe.map(frames))
    assert len(got) == 4
    for f, g in zip(frames, got):
        np.testing.assert_array_equal(g, f)
