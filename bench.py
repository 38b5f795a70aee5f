"""Benchmark: the reference's headline metric on real TPU hardware.

Measures ROBO-UNet 480x640 (--noScale, tester.py-style) segmentation
inference on one chip — bf16 batch-1 latency-mode fps as the headline, plus
batched throughput, serving-loop rate, and train steps/sec at the train.py
default config — and prints a cumulative JSON line after every stage (the
LAST stdout line is always the most complete report, even if the process
is killed mid-run):

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.md north star >30 fps per chip at 640x480.

Budget discipline (the round-2 bench timed out under the driver and captured
nothing — VERDICT.md #1): the WHOLE script runs under a hard wall-clock
deadline (BENCH_DEADLINE_SECS, default 780 s). The headline stage runs
FIRST; each stage gets a budget carved from the remaining time; stages print
cumulative STAGE_RESULT lines after every sub-measurement so a mid-stage
kill loses only the measurement in flight; failed/skipped stages are
reported as explicit markers (never a fake 0.0); and the final JSON line is
ALWAYS printed, whatever happened before it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

_T0 = time.monotonic()
_DEADLINE = float(os.environ.get("BENCH_DEADLINE_SECS", "780"))
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/root/repo/.jax_bench_cache")
_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "docs", "last_good_bench.json")


def _left() -> float:
    """Seconds left in this process's budget (parent: global deadline;
    stage child: the budget the parent granted via env)."""
    limit = float(os.environ.get("BENCH_STAGE_BUDGET", _DEADLINE))
    return limit - (time.monotonic() - _T0)


def _time(fn, *args, iters=100):
    """Median of 3 timed runs, synchronized by FETCHING a scalar derived from
    the last output — block_until_ready can return before execution completes
    on the axon transport (see PERF.md "phantom timings"), so only a D2H
    fetch is a trustworthy barrier. The single ~29 ms fetch RTT inside each
    window biases fps DOWN by <= RTT/window — conservative, never flattering.
    """
    import numpy as np

    import jax.numpy as jnp

    y = fn(*args)
    np.asarray(jnp.ravel(y)[0])  # warm + first-fetch stall out of the way

    # Probe to scale the iteration count DOWN if a window would exceed
    # ~4 s (a CPU dry run is ~100x slower per call than the chip; the
    # driver budget must hold there too). The probe window includes ONE
    # sync fetch (~29 ms RTT over the tunnel), which would dominate a
    # 3-call probe of a sub-ms graph and silently clamp the wide windows
    # back to ~0.1-0.25 s — so when the 3-call estimate looks
    # RTT-dominated, re-probe with 30 calls to amortize the fetch.
    t0 = time.perf_counter()
    for _ in range(3):
        y = fn(*args)
    np.asarray(jnp.ravel(y)[0])
    per_call = (time.perf_counter() - t0) / 3
    if per_call < 0.05:  # fast graph: the estimate is mostly fetch RTT
        t0 = time.perf_counter()
        for _ in range(30):
            y = fn(*args)
        np.asarray(jnp.ravel(y)[0])
        per_call = (time.perf_counter() - t0) / 30
    if per_call * iters > 4.0:
        iters = max(3, int(4.0 / per_call))

    def once():
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        np.asarray(jnp.ravel(y)[0])
        return (time.perf_counter() - t0) / iters

    return sorted(once() for _ in range(3))[1]


def _emit(out: dict):
    """Print the cumulative stage result; the parent keeps the LAST line, so
    a later timeout/kill still preserves everything emitted so far."""
    import numpy as _np

    print("STAGE_RESULT:" + json.dumps(
        out, default=lambda o: float(o) if isinstance(o, _np.floating) else o),
        flush=True)


# ---------------------------------------------------------------------------
# stages (each runs in its own child interpreter)
# ---------------------------------------------------------------------------


def bench_vga_inference():
    """Headline stage. Sub-measurements ordered by importance; optional ones
    run only while stage budget remains."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robocupvision_tpu.models import packed, zoo

    model = zoo.make("robo_unet", no_scale=True)
    params = model.init(jax.random.PRNGKey(0))
    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3), jnp.float32)
    x4 = jax.random.normal(jax.random.PRNGKey(1), (4, 480, 640, 3), jnp.float32)
    out = {"backend": jax.default_backend()}

    # 1. lane-packed bf16 batch-1 (exact rewrite; PERF.md) — THE headline.
    # iters sized so each timed window is ~0.4-0.6 s: the window's one sync
    # fetch (~29 ms tunnel RTT) then biases fps down by <10% instead of the
    # 20-30% seen at 200-iter windows (and run-to-run RTT variance shrinks
    # with it). The _time probe still scales iters down on slow backends.
    pi = packed.build_packed_infer(model, params, dtype=jnp.bfloat16)
    pfn = jax.jit(pi.infer)
    out["fps_packed_bf16_b1"] = 1.0 / _time(pfn, x1, iters=600)
    _emit(out)

    # 2. packed batched throughput
    if _left() > 60:
        out["fps_packed_bf16_b4_throughput"] = 4.0 / _time(pfn, x4, iters=200)
        _emit(out)

    # 2b. b8 throughput + 8-way data-parallel estimate (VERDICT r4 #8): the
    # MFU analysis (PERF.md) says the packed graph is fixed-cost/padded-byte
    # bound at b1 — batch is the remaining headroom axis. The dp8 row is an
    # EXTRAPOLATION (single-chip b8 x 8 replicas): serving replicates the
    # weights and shards the batch with no cross-device traffic, so per-chip
    # throughput is flat in N; MULTICHIP_r*.json proves the 8-way sharded
    # graph itself compiles+runs on the virtual mesh.
    if _left() > 60:
        x8 = jax.random.normal(jax.random.PRNGKey(2), (8, 480, 640, 3),
                               jnp.float32)
        b8 = 8.0 / _time(pfn, x8, iters=120)
        out["fps_packed_bf16_b8_throughput"] = b8
        out["fps_serving_dp8_x8chips_extrapolated"] = 8.0 * b8
        _emit(out)

    # 2c. deeper batch sweep (r5): throughput keeps climbing past b8 —
    # on-chip probe read b16 2748 / b32 3061 fps vs b1 2000 (1.53x) — so
    # the larger batches are the per-chip serving-throughput numbers worth
    # recording; dp8 extrapolation at the best measured batch included.
    if _left() > 75:
        for b, iters in ((16, 60), (32, 30)):
            xb = jax.random.normal(jax.random.PRNGKey(2),
                                   (b, 480, 640, 3), jnp.float32)
            out[f"fps_packed_bf16_b{b}_throughput"] = \
                float(b) / _time(pfn, xb, iters=iters)
            _emit(out)
        best = max(v for k, v in out.items()
                   if k.startswith("fps_packed_bf16_b")
                   and k.endswith("_throughput"))
        out["fps_serving_dp8_x8chips_extrapolated_best_batch"] = 8.0 * best
        _emit(out)

    # 3. standard (unpacked) graph for comparison
    def make_infer(dtype):
        @jax.jit
        def infer(params, x):
            logits, _ = model.apply(params, x.astype(dtype))
            return jnp.argmax(logits, axis=-1)
        return infer

    if _left() > 60:
        out["fps_bf16_b1_standard_graph"] = \
            1.0 / _time(make_infer(jnp.bfloat16), params, x1, iters=150)
        _emit(out)
    if _left() > 60:
        out["fps_f32_b1"] = 1.0 / _time(make_infer(jnp.float32), params, x1,
                                        iters=150)
        _emit(out)

    # Pallas fused-region variant of the headline graph (the r4 experiment:
    # ops/pallas_packed.py runs the packed top region as two VMEM-resident
    # chain kernels instead of separate XLA conv fusions + relayout copies).
    # Real-kernel path only: on a CPU dry run these would need interpret
    # mode, which measures the interpreter, not the kernel.
    on_tpu = jax.default_backend() == "tpu"
    if _left() > 60 and on_tpu:
        try:
            pip = packed.build_packed_infer(model, params,
                                            dtype=jnp.bfloat16, pallas=True)
            out["fps_packed_bf16_b1_pallas_fused"] = \
                1.0 / _time(jax.jit(pip.infer), x1, iters=600)
        except Exception as e:  # measured-negative must not kill the stage
            out["pallas_fused_error"] = repr(e)[:200]
        _emit(out)
    if _left() > 60 and on_tpu:
        try:  # ablation: also fold the stem conv into the down chain
            pis = packed.build_packed_infer(model, params,
                                            dtype=jnp.bfloat16, pallas=True,
                                            pallas_fold_stem=True)
            out["fps_packed_bf16_b1_pallas_fused_stem"] = \
                1.0 / _time(jax.jit(pis.infer), x1, iters=600)
        except Exception as e:
            out["pallas_fused_stem_error"] = repr(e)[:200]
        _emit(out)
    if _left() > 60 and on_tpu:
        try:  # ablation: also fuse the deepest-grid belly region
            pid = packed.build_packed_infer(model, params,
                                            dtype=jnp.bfloat16, pallas=True,
                                            pallas_fold_stem=True,
                                            pallas_deep=True)
            out["fps_packed_bf16_b1_pallas_fused_deep"] = \
                1.0 / _time(jax.jit(pid.infer), x1, iters=600)
        except Exception as e:
            out["pallas_fused_deep_error"] = repr(e)[:200]
        _emit(out)
    if _left() > 60 and on_tpu:
        try:  # static int8 PTQ on the full chain graph (2x MXU peak);
            # agreement vs the float chains is computed ON DEVICE (one
            # scalar fetch — PERF.md #6: no bulk fetches before timing)
            piq = packed.quantize_int8(
                packed.build_packed_infer(model, params, dtype=jnp.bfloat16,
                                          pallas=True, pallas_fold_stem=True,
                                          pallas_deep=True), x1)
            out["fps_packed_bf16_b1_pallas_int8"] = \
                1.0 / _time(jax.jit(piq.infer), x1, iters=600)
            pid = packed.build_packed_infer(model, params,
                                            dtype=jnp.bfloat16, pallas=True,
                                            pallas_fold_stem=True,
                                            pallas_deep=True)
            out["pallas_int8_label_agreement"] = float(jax.jit(
                lambda v: jnp.mean((piq.infer(v) == pid.infer(v))
                                   .astype(jnp.float32)))(x1))
        except Exception as e:
            out["pallas_int8_error"] = repr(e)[:200]
        _emit(out)

    # QVGA flagship (tester.py's DEFAULT working resolution, scale=4)
    if _left() > 60:
        mq = zoo.make("robo_unet")
        pq = packed.build_packed_infer(mq, mq.init(jax.random.PRNGKey(0)),
                                       dtype=jnp.bfloat16)
        xq = jax.random.normal(jax.random.PRNGKey(1), (1, 120, 160, 3),
                               jnp.float32)
        out["fps_packed_qvga_b1"] = 1.0 / _time(jax.jit(pq.infer), xq,
                                                iters=800)
        _emit(out)

    # structured 50% channel prune (ops/slim.py) of the SAME flagship:
    # roughly half the MACs — read against fps_packed_bf16_b1 for the
    # dense-vs-slim serving delta (PERF.md r4 1d: sub-128 widths still pad
    # MXU lanes, so the gain is measured, not assumed)
    if _left() > 60:
        try:
            from robocupvision_tpu.ops import slim as slim_ops

            # HOST-side random params of the registry shapes — NEVER
            # np.asarray(device params) here: a bulk D2H before a timed
            # window degrades every subsequent dispatch in this process to
            # ~RTT (PERF.md #6). fps doesn't depend on weight values.
            p_np = zoo.random_host_params(model)
            masked, _ = slim_ops.prune_channels(
                p_np, slim_ops.channel_groups(model), 0.5, min_keep=8,
                round_to=8, verbose=False)
            sp, _ = slim_ops.compact(model, masked)
            psl = packed.build_packed_infer(
                model, {k: jnp.asarray(v) for k, v in sp.items()},
                dtype=jnp.bfloat16)
            out["fps_packed_bf16_b1_slim50"] = \
                1.0 / _time(jax.jit(psl.infer), x1, iters=600)
        except Exception as e:
            out["slim50_error"] = repr(e)[:200]
        _emit(out)

    # packed LabelProp (the temporal net validLabelProp.py latency-measures;
    # its 8-ch full-res input is the repo's worst lane-waste case)
    if _left() > 60:
        lp_model = zoo.make("label_prop")
        lp_params = lp_model.init(jax.random.PRNGKey(0))
        lp = packed.build_packed_label_prop(lp_model, lp_params, jnp.bfloat16)
        xlp = jax.random.normal(jax.random.PRNGKey(1), (1, 120, 160, 8),
                                jnp.float32)
        out["fps_label_prop_packed_qvga_b1"] = \
            1.0 / _time(jax.jit(lp.infer), xlp, iters=800)
        _emit(out)
        if _left() > 60 and on_tpu:
            try:  # Pallas fused-chain head-to-head (same graph)
                lpp = packed.build_packed_label_prop(
                    lp_model, lp_params, jnp.bfloat16, pallas=True,
                    pallas_fold_stem=True, pallas_mid=True)
                out["fps_label_prop_packed_qvga_b1_pallas"] = \
                    1.0 / _time(jax.jit(lpp.infer), xlp, iters=800)
            except Exception as e:
                out["label_prop_pallas_error"] = repr(e)[:200]
            _emit(out)

    # LAST: serving-loop rates. These do bulk device->host label fetches,
    # which permanently degrade this process's subsequent per-dispatch
    # latency to ~RTT (PERF.md #6 / CLAUDE.md) — so every pure-dispatch
    # _time() measurement above must run before the first np.asarray here.
    # fps_serving_*: infer + full uint8 label readback per frame (the robot
    # consumes the mask on host; int32 readback would be 4x the bytes).
    pfn8 = jax.jit(pi.infer_u8)
    np.asarray(pfn8(x1))  # warm + first-fetch stall
    t0 = time.perf_counter()
    np.asarray(pfn8(x1))
    serve_iters = max(3, min(50, int(4.0 / max(time.perf_counter() - t0, 1e-4))))

    def serve_once():
        t0 = time.perf_counter()
        for _ in range(serve_iters):
            np.asarray(pfn8(x1))
        return serve_iters / (time.perf_counter() - t0)

    out["fps_serving_incl_u8_label_readback"] = \
        sorted(serve_once() for _ in range(3))[1]
    _emit(out)

    # end-to-end raw-frame serving: the robot ships its camera's uint8 RGB
    # (1/4 the f32 wire bytes; preprocessing runs on device as one fused
    # affine — models/packed.py infer_u8_io) and the loop pays H2D + infer
    # + uint8 label readback per frame. The f32-wire comparator ships the
    # host-preprocessed frame instead — same loop, 4x the input bytes.
    if _left() > 30:
        pio = jax.jit(pi.infer_u8_io)
        frame_u8 = (np.arange(480 * 640 * 3) % 251).astype(np.uint8) \
            .reshape(1, 480, 640, 3)
        np.asarray(pio(frame_u8))  # warm (numpy arg pays H2D per call)

        def serve_u8_wire_once():
            t0 = time.perf_counter()
            for _ in range(serve_iters):
                np.asarray(pio(frame_u8))
            return serve_iters / (time.perf_counter() - t0)

        out["fps_serving_e2e_u8_wire"] = \
            sorted(serve_u8_wire_once() for _ in range(3))[1]
        _emit(out)

        frame_f32 = np.asarray(x1)  # host-resident preprocessed frame
        f32_iters = max(3, serve_iters // 3)  # 4x the bytes: smaller window

        def serve_f32_wire_once():
            t0 = time.perf_counter()
            for _ in range(f32_iters):
                np.asarray(pfn8(frame_f32))
            return f32_iters / (time.perf_counter() - t0)

        out["fps_serving_e2e_f32_wire"] = \
            sorted(serve_f32_wire_once() for _ in range(3))[1]
        _emit(out)

    # serving via the packed-label output (no device-side depth-to-space;
    # host numpy unpack included in the timed loop — same wire bytes)
    if _left() > 30:
        device_fn, host_unpack = pi.infer_u8_packed()
        pfn8p = jax.jit(device_fn)
        host_unpack(pfn8p(x1))  # warm

        def serve_packed_once():
            t0 = time.perf_counter()
            for _ in range(serve_iters):
                host_unpack(pfn8p(x1))
            return serve_iters / (time.perf_counter() - t0)

        out["fps_serving_packed_label_output"] = \
            sorted(serve_packed_once() for _ in range(3))[1]
        _emit(out)

    # 4-bit label wire (two labels per byte packed ON DEVICE, host nibble
    # unpack in the timed loop): half the readback bytes of every u8 row —
    # the serving loop's honest ceiling on a bandwidth-limited transport
    # is the label wire, so this is the direct >30 fps lever (VERDICT r4
    # #3). Compare against fps_serving_incl_u8_label_readback.
    if _left() > 30:
        device_fn4, host_unpack4 = pi.infer_u4_packed()
        pfn4 = jax.jit(device_fn4)
        host_unpack4(pfn4(x1))  # warm

        def serve_u4_once():
            t0 = time.perf_counter()
            for _ in range(serve_iters):
                host_unpack4(pfn4(x1))
            return serve_iters / (time.perf_counter() - t0)

        out["fps_serving_incl_u4_label_readback"] = \
            sorted(serve_u4_once() for _ in range(3))[1]
        _emit(out)

    # pipelined serving (utils/serving.py): depth-4 in-flight window overlaps
    # dispatch + compute + label readback across frames — the serial loop
    # above pays RTT + wire per frame in sequence (the honest remote-
    # transport serving ceiling is the readback wire, not the device)
    if _left() > 30:
        from robocupvision_tpu.utils.serving import ServingPipeline

        def serve_pipelined_once():
            pipe = ServingPipeline(pfn8, depth=4)
            t0 = time.perf_counter()
            n = sum(1 for _ in pipe.map([x1] * serve_iters))
            return n / (time.perf_counter() - t0)

        serve_pipelined_once()  # warm the pipeline pattern
        out["fps_serving_pipelined_d4_u8_readback"] = \
            sorted(serve_pipelined_once() for _ in range(3))[1]
        _emit(out)

    # best-known serving combo: 4-bit wire + depth-4 pipelining
    if _left() > 30:
        from robocupvision_tpu.utils.serving import ServingPipeline

        device_fn4, host_unpack4 = pi.infer_u4_packed()
        pfn4 = jax.jit(device_fn4)

        def serve_pipe_u4_once():
            pipe = ServingPipeline(pfn4, host_postprocess=host_unpack4,
                                   depth=4)
            t0 = time.perf_counter()
            n = sum(1 for _ in pipe.map([x1] * serve_iters))
            return n / (time.perf_counter() - t0)

        serve_pipe_u4_once()  # warm
        out["fps_serving_pipelined_d4_u4_readback"] = \
            sorted(serve_pipe_u4_once() for _ in range(3))[1]
        _emit(out)
    return out


def _device_trace_steps_per_sec(step_fn, state, steps: int):
    """Ground-truth cross-check for the train rate (PERF.md: wall-clock over
    the axon tunnel carries RTT/dispatch noise; device traces are truth).
    Runs ``steps`` under jax.profiler.trace and derives steps/s from the
    device track's busy span. Returns None if tracing/parsing fails —
    the wall number still stands alone in that case."""
    from robocupvision_tpu.utils.profiling import device_busy_span_us

    def run():
        s = state
        for i in range(steps):
            s, m = step_fn(i, s)
        float(m["loss"])

    span_us = device_busy_span_us(run, steps)
    return steps / (span_us / 1e6) if span_us else None


def bench_train_steps():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep

    model = zoo.make("robo_unet")
    tx = optim.adam()
    b = 64  # train.py synthetic-pretrain default batch
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 120, 160, 3))
    targets = jnp.zeros((b, 120, 160), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    lr = jnp.float32(1e-3)

    # One throwaway fetch first: the axon tunnel's FIRST device->host copy
    # can stall for minutes (one-time); get it out of the timed region.
    jax.device_get(jnp.zeros(1))

    def measure(cfg, spread_out=None, keep=None):
        train_step = tstep.make_train_step(model, tx, cfg)
        state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
        state, out = train_step(state, imgs, targets, mask,
                                jax.random.PRNGKey(2), lr, None)
        float(out["loss"])
        t0 = time.perf_counter()
        state, out = train_step(state, imgs, targets, mask,
                                jax.random.PRNGKey(2), lr, None)
        float(out["loss"])
        per_step = time.perf_counter() - t0
        if per_step < 0.15:
            # the 1-step estimate is dominated by the ~29 ms sync-fetch RTT
            # (a real chip step is ~10-20 ms): amortize the fetch over 20
            # steps, else iters comes out ~2x low and the wall window stays
            # ~1 s — the very size that gave r3 its 2x run-to-run spread
            t0 = time.perf_counter()
            for i in range(20):
                state, out = train_step(state, imgs, targets, mask,
                                        jax.random.fold_in(
                                            jax.random.PRNGKey(2), i),
                                        lr, None)
            float(out["loss"])
            per_step = (time.perf_counter() - t0) / 20
        # window sizing (PERF.md #6b, extended to train in r4): each timed
        # window targets ~2-3 s so the one sync fetch (~29 ms tunnel RTT)
        # and dispatch jitter cost <2%; r3's ~1 s windows left a 2x
        # run-to-run spread on the headline train number
        iters = max(3, min(300, int(2.5 / max(per_step, 1e-4))))

        def once():
            nonlocal state
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = train_step(state, imgs, targets, mask,
                                      jax.random.fold_in(jax.random.PRNGKey(3), i),
                                      lr, None)
            # sync on a VALUE derived from the last step (PERF.md: phantom
            # block_until_ready timings over the axon transport)
            float(m["loss"])
            return iters / (time.perf_counter() - t0)

        rates = sorted(once() for _ in range(3))
        if spread_out is not None:
            # pinning evidence: the three windows' relative spread
            spread_out.append(100.0 * (rates[-1] - rates[0]) / rates[1])
        if keep is not None:
            # for the device-trace cross-check, which must run AFTER every
            # timed window in this process (trace collection is a bulk
            # device->host fetch — the PERF.md #6 contamination class)
            keep["step"], keep["state"] = train_step, state
        return rates[1]

    base = dict(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                l1_decay=1e-6, out_size=1.0 / (120 * 160))
    out = {}
    # ordered by importance: bf16 is the production default; f32 anchors the
    # torch-CPU comparison; remat/packed are opt-in variants
    cfg16 = tstep.StepCfg(compute_dtype="bfloat16", **base)
    spread, keep = [], {}
    out["bfloat16"] = measure(cfg16, spread_out=spread, keep=keep)
    if spread:  # pinning evidence (VERDICT r3 #5): window agreement + trace
        out["train_bf16_window_spread_pct"] = spread[0]
    _emit(out)
    if _left() > 90:
        out["float32"] = measure(tstep.StepCfg(compute_dtype="float32", **base))
        _emit(out)
    if _left() > 90:
        out["bfloat16_remat"] = measure(dataclasses.replace(cfg16, remat="dots"))
        _emit(out)
    if _left() > 90:
        out["bfloat16_packed"] = measure(dataclasses.replace(cfg16, packed=True))
        _emit(out)
    # device-trace cross-check LAST: the trace collection is a bulk D2H
    # fetch that can degrade this process's subsequent dispatch latency
    # (PERF.md #6) — it must never precede another timed window
    if keep and _left() > 30:
        dev = _device_trace_steps_per_sec(
            lambda i, s: keep["step"](s, imgs, targets, mask,
                                      jax.random.fold_in(
                                          jax.random.PRNGKey(4), i),
                                      lr, None),
            keep["state"], steps=50)
        if dev:
            out["train_steps_per_sec_b64_qvga_bf16_devtrace"] = dev
            _emit(out)
    rate_keys = ("bfloat16", "float32", "bfloat16_remat", "bfloat16_packed")
    out["best"] = max(v for k, v in out.items() if k in rate_keys)
    _emit(out)
    return out


def bench_scan_epoch(n: int = 2048, batch: int = 64, epochs: int = 3):
    """Whole-epoch lax.scan training throughput (images/sec) through the
    Trainer on an HBM-cached synthetic dataset — the pipeline cli.train uses.
    n is sized so the fixed per-epoch cost (one metrics device_get: ~29 ms
    tunnel RTT) amortizes over 32 scanned batches."""
    import numpy as np

    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((n, 120, 160, 3)).astype(np.float32)
    labs = rng.integers(0, 5, (n, 120, 160)).astype(np.int32)
    cache = DeviceCache.from_numpy(imgs, labs)
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype="bfloat16")
    tr = Trainer(zoo.make("robo_unet"), optim.adam(), cfg, cache, cache, batch)
    tr.init()
    t0 = time.perf_counter()
    tr.train_epoch(1e-3)  # compile + first epoch
    t1 = time.perf_counter() - t0
    # coarse lower bound recorded immediately (compile included), so even a
    # budget kill during the steady-state timing leaves a number behind
    out = {"scan_epoch_train_imgs_per_sec_bf16_incl_compile": n / t1}
    _emit(out)
    if t1 > 60:  # CPU dry run: one epoch is plenty
        epochs = 1
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch(1e-3)
    out["scan_epoch_train_imgs_per_sec_bf16"] = \
        n * epochs / (time.perf_counter() - t0)
    _emit(out)
    return out


def bench_streamed_epoch(n: int = 128, batch: int = 64, epochs: int = 2):
    """Streamed training (prefetching host pipeline, data/streaming.py) vs
    the same per-step path fed from the HBM cache — the big-dataset story.

    The dataset ships raw uint8 and normalizes ON DEVICE (StreamingBatches
    device_transform): host->device transfer bandwidth is the streaming
    roofline (the axon tunnel moves ~35-40 MB/s — a local PCIe host does
    GB/s), so bytes-on-the-wire is the honest thing to optimize."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (n, 120, 160, 3), np.uint8)
    labs = rng.integers(0, 5, (n, 120, 160)).astype(np.int32)
    labs8 = labs.astype(np.uint8)

    class HostDataset:  # ship compact: uint8 frames AND uint8 labels
        def __len__(self):
            return n

        def __getitem__(self, i):
            return (raw[i], labs8[i])

    def normalize(x, t):
        return (x.astype(jnp.float32) - 127.5) / 127.5, t.astype(jnp.int32)

    ds = HostDataset()
    out = {}

    # transfer roofline FIRST (pure device_put, no compile): the r5 clean
    # run's streamed child was budget-killed before its first emit — land
    # the cheap number before the compile-heavy training timing so a kill
    # still leaves evidence behind.
    sample = np.stack([raw[i] for i in range(batch)])
    lab_b = labs8[:batch]
    jax.device_put(sample).block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        a = jax.device_put(sample)
        b = jax.device_put(lab_b)
        jax.block_until_ready((a, b))
    out["transfer_roofline_imgs_per_sec"] = \
        batch * reps / (time.perf_counter() - t0)
    _emit(out)

    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype="bfloat16")
    tr = Trainer(zoo.make("robo_unet"), optim.adam(), cfg, None, None, batch,
                 scan_epochs=False)
    tr.init()
    t0 = time.perf_counter()
    tr.train_epoch_streamed(1e-3, ds, device_transform=normalize)  # compile
    if time.perf_counter() - t0 > 60:  # CPU dry run: one epoch is plenty
        epochs = 1
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch_streamed(1e-3, ds, device_transform=normalize)
    out["streamed_train_imgs_per_sec_bf16"] = \
        n * epochs / (time.perf_counter() - t0)
    _emit(out)

    if _left() > 60:
        imgs_f32 = (raw.astype(np.float32) - 127.5) / 127.5
        tr.train_cache = DeviceCache.from_numpy(imgs_f32, labs)
        tr.train_epoch(1e-3)  # compile/warm
        t0 = time.perf_counter()
        for _ in range(epochs):
            tr.train_epoch(1e-3)
        out["cached_per_step_imgs_per_sec"] = \
            n * epochs / (time.perf_counter() - t0)
        _emit(out)
    return out


def bench_torch_cpu_baseline(iters: int = 3):
    """The reference's own model on torch-CPU (this host), same workload:
    batch-64 QVGA fwd+bwd+Adam step — the BASELINE.md >=5x comparison point."""
    if not os.path.isdir("/root/reference"):
        return {}
    sys.path.insert(0, "/root/reference")
    import torch

    import model as refmodel

    tm = refmodel.ROBO_UNet()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    crit = refmodel.CrossEntropyLoss2d(torch.tensor([1., 10, 30, 10, 2]))
    x = torch.randn(64, 3, 120, 160)
    t = torch.zeros(64, 120, 160, dtype=torch.long)
    tm.train()
    # warmup
    opt.zero_grad()
    crit(tm(x), t).backward()
    opt.step()
    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        loss = crit(tm(x), t)
        loss.backward()
        opt.step()
    out = {"torch_cpu_reference_steps_per_sec":
           iters / (time.perf_counter() - t0)}
    _emit(out)
    return out


def analytic_gflops():
    """Analytic forward-pass GFLOPs (reference get_computations formulas) for
    the VGA inference graph and the QVGA train graph, so BENCH_r*.json makes
    achieved GFLOP/s (and hence MFU drift) visible across rounds. Host-only
    math — safe in the parent process."""
    from robocupvision_tpu.models import zoo

    vga = sum(zoo.robo_unet_get_computations(
        zoo.make("robo_unet", no_scale=True).cfg)) / 1e9
    qvga = sum(zoo.robo_unet_get_computations(zoo.make("robo_unet").cfg)) / 1e9
    return vga, qvga


_V5E_BF16_PEAK_GFLOPS = 197_000.0  # TPU v5e: 197 bf16 TFLOP/s per chip

_STAGES = {
    "vga": bench_vga_inference,
    "train": bench_train_steps,
    "scan": bench_scan_epoch,
    "streamed": bench_streamed_epoch,
    "torch": bench_torch_cpu_baseline,
}


def _run_stage(stage: str):
    """Execute one bench stage in THIS (child) process.

    Stages run in separate interpreters: one workload per process is how
    production jobs run, and it keeps each stage's numbers independent of
    the axon tunnel's per-process state (first-fetch stall, sync-mode
    changes — see PERF.md "measuring through the axon tunnel").
    """
    if stage != "torch":
        import jax
        import jax.numpy as jnp

        # persistent compilation cache shared across stage processes (and
        # retries): a respawn must not re-pay compiles
        try:
            jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
        # boot sentinel: proves backend init + first D2H survived. The axon
        # tunnel has stall-heavy phases where a fresh process hangs in
        # futex wait at init for minutes — the parent watchdog kills a
        # child that hasn't printed this within ~90 s and respawns, so a
        # stall costs 90 s, not the whole stage budget.
        jax.device_get(jnp.zeros(1))
    print("STAGE_BOOT", flush=True)
    _STAGES[stage]()  # emits cumulative STAGE_RESULT lines as it goes


_BOOT_TIMEOUT = float(os.environ.get("BENCH_BOOT_TIMEOUT_SECS", "90"))


def _outage_probe(cap: float) -> tuple:
    """Can a fresh process init the backend and complete one D2H fetch within
    ``cap`` seconds? The tunnel's outage phases hang EVERY process's backend
    init in futex wait (CLAUDE.md; 60+ min observed on Aug 17), so a capped
    child interpreter is the only safe way to ask.

    Returns ``(status, detail)`` with status one of:
    - ``"ok"``     — backend up;
    - ``"stall"``  — the child hit the cap (outage phase: wait + re-probe);
    - ``"broken"`` — the child EXITED without PROBE_OK (ImportError, plugin
      regression, …). That is a deterministic failure, not an outage — the
      caller must NOT burn the budget sleeping on it; detail carries the
      stderr tail for the artifact."""
    import subprocess

    src = ("import jax, jax.numpy as jnp; jax.devices(); "
           "jax.device_get(jnp.zeros(1)); print('PROBE_OK')")
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
    try:
        proc = subprocess.run([sys.executable, "-c", src], env=env,
                              capture_output=True, text=True, timeout=cap)
    except subprocess.TimeoutExpired:
        return "stall", f"no PROBE_OK within {cap:.0f}s"
    except Exception as e:  # spawn failure — deterministic
        return "broken", repr(e)[:300]
    if "PROBE_OK" in proc.stdout:
        return "ok", ""
    return "broken", (proc.stderr or proc.stdout or "")[-300:].strip()


def _stage_subprocess(stage: str, budget: float,
                      boot_timeout: float | None = None) -> tuple:
    """Run one stage in a fresh interpreter under ``budget`` seconds; parse
    the LAST cumulative STAGE_RESULT line. A child that fails to print
    STAGE_BOOT within ``boot_timeout`` is killed early (init stall — see
    _run_stage). Returns ``(result, kill_reason)``; result is {} on total
    failure — callers record the stage in failed_stages; no fake numbers
    are synthesized. kill_reason is None, "init", or "budget" and drives
    the retry policy (budget kills of non-headline stages don't respawn)."""
    import subprocess
    import threading

    if boot_timeout is None:
        boot_timeout = _BOOT_TIMEOUT
    env = dict(os.environ)
    env["BENCH_STAGE_BUDGET"] = str(max(budget - 15.0, 30.0))
    env["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__),
                             "--stage", stage], env=env, text=True,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    lines: list = []
    booted = threading.Event()

    def reader():
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("STAGE_BOOT"):
                booted.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    start = time.monotonic()
    killed = None
    kill_kind = None
    while proc.poll() is None:
        el = time.monotonic() - start
        if not booted.is_set() and el > boot_timeout:
            killed = f"init stall (> {boot_timeout:.0f}s to boot)"
            kill_kind = "init"
            break
        if el > budget:
            killed = f"budget ({budget:.0f}s)"
            kill_kind = "budget"
            break
        time.sleep(0.5)
    if killed:
        proc.kill()
        sys.stderr.write(f"bench stage {stage}: killed — {killed}\n")
    proc.wait()
    t.join(timeout=5)
    result = {}
    for line in lines:
        if line.startswith("STAGE_RESULT:"):
            result = json.loads(line[len("STAGE_RESULT:"):])
    if not result and not killed:
        sys.stderr.write(f"bench stage {stage} produced no result\n")
    return result, kill_kind


def _assemble(extra_raw: dict, failed: list) -> dict:
    """Build the final JSON payload from whatever has been measured so far
    (called after EVERY stage: the last stdout line is always a complete,
    parseable report, so a driver-side kill at any point still leaves the
    completed stages' numbers in the tail)."""
    extra = dict(extra_raw)
    gf_vga, gf_qvga = analytic_gflops()
    extra["analytic_fwd_gflops_vga"] = round(gf_vga, 3)

    fps = extra.get("fps_packed_bf16_b1") or extra.get("fps_bf16_b1_standard_graph")
    if fps:
        extra["infer_bf16_b1_gflops_per_sec"] = round(gf_vga * fps, 1)
        extra["infer_bf16_b1_mfu_pct"] = \
            round(100 * gf_vga * fps / _V5E_BF16_PEAK_GFLOPS, 3)

    # train ~= 3x forward cost (fwd + 2x in bwd); rate = the best of the
    # per-step microbench and the fused scan pipeline (imgs/s / batch)
    rates = [extra.get("best") or 0.0,
             (extra.get("scan_epoch_train_imgs_per_sec_bf16") or 0.0) / 64.0]
    train_rate = max(rates)
    if train_rate:
        train_gflops = 3 * 64 * gf_qvga * train_rate
        extra["train_bf16_analytic_gflops_per_sec"] = round(train_gflops, 1)
        extra["train_bf16_mfu_pct"] = \
            round(100 * train_gflops / _V5E_BF16_PEAK_GFLOPS, 3)
    torch_steps = extra.get("torch_cpu_reference_steps_per_sec")
    if torch_steps and train_rate:
        extra["train_speedup_vs_torch_cpu"] = round(train_rate / torch_steps, 1)
    if torch_steps and extra.get("float32"):
        extra["train_speedup_vs_torch_cpu_f32"] = \
            round(extra["float32"] / torch_steps, 1)
    sc = extra.get("streamed_train_imgs_per_sec_bf16")
    if sc and extra.get("cached_per_step_imgs_per_sec"):
        extra["streamed_vs_cached_per_step_pct"] = \
            round(100 * sc / extra["cached_per_step_imgs_per_sec"], 1)
    if sc and extra.get("transfer_roofline_imgs_per_sec"):
        extra["streamed_vs_transfer_roofline_pct"] = \
            round(100 * sc / extra["transfer_roofline_imgs_per_sec"], 1)
    # rename per-step train keys for self-describing output
    for old, new in [
            ("bfloat16", "train_steps_per_sec_b64_qvga_bf16"),
            ("float32", "train_steps_per_sec_b64_qvga_f32"),
            ("bfloat16_remat", "train_steps_per_sec_b64_qvga_bf16_remat"),
            ("bfloat16_packed", "train_steps_per_sec_b64_qvga_bf16_packed"),
            ("best", "train_steps_per_sec_b64_qvga_best")]:
        if old in extra:
            extra[new] = extra.pop(old)
    if failed:
        extra["failed_stages"] = sorted(set(failed))
    extra = {k: (round(v, 2) if isinstance(v, float) else v)
             for k, v in extra.items()}

    out = {
        "metric": "robo_unet_vga_640x480_inference_fps_per_chip",
        "value": round(fps, 2) if fps else None,
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 2) if fps else None,
        "extra": extra,
    }
    # Always carry the most recent committed clean run: a transport-outage
    # run (null headline) must still be evidence-bearing (VERDICT r3 #1).
    lg = _load_last_good()
    if lg:
        out["last_good"] = lg
    return out


# Primary result key per stage: presence in `extra` means the stage's
# headline sub-measurement exists (used for resume-skip and scheduling).
_STAGE_KEY = {
    "vga": "fps_packed_bf16_b1",
    "train": "bfloat16",  # renamed to train_steps_per_sec_b64_qvga_bf16 late
    "scan": "scan_epoch_train_imgs_per_sec_bf16",
    "streamed": "streamed_train_imgs_per_sec_bf16",
    "torch": "torch_cpu_reference_steps_per_sec",
}

_PARTIAL = os.path.join(_CACHE_DIR, "bench_partial.json")


def _git_head() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        return "unknown"


def _save_partial(extra: dict, complete: bool) -> None:
    """Persist the raw (pre-rename) stage results after every stage so a
    later kill — the driver's own deadline included — doesn't erase them:
    the next invocation at the SAME commit resumes the incomplete stages
    instead of re-measuring the finished ones (VERDICT r4 weak #1)."""
    try:
        with open(_PARTIAL, "w") as f:
            json.dump({"commit": _git_head(), "ts": time.time(),
                       "complete": complete, "extra": extra}, f)
    except Exception:
        pass


def _load_partial(max_age_secs: float = 3 * 3600.0) -> dict:
    """Resumable partial results: same commit, recent, and from a run that
    did NOT finish cleanly (a clean run marks complete=True so the next
    invocation measures fresh instead of replaying it)."""
    try:
        with open(_PARTIAL) as f:
            d = json.load(f)
    except Exception:
        return {}
    if d.get("complete") or d.get("commit") != _git_head() \
            or time.time() - d.get("ts", 0) > max_age_secs:
        return {}
    return d.get("extra") or {}


def _prev_artifact_has_train() -> bool:
    """Does the newest committed BENCH_r*.json carry a driver-captured train
    number? When it doesn't, the train stage is the scarce metric and runs
    BEFORE vga (whose headline is thrice-confirmed) — VERDICT r4 #2."""
    import glob

    files = sorted(glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    if not files:
        return False
    try:
        with open(files[-1]) as f:
            d = json.load(f)
    except Exception:
        return False
    return "train_steps_per_sec_b64_qvga_bf16" in (d.get("extra") or {})


def _stage_plan(train_first: bool) -> list:
    """(stage, cap, reserve, run_with_retry kwargs) in execution order.

    train-first: torch (CPU-only, immune to tunnel outages) pins the
    comparison denominator, then train gets the generous boot schedule vga
    had, then vga — its minimum useful slice (the headline sub-measurement
    alone) fits any leftover budget. Otherwise the r4 order stands."""
    if train_first:
        return [
            ("torch", 90, 620, {"attempts": 2}),
            ("train", 330, 170, {"attempts": 4,
                                 "boot_schedule": (60, 90, 150, 210),
                                 "final_longwait": True}),
            ("vga", 420, 60, {"attempts": 3, "boot_schedule": (60, 90, 150)}),
            ("scan", 150, 50, {}),
            ("streamed", 180, 30, {}),
        ]
    return [
        ("vga", 420, 120, {"attempts": 5,
                           "boot_schedule": (60, 90, 120, 180, 240),
                           "final_longwait": True}),
        ("train", 300, 75, {}),
        ("scan", 150, 50, {}),
        ("streamed", 180, 30, {}),
        ("torch", 90, 10, {}),
    ]


def _load_last_good() -> dict:
    try:
        with open(_LAST_GOOD) as f:
            lg = json.load(f)
        lg.pop("note", None)
        return lg
    except Exception:
        return {}


def _store_last_good(payload: dict) -> None:
    """After a clean run (non-null headline), refresh the committed
    last-good artifact with this run's numbers + provenance."""
    import datetime
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        commit = "unknown"
    record = {
        "note": ("Most recent clean full driver-style bench run on the real "
                 "chip. bench.py embeds this block as `last_good` in every "
                 "final JSON so an outage run is never evidence-free, and "
                 "rewrites this file after each clean run (the driver "
                 "commits it)."),
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "commit": commit or "unknown",
        "source": "bench.py run (this file is rewritten by bench.py itself)",
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "vs_baseline": payload["vs_baseline"],
        # drop the run's TRANSIENT markers (stage failures, init-stall /
        # outage bookkeeping, error strings): this record is replayed as
        # clean-run evidence by every later outage run, and a recovered
        # stall or a failed opt-in variant is not part of that evidence
        "extra": {k: v for k, v in payload["extra"].items()
                  if k not in ("failed_stages", "resumed_stages")
                  and "outage" not in k
                  and not k.startswith("infra_")
                  and not k.endswith("_error")},
    }
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
    except Exception as e:  # read-only checkout: the run must still succeed
        sys.stderr.write(f"last_good write failed: {e}\n")


def main():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    extra = {}
    failed = []

    # Resume an interrupted run at the same commit: completed stages' numbers
    # are preloaded (and those stages skipped), incomplete ones re-run.
    resumed = _load_partial()
    if resumed:
        extra.update(resumed)
        done = sorted(s for s, k in _STAGE_KEY.items() if k in extra)
        if done:
            extra["resumed_stages"] = done
            sys.stderr.write(f"bench: resumed partial results for {done}\n")

    def emit(complete: bool = False):
        _save_partial({k: v for k, v in extra.items()
                       if k != "resumed_stages"}, complete)
        print(json.dumps(_assemble(extra, failed)), flush=True)

    # smallest budget a stage can realistically finish its FIRST
    # sub-measurement in (boot + first compile + one timed window over the
    # tunnel) — starting an attempt below this just burns deadline that a
    # later stage could use (the r3 stall-phase run budget-killed a doomed
    # 97 s train attempt while scan then had to be skipped)
    # vga's minimum is the smallest useful slice (instant boot + the
    # headline sub-measurement alone, ~15-25 s warm-cache): the one number
    # that must exist is worth a last-ditch attempt at any viable budget
    _MIN_BUDGET = {"vga": 60, "train": 150, "scan": 110,
                   "streamed": 90, "torch": 45}

    def run(stage: str, cap: float, reserve: float,
            boot_timeout: float | None = None) -> tuple:
        """Give ``stage`` min(cap, remaining - reserve) seconds; skip it
        outright (marker, not a hang) if that's under the stage's minimum
        viable budget."""
        budget = min(cap, _left() - reserve)
        if budget < _MIN_BUDGET.get(stage, 45):
            sys.stderr.write(f"bench stage {stage}: skipped "
                             f"({_left():.0f}s left)\n")
            failed.append(stage + ":skipped")
            return {}, None
        sys.stderr.write(f"bench stage {stage}: budget {budget:.0f}s "
                         f"({_left():.0f}s left)\n")
        out, kill_kind = _stage_subprocess(stage, budget, boot_timeout)
        if kill_kind == "init":
            # a null/missing metric caused by the transport refusing
            # backend init must read as an infrastructure outage in the
            # report, not a framework regression (an Aug-17 outage phase
            # stalled every boot for 60+ minutes straight)
            extra["infra_init_stall_kills"] = \
                extra.get("infra_init_stall_kills", 0) + 1
        if not out:
            failed.append(stage)
        return out, kill_kind

    def run_with_retry(stage: str, cap: float, reserve: float,
                       attempts: int = 3,
                       boot_schedule: tuple = (),
                       final_longwait: bool = False) -> dict:
        """Respawn a failed stage while time allows: an init-stalled child
        is killed by the boot watchdog (nothing computed by then), and the
        shared compilation cache makes post-compile respawns cheap. The
        boot timeout ESCALATES per attempt (x1, x2, x3): a kill+respawn
        during a persistent tunnel stall phase would otherwise loop — the
        r3 dry run saw one stage stall 3/3 at a fixed 90 s — while the
        first attempt stays cheap in the common transient case.

        BUDGET kills (the child booted, ran, and still overran) only
        respawn for the headline stage: a non-headline stage slow enough
        to blow its full budget will likely do so again, and its respawns
        starve the stages after it (seen in the r3 contended run: scan's
        two budget kills consumed 300 s and streamed/torch were skipped)."""
        out = {}
        for i in range(attempts):
            bt = (boot_schedule[min(i, len(boot_schedule) - 1)]
                  if boot_schedule else _BOOT_TIMEOUT * (i + 1))
            if final_longwait and i == attempts - 1:
                # last roll: stop re-rolling and OUT-WAIT the stall phase —
                # the futex stalls can run multiple minutes (CLAUDE.md), so
                # spend everything but a measurement slice on one long boot
                bt = max(bt, min(cap, _left() - reserve) - 60)
            got, kill_kind = run(stage, cap, reserve, boot_timeout=bt)
            skipped = not got and kill_kind is None
            out = {**got, **out}
            complete = bool(out) and not (stage == "vga"
                                          and "fps_packed_bf16_b1" not in out)
            if complete or _left() - reserve < 60:
                break
            if skipped:  # the remaining budget can only shrink
                break
            if kill_kind == "budget" and stage != "vga":
                sys.stderr.write(f"bench stage {stage}: budget kill — "
                                 f"not retrying (non-headline)\n")
                break
            if i + 1 < attempts:
                sys.stderr.write(f"bench stage {stage}: retrying\n")
        if out:
            for marker in (stage, stage + ":skipped"):
                while marker in failed:
                    failed.remove(marker)
        return out

    # Outage gate (VERDICT r3 #1): ONE capped probe before spending budget
    # on full stage respawns. If the transport is in an outage phase (every
    # backend init hangs — CLAUDE.md), alternate cheap re-probes with sleeps
    # to the end of budget: the tunnel can recover mid-window, and a probe +
    # sleep costs seconds where a doomed stage spawn costs its whole boot
    # schedule. The final JSON always carries `last_good`, so even a
    # full-outage run is evidence-bearing.
    probe_cap = float(os.environ.get("BENCH_PROBE_CAP_SECS", "120"))
    status, detail = _outage_probe(min(probe_cap, max(_left() - 120, 30.0)))
    if status == "broken":
        # Deterministic child failure (ImportError / plugin regression):
        # NOT an outage. Record the actual error and fall through to the
        # stages — their own stderr is the debuggable evidence; sleeping
        # the budget away here would misattribute it to infrastructure.
        extra["outage_probe_error"] = detail
        emit()
    elif status == "stall":
        extra["infra_init_stall_kills"] = 1
        extra["outage_probe_failures"] = 1
        emit()
        # Routine (non-outage) init stalls hit roughly every other PROCESS
        # (CLAUDE.md), so one stalled probe is weak evidence: re-roll
        # immediately in a fresh child before concluding "outage phase" —
        # otherwise an unlucky single roll on a healthy tunnel would sleep
        # away the budget (or, under a small BENCH_DEADLINE_SECS, skip
        # every TPU stage outright). Two consecutive independent stalls is
        # what an outage actually looks like.
        recovered = turned_broken = False
        status, detail = _outage_probe(min(60.0, max(_left() - 90.0, 20.0)))
        if status == "ok":
            recovered = True
        elif status == "broken":
            extra["outage_probe_error"] = detail
            turned_broken = True
        else:
            extra["outage_probe_failures"] += 1
            extra["infra_init_stall_kills"] += 1
        while not (recovered or turned_broken) and _left() > 120:
            time.sleep(min(45.0, max(_left() - 120.0, 1.0)))
            status, detail = _outage_probe(min(90.0, _left() - 60.0))
            if status == "ok":
                recovered = True
                break
            if status == "broken":  # turned deterministic: stop sleeping
                extra["outage_probe_error"] = detail
                turned_broken = True
                break
            extra["outage_probe_failures"] += 1
            extra["infra_init_stall_kills"] += 1
            emit()
        if recovered:
            extra["outage_wait_secs"] = round(time.monotonic() - _T0, 1)
        elif turned_broken:
            # deterministic child failure mid-run: NOT a recovery and NOT
            # an outage — fall through to the stages, whose own stderr is
            # the debuggable evidence (outage_probe_error already recorded)
            pass
        else:
            # hard-down for the whole budget: mark the TPU stages as
            # outage-skipped, still run the CPU-only torch baseline, and
            # leave a final JSON whose null headline reads as infrastructure
            extra["outage"] = "backend init stalled for the whole budget"
            for stage in ("vga", "train", "scan", "streamed"):
                failed.append(stage + ":skipped")
            if _left() > 55:
                got, _ = _stage_subprocess("torch", min(90.0, _left() - 10.0))
                extra.update(got or {})
                if not got:
                    failed.append("torch")
            emit()
            return

    # Scarce-metric-first scheduling (VERDICT r4 #2): when the newest
    # committed BENCH_r*.json lacks a train number, torch + train run BEFORE
    # vga so outage pressure starves the thrice-confirmed headline instead
    # of the metric with no driver evidence. Init-stall physics (CLAUDE.md):
    # each fresh child re-rolls the stall dice, so the must-produce stage
    # buys cheap boot rolls first, then its LAST attempt out-waits the stall
    # phase with a long boot timeout instead of re-rolling.
    plan = _stage_plan(train_first=not _prev_artifact_has_train())
    for stage, cap, reserve, kw in plan:
        if extra.get(_STAGE_KEY[stage]) is not None:
            continue  # resumed from a prior interrupted run at this commit
        extra.update(run_with_retry(stage, cap, reserve, **kw))
        emit()

    # backfill: convert leftover deadline into recovered stages. A stage
    # that lost all its boot rolls to init stalls (the r3 runs saw 2-3 in a
    # row during tunnel stall phases) gets fresh rolls from whatever time
    # the other stages didn't use, in priority order.
    for stage, cap, _reserve, _kw in plan:
        if stage in failed and _left() > 120:
            sys.stderr.write(f"bench stage {stage}: backfill attempt "
                             f"({_left():.0f}s left)\n")
            extra.update(run_with_retry(stage, cap, reserve=60, attempts=2))
            emit()

    # a clean run (non-null headline) refreshes the committed last-good
    # artifact so the NEXT outage run still carries real numbers; a run
    # holding BOTH scarce metrics marks the partial file complete so the
    # next invocation measures fresh instead of replaying it
    payload = _assemble(extra, failed)
    # only a REAL-CHIP headline may refresh the committed clean-run record
    # (a CPU dry run of the full bench would otherwise overwrite it)
    if payload["value"] is not None and extra.get("backend") == "tpu":
        _store_last_good(payload)
    emit(complete=payload["value"] is not None
         and extra.get(_STAGE_KEY["train"]) is not None)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--stage":
        _run_stage(sys.argv[2])
        sys.exit(0)
    main()
