"""On-chip probe for the Pallas fused-chain variants (r4).

Runs on the real TPU: for each packed family x chain config, (1) compiles
the REAL Mosaic kernels, (2) checks label agreement vs the XLA packed path
on-device, (3) measures head-to-head fps with the bench methodology
(value-fetch-synced windows, PERF.md #6/#6b). One JSON line per row so a
mid-run kill keeps completed rows. Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/pallas_chip_probe.py
    [--families flagship,lp,pbfcn,v2] [--iters 600]

The results belong in PERF.md (kept if faster / measured-negative if not)
— this is the measurement side of VERDICT r3 item 2.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _time(fn, x, iters):
    import numpy as np

    import jax.numpy as jnp

    y = fn(x)
    np.asarray(jnp.ravel(y)[0])  # warm + first-fetch stall
    t0 = time.perf_counter()
    for _ in range(30):
        y = fn(x)
    np.asarray(jnp.ravel(y)[0])
    per_call = (time.perf_counter() - t0) / 30
    iters = max(3, min(iters, int(0.6 / max(per_call, 1e-6))))

    def once():
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        np.asarray(jnp.ravel(y)[0])
        return (time.perf_counter() - t0) / iters

    return sorted(once() for _ in range(3))[1], iters


def _agree(fa, fb, x):
    """Label agreement computed ON DEVICE, fetched as one scalar.

    Never bulk-fetch the full label maps here: a bulk D2H in this process
    would degrade every SUBSEQUENT timed window to ~RTT per dispatch
    (PERF.md #6 — the r3 phantom-slowness finding), silently turning the
    head-to-head into a measured-negative for whichever variant runs
    after the first parity check."""
    import jax
    import jax.numpy as jnp

    cmp = jax.jit(
        lambda v: jnp.mean((fa(v) == fb(v)).astype(jnp.float32)))
    return float(cmp(x))


def _device_trace_us_per_call(fn, x, calls=50):
    """Device-track busy span per call (transport-noise-free — PERF.md
    'phantom timings'). Shared parser: utils/profiling.device_busy_span_us.
    Returns None if tracing/parsing fails."""
    import numpy as np

    import jax.numpy as jnp

    from robocupvision_tpu.utils.profiling import device_busy_span_us

    def run():
        for _ in range(calls):
            y = fn(x)
        np.asarray(jnp.ravel(y)[0])

    span_us = device_busy_span_us(run, calls)
    return span_us / calls if span_us else None


def run(families, iters, trace=False):
    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.models import packed, zoo

    jax.device_get(jnp.zeros(1))  # first-fetch stall out of the way

    def emit(row):
        print("ROW:" + json.dumps(row), flush=True)

    # Trace collection is a BULK device->host transfer; doing one before any
    # later timed window is the PERF.md #6 contamination class (it can
    # degrade every subsequent dispatch in this process to ~RTT, biasing
    # whichever variants time after it). So every trace is DEFERRED until
    # all families' timing windows in this process have run; the collector
    # merges the supplemental device_us rows into the timing rows by
    # (row, variant) key.
    deferred_traces = []  # (row, variant, fn, x)

    def head_to_head(name, base, variants, x):
        bfn = jax.jit(base.infer)
        t, it = _time(bfn, x, iters)
        emit({"row": name, "variant": "xla_packed", "fps": round(1 / t, 1),
              "iters": it})
        if trace:
            deferred_traces.append((name, "xla_packed", bfn, x))
        for vname, builder in variants:
            try:
                vi = builder()
                vfn = jax.jit(vi.infer)
                # agreement is an on-device scalar fetch (same barrier shape
                # as the timing sync) — safe before later windows
                agree = _agree(vfn, bfn, x)
                t, it = _time(vfn, x, iters)
                emit({"row": name, "variant": vname,
                      "fps": round(1 / t, 1), "agree": agree, "iters": it})
                if trace:
                    deferred_traces.append((name, vname, vfn, x))
            except Exception as e:
                emit({"row": name, "variant": vname,
                      "error": repr(e)[:300]})

    if "flagship" in families:
        m = zoo.make("robo_unet", no_scale=True)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        bb = packed.build_packed_infer(m, p, jnp.bfloat16)
        head_to_head("flagship_vga_b1", bb, [
            ("pallas", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True)),
            ("pallas_stem", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True)),
            ("pallas_stem_deep", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_deep=True)),
            # fused-argmax-head ablation (and the fallback if the argmax
            # epilogue trips real Mosaic): logits head + XLA argmax
            ("pallas_stem_deep_noargmax", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_deep=True, pallas_argmax_head=False)),
            # static int8 PTQ serving (2x MXU peak, int8 scratch); its
            # `agree` column IS the quantization-accuracy measurement
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_deep=True), x)),
        ], x)

    if "bands" in families:
        # row-band sweep on the flagship VGA chain: smaller bands recompute
        # more halo rows but stream smaller scratch strips through VMEM
        m = zoo.make("robo_unet", no_scale=True)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        for band in (12, 15, 20, 24, 30, 40, 60):
            try:
                vi = packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_band=band)
                t, it = _time(jax.jit(vi.infer), x, iters)
                emit({"row": "flagship_vga_band_sweep", "band": band,
                      "fps": round(1 / t, 1), "iters": it})
            except Exception as e:
                emit({"row": "flagship_vga_band_sweep", "band": band,
                      "error": repr(e)[:200]})

    if "qvga" in families:
        m = zoo.make("robo_unet")
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 120, 160, 3),
                              jnp.float32)
        bb = packed.build_packed_infer(m, p, jnp.bfloat16)
        head_to_head("flagship_qvga_b1", bb, [
            ("pallas_stem_deep", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_deep=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_deep=True), x)),
        ], x)

    if "lp" in families:
        m = zoo.make("label_prop")
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 120, 160, 8),
                              jnp.float32)
        bb = packed.build_packed_label_prop(m, p, jnp.bfloat16)
        head_to_head("label_prop_qvga_b1", bb, [
            ("pallas_stem", lambda: packed.build_packed_label_prop(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True)),
            ("pallas_stem_mid", lambda: packed.build_packed_label_prop(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_mid=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_label_prop(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_mid=True), x)),
        ], x)

    if "pbfcn" in families:
        m = zoo.make("pb_fcn", no_scale=True)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        bb = packed.build_packed_pb_fcn(m, p, jnp.bfloat16)
        head_to_head("pb_fcn_vga_b1", bb, [
            ("pallas", lambda: packed.build_packed_pb_fcn(
                m, p, jnp.bfloat16, pallas=True)),
            ("pallas_deep", lambda: packed.build_packed_pb_fcn(
                m, p, jnp.bfloat16, pallas=True, pallas_deep=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_pb_fcn(
                    m, p, jnp.bfloat16, pallas=True, pallas_deep=True), x)),
        ], x)

    if "unet" in families:
        # --UNet hyper-table config: maxpool downs chain as lane-selection
        # max stages (models/packed._pool_chain_stage)
        m = zoo.make("robo_unet", no_scale=True, pool=True, levels=3,
                     belly_size=0)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        bb = packed.build_packed_infer(m, p, jnp.bfloat16)
        head_to_head("unet_vga_b1", bb, [
            ("pallas_stem", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True),
                x)),
        ], x)

    if "slim" in families:
        # structured 50% channel prune (ops/slim.py, lane-friendly widths):
        # same graph family, roughly half the MACs — read against the
        # flagship_vga_b1 row from the same run for the dense-vs-slim fps
        # delta (agreement here is slim-pallas vs slim-XLA, both slim)
        from robocupvision_tpu.ops import slim as slim_ops

        m = zoo.make("robo_unet", no_scale=True)
        # host-side params: NEVER np.asarray(device init) here — a bulk D2H
        # before a timed window is the PERF.md #6 contamination class (the
        # flagship rows time first in this process); fps is value-free
        p0 = zoo.random_host_params(m)
        masked, _ = slim_ops.prune_channels(
            p0, slim_ops.channel_groups(m), 0.5, min_keep=8, round_to=8,
            verbose=False)
        sp, _ = slim_ops.compact(m, masked)
        p = {k: jnp.asarray(v) for k, v in sp.items()}
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        bb = packed.build_packed_infer(m, p, jnp.bfloat16)
        head_to_head("flagship_vga_slim50_b1", bb, [
            ("pallas_stem_deep", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_deep=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_deep=True), x)),
        ], x)

    if "v2" in families:
        m = zoo.make("robo_unet", no_scale=True, v2=True, levels=1,
                     belly_size=9, belly_planes=64, class_size=3)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3),
                              jnp.float32)
        bb = packed.build_packed_infer(m, p, jnp.bfloat16)
        head_to_head("v2_vga_b1", bb, [
            ("pallas_stem_deep", lambda: packed.build_packed_infer(
                m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                pallas_deep=True)),
            ("pallas_int8", lambda: packed.quantize_int8(
                packed.build_packed_infer(
                    m, p, jnp.bfloat16, pallas=True, pallas_fold_stem=True,
                    pallas_deep=True), x)),
        ], x)

    # deferred device traces, strictly AFTER every timed window (see above)
    for name, vname, fn, x in deferred_traces:
        try:
            us = _device_trace_us_per_call(fn, x)
        except Exception:
            us = None
        if us:
            emit({"row": name, "variant": vname,
                  "device_us_per_frame": round(us, 1)})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="flagship,qvga,lp,pbfcn,v2,unet",
                    help="comma list from: "
                         "flagship,bands,qvga,lp,pbfcn,v2,unet,slim")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--trace", action="store_true", default=False,
                    help="also report device-trace us/frame per variant")
    a = ap.parse_args()
    run(a.families.split(","), a.iters, a.trace)
