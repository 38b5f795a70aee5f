"""AOT deployment artifacts: serialized, versioned StableHLO graphs.

The reference deploys by exporting (net.cfg, weights.dat) and re-building the
network inside a hand-written C++ engine (reference: CNN/ directory;
tester.py:121-124 writes the artifacts). The TPU-native analog is an
ahead-of-time *compiled graph* artifact: `jax.export` serializes the traced
computation (StableHLO + calling convention, versioned for compatibility)
WITH the weights baked in, so a serving process deserializes and calls it —
no model code, registry, or retracing on the robot/server side, and the
graph is exactly the one that was benchmarked (e.g. the lane-packed
serving graph, models/packed.py).

Artifacts are platform-checked at load time by jax.export itself (a TPU
export refuses to run on CPU unless exported for both), mirroring how the
reference's weights.dat is engine-version-bound.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import numpy as np

AOT_FNAME = "serving.stablehlo"


def export_fn(fn: Callable, example_args: Sequence,
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args`` (weights and all
    captured constants baked in). ``platforms`` defaults to the current
    backend; pass e.g. ("tpu", "cpu") to produce a dual-target artifact."""
    jfn = jax.jit(fn)
    if platforms is not None:
        exp = jax.export.export(jfn, platforms=tuple(platforms))(*example_args)
    else:
        exp = jax.export.export(jfn)(*example_args)
    return exp.serialize()


def load_fn(blob: bytes) -> Callable:
    """Deserialize an exported graph into a callable. The result is itself
    jittable (jax.jit(load_fn(blob)) compiles the embedded StableHLO once
    and dispatches like any jitted function)."""
    exp = jax.export.deserialize(blob)
    return jax.jit(exp.call)


def export_serving(path: str, model, params, hw=(480, 640),
                   dtype=None, packed: bool = True, raw_u8: bool = False,
                   pallas: bool = False, pallas_opts: Optional[dict] = None,
                   int8: bool = False, calib_x=None,
                   platforms: Optional[Sequence[str]] = None,
                   fname: str = AOT_FNAME) -> str:
    """Write the uint8-label serving graph for ``model`` as an AOT artifact
    next to the reference-style net.cfg/weights.dat (export_deployment).

    The exported callable maps float32 NHWC (1, H, W, 3) -> uint8 (1, H, W)
    label map — the exact graph bench.py's fps_serving_incl_u8_label_readback
    measures (lane-packed when ``packed``). With ``raw_u8`` (packed only),
    the input is the camera's raw uint8 RGB and the /255+ToYUV+Normalize
    preprocessing is baked into the graph (models/packed.py infer_u8_io).

    ``pallas`` exports the fused-chain form (ops/pallas_packed.py): for a
    TPU target the real Mosaic kernels are cross-lowered into the artifact
    even on a CPU host (jax.export serializes the tpu_custom_call); for a
    CPU target the interpreter form is baked instead. ``pallas_opts`` passes
    extra chain knobs (pallas_fold_stem/pallas_deep/...). ``int8`` exports
    the static-PTQ graph (models/packed.quantize_int8 — int8 weights baked
    in, ~2x smaller artifact); it requires ``calib_x``, a batch of
    representative float inputs for the one-pass calibration."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    if raw_u8 and model.family == "label_prop":
        raise ValueError("raw_u8 export is for camera-input nets; LabelProp's "
                         "8-channel input (img+flow+prior label) is not raw "
                         "camera bytes")
    if (pallas or int8) and not packed:
        raise ValueError("pallas/int8 export requires the packed graph")
    if int8 and not pallas:
        raise ValueError("int8 export requires pallas=True (the quantized "
                         "form lives in the chain kernels)")
    if int8 and calib_x is None:
        raise ValueError("int8 export needs calib_x (representative inputs "
                         "for the one-pass calibration — zeros would "
                         "produce degenerate scales)")
    if packed:
        from robocupvision_tpu.models import packed as pk

        builder = {"pb_fcn": pk.build_packed_pb_fcn,
                   "label_prop": pk.build_packed_label_prop}.get(
                       model.family, pk.build_packed_infer)
        pkw = {}
        if pallas:
            targets = tuple(platforms) if platforms else \
                (jax.default_backend(),)
            pkw = dict(pallas=True, pallas_interpret="tpu" not in targets,
                       **(pallas_opts or {}))
        pi = builder(model, params, dtype=dtype, **pkw)
        if int8:
            pi = pk.quantize_int8(pi, jnp.asarray(calib_x))
        fn = pi.infer_u8_io if raw_u8 else pi.infer_u8
    elif raw_u8:
        raise ValueError("raw_u8 export requires the packed serving graph")
    else:
        pdev = {k: jnp.asarray(v) for k, v in params.items()}

        def fn(x):
            logits, _ = model.apply(pdev, x.astype(dtype), train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    h, w = hw
    cin = 8 if model.family == "label_prop" else 3  # LP: img+flow+prior label
    x = np.zeros((1, h, w, cin), np.uint8 if raw_u8 else np.float32)
    blob = export_fn(fn, (x,), platforms=platforms)
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, fname)
    with open(out, "wb") as f:
        f.write(blob)
    return out


def load_serving(path: str, fname: str = AOT_FNAME) -> Callable:
    """Load an AOT serving artifact written by export_serving. ``path`` may
    be the artifact file itself or the deployment directory holding it."""
    if os.path.isdir(path):
        path = os.path.join(path, fname)
    with open(path, "rb") as f:
        return load_fn(f.read())
