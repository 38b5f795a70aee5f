"""Pallas TPU kernels for hot ops.

``confusion_matrix_pallas``: per-image confusion counts directly from integer
label maps. The jnp path (ops/metrics.seg_batch_stats) materializes two
(B, H, W, C) float one-hots and einsums them — ~2*C times the HBM traffic of
the label maps themselves; on a bandwidth-bound chip that dominates eval.
This kernel streams the two int32 maps through VMEM once per image and
accumulates the C*C counters on the VPU (C*C masked reductions per tile), so
HBM traffic is exactly the two label maps + a (C, C) write.

Used by metrics.seg_batch_stats(..., impl="pallas") and picked automatically
on TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only exists on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _conf_kernel(pred_ref, tgt_ref, out_ref, *, num_classes: int):
    pred = pred_ref[0]
    tgt = tgt_ref[0]
    # one (C, C) counter block per image; C*C vectorized masked sums on the VPU
    rows = []
    for p in range(num_classes):
        pm = pred == p
        rows.append(jnp.stack([
            jnp.sum(jnp.where(pm & (tgt == t), 1.0, 0.0))
            for t in range(num_classes)
        ]))
    out_ref[0] = jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def confusion_matrix_pallas(pred: jax.Array, tgt: jax.Array, num_classes: int,
                            interpret: bool = False) -> jax.Array:
    """(B, H, W) int maps -> (B, C, C) float32 counts, conf[b, pred, tgt]."""
    b, h, w = pred.shape
    kernel = functools.partial(_conf_kernel, num_classes=num_classes)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, num_classes, num_classes),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, num_classes, num_classes),
                                       jnp.float32),
        interpret=interpret,
    )(pred.astype(jnp.int32), tgt.astype(jnp.int32))
