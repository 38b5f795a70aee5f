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


def _conv_block_kernel(x_ref, w_ref, b_ref, scale_ref, shift_ref, out_ref,
                       *, relu_before_bn: bool):
    """One output row-tile of fused conv3x3(s1,p1) + bias + ReLU/BN-affine.

    x_ref holds the whole zero-padded input (H+2, W+2, C) in VMEM; the nine
    taps are static slices feeding MXU dots with f32 accumulation; the
    epilogue applies the reference's block ordering (conv -> ReLU -> BN for
    conv_block, conv -> BN -> ReLU for up_tconv) before the bf16 store.
    """
    i = pl.program_id(0)
    tile, w_out, _ = out_ref.shape
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[pl.ds(i * tile + dy, tile), pl.ds(dx, w_out), :]
            t = jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    y = acc + b_ref[0].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)
    shift = shift_ref[0].astype(jnp.float32)
    if relu_before_bn:
        y = jnp.maximum(y, 0.0) * scale + shift
    else:
        y = jnp.maximum(y * scale + shift, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu_before_bn", "tile",
                                             "interpret"))
def fused_conv3x3_block(x: jax.Array, w: jax.Array, b: jax.Array,
                        scale: jax.Array, shift: jax.Array,
                        relu_before_bn: bool = True, tile: int = 8,
                        interpret: bool = False) -> jax.Array:
    """Fused conv3x3(s1,p1)+bias+ReLU+BN inference block, (1,H,W,C)->(1,H,W,Co).

    The BASELINE north star names a fused conv-BN-ReLU Pallas block; this is
    that kernel for the lane-packed inference graph's uniform k3/s1/p1 convs.
    Measured head-to-head against XLA's convolution fusion at the packed
    graph's shapes (v5e, bf16, steady-state 10-op chains): XLA wins —
    40/47 us per op at C=64/128 vs 51/53 us for this kernel, and inside the
    full graph XLA reaches 20-32 us by fusing epilogues with neighbors. An
    im2col variant (one K=3C dot per row) hit a Mosaic lane-concat internal
    error. The packed graph therefore keeps the XLA path; the kernel stays
    as the measured record and as a starting point if shapes change.
    See PERF.md.
    """
    n, h, ww, c = x.shape
    assert n == 1 and h % tile == 0, (x.shape, tile)
    co = int(w.shape[3])
    xp = jnp.pad(x[0], ((1, 1), (1, 1), (0, 0)))
    kernel = functools.partial(_conv_block_kernel,
                               relu_before_bn=relu_before_bn)
    out = pl.pallas_call(
        kernel,
        grid=(h // tile,),
        in_specs=[
            pl.BlockSpec((h + 2, ww + 2, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((3, 3, c, co), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
            pl.BlockSpec((1, co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, ww, co), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, ww, co), x.dtype),
        interpret=interpret,
    )(xp, w.astype(x.dtype), b.reshape(1, co), scale.reshape(1, co),
      shift.reshape(1, co))
    return out[None]


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
