"""Low-level NN ops with PyTorch numerics, TPU-native layouts.

All ops take NHWC activations and HWIO kernels (the layouts XLA:TPU tiles
best onto the MXU) while reproducing PyTorch semantics exactly:

- ``conv2d``             == torch.nn.functional.conv2d
- ``conv_transpose2d``   == torch.nn.ConvTranspose2d (incl. output_padding)
- ``batch_norm``         == torch.nn.BatchNorm2d (biased batch var for
                            normalization, unbiased for the running-stat
                            update, momentum 0.1, eps 1e-5)
- pools/dropout/linear/pixel_shuffle match their torch counterparts.

Weight-layout conventions of this framework (see also export/torch_io.py):
- conv weight:   (kh, kw, in, out)            [torch: (out, in, kh, kw)]
- tconv weight:  (kh, kw, in, out), already spatially flipped so that the
                 forward pass is a single ``lax.conv_general_dilated`` with
                 ``lhs_dilation`` (torch stores (in, out, kh, kw) unflipped).
- linear weight: (in, out)                    [torch: (out, in)]

Reference behavior being reproduced (cited for parity checks, not copied):
/root/reference/model.py:105-199 (Conv/ConvPool/upSampleTransposeConv blocks).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: IntOrPair) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pref(x, accum_dtype):
    """Accumulation dtype hint: explicit f32 for f32 operands; for bf16
    operands the MXU already accumulates in f32 internally, and requesting a
    widened output breaks the autodiff transpose rule (cotangent/operand
    dtype mismatch in lax.conv) — so keep the operand dtype."""
    return accum_dtype if x.dtype == jnp.float32 else x.dtype


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    dilation: IntOrPair = 1,
    *,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, PyTorch padding semantics.

    ``accum_dtype`` keeps MXU accumulation in f32 even for bf16 activations.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=_pref(x, accum_dtype),
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: IntOrPair = 2,
    padding: IntOrPair = 1,
    output_padding: IntOrPair = 1,
    *,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Transposed conv matching torch.nn.ConvTranspose2d.

    Expects ``w`` in this framework's pre-flipped HWIO layout (kh, kw, in, out);
    the op is then a single input-dilated convolution:
    out = (in-1)*stride - 2*padding + kernel + output_padding.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = int(w.shape[0]), int(w.shape[1])
    pad = (
        (kh - 1 - ph, kh - 1 - ph + oph),
        (kw - 1 - pw, kw - 1 - pw + opw),
    )
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMSPEC,
        preferred_element_type=_pref(x, accum_dtype),
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d_subpixel(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
) -> jax.Array:
    """ConvTranspose2d(k=3, s=2, p=1, op=1) as one 2x2 conv + depth-to-space.

    Exactly equivalent to ``conv_transpose2d`` for this configuration (the
    only one the model zoo uses): the phase decomposition emits 4*C_out
    channels from a dense 2x2 conv (16/36 of the dense-at-output MACs, 4x
    the lane utilization), then depth-to-space.

    Measured on v5e: wins ~1.5x at >=64 output channels; at the flagship's
    8-32 channel decoders the depth-to-space relayout costs more than the
    dilated conv saves (full-model VGA 2.08 ms dilated vs 2.31 ms subpixel),
    so the default path stays ``conv_transpose2d``. Use this for wider
    decoder variants.

    Derivation: with output y[2i+a, 2j+b], the dilated input is nonzero only
    at odd offsets, so each output phase (a, b) sees a fixed subset of the
    3x3 taps: (0,0)->{w[1,1]}, (0,1)->{w[1,0], w[1,2]}, (1,0)->{w[0,1],
    w[2,1]}, (1,1)->{w[0,0], w[0,2], w[2,0], w[2,2]} — a 2x2 stencil over
    x[i..i+1, j..j+1].  ``w`` is this framework's pre-flipped HWIO kernel.
    """
    assert w.shape[0] == 3 and w.shape[1] == 3, "specialized to k=3"
    ci, co = int(w.shape[2]), int(w.shape[3])
    wz = jnp.zeros((ci, co), w.dtype)

    def k2(dy_dx_taps):
        # build a (2, 2, ci, co) sub-kernel from {(dy, dx): w[u, v]} taps
        rows = []
        for dy in range(2):
            cols = []
            for dx in range(2):
                cols.append(dy_dx_taps.get((dy, dx), wz))
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    phases = [
        k2({(0, 0): w[1, 1]}),                                    # (a,b)=(0,0)
        k2({(0, 0): w[1, 0], (0, 1): w[1, 2]}),                   # (0,1)
        k2({(0, 0): w[0, 1], (1, 0): w[2, 1]}),                   # (1,0)
        k2({(0, 0): w[0, 0], (0, 1): w[0, 2],
            (1, 0): w[2, 0], (1, 1): w[2, 2]}),                   # (1,1)
    ]
    # pixel_shuffle channel layout: c * 4 + a * 2 + b
    w2 = jnp.stack(phases, axis=-1)            # (2, 2, ci, co, 4)
    w2 = w2.reshape(2, 2, ci, co * 4)
    y = lax.conv_general_dilated(
        x, w2.astype(x.dtype), window_strides=(1, 1),
        padding=((0, 1), (0, 1)), dimension_numbers=_DIMSPEC,
        preferred_element_type=_pref(x, jnp.float32),
    ).astype(x.dtype)
    y = pixel_shuffle(y, 2)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
    sample_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """BatchNorm2d over the channel (last) axis with torch semantics.

    Returns (y, new_running_mean, new_running_var). In eval mode the running
    stats are returned unchanged. Statistics are always computed in f32.

    ``sample_mask`` (N,) excludes padded batch slots from the statistics (the
    static-shape batching pads partial batches — see data/device_cache.py);
    with a mask, the stats equal those the reference computes over its
    variable-size final batch.

    Under a data-sharded ``jit``, the reductions below become cross-replica
    collectives automatically, i.e. multi-chip training gets synchronized
    batch norm for free.
    """
    if train:
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if sample_mask is not None:
            m = sample_mask.astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            per_sample = 1
            for a in axes[1:]:
                per_sample *= x.shape[a]
            n = jnp.maximum(jnp.sum(m) * per_sample, 1.0)
            mean = jnp.sum(xf * m, axis=axes) / n
            var = jnp.sum(jnp.square(xf) * m, axis=axes) / n - jnp.square(mean)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        else:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)  # biased
            n = 1
            for a in axes:
                n *= x.shape[a]
            unbiased = var * (n / max(n - 1, 1))
        new_rm = (1.0 - momentum) * running_mean + momentum * mean
        new_rv = (1.0 - momentum) * running_var + momentum * unbiased
        if sample_mask is not None:
            # an ALL-padding batch (multi-host epoch tails emit zero-mask
            # batches so step counts agree — data/streaming.py) carries no
            # real samples: its zero "statistics" must not drag the running
            # mean/var toward zero
            valid = jnp.sum(sample_mask.astype(jnp.float32)) > 0
            new_rm = jnp.where(valid, new_rm, running_mean)
            new_rv = jnp.where(valid, new_rv, running_var)
    else:
        mean = running_mean.astype(jnp.float32)
        var = running_var.astype(jnp.float32)
        new_rm, new_rv = running_mean, running_var
    inv = lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
    shift = beta.astype(jnp.float32) - mean * inv
    y = (x.astype(jnp.float32) * inv + shift).astype(x.dtype)
    return y, new_rm, new_rv


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def max_pool(x: jax.Array, kernel: IntOrPair, stride: Optional[IntOrPair] = None) -> jax.Array:
    """MaxPool2d, no padding, floor division of output size (torch default)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )


def avg_pool(x: jax.Array, kernel: IntOrPair, stride: Optional[IntOrPair] = None) -> jax.Array:
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    summed = lax.reduce_window(
        x,
        jnp.array(0, x.dtype),
        lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    return summed / (kh * kw)


def adaptive_avg_pool_1(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1): global mean over H, W (keeps dims)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def dropout(rng: jax.Array, x: jax.Array, p: float, train: bool) -> jax.Array:
    """Element dropout (torch.nn.Dropout)."""
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0).astype(x.dtype)


def dropout2d(rng: jax.Array, x: jax.Array, p: float, train: bool) -> jax.Array:
    """Channel dropout (torch.nn.Dropout2d) over NHWC: drops whole channels."""
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - p), 0).astype(x.dtype)


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Dense layer; w is (in, out)."""
    y = jnp.dot(x, w.astype(x.dtype),
                preferred_element_type=_pref(x, jnp.float32)).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """PixelShuffle on NHWC: (N,H,W,C*r*r) -> (N,H*r,W*r,C).

    Matches torch.nn.PixelShuffle applied to the NCHW-equivalent tensor.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    # torch layout: channel index = c_out * r * r + i * r + j
    y = x.reshape(n, h, w, c, r, r)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return y.reshape(n, h * r, w * r, c)


def log_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.log_softmax(x, axis=axis)


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x, axis=axis)
