"""Losses with reference semantics (reference model.py:5-43, 76-82).

All take NHWC logits and integer NHW targets, plus an optional per-pixel
validity mask so padded batches (static-shape TPU batching) contribute zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_2d(logits: jax.Array, targets: jax.Array,
                     class_weights: Optional[jax.Array] = None,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """Pixel-wise weighted NLL over log_softmax (CrossEntropyLoss2d).

    Matches torch NLLLoss(weight, reduction='mean'): the mean is weighted —
    sum(w[t] * nll) / sum(w[t]).

    Precondition: targets in [0, num_classes). The one-hot formulation drops
    out-of-range labels from numerator AND denominator (torch's
    take_along_axis semantics would clamp them instead) — all in-repo label
    paths (mask_label, dataset loaders) guarantee in-range targets.
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = targets.astype(jnp.int32)
    # one-hot select instead of take_along_axis: bit-identical (0/1 mask
    # picks the element exactly), but avoids gather/scatter over buffers
    # whose minor dim is 1 — XLA:TPU pads those to 128 lanes, and the CE
    # gather (+ its scatter-add backward) dominated the train step
    # (measured 54 -> 92 steps/s b64 QVGA from this change alone; PERF.md)
    oh = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
    # where() instead of logp*oh: avoids -inf * 0 -> NaN when a logit
    # saturates (bf16 divergence) and some class's log-prob is -inf
    nll = -jnp.sum(jnp.where(oh > 0, logp, 0.0), axis=-1)
    if class_weights is None:
        w = jnp.ones((num_classes,), jnp.float32)
    else:
        w = class_weights.astype(jnp.float32)
    pw = jnp.sum(w * oh, axis=-1)
    if mask is not None:
        pw = pw * mask.astype(jnp.float32)
    return jnp.sum(nll * pw) / jnp.maximum(jnp.sum(pw), 1e-12)


def cross_entropy(logits: jax.Array, targets: jax.Array,
                  class_weights: Optional[jax.Array] = None,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Classification CE (torch.nn.CrossEntropyLoss) over (B, C) logits."""
    return cross_entropy_2d(logits, targets, class_weights, mask)


def dice_loss(logits: jax.Array, targets: jax.Array, class_weights: jax.Array,
              mask: Optional[jax.Array] = None, eps: float = 1e-7) -> jax.Array:
    """Class-weighted Sørensen–Dice loss (reference model.py:5-43).

    Weights are renormalized to sum to C. The 1-class case uses sigmoid with
    (pos, neg) channels, matching the reference's channel ordering.
    """
    num_classes = logits.shape[-1]
    w = class_weights.astype(jnp.float32)
    w = w / jnp.sum(w) * w.shape[0]
    tgt = targets.astype(jnp.int32)
    if num_classes == 1:
        pos = jax.nn.sigmoid(logits.astype(jnp.float32))
        probas = jnp.concatenate([pos, 1.0 - pos], axis=-1)
        oh = jax.nn.one_hot(tgt, 2, dtype=jnp.float32)
        one_hot = jnp.stack([oh[..., 1], oh[..., 0]], axis=-1)
    else:
        probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        one_hot = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        probas = probas * m
        one_hot = one_hot * m
    axes = tuple(i for i in range(probas.ndim - 1))  # reduce all but class
    intersection = jnp.sum(probas * one_hot, axis=axes)
    cardinality = jnp.sum(probas + one_hot, axis=axes)
    dice = jnp.mean(2.0 * w * intersection / (cardinality + eps))
    return 1.0 - dice


def l1_regularization(params) -> jax.Array:
    """Sum of absolute values over all trainable tensors (train.py:23-27)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.abs(p)) for p in leaves)
