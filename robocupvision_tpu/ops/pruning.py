"""Magnitude pruning with the reference's three strategies.

All operate on the flat ordered param dict; "prunable" tensors are the dim>1
weights in registration order, matching the reference's
``for param in model.parameters(): if param.dim() > 1`` walks. Each strategy
returns (new_params, masks) where masks[name] is True at pruned positions —
the train step zeroes those gradient entries (train.py:59-65).

Unstructured sparsity gives no TPU-time speedup (the MXU runs dense); masks
exist for parity, for the sparsity-aware analytic op counts
(model.py:118-124), and for the exported deployment engine.

Strategies (reference locations):
- prune_band:      std-seeded binary search to 73-77% per tensor (model.py:621-642)
- prune_topk:      size-adaptive top-k ratio pruning (model.py:644-672)
- prune_threshold: 1%-of-max threshold pruning (model.py:45-57)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from robocupvision_tpu.models.layers import is_weight

Params = Dict[str, "np.ndarray"]


def prunable_names(order: List[str], params: Params) -> List[str]:
    return [n for n in order if is_weight(n) and np.ndim(params[n]) > 1]


def prune_band(params: Params, order: List[str], lower: float = 73.0,
               upper: float = 77.0, verbose: bool = True) -> Tuple[Params, Dict[str, np.ndarray]]:
    new = dict(params)
    masks: Dict[str, np.ndarray] = {}
    for name in prunable_names(order, params):
        p = np.asarray(params[name]).copy()
        thresh = float(p.std())
        while True:
            nz = float(np.sum(p != 0))
            num = float(np.sum(np.abs(p) < thresh)) / max(nz, 1.0) * 100.0
            if num < lower:
                thresh *= 1.025
            elif num > upper:
                thresh *= 0.975
            else:
                break
        mask = np.abs(p) < thresh
        if verbose:
            print("Pruned %f%% of the weights" % (mask.sum() / max(float(np.sum(p != 0)), 1.0) * 100.0))
        p[mask] = 0
        new[name] = p
        masks[name] = mask
    return new, masks


def prune_topk(params: Params, order: List[str], ratio: float,
               low_t: int, high_t: int, verbose: bool = True) -> Tuple[Params, Dict[str, np.ndarray]]:
    new = dict(params)
    masks: Dict[str, np.ndarray] = {}
    for name in prunable_names(order, params):
        p = np.asarray(params[name]).copy()
        r = ratio
        size = p.size
        if size < 100:
            r = 0.0
        elif size < low_t:
            r = ratio * 0.8
        if size > high_t:
            r = ratio * 1.05
        flat = p.reshape(-1)
        amount = int(flat.size * r)
        if amount > 0:
            idx = np.argpartition(np.abs(flat), amount - 1)[:amount]
            flat[idx] = 0.0
        if verbose:
            print("Pruned %d of %d weights (%.3f%%)" % (amount, flat.size, r))
        p = flat.reshape(p.shape)
        new[name] = p
        masks[name] = p == 0.0
    return new, masks


def prune_threshold(params: Params, order: List[str], ratio: float = 0.01,
                    verbose: bool = True) -> Tuple[Params, Dict[str, np.ndarray]]:
    new = dict(params)
    masks: Dict[str, np.ndarray] = {}
    for name in prunable_names(order, params):
        p = np.asarray(params[name]).copy()
        thresh = float(np.max(np.abs(p))) * ratio
        mask = np.abs(p) < thresh
        if verbose:
            print("Pruned %f%% of the weights" % (
                float(mask.sum()) / max(float(np.sum(p != 0)), 1.0) * 100.0))
        p[mask] = 0
        new[name] = p
        masks[name] = mask
    return new, masks


def count_zero_weights(params: Params, order: List[str]) -> float:
    """Fraction of weights below 1% of per-tensor max-abs, over all trainable
    tensors (reference model.py:59-66 — despite the name it counts *near*-zeros)."""
    near_zero = 0.0
    total = 0
    for name in order:
        if not is_weight(name):
            continue
        p = np.asarray(params[name])
        m = np.max(np.abs(p)) if p.size else 0.0
        near_zero += float(np.sum(np.abs(p) < m * 0.01))
        total += p.size
    return near_zero / max(total, 1)


def near_zero_fraction_traceable(params, order: List[str]):
    """count_zero_weights as jnp ops (jit-traceable): fraction of trainable
    weights below 1% of per-tensor max-abs. One definition shared by
    Trainer.pruned_fraction and the fused train run — keep in sync with
    :func:`count_zero_weights` above (reference model.py:59-66)."""
    import jax.numpy as jnp

    near = jnp.float32(0.0)
    total = 0
    for name in order:
        if not is_weight(name):
            continue
        p = params[name]
        m = jnp.max(jnp.abs(p)) if p.size else jnp.float32(0.0)
        near = near + jnp.sum((jnp.abs(p) < m * 0.01).astype(jnp.float32))
        total += p.size
    return near / max(total, 1)


def mask_gradients(grads: Params, masks: Dict[str, np.ndarray]) -> Params:
    """Zero gradient entries at pruned positions (jit-friendly)."""
    import jax.numpy as jnp

    out = dict(grads)
    for name, mask in masks.items():
        if name in out:
            out[name] = jnp.where(jnp.asarray(mask), 0.0, out[name])
    return out
