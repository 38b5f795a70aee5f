"""Optimizers with PyTorch semantics and per-name learning-rate groups.

The reference uses torch.optim.Adam with a 10x LR on the first ``transfer``
encoder levels (train.py:357-363) and torch.optim.SGD(momentum, weight_decay)
elsewhere (trainer.py:182-184). Param groups here are per-name LR multipliers
over the flat param dict — the transform produces a pre-LR "direction" and
``apply_updates`` scales by (lr * multiplier[name]), so LR schedules never
trigger recompilation (lr is a traced scalar).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

Params = Dict[str, jax.Array]


def adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """Direction = Adam step (torch defaults), before LR scaling."""
    return optax.scale_by_adam(b1=b1, b2=b2, eps=eps)


def sgd(momentum: float = 0.0, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.SGD: grad += wd * param; buf = m * buf + grad; step = buf."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    if not parts:
        parts.append(optax.identity())
    return optax.chain(*parts)


def transfer_multipliers(order, transfer: int, base: float = 10.0) -> Dict[str, float]:
    """10x LR on params of downPart levels [0, transfer) (train.py:357-363)."""
    mult = {}
    for name in order:
        m = 1.0
        if transfer > 0 and name.startswith("downPart.Level"):
            level = int(name.split("Level")[1].split(".")[0])
            if level < transfer:
                m = base
        mult[name] = m
    return mult


def apply_updates(params: Params, direction: Params, lr: jax.Array,
                  multipliers: Optional[Dict[str, float]] = None) -> Params:
    """params - lr * mult * direction (torch minimizing convention)."""
    out = {}
    for name, p in params.items():
        m = 1.0 if multipliers is None else multipliers.get(name, 1.0)
        out[name] = p - lr * m * direction[name]
    return out


def cosine_annealing_lr(base_lr: float, t_max: int, eta_min: float = 0.0
                        ) -> Callable[[int], float]:
    """CosineAnnealingLR by epoch (reference lr_scheduler.py:180-210)."""
    import math

    def lr(epoch: int) -> float:
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / t_max)) / 2

    return lr
