"""Jitted train / eval steps.

One compiled step covers everything the reference does per batch
(train.py:43-94): on-device augmentation, label class-ablation remap, forward,
loss (+ L1 regularization), backward, pruning-mask gradient zeroing, optimizer
update, BN running-stat merge, and metric accumulation — no host round-trips
inside the epoch.

State is a flat pytree-of-dicts (``TrainState``), shardable with
``jax.sharding`` (params replicated, batch data-parallel, optionally spatially
partitioned — see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from robocupvision_tpu.models import layers as L
from robocupvision_tpu.models.zoo import Model
from robocupvision_tpu.ops import color, labels, losses, metrics

Params = Dict[str, jax.Array]


@dataclasses.dataclass
class TrainState:
    params: Params        # trainable + BN running stats (flat, ordered names)
    opt_state: object


jax.tree_util.register_dataclass(TrainState, data_fields=["params", "opt_state"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class StepCfg:
    num_classes: int
    loss: str = "ce2d"                  # ce2d | dice | ce (classification)
    class_weights: Tuple[float, ...] = ()
    l1_decay: float = 0.0               # train.py:52-54 manual L1 term
    mask_flags: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    augment: bool = True                # on-device augmentation
    augment_mode: str = "ssyuv"         # ssyuv: hflip + YUV jitter (train.py)
                                        # legacy: hflip+vflip+RGB ColorJitter
                                        #         (trainer.py:88-104)
                                        # legacy_hflip: hflip+RGB ColorJitter
                                        #         (classTrainer.py:55-62)
    jitter: bool = True
    out_size: float = 1.0               # 1/(H*W) pixel-acc normalizer
    compute_dtype: str = "float32"      # "bfloat16": bf16 fwd/bwd, f32 master
                                        # weights + f32 loss/stats/optimizer
    packed: bool = False                # lane-packed training graph (ROBO-UNet
                                        # CE path only) — exact rewrite, same
                                        # params/opt/checkpoints; see
                                        # models/packed.py packed_train_apply


def _loss(cfg: StepCfg, logits, targets, mask):
    w = jnp.asarray(cfg.class_weights, jnp.float32) if cfg.class_weights else None
    pixel_mask = None
    if mask is not None:
        if logits.ndim >= 4:  # (N,H,W,C) or packed (N,Hp,Wp,16,C)
            pixel_mask = mask.reshape((-1,) + (1,) * (targets.ndim - 1)) \
                * jnp.ones(targets.shape, jnp.float32)
        else:
            pixel_mask = mask
    if cfg.loss == "dice":
        return losses.dice_loss(logits, targets, w if w is not None
                                else jnp.ones(cfg.num_classes), pixel_mask)
    return losses.cross_entropy_2d(logits, targets, w, pixel_mask)


def make_train_step(model: Model, tx: optax.GradientTransformation, cfg: StepCfg,
                    multipliers: Optional[Dict[str, float]] = None,
                    donate: bool = True):
    """Returns jitted step(state, imgs, targets, sample_mask, rng, lr,
    prune_masks) -> (state, metrics dict).

    ``prune_masks`` is a dict of 0/1 arrays (1 = pruned) for the dim>1 weights,
    or None for no masking — passed as traced args so the same executable
    serves masked and unmasked epochs when shapes match.
    """
    step = _train_step_body(model, tx, cfg, multipliers)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _train_step_body(model: Model, tx: optax.GradientTransformation,
                     cfg: StepCfg, multipliers: Optional[Dict[str, float]] = None):
    """The un-jitted step body — jitted directly by make_train_step, or
    scanned over a whole epoch by make_epoch_fn."""
    nb, nr, ng, nl = cfg.mask_flags

    packed_maps = None
    if cfg.packed:
        from robocupvision_tpu.models import packed as packed_mod

        assert cfg.loss == "ce2d", "packed training supports the ce2d path"
        packed_maps = packed_mod.build_train_pack_maps(model)

    def loss_fn(trainable: Params, state: Params, imgs, targets, mask, rng):
        p = {**trainable, **state}
        if cfg.compute_dtype == "bfloat16":
            # activations run bf16 (ops cast weights per-op — a fused convert);
            # master params, BN stats and the loss stay f32.
            imgs = imgs.astype(jnp.bfloat16)
        with L.bn_stats_mask(mask):
            # padded batch slots must not contaminate BN batch statistics
            if packed_maps is not None:
                from robocupvision_tpu.models import packed as packed_mod

                logits, mut = packed_mod.packed_train_apply(
                    packed_maps, p, imgs, train=True, rng=rng)
            else:
                logits, mut = model.apply(p, imgs, train=True, rng=rng)
        if cfg.loss == "ce":
            logits = logits.reshape(logits.shape[0], -1)  # squeeze 1x1 spatial
        task_loss = _loss(cfg, logits, targets, mask)
        reg = jnp.asarray(0.0, jnp.float32)
        if cfg.l1_decay:
            reg = cfg.l1_decay * losses.l1_regularization(trainable)
        total = task_loss + reg
        return total, (mut, logits, reg)

    if cfg.augment_mode == "ssyuv":
        _augment = color.augment_batch
    elif cfg.augment_mode == "legacy":
        def _augment(rng, imgs, labels, jitter=True):
            return color.legacy_augment_batch(rng, imgs, labels, jitter, True)
    elif cfg.augment_mode == "legacy_hflip":
        def _augment(rng, imgs, labels, jitter=True):
            return color.legacy_augment_batch(rng, imgs, labels, jitter, False)
    else:
        raise ValueError(cfg.augment_mode)

    def step(state: TrainState, imgs, targets, sample_mask, rng, lr,
             prune_masks: Optional[Params]):
        aug_rng, drop_rng = jax.random.split(rng)
        if cfg.augment and cfg.loss != "ce":
            imgs, targets = _augment(aug_rng, imgs, targets, cfg.jitter)
        elif cfg.augment:
            imgs, _ = _augment(
                aug_rng, imgs, jnp.zeros(imgs.shape[:3], jnp.int32), cfg.jitter)
        targets = labels.mask_label(targets, nb, nr, ng, nl)
        if packed_maps is not None:
            from robocupvision_tpu.models import packed as packed_mod

            targets = packed_mod.pack_targets(targets)

        trainable, bn_state = L.split_params(state.params)
        (total, (mut, logits, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, bn_state, imgs, targets,
                                   sample_mask, drop_rng)
        if prune_masks is not None:
            grads = {k: jnp.where(prune_masks[k] > 0, 0.0, g) if k in prune_masks
                     else g for k, g in grads.items()}

        direction, opt_state = tx.update(grads, state.opt_state, trainable)
        from robocupvision_tpu.train.optim import apply_updates

        trainable = apply_updates(trainable, direction, lr, multipliers)
        new_params = {**trainable, **bn_state, **mut}

        pred = jnp.argmax(logits, axis=-1)
        m = sample_mask.astype(jnp.float32)
        if cfg.loss == "ce":
            correct = jnp.sum((pred == targets).astype(jnp.float32) * m)
        else:
            correct = jnp.sum(
                (pred == targets).astype(jnp.float32)
                * m.reshape((-1,) + (1,) * (targets.ndim - 1)))
        out = {
            "loss": total, "reg": reg,
            "correct": correct,
            "img_cnt": jnp.sum(m),
        }
        return TrainState(new_params, opt_state), out

    return step


def make_epoch_fn(model: Model, tx: optax.GradientTransformation, cfg: StepCfg,
                  batch_size: int, n_batches: int,
                  multipliers: Optional[Dict[str, float]] = None):
    """One jitted call per EPOCH: lax.scan over static-shape batches gathered
    from the HBM-cached dataset — the reference's whole DataLoader-plus-loop
    becomes a single XLA program with zero per-batch dispatch.

    Signature: epoch(state, images, labels, perm, valid_mask, rng, lr,
    prune_masks) -> (state, stacked per-batch metric dict). ``perm`` is a
    padded index vector of length n_batches * batch_size; ``valid_mask``
    marks real (non-padding) positions.
    """
    step = _train_step_body(model, tx, cfg, multipliers)

    def epoch(state: TrainState, images, labels, perm, valid_mask, rng, lr,
              prune_masks: Optional[Params]):
        def body(carry, bi):
            st = carry
            start = bi * batch_size
            idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
            bimgs = jnp.take(images, idx, axis=0)
            btgt = jnp.take(labels, idx, axis=0)
            bmask = jax.lax.dynamic_slice_in_dim(valid_mask, start, batch_size)
            st, out = step(st, bimgs, btgt, bmask,
                           jax.random.fold_in(rng, bi), lr, prune_masks)
            return st, out

        return jax.lax.scan(body, state, jnp.arange(n_batches))

    return jax.jit(epoch, donate_argnums=(0,))


def make_eval_step(model: Model, cfg: StepCfg):
    """Jitted eval: forward + loss + on-device confusion/IoU accumulation."""
    nb, nr, ng, nl = cfg.mask_flags

    def step(params: Params, imgs, targets, sample_mask):
        targets = labels.mask_label(targets, nb, nr, ng, nl)
        if cfg.compute_dtype == "bfloat16":
            imgs = imgs.astype(jnp.bfloat16)
        logits, _ = model.apply(params, imgs, train=False)
        if cfg.loss == "ce":
            logits = logits.reshape(logits.shape[0], -1)
        loss = _loss(cfg, logits, targets, sample_mask)
        if cfg.l1_decay:
            # the reference's valid() adds the L1 term too (train.py:117-124)
            trainable, _ = L.split_params(params)
            loss = loss + cfg.l1_decay * losses.l1_regularization(trainable)
        pred = jnp.argmax(logits, axis=-1)
        if cfg.loss == "ce":
            conf, correct = metrics.class_batch_stats(pred, targets,
                                                      cfg.num_classes, sample_mask)
            return {"loss": loss, "conf": conf, "correct": correct,
                    "img_cnt": jnp.sum(sample_mask)}
        acc = metrics.seg_batch_stats(pred, targets, cfg.num_classes, sample_mask)
        return {"loss": loss, "acc": acc, "pred": pred}

    return jax.jit(step)


def init_state(model: Model, tx: optax.GradientTransformation,
               rng: jax.Array) -> TrainState:
    params = model.init(rng)
    trainable, _ = L.split_params(params)
    return TrainState(params, tx.init(trainable))
