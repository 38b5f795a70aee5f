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
    remat: str = "none"                 # none | dots | full: jax.checkpoint
                                        # around the forward — recompute
                                        # activations in bwd instead of
                                        # storing (HBM-bound steps gain ~10%
                                        # with "dots"; numerics unchanged)


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

    def _forward(trainable: Params, state: Params, imgs, rng):
        p = {**trainable, **state}
        if packed_maps is not None:
            from robocupvision_tpu.models import packed as packed_mod

            return packed_mod.packed_train_apply(packed_maps, p, imgs,
                                                 train=True, rng=rng)
        return model.apply(p, imgs, train=True, rng=rng)

    if cfg.remat == "dots":
        _forward = jax.checkpoint(
            _forward, policy=jax.checkpoint_policies.dots_saveable)
    elif cfg.remat == "full":
        _forward = jax.checkpoint(_forward)
    elif cfg.remat != "none":
        raise ValueError(cfg.remat)

    def loss_fn(trainable: Params, state: Params, imgs, targets, mask, rng):
        if cfg.compute_dtype == "bfloat16":
            # activations run bf16 (ops cast weights per-op — a fused convert);
            # master params, BN stats and the loss stay f32.
            imgs = imgs.astype(jnp.bfloat16)
        with L.bn_stats_mask(mask):
            # padded batch slots must not contaminate BN batch statistics
            logits, mut = _forward(trainable, state, imgs, rng)
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

        # argmax over a non-minor axis: avoids XLA:TPU's packed-index argmax
        # machinery on minor-dim-1 s32 buffers (128x lane padding); same
        # values, same first-max tie-breaking
        pred = jnp.argmax(jnp.moveaxis(logits, -1, 1), axis=1)
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
                  batch_size: int, n_batches: int, n: int,
                  multipliers: Optional[Dict[str, float]] = None):
    """One jitted call per EPOCH: lax.scan over static-shape batches gathered
    from the HBM-cached dataset — the reference's whole DataLoader-plus-loop
    becomes a single XLA program with zero per-batch dispatch.

    Signature: epoch(state, images, labels, rng, lr, prune_masks) ->
    (state, summed metric dict). The shuffle permutation, last-batch padding
    and per-batch metric reduction all happen INSIDE the program: one
    dispatch and one 4-scalar fetch per epoch. (Per-batch host work is
    poison on remote-dispatch transports — the axon tunnel charges ~29 ms
    RTT per synchronous hop and ~1 s per cold eager op; see PERF.md.)
    ``n`` is the number of real samples; n_batches*batch_size - n slots are
    padding, excluded from stats via the sample mask.
    """
    step = _train_step_body(model, tx, cfg, multipliers)
    epoch_scan = _make_epoch_scan(step, batch_size, n_batches, n)
    return jax.jit(epoch_scan, donate_argnums=(0,))


def _make_epoch_scan(step, batch_size: int, n_batches: int, n: int):
    """One scanned training epoch: shuffle, pad, gather, step, metric-sum —
    shared by make_epoch_fn and make_train_run_fn so the two paths can never
    diverge. Returns epoch(state, images, labels, rng, lr, prune_masks) ->
    (state, summed metric dict)."""
    pad = n_batches * batch_size - n

    def epoch(state: TrainState, images, labels, rng, lr,
              prune_masks: Optional[Params]):
        perm_rng, step_rng = jax.random.split(rng)
        perm = jax.random.permutation(perm_rng, n)
        if pad > 0:
            perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        valid_mask = jnp.concatenate(
            [jnp.ones((n,), jnp.float32), jnp.zeros((max(pad, 0),), jnp.float32)])

        def body(carry, bi):
            st = carry
            start = bi * batch_size
            idx = jax.lax.dynamic_slice_in_dim(perm, start, batch_size)
            bimgs = jnp.take(images, idx, axis=0)
            btgt = jnp.take(labels, idx, axis=0)
            bmask = jax.lax.dynamic_slice_in_dim(valid_mask, start, batch_size)
            st, out = step(st, bimgs, btgt, bmask,
                           jax.random.fold_in(step_rng, bi), lr, prune_masks)
            return st, out

        state, outs = jax.lax.scan(body, state, jnp.arange(n_batches))
        return state, jax.tree.map(lambda x: jnp.sum(x, axis=0), outs)

    return epoch


def make_train_run_fn(model: Model, tx: optax.GradientTransformation,
                      cfg: StepCfg, batch_size: int, n: int,
                      val_batch_size: int, val_n: int, epochs: int,
                      multipliers: Optional[Dict[str, float]] = None):
    """The ENTIRE train.py epoch loop as ONE compiled program: train epochs,
    per-epoch validation, best-model selection, pruned-fraction reporting —
    a lax.scan over epochs of lax.scans over batches, with the running best
    params carried on device.

    Why: the host only needs the metrics *after* the run to print them and
    the best params to write the checkpoint — so the program fetches nothing
    until everything is done. One dispatch + one fetch per training run.
    (On the axon tunnel this matters enormously: the FIRST device->host copy
    permanently degrades per-dispatch latency to ~RTT (measured 450 -> 47
    steps/s), so a per-epoch metrics fetch caps training at ~1/10 of the
    chip; locally it is still strictly fewer round-trips.)

    Returns run(state, images, labels, val_images, val_labels, rng, lrs,
    prune_masks, carry_in) -> (state, best_score, best_params,
    per_epoch_metrics) with lrs a (epochs,) f32 vector (precompute the
    cosine schedule host-side). ``carry_in`` is None to start fresh
    (best_score 0, best_params = current params) or a (best_score,
    best_params) pair from a previous call — this is what lets
    Trainer.train_run split a long run into K-epoch chunks (durable
    checkpoints + live prints between dispatches) without giving up the
    scanned-epochs design. Seg losses only (ce2d | dice) — matches
    reference train.py.
    """
    assert cfg.loss in ("ce2d", "dice"), "train_run is the seg train loop"
    from robocupvision_tpu.data.device_cache import num_batches
    from robocupvision_tpu.ops.metrics import seg_finalize
    from robocupvision_tpu.ops.pruning import near_zero_fraction_traceable

    step = _train_step_body(model, tx, cfg, multipliers)
    ev = _eval_step_body(model, cfg)
    n_batches = num_batches(n, batch_size)
    vn_batches = num_batches(val_n, val_batch_size)
    train_one_epoch = _make_epoch_scan(step, batch_size, n_batches, n)
    param_order = model.param_order

    def run(state: TrainState, images, labels, val_images, val_labels, rng,
            lrs, prune_masks: Optional[Params], carry_in=None):
        def val_one_epoch(params):
            def body(carry, bi):
                pos = bi * val_batch_size + jnp.arange(val_batch_size)
                idx = jnp.clip(pos, 0, val_n - 1)
                bmask = (pos < val_n).astype(jnp.float32)
                out = ev(params, jnp.take(val_images, idx, axis=0),
                         jnp.take(val_labels, idx, axis=0), bmask)
                out.pop("pred", None)
                return carry, out

            _, outs = jax.lax.scan(body, None, jnp.arange(vn_batches))
            return jax.tree.map(lambda x: jnp.sum(x, axis=0), outs)

        def epoch_body(carry, ei):
            st, best_score, best_params = carry
            st, tr_out = train_one_epoch(st, images, labels,
                                         jax.random.fold_in(rng, ei),
                                         lrs[ei], prune_masks)
            vout = val_one_epoch(st.params)
            fin = seg_finalize(vout["acc"], cfg.out_size)
            score = fin["score"]
            better = score > best_score
            best_params = jax.tree.map(
                lambda b, c: jnp.where(better, c, b), best_params, st.params)
            best_score = jnp.where(better, score, best_score)
            em = {
                "train_loss": tr_out["loss"] / max(n_batches, 1),
                "train_reg": tr_out["reg"] / max(n_batches, 1),
                "train_pixel_acc": tr_out["correct"] * cfg.out_size * 100.0
                / jnp.maximum(tr_out["img_cnt"], 1.0),
                "val_loss": vout["loss"] / max(vn_batches, 1),
                "pixel_acc": fin["pixel_acc"],
                "mean_class_acc": fin["mean_class_acc"],
                "mean_iou": fin["mean_iou"],
                "score": score,
                "conf": fin["conf"],
                "better": better,
                "pruned": near_zero_fraction_traceable(st.params, param_order),
            }
            return (st, best_score, best_params), em

        if carry_in is None:
            best0, bparams0 = jnp.float32(0.0), state.params
        else:
            best0, bparams0 = carry_in
        (state, best_score, best_params), ms = jax.lax.scan(
            epoch_body, (state, best0, bparams0), jnp.arange(epochs))
        return state, best_score, best_params, ms

    return jax.jit(run, donate_argnums=(0,))


def make_eval_step(model: Model, cfg: StepCfg):
    """Jitted eval: forward + loss + on-device confusion/IoU accumulation."""
    return jax.jit(_eval_step_body(model, cfg))


def _eval_step_body(model: Model, cfg: StepCfg):
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
        # argmax over a non-minor axis: avoids XLA:TPU's packed-index argmax
        # machinery on minor-dim-1 s32 buffers (128x lane padding); same
        # values, same first-max tie-breaking
        pred = jnp.argmax(jnp.moveaxis(logits, -1, 1), axis=1)
        if cfg.loss == "ce":
            conf, correct = metrics.class_batch_stats(pred, targets,
                                                      cfg.num_classes, sample_mask)
            return {"loss": loss, "conf": conf, "correct": correct,
                    "img_cnt": jnp.sum(sample_mask)}
        acc = metrics.seg_batch_stats(pred, targets, cfg.num_classes, sample_mask)
        return {"loss": loss, "acc": acc, "pred": pred}

    return step


def init_state(model: Model, tx: optax.GradientTransformation,
               rng: jax.Array) -> TrainState:
    params = model.init(rng)
    trainable, _ = L.split_params(params)
    return TrainState(params, tx.init(trainable))
