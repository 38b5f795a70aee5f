"""On-device segmentation metrics.

Replaces the reference's O(C^2 * B) pure-Python confusion/IoU accumulation
(reference train.py:136-153 — its main eval bottleneck) with a vectorized
one-hot matmul on device. Conventions reproduced exactly:

- conf[pred, lab] counts pixels, later normalized per label column by
  labCnts/100 (train.py:157-159).
- IoU is accumulated *per image per class*, with empty-union counting as 1
  (train.py:149-153); meanIoU = sum_c(IoU_c / imgCnt) / C * 100.
- score = (meanClassAcc + meanIoU) / 2 (train.py:164).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SegAccum:
    """Host-side accumulator over eval batches (device arrays inside)."""

    conf: jax.Array          # (C, C) conf[pred, lab] pixel counts
    iou_sum: jax.Array       # (C,) per-image IoU sums
    lab_cnts: jax.Array      # (C,)
    correct: jax.Array       # scalar: correctly classified pixels
    img_cnt: jax.Array       # scalar: number of (valid) images

    @classmethod
    def zero(cls, num_classes: int) -> "SegAccum":
        """Host-side (numpy) zero accumulator — cross-batch accumulation runs
        on host so eval loops never issue eager device ops per batch."""
        import numpy as np

        z = np.zeros
        return cls(z((num_classes, num_classes), np.float64),
                   z((num_classes,), np.float64), z((num_classes,), np.float64),
                   z((), np.float64), z((), np.float64))

    def __add__(self, other: "SegAccum") -> "SegAccum":
        return SegAccum(self.conf + other.conf, self.iou_sum + other.iou_sum,
                        self.lab_cnts + other.lab_cnts,
                        self.correct + other.correct,
                        self.img_cnt + other.img_cnt)


jax.tree_util.register_dataclass(
    SegAccum, data_fields=["conf", "iou_sum", "lab_cnts", "correct", "img_cnt"],
    meta_fields=[])


def seg_batch_stats(pred_cls: jax.Array, targets: jax.Array, num_classes: int,
                    sample_mask: Optional[jax.Array] = None,
                    impl: str = "auto") -> SegAccum:
    """Per-batch contribution; pred_cls/targets are (B, H, W) int arrays.

    ``sample_mask`` (B,) zeroes out padded samples in every statistic.
    ``impl``: "einsum" (one-hot matmul), "pallas" (direct integer-map counting
    kernel — ~2*C less HBM traffic), or "auto" (pallas on TPU backends).
    """
    b = pred_cls.shape[0]
    pred = pred_cls.astype(jnp.int32)
    tgt = targets.astype(jnp.int32)
    m = (jnp.ones((b,), jnp.float32) if sample_mask is None
         else sample_mask.astype(jnp.float32))

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "einsum"
    if impl == "pallas":
        from robocupvision_tpu.ops.pallas_kernels import confusion_matrix_pallas

        conf_img = confusion_matrix_pallas(pred, tgt, num_classes)
    else:
        oh_pred = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
        oh_tgt = jax.nn.one_hot(tgt, num_classes, dtype=jnp.float32)
        # per-image confusion: (B, Cpred, Clab)
        conf_img = jnp.einsum("bhwp,bhwl->bpl", oh_pred, oh_tgt)
    inter = jnp.einsum("bcc->bc", conf_img)
    pred_cnt = jnp.sum(conf_img, axis=2)
    lab_cnt = jnp.sum(conf_img, axis=1)
    union = pred_cnt + lab_cnt - inter
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))

    conf = jnp.einsum("bpl,b->pl", conf_img, m)
    return SegAccum(
        conf=conf,
        iou_sum=jnp.einsum("bc,b->c", iou, m),
        lab_cnts=jnp.einsum("bc,b->c", lab_cnt, m),
        correct=jnp.sum(inter.sum(axis=1) * m),
        img_cnt=jnp.sum(m),
    )


def seg_finalize(acc: SegAccum, out_size: float) -> dict:
    """Final metrics matching the reference's printed quantities."""
    num_classes = acc.conf.shape[0]
    conf = jnp.asarray(acc.conf, jnp.float32)
    lab = jnp.maximum(acc.lab_cnts, 1e-12)
    conf_norm = conf / (lab[None, :] / 100.0)
    mean_class_acc = jnp.trace(conf_norm) / num_classes
    mean_iou = jnp.sum(acc.iou_sum / jnp.maximum(acc.img_cnt, 1.0)) / num_classes * 100.0
    pixel_acc = acc.correct * out_size * 100.0 / jnp.maximum(acc.img_cnt, 1.0)
    return {
        "conf": conf_norm,
        "conf_raw": conf,
        "pixel_acc": pixel_acc,
        "mean_class_acc": mean_class_acc,
        "mean_iou": mean_iou,
        "score": (mean_class_acc + mean_iou) / 2.0,
    }


seg_batch_stats_jit = jax.jit(seg_batch_stats, static_argnums=(2,))


def to_host(acc: SegAccum) -> SegAccum:
    import numpy as np

    return SegAccum(np.asarray(acc.conf), np.asarray(acc.iou_sum),
                    np.asarray(acc.lab_cnts), np.asarray(acc.correct),
                    np.asarray(acc.img_cnt))


def seg_batch_stats_host(pred_cls, targets, num_classes: int,
                         sample_mask=None) -> SegAccum:
    """Jitted stats + host-side numpy accumulator fields.

    Eager per-op dispatch is pathologically slow over remote TPU transports;
    per-sample eval loops (tester/validLabelProp) must use this jitted entry.
    """
    return to_host(seg_batch_stats_jit(pred_cls, targets, num_classes,
                                       sample_mask))


def class_batch_stats(pred_cls: jax.Array, targets: jax.Array,
                      num_classes: int,
                      sample_mask: Optional[jax.Array] = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Classification confusion counts + correct count (classTrainer.py:144-146)."""
    m = (jnp.ones(pred_cls.shape[0], jnp.float32) if sample_mask is None
         else sample_mask.astype(jnp.float32))
    oh_pred = jax.nn.one_hot(pred_cls.astype(jnp.int32), num_classes, dtype=jnp.float32)
    oh_tgt = jax.nn.one_hot(targets.astype(jnp.int32), num_classes, dtype=jnp.float32)
    conf = jnp.einsum("bp,bl,b->pl", oh_pred, oh_tgt, m)
    correct = jnp.sum((pred_cls == targets).astype(jnp.float32) * m)
    return conf, correct
