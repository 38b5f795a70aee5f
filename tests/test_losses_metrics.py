"""Losses, metrics, label transforms, pruning — parity with torch/reference
conventions."""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robocupvision_tpu.ops import color, labels, losses, metrics, pruning

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def test_cross_entropy_2d_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 6, 8)).astype(np.float32)  # NCHW
    tgt = rng.integers(0, 5, (2, 6, 8))
    w = np.array([1, 10, 30, 10, 2], np.float32)

    ref = F.nll_loss(F.log_softmax(torch.from_numpy(logits), 1),
                     torch.from_numpy(tgt), torch.from_numpy(w)).item()
    got = losses.cross_entropy_2d(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(tgt),
        jnp.asarray(w))
    assert abs(float(got) - ref) < 1e-5


def test_dice_loss_matches_reference():
    import model as refmodel

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 5, 6, 8)).astype(np.float32)
    tgt = rng.integers(0, 5, (2, 6, 8))
    w = torch.tensor([1.0, 2, 6, 3, 2])

    ref = refmodel.DiceLoss(w)(torch.from_numpy(logits), torch.from_numpy(tgt)).item()
    got = losses.dice_loss(
        jnp.asarray(np.transpose(logits, (0, 2, 3, 1))), jnp.asarray(tgt),
        jnp.asarray(w.numpy()))
    assert abs(float(got) - ref) < 1e-5


def test_masked_loss_ignores_padded_samples():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((3, 6, 8, 5)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 5, (3, 6, 8)))
    w = jnp.asarray(np.ones(5, np.float32))
    mask = jnp.asarray(np.array([1.0, 1.0, 0.0], np.float32))[:, None, None] * jnp.ones((3, 6, 8))
    full = losses.cross_entropy_2d(logits[:2], tgt[:2], w)
    masked = losses.cross_entropy_2d(logits, tgt, w, mask=mask)
    assert abs(float(full) - float(masked)) < 1e-6


def _reference_metric_loop(pred_cls, targets, num_classes):
    """The reference's per-image python accumulation (train.py:136-163),
    re-expressed in numpy as the oracle for the vectorized version."""
    b = pred_cls.shape[0]
    conf = np.zeros((num_classes, num_classes))
    iou = np.zeros(num_classes)
    lab_cnts = np.zeros(num_classes)
    for i in range(b):
        for lab in range(num_classes):
            t_mask = targets[i] == lab
            lab_cnts[lab] += t_mask.sum()
            for pr in range(num_classes):
                p_mask = pred_cls[i] == pr
                inter = np.sum(p_mask & t_mask)
                conf[pr, lab] += inter
                if pr == lab:
                    union = np.sum(p_mask | t_mask)
                    iou[lab] += 1.0 if union == 0 else inter / union
    return conf, iou, lab_cnts


def test_seg_stats_match_reference_loop():
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 4, (5, 12, 16))
    # ensure at least one empty-union class (class 4 absent everywhere)
    tgt = rng.integers(0, 4, (5, 12, 16))
    acc = metrics.seg_batch_stats(jnp.asarray(pred), jnp.asarray(tgt), 5)
    conf, iou, lab = _reference_metric_loop(pred, tgt, 5)
    np.testing.assert_allclose(np.asarray(acc.conf), conf, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc.iou_sum), iou, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc.lab_cnts), lab, rtol=1e-6)
    assert float(acc.img_cnt) == 5

    fin = metrics.seg_finalize(acc, 1.0 / (12 * 16))
    mean_iou_ref = np.sum(iou / 5) / 5 * 100
    assert abs(float(fin["mean_iou"]) - mean_iou_ref) < 1e-4


def test_seg_stats_sample_mask():
    rng = np.random.default_rng(4)
    pred = rng.integers(0, 5, (4, 8, 8))
    tgt = rng.integers(0, 5, (4, 8, 8))
    full = metrics.seg_batch_stats(jnp.asarray(pred[:2]), jnp.asarray(tgt[:2]), 5)
    masked = metrics.seg_batch_stats(jnp.asarray(pred), jnp.asarray(tgt), 5,
                                     jnp.asarray(np.array([1, 1, 0, 0], np.float32)))
    np.testing.assert_allclose(np.asarray(masked.conf), np.asarray(full.conf))
    assert float(masked.img_cnt) == 2


@pytest.mark.parametrize("flags", [(0, 0, 0, 0), (1, 0, 0, 0), (0, 1, 1, 0),
                                   (1, 1, 1, 0), (0, 0, 0, 1), (1, 0, 1, 1)])
def test_mask_label_matches_reference(flags):
    import transform as reftransform

    nb, nr, ng, nl = map(bool, flags)
    lab = np.random.default_rng(5).integers(0, 5, (2, 6, 6))
    ref = reftransform.maskLabel(torch.from_numpy(lab.copy()), nb, nr, ng, nl).numpy()
    got = np.asarray(labels.mask_label(jnp.asarray(lab), nb, nr, ng, nl))
    np.testing.assert_array_equal(got, ref)


def test_label_to_pred_matches_reference():
    import transform as reftransform

    lab = np.random.default_rng(6).integers(0, 5, (2, 6, 6))
    ref = reftransform.labelToPred(torch.from_numpy(lab), 5).numpy()  # (B,C,H,W)
    got = np.asarray(labels.label_to_pred(jnp.asarray(lab), 5))  # (B,H,W,C)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref)


def test_colorize_matches_reference():
    import transform as reftransform

    lab = np.random.default_rng(7).integers(0, 5, (6, 6))
    ref = reftransform.Colorize(torch.from_numpy(lab)).permute(1, 2, 0).numpy()
    got = labels.colorize(lab)
    np.testing.assert_array_equal(got, ref)


def test_rgb_to_yuv_constants():
    """Our matrix equals skimage's published BT.601 yuv_from_rgb values."""
    rgb = np.random.default_rng(8).random((4, 4, 3)).astype(np.float32)
    got = np.asarray(color.rgb_to_yuv(jnp.asarray(rgb)))
    m = np.array([[0.299, 0.587, 0.114],
                  [-0.14714119, -0.28886916, 0.43601035],
                  [0.61497538, -0.51496512, -0.10001026]])
    ref = rgb @ m.T
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_yuv_jitter_matches_reference_formula():
    import importlib

    import dataset as refdataset
    importlib.reload(refdataset)

    img = np.random.default_rng(9).random((3, 8, 8)).astype(np.float32)
    # fix the sampled values by seeding python's random (reference uses random.uniform)
    import random as pyrandom
    pyrandom.seed(42)
    ref = refdataset.ColorJitter(0.3, 0.3, 0.3, 3.1415 / 6)(torch.from_numpy(img.copy())).numpy()
    pyrandom.seed(42)
    b_val = pyrandom.uniform(-0.3, 0.3)
    c_val = pyrandom.uniform(0.7, 1.3)
    s_val = pyrandom.uniform(0.7, 1.3)
    h_val = pyrandom.uniform(-3.1415 / 6, 3.1415 / 6)
    # apply our formula with the same scalars by monkey-driving the math
    m = np.array([[s_val * np.cos(h_val), -np.sin(h_val)],
                  [np.sin(h_val), s_val * np.cos(h_val)]], np.float32)
    ours = img.copy()
    ours[0] = (ours[0] + b_val) * c_val
    ours[1:] = np.einsum("nm,mhw->nhw", m, ours[1:])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_augment_batch_shapes_and_determinism():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(10).random((4, 8, 8, 3)), jnp.float32)
    labs = jnp.asarray(np.random.default_rng(11).integers(0, 5, (4, 8, 8)))
    a1, l1 = color.augment_batch(rng, imgs, labs)
    a2, l2 = color.augment_batch(rng, imgs, labs)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert a1.shape == imgs.shape and l1.shape == labs.shape


def test_pruning_strategies_match_reference():
    import model as refmodel

    tm = refmodel.ROBO_UNet()
    from robocupvision_tpu.export.torch_io import from_torch_state_dict
    from robocupvision_tpu.models import zoo

    ours = zoo.make("robo_unet")
    params = from_torch_state_dict(ours.registry, tm.state_dict())

    # prune_threshold vs pruneModelNew
    ref_params = [p for p in tm.parameters()]
    with torch.no_grad():
        ref_indices = refmodel.pruneModelNew(ref_params)
    new, masks = pruning.prune_threshold(params, ours.param_order, verbose=False)
    prunable = pruning.prunable_names(ours.param_order, params)
    assert len(ref_indices) == len(prunable)
    total_ref = sum(int(m.sum()) for m in ref_indices)
    total_got = sum(int(masks[n].sum()) for n in prunable)
    assert total_ref == total_got

    # count_zero_weights agreement after pruning
    ref_frac = refmodel.count_zero_weights(tm)
    got_frac = pruning.count_zero_weights(
        {k: v for k, v in new.items()},
        [n for n in ours.param_order])
    # compare on the same model state: reference was pruned in place too
    assert abs(ref_frac - got_frac) < 1e-6

    # prune_topk vs pruneModel2 (fresh model)
    tm2 = refmodel.ROBO_UNet()
    params2 = from_torch_state_dict(ours.registry, tm2.state_dict())
    with torch.no_grad():
        ref_idx2 = refmodel.pruneModel2([p for p in tm2.parameters()], 0.16, 1000, 50000)
    _, masks2 = pruning.prune_topk(params2, ours.param_order, 0.16, 1000, 50000,
                                   verbose=False)
    for refm, name in zip(ref_idx2, prunable):
        assert int(refm.sum()) == int(masks2[name].sum())


def test_hsv_roundtrip_and_legacy_jitter():
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.random((8, 9, 3)), jnp.float32)
    h, s, v = color._rgb_to_hsv(rgb)
    back = color._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    # legacy augment: deterministic under the same key, shapes preserved,
    # vflip occurs (ssyuv mode never flips vertically)
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(rng.standard_normal((8, 6, 6, 3)), jnp.float32)
    labs = jnp.asarray(rng.integers(0, 5, (8, 6, 6)))
    a1, l1 = color.legacy_augment_batch(key, imgs, labs)
    a2, l2 = color.legacy_augment_batch(key, imgs, labs)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert a1.shape == imgs.shape and l1.shape == labs.shape
    flipped_v = any(
        np.array_equal(np.asarray(l1[i]), np.asarray(labs[i])[::-1])
        or np.array_equal(np.asarray(l1[i]), np.asarray(labs[i])[::-1, ::-1])
        for i in range(8))
    assert flipped_v


def test_rgb_color_jitter_identity_at_zero():
    rng = np.random.default_rng(4)
    rgb = jnp.asarray(rng.random((5, 7, 3)), jnp.float32)
    out = color.rgb_color_jitter(jax.random.PRNGKey(1), rgb, b=0, c=0, s=0, h=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_rgb_color_jitter_random_op_order():
    # torchvision's ColorJitter applies brightness/contrast/saturation/hue in
    # a random order per call; pin that semantics: the random-order path must
    # equal the explicitly-ordered path under the perm the impl derives, the
    # order must matter, and all 24 permutations must be reachable.
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.random((6, 8, 3)), jnp.float32)

    o1 = color.rgb_color_jitter(jax.random.PRNGKey(3), rgb, order=(0, 1, 2, 3))
    o2 = color.rgb_color_jitter(jax.random.PRNGKey(3), rgb, order=(3, 2, 1, 0))
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    seen = set()
    for seed in range(120):
        key = jax.random.PRNGKey(seed)
        kp = jax.random.split(key, 5)[4]
        perm = tuple(int(i) for i in jax.random.permutation(kp, 4))
        seen.add(perm)
        if seed < 8:  # shuffled call == static call at the derived perm
            got = color.rgb_color_jitter(key, rgb)
            want = color.rgb_color_jitter(key, rgb, order=perm)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)
    assert len(seen) == 24, sorted(seen)
