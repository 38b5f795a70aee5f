"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from robocupvision_tpu.ops.pallas_kernels import confusion_matrix_pallas


def test_confusion_matrix_pallas_matches_einsum():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.integers(0, 5, (4, 24, 32)))
    tgt = jnp.asarray(rng.integers(0, 5, (4, 24, 32)))

    got = confusion_matrix_pallas(pred, tgt, 5, interpret=True)

    oh_p = jax.nn.one_hot(pred, 5, dtype=jnp.float32)
    oh_t = jax.nn.one_hot(tgt, 5, dtype=jnp.float32)
    ref = jnp.einsum("bhwp,bhwl->bpl", oh_p, oh_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_seg_batch_stats_pallas_impl_matches():
    from robocupvision_tpu.ops import metrics

    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.integers(0, 5, (3, 16, 20)))
    tgt = jnp.asarray(rng.integers(0, 5, (3, 16, 20)))
    mask = jnp.asarray(np.array([1, 1, 0], np.float32))

    # interpret-mode pallas vs einsum through the public entry point
    import robocupvision_tpu.ops.pallas_kernels as pk

    orig = pk.confusion_matrix_pallas
    pk_patched = lambda p, t, c: orig(p, t, c, interpret=True)  # noqa: E731
    pk.confusion_matrix_pallas = pk_patched
    try:
        a = metrics.seg_batch_stats(pred, tgt, 5, mask, impl="pallas")
    finally:
        pk.confusion_matrix_pallas = orig
    b = metrics.seg_batch_stats(pred, tgt, 5, mask, impl="einsum")
    for fa, fb in zip([a.conf, a.iou_sum, a.lab_cnts, a.correct, a.img_cnt],
                      [b.conf, b.iou_sum, b.lab_cnts, b.correct, b.img_cnt]):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb))


def test_fused_conv3x3_block_matches_xla():
    from robocupvision_tpu.ops import nn
    from robocupvision_tpu.ops.pallas_kernels import fused_conv3x3_block

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    sc = jnp.asarray(rng.random(16) + 0.5, jnp.float32)
    sh = jnp.asarray(rng.standard_normal(16), jnp.float32)

    for relu_before_bn in (True, False):
        got = fused_conv3x3_block(x, w, b, sc, sh, tile=8, interpret=True,
                                  relu_before_bn=relu_before_bn)
        y = nn.conv2d(x, w, padding=1) + b
        want = (jnp.maximum(y, 0) * sc + sh if relu_before_bn
                else jnp.maximum(y * sc + sh, 0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
