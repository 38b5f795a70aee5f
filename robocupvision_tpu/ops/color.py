"""Color-space ops and on-device augmentation.

The reference runs its augmentation in 8 DataLoader worker processes
(train.py:295-299). Here the whole pipeline — flip, YUV color jitter,
normalize — is jitted and runs on device, keyed by jax.random.

rgb2yuv uses skimage.color's constants (reference transform.py:21-24), since
skimage derives YUV via the BT.601 matrix below.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# skimage.color.yuv_from_rgb
YUV_FROM_RGB = jnp.array(
    [[0.299, 0.587, 0.114],
     [-0.14714119, -0.28886916, 0.43601035],
     [0.61497538, -0.51496512, -0.10001026]], jnp.float32)

RGB_FROM_YUV = jnp.linalg.inv(YUV_FROM_RGB)

# Per-domain normalization constants (reference dataset.py:74-75)
MEAN_SYNTHETIC = (0.36269532, 0.41144562, 0.282713)
STD_SYNTHETIC = (0.31111388, 0.21010718, 0.34060917)
MEAN_FINETUNE = (0.34190056, 0.4833289, 0.48565758)
STD_FINETUNE = (0.47421749, 0.13846053, 0.1714848)
# Legacy pipeline constants (trainer.py:79)
MEAN_LEGACY = (0.5, 0.0, 0.0)
STD_LEGACY = (0.5, 0.5, 0.5)


def rgb_to_yuv(rgb: jax.Array) -> jax.Array:
    """NHWC (or HWC) RGB in [0,1] -> YUV, skimage semantics."""
    return jnp.einsum("...c,dc->...d", rgb, YUV_FROM_RGB)


def normalize(img: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def yuv_color_jitter(rng: jax.Array, img: jax.Array,
                     b: float = 0.3, c: float = 0.3, s: float = 0.3,
                     h: float = 3.1415 / 6) -> jax.Array:
    """YUV-space jitter (reference dataset.py:19-39), NHWC single image.

    Y: (y + brightness) * contrast; UV: 2x2 rotation-scale
    [[s cos h, -sin h], [sin h, s cos h]].
    """
    kb, kc, ks, kh = jax.random.split(rng, 4)
    b_val = jax.random.uniform(kb, (), minval=-b, maxval=b)
    c_val = jax.random.uniform(kc, (), minval=1 - c, maxval=1 + c)
    s_val = jax.random.uniform(ks, (), minval=1 - s, maxval=1 + s)
    h_val = jax.random.uniform(kh, (), minval=-h, maxval=h)

    y = (img[..., 0] + b_val) * c_val
    mtx = jnp.array  # build 2x2 from traced scalars
    m = jnp.stack([
        jnp.stack([s_val * jnp.cos(h_val), -jnp.sin(h_val)]),
        jnp.stack([jnp.sin(h_val), s_val * jnp.cos(h_val)]),
    ])
    del mtx
    uv = jnp.einsum("nm,...m->...n", m, img[..., 1:3])
    return jnp.concatenate([y[..., None], uv], axis=-1).astype(img.dtype)


def augment_sample(rng: jax.Array, img: jax.Array, label: jax.Array,
                   jitter: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Train-time augmentation for one (H, W, 3) image + (H, W) label:
    0.5-probability horizontal flip of both, then YUV jitter of the image
    (reference dataset.py:126-131)."""
    kf, kj = jax.random.split(rng)
    flip = jax.random.uniform(kf, ()) > 0.5
    img = jnp.where(flip, img[:, ::-1, :], img)
    label = jnp.where(flip, label[:, ::-1], label)
    if jitter:
        img = yuv_color_jitter(kj, img)
    return img, label


def augment_batch(rng: jax.Array, imgs: jax.Array, labels: jax.Array,
                  jitter: bool = True) -> Tuple[jax.Array, jax.Array]:
    """vmapped per-sample augmentation over an NHWC batch."""
    keys = jax.random.split(rng, imgs.shape[0])
    return jax.vmap(lambda k, i, l: augment_sample(k, i, l, jitter))(keys, imgs, labels)
