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
import numpy as np

# skimage.color.yuv_from_rgb. Plain numpy ON PURPOSE: module-level jnp
# constants become tracers (and escape into globals) if this module is
# first imported inside an active trace — e.g. a lazy import in a function
# being jax.export'ed. numpy constants are safe everywhere jnp ops accept
# them.
YUV_FROM_RGB = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14714119, -0.28886916, 0.43601035],
     [0.61497538, -0.51496512, -0.10001026]], np.float32)

RGB_FROM_YUV = np.linalg.inv(YUV_FROM_RGB)

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


def raw_camera_preprocess(x_u8: jax.Array, mean=(0.5, 0.0, 0.0),
                          std: float = 0.5) -> jax.Array:
    """Raw uint8 RGB frames -> the legacy serving input (/255, ToYUV,
    normalize — reference transform.py:21-24 + tester.py's Normalize), as
    ONE on-device affine: every step is linear, so the chain folds to
    ``x @ (YUV^T / (255*std)) - mean/std``. Lets a serving host ship the
    camera's native uint8 bytes (1/4 the f32 wire) and XLA fuses the
    affine into the stem conv's input read."""
    a = YUV_FROM_RGB.T / (255.0 * std)
    c = -jnp.asarray(mean, jnp.float32) / std
    return jnp.einsum("...c,cd->...d", x_u8.astype(jnp.float32),
                      a.astype(jnp.float32)) + c


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


# ---------------------------------------------------------------------------
# Legacy-pipeline augmentation (trainer.py:88-104): HorizontalFlip +
# VerticalFlip + torchvision ColorJitter(0.5, 0.5, 0.4, 0.3) applied to the
# RGB image BEFORE the YUV conversion. The legacy datasets cache
# YUV-normalized tensors, so this inverts the (linear) normalization+YUV,
# jitters in RGB with torchvision's formulas, and re-converts. Like
# torchvision, the four jitter ops are applied in a random order per call
# (ColorJitter.get_params shuffles the op list).
# ---------------------------------------------------------------------------


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng_, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(rng_ > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_color_jitter(rng: jax.Array, rgb: jax.Array, b: float = 0.5,
                     c: float = 0.5, s: float = 0.4, h: float = 0.3,
                     order=None) -> jax.Array:
    """torchvision-style ColorJitter on an (H, W, 3) RGB image in [0, 1].

    The four ops (0 brightness, 1 contrast, 2 saturation, 3 hue) are applied
    in a uniformly random order per call, matching torchvision's
    ColorJitter which shuffles its op list in get_params. ``order`` pins a
    static order (a permutation of 0..3) for testing.
    """
    kb, kc, ks, kh, kp = jax.random.split(rng, 5)
    gray_w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    b_f = jax.random.uniform(kb, (), minval=1 - b, maxval=1 + b)
    c_f = jax.random.uniform(kc, (), minval=1 - c, maxval=1 + c)
    s_f = jax.random.uniform(ks, (), minval=1 - s, maxval=1 + s)
    shift = jax.random.uniform(kh, (), minval=-h, maxval=h)

    def brightness(img):  # img * U(1-b, 1+b)
        return jnp.clip(img * b_f, 0.0, 1.0)

    def contrast(img):  # blend toward the mean of the grayscale image
        mean_gray = jnp.mean(img @ gray_w)
        return jnp.clip(c_f * img + (1 - c_f) * mean_gray, 0.0, 1.0)

    def saturation(img):  # blend toward per-pixel grayscale
        gray = (img @ gray_w)[..., None]
        return jnp.clip(s_f * img + (1 - s_f) * gray, 0.0, 1.0)

    def hue(img):  # shift the HSV hue channel (torchvision units: turns)
        hh, ss, vv = _rgb_to_hsv(img)
        return jnp.clip(_hsv_to_rgb((hh + shift) % 1.0, ss, vv), 0.0, 1.0)

    ops = (brightness, contrast, saturation, hue)
    img = rgb.astype(jnp.float32)
    if order is not None:
        for i in order:
            img = ops[i](img)
    else:
        perm = jax.random.permutation(kp, 4)
        img = jax.lax.fori_loop(
            0, 4, lambda i, im: jax.lax.switch(perm[i], ops, im), img)
    return img.astype(rgb.dtype)


def legacy_augment_sample(rng: jax.Array, img: jax.Array, label: jax.Array,
                          jitter: bool = True, use_vflip: bool = True
                          ) -> Tuple[jax.Array, jax.Array]:
    """Legacy-stack augmentation of one YUV-normalized (H, W, 3) image:
    0.5-prob horizontal (and optionally vertical) flips applied to image and
    label, then ColorJitter(0.5, 0.5, 0.4, 0.3) in RGB space.
    classTrainer's stack has no vertical flip (classTrainer.py:55-62)."""
    kh_, kv_, kj = jax.random.split(rng, 3)
    hflip = jax.random.uniform(kh_, ()) < 0.5
    img = jnp.where(hflip, img[:, ::-1, :], img)
    label = jnp.where(hflip, label[:, ::-1], label)
    if use_vflip:
        vflip = jax.random.uniform(kv_, ()) < 0.5
        img = jnp.where(vflip, img[::-1, :, :], img)
        label = jnp.where(vflip, label[::-1, :], label)
    if jitter:
        # invert Normalize([.5,0,0],[.5,.5,.5]) and the BT.601 YUV transform
        yuv = img * 0.5 + jnp.array([0.5, 0.0, 0.0], img.dtype)
        rgb = jnp.clip(jnp.einsum("...c,dc->...d", yuv.astype(jnp.float32),
                                  RGB_FROM_YUV), 0.0, 1.0)
        rgb = rgb_color_jitter(kj, rgb)
        yuv = rgb_to_yuv(rgb)
        img = ((yuv - jnp.array([0.5, 0.0, 0.0], yuv.dtype)) / 0.5).astype(img.dtype)
    return img, label


def legacy_augment_batch(rng: jax.Array, imgs: jax.Array, labels: jax.Array,
                         jitter: bool = True, use_vflip: bool = True
                         ) -> Tuple[jax.Array, jax.Array]:
    keys = jax.random.split(rng, imgs.shape[0])
    return jax.vmap(lambda k, i, l: legacy_augment_sample(
        k, i, l, jitter, use_vflip))(keys, imgs, labels)


# ---------------------------------------------------------------------------
# The reference's standalone Random* transforms (transform.py:88-137).
# Unused by every reference entry point (the on-device YUV jitter supersedes
# them in the working pipelines) — implemented for literal completeness.
# The enhance_* helpers are the deterministic PIL ImageEnhance formulas on a
# float32 RGB image in [0, 255]; the random_* wrappers reproduce the
# reference's 0.9-probability gates and factor distributions.
# ---------------------------------------------------------------------------

_GRAY_W = np.array([0.299, 0.587, 0.114], np.float32)  # PIL convert("L")


def add_noise(rng: jax.Array, img: jax.Array, std: float = 0.05) -> jax.Array:
    """RandomNoise body (transform.py:88-93): additive Gaussian, tensor
    domain (the reference applies it after ToTensor, so NO clipping)."""
    return img + std * jax.random.normal(rng, img.shape, img.dtype)


def enhance_brightness(img: jax.Array, factor) -> jax.Array:
    """PIL ImageEnhance.Brightness: blend from black — img * factor."""
    return jnp.clip(img * factor, 0.0, 255.0)


def enhance_contrast(img: jax.Array, factor) -> jax.Array:
    """PIL ImageEnhance.Contrast: blend from a constant image holding the
    rounded mean of the grayscale conversion."""
    gray = jnp.round(img @ _GRAY_W)
    mean = jnp.floor(jnp.mean(gray) + 0.5)
    return jnp.clip(mean + factor * (img - mean), 0.0, 255.0)


def enhance_color(img: jax.Array, factor) -> jax.Array:
    """PIL ImageEnhance.Color: blend from the per-pixel grayscale image."""
    gray = jnp.round(img @ _GRAY_W)[..., None]
    return jnp.clip(gray + factor * (img - gray), 0.0, 255.0)


def hue_shift_saturating(img: jax.Array, amount, subtract) -> jax.Array:
    """RandomHue body (transform.py:120-137): shift the PIL-HSV hue channel
    (0..255 scale) by ``amount`` with SATURATING add/subtract — the
    reference uses ImageChops.add/subtract, which clip instead of wrapping
    the hue."""
    h, s, v = _rgb_to_hsv(img / 255.0)
    h255 = h * 255.0
    h255 = jnp.where(subtract, jnp.clip(h255 - amount, 0.0, 255.0),
                     jnp.clip(h255 + amount, 0.0, 255.0))
    return jnp.clip(_hsv_to_rgb(h255 / 255.0, s, v) * 255.0, 0.0, 255.0)


def _gated(rng: jax.Array, img: jax.Array, fn, p: float = 0.9):
    kg, kf = jax.random.split(rng)
    return jnp.where(jax.random.uniform(kg, ()) < p, fn(kf, img), img)


def random_noise(rng: jax.Array, img: jax.Array) -> jax.Array:
    return _gated(rng, img, add_noise)


def random_brightness(rng: jax.Array, img: jax.Array) -> jax.Array:
    return _gated(rng, img, lambda k, im: enhance_brightness(
        im, 0.5 + jax.random.uniform(k, ())))


def random_contrast(rng: jax.Array, img: jax.Array) -> jax.Array:
    return _gated(rng, img, lambda k, im: enhance_contrast(
        im, 0.5 + jax.random.uniform(k, ())))


def random_color(rng: jax.Array, img: jax.Array) -> jax.Array:
    return _gated(rng, img, lambda k, im: enhance_color(
        im, 0.5 + jax.random.uniform(k, ())))


def random_hue(rng: jax.Array, img: jax.Array) -> jax.Array:
    def _apply(k, im):
        ka, ks_ = jax.random.split(k)
        # the reference builds its shift image via astype('uint8'), which
        # truncates random()*30 to an integer shift of 0..29
        amount = jnp.floor(jax.random.uniform(ka, ()) * 30.0)
        subtract = jax.random.uniform(ks_, ()) >= 0.5
        return hue_shift_saturating(im, amount, subtract)

    return _gated(rng, img, _apply)
