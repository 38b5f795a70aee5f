"""Dense optical flow + label warping (reference transform.py:185-198).

The reference uses cv2 Farneback flow as (a) input warping for chained
label-propagation scoring (test.py:132-146) and (b) the classical baseline
the LP net is compared against (validLabelProp.py:108-114).

Two implementations:
- ``optflow_cv2`` / ``update_labels_cv2``: exact cv2 calls with the
  reference's parameters (host, eval-only).
- ``optflow_jax``: a TPU-native Farneback — polynomial-expansion flow is
  separable filtering + per-pixel 2x2 solves, which vectorizes perfectly;
  jitted, it runs the whole (pyramid, iterations) pipeline on device.
  ``warp_labels_jax`` is the nearest-neighbor gather warp.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import numpy as np

try:
    import cv2  # type: ignore
except ImportError:  # pragma: no cover
    cv2 = None

FARNEBACK_PARAMS = dict(pyr_scale=0.5, levels=2, winsize=15, iterations=2,
                        poly_n=7, poly_sigma=1.5, flags=0)


def optflow_cv2(img_prev: np.ndarray, img_next: np.ndarray) -> np.ndarray:
    """(2, H, W) flow, channel 0 = x displacement (reference optFlow)."""
    assert cv2 is not None, "cv2 unavailable; use optflow_jax"
    flow = cv2.calcOpticalFlowFarneback(np.asarray(img_prev), np.asarray(img_next),
                                        None, **FARNEBACK_PARAMS)
    return flow.transpose(2, 0, 1)


def update_labels_cv2(old_lab: np.ndarray, flow: np.ndarray) -> np.ndarray:
    """Warp a label map along flow, nearest, 0-fill (reference updateLabels)."""
    assert cv2 is not None
    old = np.asarray(old_lab)
    idx = np.indices(old.shape)
    x = (idx[1] + flow[0]).astype("float32")
    y = (idx[0] + flow[1]).astype("float32")
    ans = cv2.remap(old.astype("float32"), x, y, cv2.INTER_NEAREST,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    return ans.astype("int64")


# ---------------------------------------------------------------------------
# TPU-native Farneback
# ---------------------------------------------------------------------------


def _gaussian_kernel(n: int, sigma: float):
    import jax.numpy as jnp

    x = jnp.arange(-n, n + 1, dtype=jnp.float32)
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _sep_filter(img, kx, ky):
    """Separable 2-D correlation with replicate borders on (H, W)."""
    import jax.numpy as jnp
    from jax import lax

    nx = (kx.shape[0] - 1) // 2
    ny = (ky.shape[0] - 1) // 2
    p = jnp.pad(img, ((ny, ny), (nx, nx)), mode="edge")
    p = p[None, :, :, None]
    wx = kx.reshape(1, -1, 1, 1)
    wy = ky.reshape(-1, 1, 1, 1)
    out = lax.conv_general_dilated(p, wy, (1, 1), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(out, wx, (1, 1), "VALID",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0, :, :, 0]


def _poly_expansion(img, n: int = 3, sigma: float = 1.5):
    """Farneback quadratic expansion f ~ x^T A x + b^T x + c per pixel.

    Weighted least squares against the basis {1, x, y, x^2, y^2, xy} with a
    Gaussian applicability, solved in closed form via the separable-moment
    trick (all terms are separable correlations).
    """
    import jax.numpy as jnp

    x = jnp.arange(-n, n + 1, dtype=jnp.float32)
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))

    # 1-D moment kernels
    g0, g1, g2 = g, g * x, g * x * x

    m00 = _sep_filter(img, g0, g0)
    m10 = _sep_filter(img, g1, g0)   # x moment
    m01 = _sep_filter(img, g0, g1)   # y moment
    m20 = _sep_filter(img, g2, g0)
    m02 = _sep_filter(img, g0, g2)
    m11 = _sep_filter(img, g1, g1)

    # Gram matrix of the basis under the Gaussian weight (diagonal by parity)
    s0 = jnp.sum(g0)
    s2 = jnp.sum(g2)
    s4 = jnp.sum(g2 * x * x)
    G = jnp.array([
        [s0 * s0, 0, 0, s2 * s0, s0 * s2, 0],
        [0, s2 * s0, 0, 0, 0, 0],
        [0, 0, s0 * s2, 0, 0, 0],
        [s2 * s0, 0, 0, s4 * s0, s2 * s2, 0],
        [s0 * s2, 0, 0, s2 * s2, s0 * s4, 0],
        [0, 0, 0, 0, 0, s2 * s2],
    ], jnp.float32)
    Ginv = jnp.linalg.inv(G)
    m = jnp.stack([m00, m10, m01, m20, m02, m11], axis=-1)
    coef = jnp.einsum("ij,hwj->hwi", Ginv, m)  # c, bx, by, axx, ayy, axy
    c, bx, by, axx, ayy, axy = (coef[..., i] for i in range(6))
    A = jnp.stack([jnp.stack([axx, axy / 2], -1),
                   jnp.stack([axy / 2, ayy], -1)], -2)  # (H,W,2,2)
    b = jnp.stack([bx, by], -1)
    return A, b, c


def _flow_update(A1, b1, A2, b2, flow, winsize: int = 15):
    """One Farneback displacement update from two expansions + prior flow."""
    import jax.numpy as jnp

    h, w = b1.shape[:2]
    yy, xx = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    # sample field 2 at x + flow (bilinear)
    fx, fy = flow[..., 0], flow[..., 1]
    sx = jnp.clip(xx + fx, 0, w - 1)
    sy = jnp.clip(yy + fy, 0, h - 1)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    def samp(field):
        f = field.reshape(h, w, -1)
        f00 = f[y0, x0]
        f01 = f[y0, x1]
        f10 = f[y1, x0]
        f11 = f[y1, x1]
        out = (f00 * (1 - wx) * (1 - wy) + f01 * wx * (1 - wy)
               + f10 * (1 - wx) * wy + f11 * wx * wy)
        return out.reshape(field.shape)

    A2w = samp(A2.reshape(h, w, 4)).reshape(h, w, 2, 2)
    b2w = samp(b2)

    A = 0.5 * (A1 + A2w)
    db = -0.5 * (b2w - b1) + jnp.einsum("hwij,hwj->hwi", A, flow)

    # accumulate G = A^T A and h = A^T db over a box window, then solve
    G = jnp.einsum("hwki,hwkj->hwij", A, A).reshape(h, w, 4)
    rhs = jnp.einsum("hwki,hwk->hwi", A, db)
    box = jnp.ones((winsize,), jnp.float32)
    Gf = jnp.stack([_sep_filter(G[..., i], box, box) for i in range(4)], -1)
    hf = jnp.stack([_sep_filter(rhs[..., i], box, box) for i in range(2)], -1)

    g11, g12, g21, g22 = Gf[..., 0], Gf[..., 1], Gf[..., 2], Gf[..., 3]
    det = g11 * g22 - g12 * g21
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    u = (g22 * hf[..., 0] - g12 * hf[..., 1]) / det
    v = (-g21 * hf[..., 0] + g11 * hf[..., 1]) / det
    return jnp.stack([u, v], -1)


def _resize_bilinear(img, hw):
    import jax

    return jax.image.resize(img, hw + img.shape[2:], method="linear")


@partial(jax.jit, static_argnames=("levels", "iterations", "winsize", "poly_n"))
def optflow_jax(img_prev, img_next, levels: int = 2, iterations: int = 2,
                winsize: int = 15, poly_n: int = 3, poly_sigma: float = 1.5):
    """TPU Farneback: returns (H, W, 2) flow mapping prev -> next.

    Same algorithm family as cv2's (pyramidal polynomial-expansion flow);
    constants differ slightly so outputs are comparable, not bit-equal.
    """
    import jax.numpy as jnp

    scale_in = 255.0 if jnp.issubdtype(jnp.asarray(img_prev).dtype, jnp.integer) \
        else 1.0
    a = jnp.asarray(img_prev, jnp.float32) / scale_in
    b = jnp.asarray(img_next, jnp.float32) / scale_in
    h, w = a.shape

    flow = None
    for lev in reversed(range(levels)):
        scale = 2 ** lev
        hw = (max(h // scale, 8), max(w // scale, 8))
        al = _resize_bilinear(a[..., None], hw)[..., 0]
        bl = _resize_bilinear(b[..., None], hw)[..., 0]
        if flow is None:
            flow = jnp.zeros(hw + (2,), jnp.float32)
        else:
            flow = _resize_bilinear(flow, hw) * 2.0
        A1, b1, _ = _poly_expansion(al, poly_n, poly_sigma)
        A2, b2, _ = _poly_expansion(bl, poly_n, poly_sigma)
        for _ in range(iterations):
            flow = _flow_update(A1, b1, A2, b2, flow,
                                winsize=max(winsize // scale, 5))
    return flow


def warp_labels_jax(old_lab, flow):
    """Nearest-neighbor label warp: out[y, x] = old[y + v, x + u], 0 outside."""
    import jax.numpy as jnp

    old = jnp.asarray(old_lab)
    h, w = old.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    sx = jnp.round(xx + flow[..., 0]).astype(jnp.int32)
    sy = jnp.round(yy + flow[..., 1]).astype(jnp.int32)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    sx = jnp.clip(sx, 0, w - 1)
    sy = jnp.clip(sy, 0, h - 1)
    return jnp.where(valid, old[sy, sx], 0)
