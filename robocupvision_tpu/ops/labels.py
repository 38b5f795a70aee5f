"""Label transforms: class-ablation remap, +-1 one-hot encoding, colorize.

mask_label reproduces the order-dependent remap cascade of reference
transform.py:26-49 via a precomputed 5-entry lookup table — one gather on
device instead of sequential in-place passes.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np


def mask_label_table(nb: bool, nr: bool, ng: bool, nl: bool) -> np.ndarray:
    """Lookup table equivalent to the reference cascade on ids 0..4."""
    lab = np.arange(5)
    b_num, r_num, g_num, l_num = 1, 2, 3, 4
    if nb:
        lab[lab == b_num] = 0
        lab[lab > b_num] -= 1
        r_num, g_num, l_num = 1, 2, 3
    if nr:
        lab[lab == r_num] = 0
        lab[lab > r_num] -= 1
        g_num, l_num = 1, 2
    if ng:
        lab[lab == g_num] = 0
        lab[lab > g_num] -= 1
        l_num = 1
    if nl:
        lab[lab == l_num] = 0
    return lab.astype(np.int32)


def mask_label(label: jax.Array, nb: bool, nr: bool, ng: bool, nl: bool) -> jax.Array:
    """Remap labels per class-ablation flags (static flags -> constant table)."""
    if not (nb or nr or ng or nl):
        return label
    table = jnp.asarray(mask_label_table(nb, nr, ng, nl))
    return table[label.astype(jnp.int32)]


def label_to_pred(label: jax.Array, num_classes: int) -> jax.Array:
    """Label map (B, H, W) -> (B, H, W, C) tensor of +1 at the label, -1
    elsewhere (reference transform.py:172-183, NHWC here)."""
    oh = jax.nn.one_hot(label.astype(jnp.int32), num_classes, dtype=jnp.float32)
    return 2.0 * oh - 1.0


def label_colormap(n: int = 5) -> np.ndarray:
    """5-class palette: bg black, ball blue, robot green, goal red, line white
    (reference transform.py:139-156)."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    full = [(0, 0, 0), (0, 0, 255), (0, 255, 0), (255, 0, 0), (255, 255, 255)]
    for i in range(min(n, 5)):
        cmap[i] = full[i]
    return cmap


def colorize(label: np.ndarray, n: int = 5) -> np.ndarray:
    """Label map (H, W) -> RGB uint8 (H, W, 3)."""
    cmap = label_colormap(n)
    return cmap[np.asarray(label).astype(np.int64).clip(0, n - 1)]
