"""Whole-dataset-on-device batching.

The reference feeds the GPU from 8 DataLoader worker processes
(train.py:295-299). The RoboCup datasets are small (thousands of QVGA
frames); on TPU the fastest pipeline is: decode once on host, push the whole
normalized dataset to HBM, then do *all* per-epoch work on device —
permutation (jax.random), static-shape batch slicing with padding masks, and
jitted augmentation inside the train step. Zero host<->device traffic per
epoch beyond the scalars you print.

``Batches`` pads the last batch and marks padded samples in a (B,) mask that
the loss/metrics honor, so partial batches contribute exactly like the
reference's variable-size batches.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DeviceCache:
    images: jax.Array      # (N, H, W, C) float32, normalized
    labels: jax.Array      # (N, H, W) or (N,) int32
    n: int

    @classmethod
    def from_numpy(cls, images: np.ndarray, labels: np.ndarray,
                   sharding=None) -> "DeviceCache":
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        return cls(put(jnp.asarray(images)), put(jnp.asarray(labels)),
                   int(images.shape[0]))


def epoch_batches(cache: DeviceCache, batch_size: int, rng: Optional[jax.Array],
                  drop_last: bool = False
                  ) -> Iterator[Tuple[jax.Array, jax.Array, jax.Array]]:
    """Yield (imgs, labels, sample_mask) static-shape batches for one epoch.

    rng=None -> sequential order (eval); otherwise device-side shuffle.
    """
    n = cache.n
    if n == 0:
        return
    if rng is not None:
        perm = jax.random.permutation(rng, n)
    else:
        perm = jnp.arange(n)
    n_batches = n // batch_size if drop_last else -(-n // batch_size)
    pad = n_batches * batch_size - n
    if pad > 0 and not drop_last:
        perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    mask_full = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((max(pad, 0),), jnp.float32)])
    for b in range(n_batches):
        idx = perm[b * batch_size:(b + 1) * batch_size]
        yield (jnp.take(cache.images, idx, axis=0),
               jnp.take(cache.labels, idx, axis=0),
               mask_full[b * batch_size:(b + 1) * batch_size])


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
