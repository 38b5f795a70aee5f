"""Device mesh + sharding for data-parallel / spatially-partitioned execution.

The reference is single-device (SURVEY.md §2.8: no torch.distributed anywhere);
the TPU-native scaling story is a 2-D ``jax.sharding.Mesh``:

- ``data``    axis: batch sharding (gradient psum inserted by XLA under jit).
- ``spatial`` axis: image-height sharding for VGA-scale inference/training —
  XLA SPMD inserts halo exchanges for the convolutions automatically, so a
  single 480x640 frame can be split across chips on ICI.

Parameters are replicated; BatchNorm reductions under jit become global
(cross-replica) means automatically, i.e. multi-chip sync-BN for free.

Works identically on one real chip, a v5e-8 slice, or the CPU
``--xla_force_host_platform_device_count`` mesh used in tests and the
driver's dry run.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, spatial: int = 1) -> Mesh:
    """(data x spatial) mesh over the first n devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
    arr = np.array(devs[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = 1) -> NamedSharding:
    """NHWC batch: shard N over 'data' and (optionally) H over 'spatial'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def label_sharding(mesh: Mesh, spatial_dim: Optional[int] = 1) -> NamedSharding:
    """(B, H, W) labels sharded to match the batch."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None]
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """(B,) per-sample masks: data-parallel only."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, imgs, targets, sample_mask, spatial: bool = True):
    """Place a host batch onto the mesh with the canonical shardings.

    Raises a clear error when H is not divisible by the spatial axis:
    uneven spatial shards would silently degrade conv halo exchange and
    BN-stat balance, so the caller must pad (or pick a dividing factor).
    """
    sd = 1 if spatial else None
    n_sp = mesh.shape["spatial"]
    if spatial and imgs.shape[1] % n_sp != 0:
        raise ValueError(
            f"image height {imgs.shape[1]} is not divisible by the mesh "
            f"spatial axis ({n_sp}); pad H to a multiple of {n_sp} or use "
            f"spatial=False / a smaller spatial factor")
    if imgs.shape[0] % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch {imgs.shape[0]} is not divisible by the mesh data axis "
            f"({mesh.shape['data']}); pad the batch (sample_mask marks pad "
            f"rows) to a multiple of it")
    imgs = jax.device_put(imgs, batch_sharding(mesh, sd))
    targets = jax.device_put(targets, label_sharding(mesh, sd))
    sample_mask = jax.device_put(sample_mask, sample_sharding(mesh))
    return imgs, targets, sample_mask


def replicate_state(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
