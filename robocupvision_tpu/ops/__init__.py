"""Low-level ops: PyTorch-semantics NN primitives, losses, metrics, augment."""

from robocupvision_tpu.ops import nn  # noqa: F401
