"""robocupvision_tpu — a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework.

A from-scratch rebuild of the capabilities of szemenyeim/RoboCupVision
(reference mounted at /root/reference) designed for TPU hardware:

- NHWC/HWIO layouts, jitted functional forwards, bfloat16-friendly compute.
- Whole-dataset-on-device training epochs (lax.scan) instead of host DataLoaders.
- Data-parallel + spatially-partitioned execution over a ``jax.sharding.Mesh``.
- A C++ inference engine speaking the reference's ``net.cfg`` + ``weights.dat``
  deployment contract (reference: paramSave.py:5-18, weights/net.cfg).

Subpackages:
    ops       low-level PyTorch-semantics NN ops (conv/bn/pool/...), losses,
              metrics, augmentation, pruning.
    models    model zoo: ROBO_UNet, PB_FCN, PB_FCN_2, FCN, LabelProp, BNNL/BNNMC.
    data      datasets (SSYUV / SS / LP / ImageFolder equivalents) + device cache.
    train     jitted train/eval steps, schedules (incl. plateau-rollback),
              optimizers with param groups, checkpointing.
    parallel  mesh construction and sharded train/infer steps.
    export    net.cfg writer/parser, flat weights.dat dump, golden vectors.
    cli       entry points mirroring the reference's script surface.
    tools     offline dataset converters.
"""

__version__ = "0.1.0"
