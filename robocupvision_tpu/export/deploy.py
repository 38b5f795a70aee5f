"""One-call deployment export: model -> (net.cfg, weights.dat) directory.

Mirrors the reference's deployment artifacts (weights/, weightsVGA/,
weightsLP/ — tester.py:121-124, validLabelProp.py:79) but generates the cfg
from the model config instead of hand-maintaining it, and skips the unused
classification head precisely (see weights_io.save_params docstring).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from robocupvision_tpu.export import netcfg, weights_io
from robocupvision_tpu.models.zoo import Model


def export_deployment(path: str, model: Model, params: Dict[str, np.ndarray],
                      fname: str = "weights.dat") -> str:
    """Write net.cfg + weights.dat for a deployable model family."""
    os.makedirs(path, exist_ok=True)
    fam = model.family
    if fam == "pb_fcn":
        cfg = model.cfg
        if cfg.classify:
            raise ValueError("export the segmentation head, not the classifier")
        secs = netcfg.pb_fcn_sections(cfg.planes, cfg.num_classes,
                                      cfg.no_scale, cfg.kernel_size)
        skip = ("classifier.",)
    elif fam == "label_prop":
        secs = netcfg.label_prop_sections(model.cfg.planes, model.cfg.num_classes)
        skip = ()
    elif fam == "robo_unet":
        secs = netcfg.robo_unet_sections(model.cfg)
        skip = ()
    else:
        raise ValueError(f"no deployment graph emitter for family {fam}")
    # slim (structurally-pruned) checkpoints carry non-uniform widths; for a
    # dense dict this is a no-op (keeps structural identity with the
    # reference's hand-maintained cfg files, test_export.py)
    secs = netcfg.apply_param_widths(secs, model.registry, params, skip)
    netcfg.write_cfg(os.path.join(path, "net.cfg"), secs)
    weights_io.save_params(path, model.registry, params, fname=fname,
                           skip_prefixes=skip)
    return path


def verify_deployment(path: str, model: Model, params: Dict[str, np.ndarray],
                      x_nhwc: np.ndarray, fname: str = "weights.dat",
                      atol: float = 1e-4) -> float:
    """Run the exported cfg+dat pair through the JAX interpreter and compare
    against the live model (softmax applied). Returns max abs diff."""
    import jax.numpy as jnp

    from robocupvision_tpu.ops import nn

    secs = netcfg.parse_cfg(os.path.join(path, "net.cfg"))
    flat = np.fromfile(os.path.join(path, fname), dtype="<f4")
    got = np.asarray(netcfg.run_cfg(secs, flat, x_nhwc))
    ref_logits, _ = model.apply({k: jnp.asarray(v) for k, v in params.items()},
                                jnp.asarray(x_nhwc), train=False)
    ref = np.asarray(nn.softmax(ref_logits, axis=-1))
    diff = float(np.max(np.abs(got - ref)))
    if diff > atol:
        raise AssertionError(f"deployment mismatch: max|diff|={diff}")
    return diff
