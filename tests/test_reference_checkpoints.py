"""Loading the reference repo's actual shipped .pth artifacts.

The reference's pth/ directory mixes eras: bestModelSeg*.pth predate the
current PB_FCN (its own model.py cannot load them — missing segmenter keys,
8-channel classifier), while bestModelLP / bestModelHess* / bestModel match
the current code. We load everything the reference itself could load.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import zoo
from robocupvision_tpu.train import checkpoint

PTH = "/root/reference/pth"
pytestmark = pytest.mark.skipif(not os.path.isdir(PTH),
                                reason="reference not mounted")


@pytest.mark.parametrize("name,family,kw,in_shape", [
    ("bestModelLP.pth", "label_prop", dict(planes=32), (1, 48, 64, 8)),
    ("bestModelLPFinetuned.pth", "label_prop", dict(planes=32), (1, 48, 64, 8)),
    ("bestModelLPFinetunedPruned.pth", "label_prop", dict(planes=32), (1, 48, 64, 8)),
    ("bestModelHessL.pth", "bnn", dict(variant="L"), (1, 32, 32, 3)),
    ("bestModelHessMC.pth", "bnn", dict(variant="MC"), (1, 32, 32, 3)),
    ("bestModel.pth", "downsampler", dict(planes=32), (1, 48, 64, 3)),
])
def test_reference_artifact_loads_and_runs(name, family, kw, in_shape):
    m = zoo.make(family, **kw)
    params = checkpoint.load_any(os.path.join(PTH, name), m.registry)
    p = {k: jnp.asarray(v) for k, v in params.items()}
    out, _ = m.apply(p, jnp.zeros(in_shape, jnp.float32))
    if family == "downsampler":
        out = out[1]  # feature tuple
    assert np.isfinite(np.asarray(out)).all()


def test_pruned_lp_checkpoint_is_actually_sparse():
    """bestModelLPFinetunedPruned.pth was band-pruned (73-77%); our loader
    preserves the zeros and count_zero_weights sees them."""
    from robocupvision_tpu.ops.pruning import count_zero_weights

    m = zoo.make("label_prop", planes=32)
    params = checkpoint.load_any(os.path.join(PTH, "bestModelLPFinetunedPruned.pth"),
                                 m.registry)
    frac = count_zero_weights(params, m.param_order)
    assert frac > 0.5, frac


def test_stale_era_checkpoints_fail_identically_to_reference():
    """bestModelSeg.pth predates the in-repo PB_FCN; both implementations
    must reject it (this is reference staleness, not an interop gap)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    import model as refmodel

    sd = torch.load(os.path.join(PTH, "bestModelSeg.pth"), map_location="cpu",
                    weights_only=True)
    tm = refmodel.PB_FCN(32, 5, 1, False, 0)
    with pytest.raises(RuntimeError):
        tm.load_state_dict(sd)

    ours = zoo.make("pb_fcn", planes=32, num_classes=5, kernel_size=1)
    with pytest.raises((ValueError, KeyError)):
        checkpoint.load_any(os.path.join(PTH, "bestModelSeg.pth"), ours.registry)
