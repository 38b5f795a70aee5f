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


def test_shipped_weightslp_weights_dat_runs_end_to_end(tmp_path):
    """The reference's ONE shipped trained deployment artifact —
    weightsLP/weights.dat + weightsLP/net.cfg (written by
    makeLPImages.py:73 via paramSave.saveParams) — loads through
    export/weights_io, runs through (a) zoo.label_prop apply, (b) the packed
    inference graph and (c) the C++ engine driven by the reference's net.cfg
    VERBATIM, with mutual label-map agreement on realistic LP inputs.

    Shipped-format findings (the ground truth this pins):
    - the file is little-endian FLOAT64, not float32: paramSave.py:9 seeds
      its concatenation with np.empty(0) (float64) and np.concatenate
      promotes every float32 tensor — 742,696 bytes = 92,837 f8 values;
    - 92,837 is exactly LabelProp(5, 32, d).state_dict()'s element count
      with NO num_batches_tracked counters (saved by a pre-0.4.1 torch);
      the BN stream order is weight, bias, running_mean, running_var;
    - tconv layers carry biases (48 of the 92,837), conv layers do not,
      matching weightsLP/net.cfg's hasBias fields.
    """
    import jax.numpy as jnp
    import numpy as np

    from robocupvision_tpu.export import weights_io
    from robocupvision_tpu.export.engine import NativeEngine
    from robocupvision_tpu.models import packed

    wdat = "/root/reference/weightsLP/weights.dat"
    cfg = "/root/reference/weightsLP/net.cfg"

    m = zoo.make("label_prop", planes=32)
    params = weights_io.load_params_flat(wdat, m.registry)
    for k, v in params.items():
        assert np.isfinite(v).all(), k
        if k.endswith("bn.running_var") or k.endswith(".var"):
            assert (np.asarray(v) >= 0).all(), k

    # Realistic 8-channel inputs (Y_t, Y_other, Ydiff, labelToPred one-hot)
    # from a synthetic moving scene at the deployment resolution.
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_data import make_lp_tree

    from robocupvision_tpu.cli.labelPropTrain import build_lp_pairs
    from robocupvision_tpu.data.datasets import LPDataSet

    root = str(tmp_path / "data")
    make_lp_tree(root, size=(120, 160), n_seq=1, seq_len=2)
    ds = LPDataSet(root, train=False, img_size=(120, 160), finetune=False,
                   len_seq=2)
    imgs, labs, _ = ds[0]
    x, _ = build_lp_pairs(imgs[None], labs[None], 5)  # (2,120,160,8)
    x = x[:1]

    # (a) the zoo apply on the shipped trained weights
    p = {k: jnp.asarray(v) for k, v in params.items()}
    logits, _ = m.apply(p, jnp.asarray(x))
    ref_labels = np.asarray(jnp.argmax(logits, axis=-1))
    assert len(np.unique(ref_labels)) >= 2  # trained net produces real maps

    # (b) the packed inference graph
    pi = packed.build_packed_label_prop(m, p, dtype=jnp.float32)
    packed_labels = np.asarray(pi.infer(jnp.asarray(x)))
    agree_packed = float((packed_labels == ref_labels).mean())
    assert agree_packed >= 0.999, agree_packed

    # (c) the C++ engine on the REFERENCE's own net.cfg (verbatim path).
    # The engine reads float32 streams (the robot contract); the shipped
    # f8 file is converted element-for-element, nothing reordered.
    w32 = str(tmp_path / "weights.dat")
    np.fromfile(wdat, dtype="<f8").astype("<f4").tofile(w32)
    eng = NativeEngine(cfg, w32)
    try:
        assert eng.weights_fully_consumed
        out = eng.forward(np.transpose(x[0], (2, 0, 1)))  # (C,H,W) softmax
        eng_labels = np.argmax(out, axis=0)
    finally:
        eng.close()
    agree_engine = float((eng_labels == ref_labels[0]).mean())
    assert agree_engine >= 0.999, agree_engine


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
