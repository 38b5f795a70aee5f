"""Export contract tests: weights.dat ordering, net.cfg structure parity with
the reference's hand-maintained files, and cfg+dat self-consistency through
the JAX interpreter."""

import os

import numpy as np
import pytest

import jax

from robocupvision_tpu.export import deploy, netcfg, weights_io
from robocupvision_tpu.models import zoo

REF = "/root/reference"


def _params(model, seed=0):
    return {k: np.asarray(v)
            for k, v in model.init(jax.random.PRNGKey(seed)).items()}


def test_weights_dat_roundtrip(tmp_path):
    m = zoo.make("label_prop", planes=8)
    params = _params(m)
    out = weights_io.save_params(str(tmp_path), m.registry, params)
    assert os.path.getsize(out) % 4 == 0
    back = weights_io.load_params_flat(out, m.registry)
    for k in params:
        np.testing.assert_allclose(back[k], params[k], rtol=1e-6, atol=1e-7)


def test_weights_dat_order_matches_reference_savedump(tmp_path):
    """Flat stream equals the reference's own saveParams on the same model."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    import sys

    sys.path.insert(0, REF)
    import importlib

    import model as refmodel
    import paramSave as ref_save
    importlib.reload(ref_save)
    import torch

    torch.manual_seed(0)
    tm = refmodel.ROBO_UNet(planes=4, depth=3, levels=1, bellySize=2,
                            bellyPlanes=8)
    ours = zoo.make("robo_unet", planes=4, depth=3, levels=1, belly_size=2,
                    belly_planes=8)
    from robocupvision_tpu.export.torch_io import from_torch_state_dict

    params = from_torch_state_dict(ours.registry, tm.state_dict())

    ref_dir = str(tmp_path / "ref")
    ref_save.saveParams(ref_dir, tm, "w.dat")
    ref_flat = np.fromfile(os.path.join(ref_dir, "w.dat"))  # float64 (np quirk)

    our_file = weights_io.save_params(str(tmp_path / "ours"), ours.registry,
                                      params, "w.dat")
    our_flat = np.fromfile(our_file, dtype="<f4")

    # The reference stream interleaves int64 num_batches_tracked counters
    # (accidentally cast to float); drop them for comparison.
    n_bn = sum(1 for n in ours.param_order if n.endswith(".running_var"))
    assert ref_flat.size == our_flat.size + n_bn
    kept = []
    ref_iter = iter(ref_flat)
    sd = tm.state_dict()
    for name in sd:
        vals = [next(ref_iter) for _ in range(sd[name].numel())]
        if not name.endswith("num_batches_tracked"):
            kept.extend(vals)
    np.testing.assert_allclose(np.asarray(kept, np.float32), our_flat,
                               rtol=1e-6, atol=1e-7)


def test_pb_fcn_cfg_matches_reference_file():
    """Generated QVGA PB-FCN cfg structurally equals weights/net.cfg."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    ref = netcfg.parse_cfg(os.path.join(REF, "weights", "net.cfg"))
    ours = netcfg.pb_fcn_sections(32, 5, no_scale=False)
    assert [s[0] for s in ours] == [s[0] for s in ref]
    for (n1, kv1), (n2, kv2) in zip(ours, ref):
        for key in ("filters", "size", "stride", "pad", "dilation", "from",
                    "outpad", "height", "width", "channels", "downscale"):
            if key in kv2:
                assert str(kv1.get(key)) == str(kv2[key]), (n1, key, kv1, kv2)


def test_label_prop_cfg_matches_reference_file():
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    ref = netcfg.parse_cfg(os.path.join(REF, "weightsLP", "net.cfg"))
    ours = netcfg.label_prop_sections(32, 5)
    assert [s[0] for s in ours] == [s[0] for s in ref]
    for (n1, kv1), (n2, kv2) in zip(ours, ref):
        for key in ("filters", "size", "stride", "pad", "dilation", "from",
                    "outpad", "height", "width", "channels"):
            if key in kv2:
                assert str(kv1.get(key)) == str(kv2[key]), (n1, key, kv1, kv2)


@pytest.mark.parametrize("family,kwargs,in_ch", [
    ("pb_fcn", dict(planes=8, num_classes=5), 3),
    ("label_prop", dict(planes=8), 8),
    ("robo_unet", dict(planes=4, depth=3, levels=1, belly_size=2,
                       belly_planes=8), 3),
    ("robo_unet", dict(planes=4, depth=3, levels=1, belly_size=2,
                       belly_planes=8, v2=True, class_size=3), 3),
    # --UNet (pool) deployment graph — reference train.py:211, maxpool golden
    # vectors in testDumper.py:30-43
    ("robo_unet", dict(planes=4, depth=3, levels=2, belly_size=2,
                       belly_planes=8, pool=True), 3),
])
def test_deployment_export_self_consistent(tmp_path, family, kwargs, in_ch):
    """cfg + weights.dat executed by the interpreter == live model forward."""
    m = zoo.make(family, **kwargs)
    params = _params(m, seed=3)
    d = str(tmp_path / family)
    deploy.export_deployment(d, m, params)
    x = np.random.default_rng(0).standard_normal((1, 48, 64, in_ch)).astype(np.float32)
    diff = deploy.verify_deployment(d, m, params, x)
    assert diff < 1e-4


def test_pb_fcn_vga_cfg_matches_reference_file():
    """Generated VGA PB-FCN cfg structurally equals weightsVGA/net.cfg."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    ref = netcfg.parse_cfg(os.path.join(REF, "weightsVGA", "net.cfg"))
    ours = netcfg.pb_fcn_sections(32, 5, no_scale=True)
    assert [s[0] for s in ours] == [s[0] for s in ref]
    for (n1, kv1), (n2, kv2) in zip(ours, ref):
        for key in ("filters", "size", "stride", "pad", "dilation", "from",
                    "outpad", "height", "width", "channels", "downscale"):
            if key in kv2:
                assert str(kv1.get(key)) == str(kv2[key]), (n1, key, kv1, kv2)


def test_connected_spatial_input_flattens_nchw(tmp_path):
    """[connected] on a >1x1 input: run_cfg and the engine agree on NCHW
    flattening (review finding: they used to diverge + the engine overread)."""
    import numpy as np

    from robocupvision_tpu.export.engine import NativeEngine

    rng = np.random.default_rng(0)
    c, h, w, out = 3, 4, 5, 7
    flat = np.concatenate([rng.standard_normal(out * c * h * w),
                           rng.standard_normal(out)]).astype(np.float32)
    sections = [("net", dict(height=h, width=w, channels=c, downscale=1)),
                ("connected", dict(outputs=out))]
    cfg_path = str(tmp_path / "net.cfg")
    w_path = str(tmp_path / "weights.dat")
    netcfg.write_cfg(cfg_path, sections)
    flat.tofile(w_path)

    x = rng.standard_normal((1, h, w, c)).astype(np.float32)
    ref = np.asarray(netcfg.run_cfg(sections, flat, x)).reshape(-1)
    eng = NativeEngine(cfg_path, w_path)
    assert eng.weights_fully_consumed
    got = eng.forward(np.ascontiguousarray(x[0].transpose(2, 0, 1))).reshape(-1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # mismatched runtime input size fails cleanly instead of overreading
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        eng.forward(np.zeros((c, h + 2, w), np.float32))


def test_verify_deploy_cli(tmp_path, monkeypatch, capsys):
    import jax as _jax

    m = zoo.make("label_prop", planes=8)
    params = {k: np.asarray(v) for k, v in m.init(_jax.random.PRNGKey(0)).items()}
    d = str(tmp_path / "lp")
    deploy.export_deployment(d, m, params)

    from robocupvision_tpu.cli import verifyDeploy

    rc = verifyDeploy.main(["--dir", d, "--family", "label_prop",
                            "--planes", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK" in out and "label agreement=1.000000" in out

    # corrupted weights fail loudly
    w = os.path.join(d, "weights.dat")
    flat = np.fromfile(w, dtype="<f4")
    flat[:-8].tofile(w)
    rc = verifyDeploy.main(["--dir", d, "--family", "label_prop",
                            "--planes", "8"])
    assert rc == 1
