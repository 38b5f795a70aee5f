"""Golden-vector parity: the C++ engine vs the JAX side.

The reference's test strategy (SURVEY.md §4) is per-layer golden vectors
dumped for an external C++ engine (testDumper.py). Here both sides live in
the repo: the JAX cfg interpreter produces goldens and the native engine
must reproduce them per layer and end-to-end, for every layer type the cfg
format supports and for the actual deployed networks.
"""

import os

import numpy as np
import pytest

import jax

from robocupvision_tpu.export import deploy, netcfg
from robocupvision_tpu.export.engine import NativeEngine
from robocupvision_tpu.models import zoo

TOL = dict(rtol=1e-3, atol=5e-5)  # engine uses -ffp-contract=fast (FMA)


def _write_artifacts(tmp_path, sections, flat):
    cfg_path = str(tmp_path / "net.cfg")
    w_path = str(tmp_path / "weights.dat")
    netcfg.write_cfg(cfg_path, sections)
    np.asarray(flat, "<f4").tofile(w_path)
    return cfg_path, w_path


def _run_both(tmp_path, sections, flat, x_nhwc):
    """Returns (jax_per_layer, engine) after forward on the same input."""
    cfg_path, w_path = _write_artifacts(tmp_path, sections, flat)
    _, jax_outs = netcfg.run_cfg(sections, np.asarray(flat, np.float32),
                                 x_nhwc, return_all=True)
    eng = NativeEngine(cfg_path, w_path)
    assert eng.weights_fully_consumed
    eng.forward(np.transpose(x_nhwc[0], (2, 0, 1)))
    return jax_outs, eng


def _compare_all_layers(jax_outs, eng):
    assert eng.layer_count == len(jax_outs)
    for i, jo in enumerate(jax_outs):
        got = eng.layer_output(i)
        ref = np.transpose(np.asarray(jo)[0], (2, 0, 1))
        np.testing.assert_allclose(got, ref, err_msg=f"layer {i}", **TOL)


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


# ---- per-layer-type goldens (testDumper.py:30-55 coverage) ----------------


LAYER_CASES = [
    # (section, kv, weight-spec) on 4-channel 16x18 input
    ("convolutional", dict(filters=8, size=3, stride=1, pad=1, dilation=1,
                           hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size=3, stride=2, pad=1, dilation=1,
                           hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size=3, stride=1, pad=2, dilation=2,
                           hasBias=0), "conv"),
    ("convolutional", dict(filters=8, size=3, stride=2, pad=2, dilation=2,
                           hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size="3x1", stride=1, pad="1x0",
                           dilation=1, hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size="3x1", stride=2, pad="1x0",
                           dilation=1, hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size="3x1", stride=1, pad="2x0",
                           dilation="2x1", hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size="1x3", stride=1, pad="0x1",
                           dilation=1, hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size="1x3", stride=1, pad="0x2",
                           dilation="1x2", hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size=1, stride=1, pad=0, dilation=1,
                           hasBias=1), "conv"),
    ("convolutional", dict(filters=8, size=3, stride=1, pad=1, dilation=1,
                           hasBias=1, activation="relu"), "conv"),
    ("transposedconv", dict(filters=8, size=3, stride=2, pad=1, outpad=1),
     "tconv"),
    ("batchnorm", dict(activation="relu"), "bn"),
    ("batchnorm", dict(activation="linear"), "bn"),
    ("maxpool", dict(size=2, stride=2), None),
    ("avgpool", dict(size=2, stride=2), None),
    ("pixelshuffle", dict(factor=2), None),
    ("softmax", {}, None),
]


@pytest.mark.parametrize("name,kv,wspec", LAYER_CASES)
def test_single_layer_golden(tmp_path, name, kv, wspec):
    cin, h, w = 4, 16, 18
    rng = np.random.default_rng(hash(str(kv)) % 2 ** 31)
    flat = []
    if wspec == "conv":
        size = str(kv.get("size", 1))
        kh, kw = (int(s) for s in size.split("x")) if "x" in size \
            else (int(size), int(size))
        flat.append(rng.standard_normal(kv["filters"] * cin * kh * kw))
        if int(kv.get("hasBias", 1)):
            flat.append(rng.standard_normal(kv["filters"]))
    elif wspec == "tconv":
        flat.append(rng.standard_normal(cin * kv["filters"] * 9))
        flat.append(rng.standard_normal(kv["filters"]))
    elif wspec == "bn":
        flat.append(rng.standard_normal(cin))
        flat.append(rng.standard_normal(cin))
        flat.append(rng.standard_normal(cin))
        flat.append(np.abs(rng.standard_normal(cin)) + 0.5)
    flat = np.concatenate([np.zeros(0)] + [np.asarray(f).reshape(-1)
                                           for f in flat]).astype(np.float32)

    sections = [("net", dict(height=h, width=w, channels=cin, downscale=1)),
                (name, kv)]
    x = _rand(1, h, w, cin, seed=1)
    jax_outs, eng = _run_both(tmp_path, sections, flat, x)
    _compare_all_layers(jax_outs, eng)


def test_shortcut_and_concat_golden(tmp_path):
    cin, h, w = 4, 12, 14
    rng = np.random.default_rng(0)
    # conv -> conv -> shortcut(from 0) -> concat(from 1)
    flat = np.concatenate([
        rng.standard_normal(6 * cin * 9), rng.standard_normal(6),
        rng.standard_normal(6 * 6 * 9), rng.standard_normal(6),
    ]).astype(np.float32)
    sections = [("net", dict(height=h, width=w, channels=cin, downscale=1)),
                ("convolutional", dict(filters=6, size=3, stride=1, pad=1,
                                       dilation=1, hasBias=1)),
                ("convolutional", dict(filters=6, size=3, stride=1, pad=1,
                                       dilation=1, hasBias=1)),
                ("shortcut", {"from": 0, "activation": "linear"}),
                ("concat", {"from": 1})]
    x = _rand(1, h, w, cin, seed=2)
    jax_outs, eng = _run_both(tmp_path, sections, flat, x)
    _compare_all_layers(jax_outs, eng)


def test_partial_channel_shortcut_golden(tmp_path):
    """The LP-net's 16ch += 8ch skip (reference model.py:565 / weightsLP cfg):
    a [shortcut] whose source has fewer channels adds over the overlap."""
    cin, h, w = 8, 12, 14
    rng = np.random.default_rng(3)
    sections = [("net", dict(height=h, width=w, channels=cin, downscale=1)),
                ("convolutional", dict(filters=8, size=1, stride=1, pad=0,
                                       dilation=1, hasBias=0)),   # 8ch source
                ("convolutional", dict(filters=16, size=3, stride=1, pad=1,
                                       dilation=1, hasBias=1)),   # 16ch main
                ("shortcut", {"from": 0, "activation": "linear"})]
    flat = np.concatenate([
        rng.standard_normal(8 * cin),                       # 1x1 conv, no bias
        rng.standard_normal(16 * 8 * 9), rng.standard_normal(16),
    ]).astype(np.float32)
    x = _rand(1, h, w, cin, seed=3)
    jax_outs, eng = _run_both(tmp_path, sections, flat, x)
    _compare_all_layers(jax_outs, eng)


def test_connected_golden(tmp_path):
    rng = np.random.default_rng(4)
    flat = np.concatenate([rng.standard_normal(16 * 32),
                           rng.standard_normal(16)]).astype(np.float32)
    sections = [("net", dict(height=1, width=1, channels=32, downscale=1)),
                ("connected", dict(outputs=16, inputs=32))]
    x = _rand(1, 1, 1, 32, seed=4)
    jax_outs, eng = _run_both(tmp_path, sections, flat, x)
    _compare_all_layers(jax_outs, eng)


# ---- full deployed networks ------------------------------------------------


@pytest.mark.parametrize("family,kwargs,in_ch,hw", [
    ("pb_fcn", dict(planes=8, num_classes=5), 3, (48, 64)),
    ("label_prop", dict(planes=8), 8, (48, 64)),
    ("robo_unet", dict(planes=4, depth=3, levels=1, belly_size=2,
                       belly_planes=8), 3, (48, 64)),
    ("robo_unet", dict(planes=4, depth=3, levels=1, belly_size=2,
                       belly_planes=8, v2=True, class_size=3), 3, (48, 64)),
    # --UNet (pool) deployment: [maxpool] sections through the C++ engine
    ("robo_unet", dict(planes=4, depth=3, levels=2, belly_size=2,
                       belly_planes=8, pool=True), 3, (48, 64)),
])
def test_full_network_engine_parity(tmp_path, family, kwargs, in_ch, hw):
    m = zoo.make(family, **kwargs)
    params = {k: np.asarray(v) for k, v in m.init(jax.random.PRNGKey(7)).items()}
    d = str(tmp_path / family)
    deploy.export_deployment(d, m, params)

    x = _rand(1, hw[0], hw[1], in_ch, seed=5)
    # verify_deployment already compares the JAX interpreter vs the live
    # model; here the native engine must match both.
    deploy.verify_deployment(d, m, params, x)

    eng = NativeEngine(os.path.join(d, "net.cfg"),
                       os.path.join(d, "weights.dat"))
    assert eng.weights_fully_consumed
    got = eng.forward(np.ascontiguousarray(np.transpose(x[0], (2, 0, 1))))

    secs = netcfg.parse_cfg(os.path.join(d, "net.cfg"))
    flat = np.fromfile(os.path.join(d, "weights.dat"), dtype="<f4")
    ref = netcfg.run_cfg(secs, flat, x)
    np.testing.assert_allclose(got, np.transpose(np.asarray(ref)[0], (2, 0, 1)),
                               rtol=1e-4, atol=1e-4)


def test_engine_rejects_truncated_weights(tmp_path):
    m = zoo.make("label_prop", planes=8)
    params = {k: np.asarray(v) for k, v in m.init(jax.random.PRNGKey(0)).items()}
    d = str(tmp_path / "lp")
    deploy.export_deployment(d, m, params)
    w = os.path.join(d, "weights.dat")
    flat = np.fromfile(w, dtype="<f4")
    flat[: flat.size // 2].tofile(w)
    with pytest.raises(RuntimeError):
        NativeEngine(os.path.join(d, "net.cfg"), w)
