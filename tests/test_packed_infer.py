"""Lane-packed inference graph: exact-rewrite guarantees.

The packed path (models/packed.py) must be a pure performance transform:
per-kernel scatter identity, full-model per-pixel logits parity against
zoo.robo_unet_apply, and identical label maps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import packed, zoo
from robocupvision_tpu.ops import nn


@pytest.mark.parametrize("f_in,f_out,stride,k,dil", [
    (4, 4, 1, 3, 1), (4, 2, 2, 3, 1), (2, 2, 1, 3, 1), (2, 1, 2, 3, 1),
    (1, 1, 1, 3, 1), (4, 4, 1, 1, 1), (2, 2, 1, 1, 1),
    (4, 4, 1, 3, 2), (2, 2, 1, 3, 2), (2, 1, 2, 3, 2),  # dilated (PB_FCN)
])
def test_pack_conv_weight_identity(f_in, f_out, stride, k, dil):
    rng = np.random.default_rng(f_in * 100 + f_out * 10 + stride + dil)
    cin, cout = 3, 5
    H = W = 8 * f_in
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)), jnp.float32)

    ref = nn.conv2d(x, w, stride=stride, padding=dil * (k // 2), dilation=dil)
    wp = packed.pack_conv_weight(np.asarray(w), f_in, f_out, stride,
                                 dilation=dil)
    got = nn.conv2d(packed.space_to_depth(x, f_in), jnp.asarray(wp),
                    padding=int(wp.shape[0]) // 2)
    want = packed.space_to_depth(ref, f_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("f_in", [1, 2])
def test_pack_tconv_weight_identity(f_in):
    rng = np.random.default_rng(7 + f_in)
    cin, cout = 4, 3
    H = W = 8 * f_in
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)

    ref = nn.conv_transpose2d(x, w, stride=2, padding=1, output_padding=1)
    wp = packed.pack_conv_weight(np.asarray(w), f_in, 2 * f_in, transpose=True)
    got = nn.conv2d(packed.space_to_depth(x, f_in), jnp.asarray(wp), padding=1)
    want = packed.space_to_depth(ref, 2 * f_in)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("group,cin", [(4, 3), (8, 3), (16, 3), (16, 8)])
def test_pack_stem_weight_grouped_identity(group, cin):
    """The grouped stem conv (+ the free output reshape) equals
    s2d(conv(x)) for any group width (the lane-density knob)."""
    rng = np.random.default_rng(group + cin)
    f, cout = 4, 6
    H, W = 16, 32
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)

    want = packed.space_to_depth(nn.conv2d(x, w, padding=1), f)
    wp = packed.pack_stem_weight_grouped(np.asarray(w), f, group)
    xg = x.reshape(2, H, W // group, group * cin)
    y = nn.conv2d(xg, jnp.asarray(wp), stride=(f, 1), padding=1)
    n, hp, wg, cg = y.shape
    got = y.reshape(n, hp, wg * (group // f), cg // (group // f))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_space_to_depth_round_trip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 3)), jnp.float32)
    y = packed.depth_to_space(packed.space_to_depth(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _randomized_params(model, seed):
    """init() params with perturbed BN running stats so the BN fold is
    actually exercised (init gives rm=0, rv=1)."""
    rng = np.random.default_rng(seed)
    params = {k: np.array(v) for k, v in
              model.init(jax.random.PRNGKey(seed)).items()}
    for k in params:
        if k.endswith(".running_mean"):
            params[k] = rng.standard_normal(params[k].shape).astype(np.float32) * 0.3
        elif k.endswith(".running_var"):
            params[k] = (0.5 + rng.random(params[k].shape)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in params.items()}


# hyper-table kwargs per deployed variant (cli/train.py model_hyper), plus
# off-table corners that the plan generality must still cover
_VARIANTS = {
    "flagship": {},
    "v2": dict(v2=True, levels=1, belly_size=9, class_size=3, belly_planes=64),
    "unet": dict(pool=True, levels=3, belly_size=0),
    "levels3_nobelly": dict(levels=3, belly_size=0),
    "v2_pool": dict(v2=True, pool=True, levels=2, class_size=3),
    "depth5": dict(depth=5),
}


@pytest.mark.parametrize("variant,no_scale,hw", [
    ("flagship", True, (64, 64)), ("flagship", False, (32, 64)),
    ("v2", False, (32, 64)), ("v2", True, (64, 64)),
    ("unet", False, (32, 64)),
    ("levels3_nobelly", False, (32, 64)),
    ("v2_pool", False, (32, 64)),
    ("depth5", False, (32, 64)),
])
def test_packed_logits_match_reference_apply(variant, no_scale, hw):
    model = zoo.make("robo_unet", no_scale=no_scale, **_VARIANTS[variant])
    params = _randomized_params(model, 1 if no_scale else 2)
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    labels = pi.infer(x)
    np.testing.assert_array_equal(
        np.asarray(labels), np.asarray(jnp.argmax(want, axis=-1)))


def test_packed_label_prop_matches_reference_apply():
    """The packed LabelProp graph (8-ch full-res input — the worst
    lane-waste case) is per-pixel exact vs zoo.label_prop_apply, including
    the channel-slice skip (reference model.py:565)."""
    model = zoo.make("label_prop")
    params = _randomized_params(model, 5)
    pi = packed.build_packed_label_prop(model, params, dtype=jnp.float32)

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 8)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(pi.infer(x)), np.asarray(jnp.argmax(want, axis=-1)))


@pytest.mark.parametrize("no_scale", [False, True])
def test_packed_pb_fcn_matches_reference_apply(no_scale):
    """Packed PB_FCN (tester.py's latency/deployment net, incl. the dilated
    DownSampler stem) is per-pixel exact vs zoo.pb_fcn_apply."""
    model = zoo.make("pb_fcn", no_scale=no_scale)
    params = _randomized_params(model, 8 + no_scale)
    pi = packed.build_packed_pb_fcn(model, params, dtype=jnp.float32)

    rng = np.random.default_rng(9)
    hw = (64, 64) if no_scale else (32, 64)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(pi.infer(x)), np.asarray(jnp.argmax(want, axis=-1)))


def test_packed_pb_fcn_2_matches_reference_apply():
    """PB_FCN_2 seg (reference model.py:416-459) rides the flagship plan via
    the cfg mapping in build_packed_infer."""
    model = zoo.make("pb_fcn_2", classify=False)
    params = _randomized_params(model, 10)
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 3)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_packed_rejects_other_families():
    m = zoo.make("pb_fcn")
    with pytest.raises(AssertionError):
        packed.build_packed_infer(m, m.init(jax.random.PRNGKey(0)))
    with pytest.raises(AssertionError):
        packed.build_packed_label_prop(m, m.init(jax.random.PRNGKey(0)))


# ---- packed TRAINING graph ---------------------------------------------------

def test_packed_train_apply_matches_standard_forward():
    """packed_train_apply with train-mode BN == robo_unet_apply per pixel."""
    model = zoo.make("robo_unet", planes=4, depth=4, levels=2, belly_size=2,
                     belly_planes=16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 48, 64, 3)), jnp.float32)

    ref, mut_ref = zoo.robo_unet_apply(model.cfg, params, x, train=True)
    maps = packed.build_train_pack_maps(model)
    got, mut_got = packed.packed_train_apply(maps, params, x, train=True)
    # unpack (N, Hp, Wp, 16, C) -> (N, H, W, C)
    n, hp, wp, t, c = got.shape
    got_full = packed.depth_to_space(got.reshape(n, hp, wp, t * c), 4)
    np.testing.assert_allclose(np.asarray(got_full), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    assert set(mut_got) == set(mut_ref)
    for k in mut_ref:
        np.testing.assert_allclose(np.asarray(mut_got[k]),
                                   np.asarray(mut_ref[k]),
                                   atol=1e-5, rtol=1e-4)


def test_packed_train_step_matches_standard():
    """A full train step (augment + loss + backward + update + BN stats)
    through the packed graph equals the standard graph — packed training is
    purely an execution strategy.

    Part 1 certifies *gradient* exactness: one plain-SGD step, where the
    param delta IS lr*grad, compared tightly. Part 2 runs 3 Adam steps and
    checks the loss trajectory and correct-pixel counts agree (Adam's
    sqrt(v)+eps rescaling amplifies float-reassociation noise on near-zero
    gradients, so param-level bitwise agreement is not expected there)."""
    import dataclasses

    from robocupvision_tpu.train import optim, step as tstep

    model = zoo.make("robo_unet", planes=4, depth=4, levels=2, belly_size=2,
                     belly_planes=16)
    cfg_std = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                            l1_decay=1e-6, out_size=1.0 / (48 * 64))
    cfg_pk = dataclasses.replace(cfg_std, packed=True)

    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.standard_normal((6, 48, 64, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, (6, 48, 64)), jnp.int32)
    mask = jnp.asarray([1, 1, 1, 1, 1, 0], jnp.float32)  # one padded slot
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(100)

    # part 1: SGD step — param delta == lr * grad, so this compares gradients
    tx = optim.sgd()
    s_std = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    s_pk = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    step_std = tstep.make_train_step(model, tx, cfg_std, donate=False)
    step_pk = tstep.make_train_step(model, tx, cfg_pk, donate=False)
    s_std, o_std = step_std(s_std, imgs, targets, mask, key, lr, None)
    s_pk, o_pk = step_pk(s_pk, imgs, targets, mask, key, lr, None)
    assert abs(float(o_std["loss"]) - float(o_pk["loss"])) < 1e-4
    for k in s_std.params:
        np.testing.assert_allclose(np.asarray(s_pk.params[k]),
                                   np.asarray(s_std.params[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=k)

    # part 2: 3 Adam steps — the loss trajectories stay together
    tx = optim.adam()
    s_std = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    s_pk = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    step_std = tstep.make_train_step(model, tx, cfg_std, donate=False)
    step_pk = tstep.make_train_step(model, tx, cfg_pk, donate=False)
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        s_std, o_std = step_std(s_std, imgs, targets, mask, key, lr, None)
        s_pk, o_pk = step_pk(s_pk, imgs, targets, mask, key, lr, None)
        assert abs(float(o_std["loss"]) - float(o_pk["loss"])) < 2e-4
        # argmax can flip on near-tied random-init logits (reassociation)
        assert float(o_std["correct"]) == pytest.approx(
            float(o_pk["correct"]), abs=0.002 * 6 * 48 * 64)


def test_packed_infer_u8_packed_roundtrip():
    """The serving-optimal packed-label output + host unpack equals the
    device-side depth-to-space path exactly."""
    model = zoo.make("robo_unet")
    params = model.init(jax.random.PRNGKey(0))
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 64, 3), jnp.float32)
    device_fn, host_unpack = pi.infer_u8_packed()
    got = host_unpack(device_fn(x))
    np.testing.assert_array_equal(got, np.asarray(pi.infer_u8(x)))


def test_packed_infer_u4_packed_roundtrip():
    """The half-wire 4-bit label pack (two labels per byte on device) +
    host unpack equals infer_u8 exactly, for the flagship and the worst
    lane-waste family (LabelProp), and the wire buffer really is half the
    u8-packed bytes."""
    for fam, shape in [("robo_unet", (2, 48, 64, 3)),
                       ("label_prop", (2, 48, 64, 8))]:
        model = zoo.make(fam)
        params = model.init(jax.random.PRNGKey(0))
        build = packed.build_packed_infer if fam == "robo_unet" \
            else packed.build_packed_label_prop
        pi = build(model, params, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
        device_fn, host_unpack = pi.infer_u4_packed()
        wire = device_fn(x)
        dev8, _ = pi.infer_u8_packed()
        assert wire.dtype == jnp.uint8
        assert wire.size * 2 == dev8(x).size
        np.testing.assert_array_equal(host_unpack(wire),
                                      np.asarray(pi.infer_u8(x)))


def test_packed_infer_data_sharded_matches_single_device():
    """Multi-chip batched serving: the packed graph jits over a data-sharded
    batch (8-device mesh) with identical label maps — the packed weights
    replicate, the batch partitions, XLA inserts no cross-device traffic."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robocupvision_tpu.parallel import mesh as pmesh

    model = zoo.make("robo_unet")
    params = _randomized_params(model, 12)
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 64, 3), jnp.float32)
    want = np.asarray(pi.infer(x))

    mesh = pmesh.make_mesh(8, spatial=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        got = jax.jit(pi.infer)(xs)
    assert len(got.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(got), want)


def test_packed_infer_u8_matches_int32():
    model = zoo.make("robo_unet", no_scale=True)
    params = model.init(jax.random.PRNGKey(0))
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)
    lab32 = np.asarray(pi.infer(x))
    lab8 = np.asarray(pi.infer_u8(x))
    assert lab8.dtype == np.uint8
    np.testing.assert_array_equal(lab32.astype(np.uint8), lab8)


def test_infer_u8_io_matches_host_preprocessing():
    """Raw-camera serving (infer_u8_io): shipping uint8 RGB and running the
    /255 + ToYUV + Normalize chain on device (one fused affine,
    ops/color.raw_camera_preprocess) yields the same labels as the host
    preprocessing the datasets do (reference transform.py:21-24)."""
    from robocupvision_tpu.data.datasets import to_yuv_legacy
    from robocupvision_tpu.ops.color import raw_camera_preprocess

    model = zoo.make("robo_unet")
    params = _randomized_params(model, 31)
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    frame = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)

    # host path: exactly what SSDataSet.__getitem__ does
    host = to_yuv_legacy(frame.astype(np.float32) / 255.0)
    host = (host - np.array([0.5, 0.0, 0.0], np.float32)) / np.float32(0.5)

    pre = np.asarray(raw_camera_preprocess(jnp.asarray(frame)))
    np.testing.assert_allclose(pre, host, atol=2e-5, rtol=1e-5)

    want = np.asarray(jax.jit(pi.infer_u8)(jnp.asarray(host)))
    got = np.asarray(jax.jit(pi.infer_u8_io)(jnp.asarray(frame)))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_packed_parity_fuzzed_configs(seed):
    """Seeded random-config fuzz over the whole RoboUNet hyper space:
    packed-vs-standard logits parity must hold for ANY buildable config,
    not just the deployed variants and pinned corners above."""
    rng = np.random.default_rng(1000 + seed)
    cfgkw = dict(
        planes=int(rng.choice([4, 6, 8, 12])),
        depth=int(rng.choice([4, 5])),
        levels=int(rng.choice([1, 2, 3])),
        belly_size=int(rng.choice([0, 1, 3, 5])),
        belly_planes=int(rng.choice([16, 32, 64])),
        pool=bool(rng.random() < 0.3),
        v2=bool(rng.random() < 0.3),
        num_classes=int(rng.choice([2, 5])),
        no_scale=bool(rng.random() < 0.5),
    )
    if cfgkw["v2"]:
        cfgkw["class_size"] = int(rng.choice([1, 3]))
    model = zoo.make("robo_unet", **cfgkw)
    params = _randomized_params(model, 2000 + seed)
    pi = packed.build_packed_infer(model, params, dtype=jnp.float32)

    hw = (64, 64) if cfgkw["no_scale"] else (32, 64)
    x = jnp.asarray(rng.standard_normal((1, *hw, 3)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4, err_msg=str(cfgkw))
    np.testing.assert_array_equal(
        np.asarray(pi.infer(x)),
        np.asarray(jnp.argmax(want, axis=-1)), err_msg=str(cfgkw))


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(3))
def test_packed_pb_fcn_parity_fuzzed(seed):
    """Same fuzz idea for the PB_FCN family (planes/kernel/scale knobs)."""
    rng = np.random.default_rng(3000 + seed)
    cfgkw = dict(planes=int(rng.choice([16, 24, 32])),
                 kernel_size=int(rng.choice([1, 3])),
                 num_classes=int(rng.choice([2, 5])),
                 no_scale=bool(rng.random() < 0.5))
    model = zoo.make("pb_fcn", classify=False, **cfgkw)
    params = _randomized_params(model, 4000 + seed)
    pi = packed.build_packed_pb_fcn(model, params, dtype=jnp.float32)

    hw = (64, 64) if cfgkw["no_scale"] else (32, 64)
    x = jnp.asarray(rng.standard_normal((1, *hw, 3)), jnp.float32)
    want, _ = model.apply(params, x)
    got = pi.logits(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4, err_msg=str(cfgkw))
