"""Whole-network structured pruning (ops/slim.py): group-structure validity,
masked-vs-compacted equality (exact up to float reassociation — removing a
channel shortens the conv reduction) across families/variants, masked-
finetune compatibility, and packed-graph parity on slim param dicts."""

import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from robocupvision_tpu.models import zoo
from robocupvision_tpu.ops import slim


def _np(params):
    return {k: np.asarray(v) for k, v in params.items()}


def _jx(params):
    return {k: jnp.asarray(v) for k, v in params.items()}


# non-default plane counts keep the arch small but every group non-trivial
ROBO_VARIANTS = {
    "flagship": dict(planes=8, levels=2, depth=4, belly_size=5,
                     belly_planes=32, class_size=1),
    "v2": dict(planes=8, levels=1, depth=4, belly_size=3, belly_planes=16,
               class_size=3, v2=True),
    "unet": dict(planes=8, levels=3, depth=4, belly_size=0, pool=True),
    "noscale": dict(planes=4, levels=2, depth=4, belly_size=3,
                    belly_planes=16, no_scale=True),
}

FAMS = {
    "robo_unet": (dict(ROBO_VARIANTS["flagship"]), (1, 32, 32, 3)),
    "pb_fcn_2": (dict(planes=8, depth=4, levels=2, belly_size=3,
                      belly_planes=16), (1, 32, 32, 3)),
    "pb_fcn": (dict(planes=16), (1, 32, 32, 3)),
    "fcn": (dict(planes=16), (1, 32, 32, 3)),
    "label_prop": (dict(planes=16), (1, 32, 32, 8)),
}


def _model_params(family, kw, seed=0):
    m = zoo.make(family, **kw)
    return m, _np(m.init(jax.random.PRNGKey(seed)))


def _x(shape, seed=1):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


@pytest.mark.parametrize("family", list(FAMS))
def test_groups_validate(family):
    kw, _ = FAMS[family]
    m, params = _model_params(family, kw)
    slim.validate_groups(m, params)


@pytest.mark.parametrize("variant", list(ROBO_VARIANTS))
def test_groups_validate_robo_variants(variant):
    m, params = _model_params("robo_unet", ROBO_VARIANTS[variant])
    slim.validate_groups(m, params)


@pytest.mark.parametrize("variant", list(ROBO_VARIANTS))
def test_masked_equals_compacted_robo_unet(variant, capsys):
    m, params = _model_params("robo_unet", ROBO_VARIANTS[variant])
    groups = slim.channel_groups(m)
    masked, masks = slim.prune_channels(params, groups, ratio=0.4)
    assert any(mk.any() for mk in masks.values())
    slim_p, kept = slim.compact(m, masked)
    assert slim.param_count(slim_p) < slim.param_count(params)

    x = _x((2, 32, 32, 3) if not m.cfg.no_scale else (2, 32, 32, 3))
    a, _ = m.apply(_jx(masked), x, train=False)
    b, _ = m.apply(_jx(slim_p), x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("family", ["pb_fcn_2", "pb_fcn", "fcn", "label_prop"])
def test_masked_equals_compacted_other_families(family, capsys):
    kw, xshape = FAMS[family]
    m, params = _model_params(family, kw)
    groups = slim.channel_groups(m)
    masked, masks = slim.prune_channels(params, groups, ratio=0.35)
    slim_p, kept = slim.compact(m, masked)
    assert slim.param_count(slim_p) < slim.param_count(params)

    x = _x(xshape)
    a, _ = m.apply(_jx(masked), x, train=False)
    b, _ = m.apply(_jx(slim_p), x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_pb_fcn_classify_head_stays_loadable():
    """The slim dict serves BOTH heads: classify-mode apply runs too."""
    m, params = _model_params("pb_fcn", dict(planes=16, classify=True))
    groups = slim.channel_groups(m)
    masked, _ = slim.prune_channels(params, groups, ratio=0.3)
    slim_p, _ = slim.compact(m, masked)
    a, _ = m.apply(_jx(masked), _x((1, 32, 32, 3)), train=False)
    b, _ = m.apply(_jx(slim_p), _x((1, 32, 32, 3)), train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_train_mode_masked_equals_compacted():
    """Exactness holds in TRAIN mode too (batch-stat BN): a dead channel is
    zero through batch normalization since gamma == beta == 0."""
    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)
    x = _x((2, 32, 32, 3))
    a, mut_a = m.apply(_jx(masked), x, train=True)
    b, mut_b = m.apply(_jx(slim_p), x, train=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)
    assert set(mut_a) == set(mut_b)


def test_masked_finetune_keeps_channels_dead_and_compacts_exactly():
    """One Adam step with the structured masks (the train step's masked-grad
    path) leaves pruned channels exactly zero, so compaction stays exact on
    the finetuned params."""
    import optax

    from robocupvision_tpu.models.layers import is_weight
    from robocupvision_tpu.ops.pruning import mask_gradients
    from robocupvision_tpu.ops.losses import cross_entropy_2d

    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, masks = slim.prune_channels(params, slim.channel_groups(m),
                                        ratio=0.4)
    x = _x((2, 32, 32, 3))
    y = jnp.asarray(np.random.default_rng(3).integers(0, 5, (2, 32, 32)))

    train_p = {k: jnp.asarray(v) for k, v in masked.items() if is_weight(k)}
    state_p = {k: jnp.asarray(v) for k, v in masked.items()
               if not is_weight(k)}
    tx = optax.adam(1e-2)
    opt_state = tx.init(train_p)

    def loss_fn(tp):
        out, mut = m.apply({**tp, **state_p}, x, train=True)
        return cross_entropy_2d(out, y, jnp.ones(5)), mut

    (_, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_p)
    grads = mask_gradients(grads, masks)
    updates, opt_state = tx.update(grads, opt_state, train_p)
    train_p = optax.apply_updates(train_p, updates)
    stepped = _np({**train_p, **state_p, **mut})

    # pruned positions stayed exactly zero -> compaction still exact
    for name, mk in masks.items():
        assert not np.asarray(stepped[name])[mk].any(), name
    slim_p, _ = slim.compact(m, stepped)
    a, _ = m.apply(_jx(stepped), x, train=False)
    b, _ = m.apply(_jx(slim_p), x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_round_to_and_min_keep():
    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    groups = slim.channel_groups(m)
    _, masks = slim.prune_channels(params, groups, ratio=0.9, round_to=4,
                                   min_keep=4)
    masked, _ = slim.prune_channels(params, groups, ratio=0.9, round_to=4,
                                    min_keep=4)
    slim_p, kept = slim.compact(m, masked)
    for g, (gid, n) in zip(groups, kept.items()):
        assert n >= 4 and n % 4 == 0 or n == g.size, (gid, n, g.size)


def test_compact_noop_on_dense_params():
    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    slim_p, kept = slim.compact(m, params)
    assert slim.param_count(slim_p) == slim.param_count(params)
    x = _x((1, 32, 32, 3))
    a, _ = m.apply(_jx(params), x, train=False)
    b, _ = m.apply(_jx(slim_p), x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # true no-op


@pytest.mark.parametrize("variant", ["flagship", "v2", "unet"])
def test_packed_infer_parity_on_slim_params(variant):
    """The packed serving graph builds from a slim dict unchanged (widths
    flow from array shapes) and matches the slim zoo apply."""
    from robocupvision_tpu.models import packed

    m, params = _model_params("robo_unet", ROBO_VARIANTS[variant])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)

    x = _x((1, 32, 32, 3))
    want, _ = m.apply(_jx(slim_p), x, train=False)
    inf = packed.build_packed_infer(m, _jx(slim_p), dtype=jnp.float32)
    got = inf.logits(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(inf.infer(x)),
        np.asarray(jnp.argmax(want, axis=-1).astype(jnp.int32)))


# ---- export / checkpoint / CLI integration ----------------------------------


def test_slim_deploy_export_interpreter_and_engine(tmp_path, monkeypatch):
    """A slim dict exports to net.cfg (per-layer widths from the params) +
    weights.dat; the cfg interpreter AND the native C++ engine agree with
    the slim zoo apply."""
    from robocupvision_tpu.export import deploy, netcfg
    from robocupvision_tpu.export.engine import NativeEngine

    monkeypatch.chdir(tmp_path)
    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)

    deploy.export_deployment("weightsSlim", m, slim_p)
    secs = netcfg.parse_cfg("weightsSlim/net.cfg")
    filters = [int(kv["filters"]) for name, kv in secs
               if name == "convolutional"]
    dense = [int(kv["filters"]) for name, kv in
             netcfg.robo_unet_sections(m.cfg) if name == "convolutional"]
    assert filters != dense and filters[-1] == dense[-1]  # head untouched

    x = np.random.default_rng(2).standard_normal((1, 32, 32, 3)).astype(np.float32)
    deploy.verify_deployment("weightsSlim", m, slim_p, x)

    eng = NativeEngine("weightsSlim/net.cfg", "weightsSlim/weights.dat")
    assert eng.weights_fully_consumed
    probs = eng.forward(np.ascontiguousarray(x[0].transpose(2, 0, 1)))
    want, _ = m.apply(_jx(slim_p), jnp.asarray(x), train=False)
    agree = float(np.mean(np.argmax(probs, axis=0)
                          == np.asarray(jnp.argmax(want[0], axis=-1))))
    assert agree >= 0.999, agree


def test_slim_checkpoint_roundtrip(tmp_path):
    from robocupvision_tpu.train import checkpoint

    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)

    path = str(tmp_path / "slim.weights")
    checkpoint.save(path, m.registry, slim_p, slim=True)
    loaded = checkpoint.load_any(path, m.registry)
    for k, v in slim_p.items():
        np.testing.assert_array_equal(np.asarray(v), loaded[k], err_msg=k)

    # unmarked files keep the strict shape guard
    dense_path = str(tmp_path / "broken.weights")
    checkpoint.save(dense_path, m.registry, slim_p)  # no slim marker
    with pytest.raises(ValueError):
        checkpoint.load_any(dense_path, m.registry)


def test_structured_prune_tool_ratio_mode(tmp_path, monkeypatch, capsys):
    """tools/structured_prune.py --ratio: whole-network slim of a train.py
    flagship checkpoint + deployment artifacts that self-verify."""
    from robocupvision_tpu.cli.train import model_hyper
    from robocupvision_tpu.export import deploy
    from robocupvision_tpu.tools import structured_prune
    from robocupvision_tpu.train import checkpoint

    monkeypatch.chdir(tmp_path)
    m = zoo.make("robo_unet", **model_hyper(False, False))
    params = _np(m.init(jax.random.PRNGKey(0)))
    checkpoint.save("checkpoints/best.weights", m.registry, params)

    rc = structured_prune.main([
        "--checkpoint", "checkpoints/best.weights", "--ratio", "0.5",
        "--out", "checkpoints/bestSlim.weights", "--deploy", "weightsSlim"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "slim:" in out and "% fewer" in out

    slim_p = checkpoint.load_any("checkpoints/bestSlim.weights", m.registry)
    assert slim.param_count(slim_p) < slim.param_count(params)
    # round_to=8 default: every conv width is a lane-friendly multiple of 8
    for k, v in slim_p.items():
        if k.endswith(".conv.weight"):
            assert v.shape[-1] % 8 == 0 or v.shape[-1] == 3, (k, v.shape)

    x = np.random.default_rng(0).standard_normal((1, 120, 160, 3)).astype(np.float32)
    deploy.verify_deployment("weightsSlim", m, slim_p, x)


@pytest.mark.parametrize("variant", ["flagship", "v2", "unet"])
def test_pallas_chains_on_slim_params(variant):
    """The Pallas fused-region chains build from a slim dict (stage widths
    flow from the packed kernels) and match the XLA packed path per-pixel
    (interpret mode; v2 exercises equal-width split halves — guaranteed by
    the joint skip/up groups)."""
    from robocupvision_tpu.models import packed

    m, params = _model_params("robo_unet", ROBO_VARIANTS[variant])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)
    jx = _jx(slim_p)

    x = _x((1, 32, 32, 3))
    base = packed.build_packed_infer(m, jx, dtype=jnp.float32)
    chain = packed.build_packed_infer(m, jx, dtype=jnp.float32, pallas=True,
                                      pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(chain.logits(x)),
                               np.asarray(base.logits(x)),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(chain.infer(x)),
                                  np.asarray(base.infer(x)))


def test_int8_quantization_on_slim_chains():
    """Static int8 PTQ composes with slim dicts: quantize the slim Pallas
    chain graph and require high label agreement vs the float slim graph."""
    from robocupvision_tpu.models import packed

    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)
    jx = _jx(slim_p)

    x = _x((1, 32, 32, 3))
    f = packed.build_packed_infer(m, jx, dtype=jnp.bfloat16, pallas=True,
                                  pallas_interpret=True)
    q = packed.quantize_int8(f, x)
    agree = float(jnp.mean(q.infer(x) == f.infer(x)))
    assert agree >= 0.95, agree


def test_get_computations_shape_driven_for_slim():
    """Analytic op counts read widths from compacted shapes: the slim dict
    reports strictly fewer ops than the masked dict's nnz-ratio estimate
    (which can't see consumers' dead in-slices); dense params unchanged."""
    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    dense_cost = sum(zoo.robo_unet_get_computations(m.cfg))
    dense_cost_p = sum(zoo.robo_unet_get_computations(m.cfg, params,
                                                      pruned=True))
    assert dense_cost_p == pytest.approx(dense_cost, rel=1e-6)

    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.5)
    slim_p, _ = slim.compact(m, masked)
    masked_cost = sum(zoo.robo_unet_get_computations(m.cfg, masked,
                                                     pruned=True))
    slim_cost = sum(zoo.robo_unet_get_computations(m.cfg, slim_p,
                                                   pruned=True))
    assert slim_cost < masked_cost < dense_cost


def test_detect_cli_slim_ckpt(tmp_path, monkeypatch, capsys):
    """detect --ckpt serves a .slim artifact end to end (masks written,
    op counts from the slim shapes)."""
    from synth_data import make_dataset_root

    from robocupvision_tpu.cli import detect as cli_detect
    from robocupvision_tpu.cli.train import model_hyper
    from robocupvision_tpu.train import checkpoint

    root = str(tmp_path / "data")
    make_dataset_root(root, size=(48, 64))
    monkeypatch.chdir(tmp_path)

    m = zoo.make("robo_unet", **model_hyper(False, False))
    params = _np(m.init(jax.random.PRNGKey(0)))
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.5)
    slim_p, _ = slim.compact(m, masked)
    checkpoint.save("checkpoints/slim.weights.slim", m.registry, slim_p,
                    slim=True)

    rc = cli_detect.main(["--root", root, "--ckpt",
                          "checkpoints/slim.weights.slim"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "wrote" in out and osp.exists("output/0.png")


def test_aot_export_on_slim_params(tmp_path):
    """AOT serving artifacts build from slim dicts (widths flow from the
    packed kernels into the exported StableHLO) and reload without model
    code, matching the live slim packed graph."""
    from robocupvision_tpu.export import aot
    from robocupvision_tpu.models import packed

    m, params = _model_params("robo_unet", ROBO_VARIANTS["flagship"])
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.4)
    slim_p, _ = slim.compact(m, masked)
    jx = _jx(slim_p)

    d = str(tmp_path / "aot_slim")
    aot.export_serving(d, m, jx, hw=(32, 32), dtype=jnp.float32)
    fn = aot.load_serving(d)
    x = _x((1, 32, 32, 3))
    got = np.asarray(fn(x))
    want = np.asarray(packed.build_packed_infer(
        m, jx, dtype=jnp.float32).infer_u8(x))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_int8_agreement_on_trained_net(tmp_path):
    """int8 PTQ agreement measured on a TRAINED net with real-image
    calibration. Measured on this harness (tiny flagship, 30 epochs,
    synthetic set): 0.9746 max-calibrated, 0.9794 at pct=99.9 — the
    percentile-clip knob's intended regime (PERF.md r4 1c). Floor set
    below the measured values to absorb cross-platform conv reassociation,
    well above the random-weight families' 0.88-0.97 envelope."""
    from synth_data import make_dataset_root

    from robocupvision_tpu.data.datasets import SSYUVDataset
    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import packed
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    root = str(tmp_path / "data")
    make_dataset_root(root, size=(48, 64))
    tr = SSYUVDataset(root, (48, 64), train=True)
    va = SSYUVDataset(root, (48, 64), train=False)
    tr_imgs, tr_labs = tr.load_all()

    m = zoo.make("robo_unet", planes=8, levels=2, depth=4, belly_size=5,
                 belly_planes=32)
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1., 10., 30., 10., 2.),
                        out_size=1.0 / (48 * 64), augment=False)
    trn = Trainer(m, optim.adam(), cfg, DeviceCache.from_numpy(tr_imgs, tr_labs),
                  None, 6)
    trn.init()
    for _ in range(30):
        trn.train_epoch(1e-3)
    params = {k: jnp.asarray(v) for k, v in trn.params_numpy().items()}

    va_imgs, _ = va.load_all()
    calib = jnp.asarray(va_imgs[:4])
    f = packed.build_packed_infer(m, params, dtype=jnp.bfloat16, pallas=True,
                                  pallas_interpret=True)
    q = packed.quantize_int8(f, calib, pct=99.9)
    x = jnp.asarray(va_imgs[:2])
    agree = float(jnp.mean(q.infer(x) == f.infer(x)))
    print(f"trained-net int8 label agreement: {agree:.4f}")
    assert agree >= 0.95, agree


def test_pb_fcn_2_nondefault_levels_groups():
    """pb_fcn_2 hardcodes Level0 to ONE conv for any cfg.levels (zoo.py);
    the group builder must honor that (regression: levels=3 crashed)."""
    m, params = _model_params("pb_fcn_2", dict(planes=8, depth=4, levels=3,
                                               belly_size=3, belly_planes=16))
    slim.validate_groups(m, params)
    masked, _ = slim.prune_channels(params, slim.channel_groups(m), ratio=0.3)
    slim_p, _ = slim.compact(m, masked)
    x = _x((1, 32, 32, 3))
    a, _ = m.apply(_jx(masked), x, train=False)
    b, _ = m.apply(_jx(slim_p), x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("family,planes,xshape", [
    ("pb_fcn", 16, (1, 32, 32, 3)),
    ("label_prop", 16, (1, 32, 32, 8)),
])
def test_structured_prune_tool_other_families(family, planes, xshape,
                                              tmp_path, monkeypatch, capsys):
    """tools/structured_prune --family pb_fcn/label_prop: whole-network slim
    + deployment artifacts that self-verify (cfg widths from slim shapes,
    engine shortcut min(C) semantics match the slice-add)."""
    from robocupvision_tpu.export import deploy
    from robocupvision_tpu.tools import structured_prune
    from robocupvision_tpu.train import checkpoint

    monkeypatch.chdir(tmp_path)
    m = zoo.make(family, planes=planes)
    params = _np(m.init(jax.random.PRNGKey(0)))
    checkpoint.save("in.weights", m.registry, params)

    rc = structured_prune.main([
        "--checkpoint", "in.weights", "--ratio", "0.4", "--family", family,
        "--planes", str(planes), "--roundTo", "2", "--minKeep", "2",
        "--out", "out.slim", "--deploy", "dep"])
    assert rc == 0
    assert "slim:" in capsys.readouterr().out

    slim_p = checkpoint.load_any("out.slim", m.registry)
    assert slim.param_count(slim_p) < slim.param_count(params)
    x = np.random.default_rng(0).standard_normal(xshape).astype(np.float32)
    deploy.verify_deployment("dep", m, slim_p, x)
