"""Per-pixel parity of the Pallas fused-region packed graph
(build_packed_infer(pallas=True), ops/pallas_packed.py) against the XLA
packed path — which is itself pinned per-pixel against the canonical zoo
apply by tests/test_packed_infer.py. Interpret mode on CPU; the same code
compiles to real Mosaic kernels on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import packed, zoo


def _build(no_scale, seed=0, **kw):
    model = zoo.make("robo_unet", no_scale=no_scale, **kw)
    params = model.init(jax.random.PRNGKey(seed))
    return model, params


def _assert_labels_match(fused, base, x, max_mismatch=2e-5):
    """Label maps must agree except at argmax TIES: float reassociation can
    flip pixels whose top-2 logits differ by ~1 ulp (observed: 1/307200)."""
    lf = np.asarray(fused.infer(x))
    lb = np.asarray(base.infer(x))
    mism = lf != lb
    frac = float(np.mean(mism))
    assert frac <= max_mismatch, frac
    if frac:
        logits = np.asarray(base.logits(x)).astype(np.float32)
        gaps = np.abs(np.take_along_axis(logits, lf[..., None], -1)
                      - np.take_along_axis(logits, lb[..., None], -1))[mism[..., None]]
        assert np.max(gaps) < 1e-4, np.max(gaps)


@pytest.mark.parametrize("no_scale,hw", [
    (False, (120, 160)),   # QVGA flagship (packed grid 30x40, one band)
    (True, (480, 640)),    # VGA flagship (packed grid 120x160, banded)
])
def test_pallas_chain_matches_xla_packed_f32(no_scale, hw):
    model, params = _build(no_scale)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, *hw, 3), jnp.float32)

    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True)
    ref = np.asarray(base.logits(x))
    got = np.asarray(fused.logits(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    _assert_labels_match(fused, base, x)


def test_pallas_chain_matches_zoo_apply_f32():
    """End-to-end: fused graph vs the canonical apply (the ground truth the
    packed graph itself is pinned to)."""
    model, params = _build(False)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 120, 160, 3), jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True)
    ref_logits, _ = model.apply(params, x)
    got = np.asarray(fused.logits(x))
    np.testing.assert_allclose(got, np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)


def test_pallas_chain_batched():
    """The fused kernels grid over batch as well (serving throughput mode)."""
    model, params = _build(False)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 120, 160, 3), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True)
    _assert_labels_match(fused, base, x)


def test_pallas_chain_bf16_label_agreement():
    """bf16 (the serving dtype): logits within bf16 tolerance and label maps
    in near-total agreement (ties under 1-ulp logit differences allowed)."""
    model, params = _build(False)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 120, 160, 3), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.bfloat16)
    fused = packed.build_packed_infer(model, params, dtype=jnp.bfloat16,
                                      pallas=True, pallas_interpret=True)
    lb = np.asarray(base.logits(x)).astype(np.float32)
    lf = np.asarray(fused.logits(x)).astype(np.float32)
    np.testing.assert_allclose(lf, lb, rtol=0.05, atol=0.05)
    agree = np.mean(np.asarray(fused.infer(x)) == np.asarray(base.infer(x)))
    assert agree > 0.999, agree


def test_pallas_chain_pb_fcn_2_matches_xla_packed():
    """PB_FCN_2 seg rides the flagship plan (build_packed_infer cfg mapping)
    — the fused chains must hold for it too."""
    model = zoo.make("pb_fcn_2", classify=False)
    params = _randomized_params(model, 41)
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True, pallas_deep=True)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("family", ["v2", "label_prop", "pb_fcn", "unet"])
def test_pallas_chain_bf16_label_agreement_families(family):
    """bf16 (the serving dtype) agreement for the non-flagship families:
    the chain rounds inter-stage activations to bf16 in VMEM scratch just
    as XLA rounds its inter-fusion tensors."""
    rng = np.random.default_rng(51)
    if family == "v2":
        model = zoo.make("robo_unet", v2=True, levels=1, belly_size=9,
                         belly_planes=64, class_size=3)
        params = _randomized_params(model, 52)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        base = packed.build_packed_infer(model, params, dtype=jnp.bfloat16)
        fused = packed.build_packed_infer(
            model, params, dtype=jnp.bfloat16, pallas=True,
            pallas_interpret=True, pallas_fold_stem=True, pallas_deep=True)
    elif family == "unet":
        model = zoo.make("robo_unet", pool=True, levels=3, belly_size=0)
        params = _randomized_params(model, 55)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        base = packed.build_packed_infer(model, params, dtype=jnp.bfloat16)
        fused = packed.build_packed_infer(
            model, params, dtype=jnp.bfloat16, pallas=True,
            pallas_interpret=True, pallas_fold_stem=True)
    elif family == "label_prop":
        model = zoo.make("label_prop")
        params = _randomized_params(model, 53)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)), jnp.float32)
        base = packed.build_packed_label_prop(model, params, jnp.bfloat16)
        fused = packed.build_packed_label_prop(
            model, params, jnp.bfloat16, pallas=True, pallas_interpret=True,
            pallas_fold_stem=True, pallas_mid=True)
    else:
        model = zoo.make("pb_fcn")
        params = _randomized_params(model, 54)
        x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)
        base = packed.build_packed_pb_fcn(model, params, jnp.bfloat16)
        fused = packed.build_packed_pb_fcn(
            model, params, jnp.bfloat16, pallas=True, pallas_interpret=True,
            pallas_deep=True)
    agree = np.mean(np.asarray(fused.infer(x)) == np.asarray(base.infer(x)))
    # unet: the 2x2 maxpool's SELECTION flips on sub-ulp pre-pool ties
    # (checked: every disagreeing pixel's top-2 logit gap is below one bf16
    # ulp), so random-weight label agreement runs ~0.992 where the pure-conv
    # families hold ~0.999 — both are reassociation noise, not error
    assert agree > (0.99 if family == "unet" else 0.995), agree


@pytest.mark.parametrize("family", ["flagship", "flagship_stem_deep",
                                    "flagship_bf16", "v2",
                                    "label_prop", "pb_fcn", "unet"])
def test_pallas_fused_argmax_head(family):
    """infer()/infer_u8_packed() on a chain graph fuse the serving argmax
    into the head stage's kernel (ChainStage.argmax_groups): the emitted
    labels must equal argmax over the SAME chain's logits exactly — the
    kernel rounds its accumulator to the chain dtype first, so even tie
    pixels must agree (first-max-wins matches jnp.argmax semantics)."""
    rng = np.random.default_rng(61)
    if family.startswith("flagship"):
        model, params = _build(False, seed=62)
        x = jnp.asarray(rng.standard_normal((2, 120, 160, 3)), jnp.float32)
        kw = dict(pallas_fold_stem=True, pallas_deep=True) \
            if family.endswith("deep") else {}
        dt = jnp.bfloat16 if family.endswith("bf16") else jnp.float32
        fused = packed.build_packed_infer(model, params, dtype=dt,
                                          pallas=True, pallas_interpret=True,
                                          **kw)
    elif family == "v2":
        model = zoo.make("robo_unet", v2=True, levels=1, belly_size=9,
                         belly_planes=64, class_size=3)
        params = _randomized_params(model, 63)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                          pallas=True, pallas_interpret=True)
    elif family == "unet":
        model = zoo.make("robo_unet", pool=True, levels=3, belly_size=0)
        params = _randomized_params(model, 66)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                          pallas=True, pallas_interpret=True,
                                          pallas_fold_stem=True)
    elif family == "label_prop":
        model = zoo.make("label_prop")
        params = _randomized_params(model, 64)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)), jnp.float32)
        fused = packed.build_packed_label_prop(
            model, params, jnp.float32, pallas=True, pallas_interpret=True)
    else:
        model = zoo.make("pb_fcn")
        params = _randomized_params(model, 65)
        x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)
        fused = packed.build_packed_pb_fcn(
            model, params, jnp.float32, pallas=True, pallas_interpret=True)

    want = np.argmax(np.asarray(fused.logits(x)), axis=-1)
    np.testing.assert_array_equal(np.asarray(fused.infer(x)), want)

    device_fn, host_unpack = fused.infer_u8_packed()
    got = host_unpack(device_fn(x))
    np.testing.assert_array_equal(got, want.astype(np.uint8))

    if family == "flagship":
        # ablation/fallback knob: logits head + XLA argmax, same labels
        noam = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                         pallas=True, pallas_interpret=True,
                                         pallas_argmax_head=False)
        np.testing.assert_array_equal(np.asarray(noam.infer(x)), want)


def test_pallas_serving_data_parallel_shard_map():
    """Data-parallel pallas serving: shard_map partitions the batch across
    the 8-device mesh and each replica runs the fused chains on its local
    shard (GSPMD can't see inside a pallas_call, so shard_map is the
    production form for pallas serving replicas). Labels match the
    single-device fused graph exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robocupvision_tpu.parallel import mesh as pmesh

    model, params = _build(False, seed=19)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(20), (8, 64, 64, 3), jnp.float32)

    mesh = pmesh.make_mesh(8, spatial=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    # check_vma=False: pallas_call out_shapes carry no vma annotation
    sharded_infer = jax.jit(jax.shard_map(fused.infer, mesh=mesh,
                                          in_specs=P("data"),
                                          out_specs=P("data"),
                                          check_vma=False))
    labels = sharded_infer(xs)
    assert len(labels.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(fused.infer(x)))

    # int8 PTQ composes with the mesh path: per-stage scales are static
    # (trace constants), int8 weights/w_scale rows are replicated operands —
    # the quantized replica matches the single-device quantized graph
    # exactly
    qi = packed.quantize_int8(fused, x)
    sharded_q = jax.jit(jax.shard_map(qi.infer, mesh=mesh,
                                      in_specs=P("data"),
                                      out_specs=P("data"),
                                      check_vma=False))
    np.testing.assert_array_equal(np.asarray(sharded_q(xs)),
                                  np.asarray(qi.infer(x)))


def test_pallas_gate_rejects_unsupported_combos():
    # fold_stem needs the fully-chained down region (pool, or strided with
    # levels<=2); deep needs a strided plan with a PB belly
    model, params = _build(False, pool=True, levels=3, belly_size=0)
    with pytest.raises(AssertionError):
        packed.build_packed_infer(model, params, pallas=True,
                                  pallas_deep=True)   # pool has no belly run
    model, params = _build(False, levels=3, belly_size=0)
    with pytest.raises(AssertionError):
        packed.build_packed_infer(model, params, pallas=True,
                                  pallas_fold_stem=True)
    with pytest.raises(AssertionError):
        packed.build_packed_infer(model, params, pallas=True,
                                  pallas_deep=True)


@pytest.mark.parametrize("fold_stem,hw", [
    (False, (120, 160)),   # QVGA: packed grid 30x40, single band
    (True, (120, 160)),
    (True, (480, 640)),    # VGA: banded grid — pool stages cross halo bands
])
def test_pallas_chain_pool_matches_xla_packed_f32(fold_stem, hw):
    """--UNet (hyper-table: pool=True, levels=3, belly_size=0): the maxpool
    downs are pure lane ops on the packed grid, in-chain as 4 lane-selection
    dots + elementwise max (_pool_chain_stage) — the full down region fuses,
    including Level0's extra conv (levels=3 puts stem + Conv1 in Level0)."""
    model, params = _build(hw == (480, 640), seed=21, pool=True, levels=3,
                           belly_size=0)
    x = jax.random.normal(jax.random.PRNGKey(22), (1, *hw, 3),
                          jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=fold_stem)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("kw", [
    dict(levels=3, belly_size=0),               # off-table corner
])
def test_pallas_up_chain_only_matches_xla_packed(kw):
    """Plans whose downs the chain kernel doesn't cover (deep per-level
    strided runs) still fuse the up region + head."""
    model, params = _build(False, seed=17, **kw)
    x = jax.random.normal(jax.random.PRNGKey(18), (1, 120, 160, 3),
                          jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("no_scale,hw", [
    (False, (120, 160)),
    (True, (480, 640)),
])
def test_pallas_chain_v2_matches_xla_packed_f32(no_scale, hw):
    """--v2 (concat skips, hyper-table config: levels=1, 3x3 class head):
    the chain's split2 stages consume the f>1 concats unmaterialized via
    3x3 skip_w kernels."""
    model, params = _build(no_scale, seed=14, v2=True, levels=1, belly_size=9,
                           belly_planes=64, class_size=3)
    x = jax.random.normal(jax.random.PRNGKey(15), (1, *hw, 3), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True, pallas_deep=True)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("no_scale,hw", [
    (False, (120, 160)),
    (True, (480, 640)),
])
def test_pallas_chain_deep_matches_xla_packed_f32(no_scale, hw):
    """pallas_deep variant: Level(D-1).Conv1 + the whole PB belly fused as a
    third single-band chain on the deepest grid."""
    model, params = _build(no_scale, seed=11)
    x = jax.random.normal(jax.random.PRNGKey(12), (1, *hw, 3), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True, pallas_deep=True)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


def test_int8_chain_kernel_matches_quant_mirror():
    """The int8 kernel's quant math (s8 taps -> s32 accumulate -> f32
    dequant/epilogue, int8 inter-stage requant) must match the plain-XLA
    quant mirror exactly — chain_reference uses integer convs, so both
    sides' accumulations are exact and only the f32 epilogue can differ."""
    from robocupvision_tpu.ops.pallas_packed import (
        ChainStage, chain_reference, fused_conv_chain, quantize_chain_stages)

    rng = np.random.default_rng(71)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16)) * 0.7, jnp.float32)
    sk = jnp.asarray(rng.standard_normal((2, 16, 16, 16)) * 0.5, jnp.float32)
    stages = [
        ChainStage(w=jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.3,
                                 jnp.float32),
                   b=rng.standard_normal(16).astype(np.float32) * 0.1,
                   scale=0.5 + rng.random(16).astype(np.float32),
                   shift=rng.standard_normal(16).astype(np.float32) * 0.1,
                   rbb=True, emit=True),
        ChainStage(w=jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.3,
                                 jnp.float32),
                   b=rng.standard_normal(16).astype(np.float32) * 0.1,
                   relu_only=True, dil=2, skip_idx=0),
        ChainStage(w=jnp.asarray(rng.standard_normal((1, 1, 16, 16)) * 0.3,
                                 jnp.float32),
                   b=rng.standard_normal(16).astype(np.float32) * 0.1),
    ]
    col = []
    ref_f32 = chain_reference(x, stages, skips=[sk], collect=col)
    qst = quantize_chain_stages(stages, col)
    ref = chain_reference(x, qst, skips=[sk])
    got = fused_conv_chain(x, qst, skips=[sk], band=8, interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
    # and the quantization is a small perturbation of the float chain
    for r, f in zip(ref, ref_f32):
        denom = float(jnp.max(jnp.abs(f)))
        err = float(jnp.max(jnp.abs(r - f))) / denom
        assert err < 0.1, err


@pytest.mark.parametrize("family", ["flagship", "unet", "v2",
                                    "label_prop", "pb_fcn"])
def test_quantize_int8_families(family):
    """Static int8 PTQ (models/packed.quantize_int8): high label agreement
    vs the float chain graph on random weights, and the quantized graph's
    fused argmax head stays EXACT vs its own logits (the quant error is in
    the logits, never in the serving argmax)."""
    rng = np.random.default_rng(81)
    if family == "flagship":
        model, params = _build(False, seed=82)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        f = packed.build_packed_infer(model, params, dtype=jnp.bfloat16,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True,
                                      pallas_deep=True)
    elif family == "unet":
        model = zoo.make("robo_unet", pool=True, levels=3, belly_size=0)
        params = _randomized_params(model, 83)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        f = packed.build_packed_infer(model, params, dtype=jnp.bfloat16,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True)
    elif family == "v2":
        model = zoo.make("robo_unet", v2=True, levels=1, belly_size=9,
                         belly_planes=64, class_size=3)
        params = _randomized_params(model, 84)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
        f = packed.build_packed_infer(model, params, dtype=jnp.bfloat16,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True,
                                      pallas_deep=True)
    elif family == "label_prop":
        model = zoo.make("label_prop")
        params = _randomized_params(model, 85)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)), jnp.float32)
        f = packed.build_packed_label_prop(
            model, params, jnp.bfloat16, pallas=True, pallas_interpret=True,
            pallas_fold_stem=True, pallas_mid=True)
    else:
        model = zoo.make("pb_fcn")
        params = _randomized_params(model, 86)
        x = jnp.asarray(rng.standard_normal((1, 32, 64, 3)), jnp.float32)
        f = packed.build_packed_pb_fcn(
            model, params, jnp.bfloat16, pallas=True, pallas_interpret=True,
            pallas_deep=True)
    qi = packed.quantize_int8(f, x)
    agree = np.mean(np.asarray(qi.infer(x)) == np.asarray(f.infer(x)))
    # pb_fcn's five-deep dilated chain accumulates the most quant error on
    # random weights (observed 0.93); the others hold ~0.99
    assert agree > (0.88 if family == "pb_fcn" else 0.97), agree
    if family == "pb_fcn":
        # percentile-clipped calibration (outliers saturate instead of
        # stretching the scale) — on random weights it lands in the same
        # agreement band; the knob exists for trained outlier-heavy nets
        qp = packed.quantize_int8(f, x, pct=99.9)
        agree_p = np.mean(np.asarray(qp.infer(x)) == np.asarray(f.infer(x)))
        assert agree_p > 0.88, agree_p
    want = np.argmax(np.asarray(qi.logits(x)), axis=-1)
    np.testing.assert_array_equal(np.asarray(qi.infer(x)), want)
    # u8 packed serving form on the quantized graph
    device_fn, host_unpack = qi.infer_u8_packed()
    np.testing.assert_array_equal(host_unpack(device_fn(x)),
                                  want.astype(np.uint8))
    # double-quantization is refused
    with pytest.raises(AssertionError):
        packed.quantize_int8(qi, x)


@pytest.mark.parametrize("seed", range(6))
def test_fused_conv_chain_fuzz_vs_xla(seed):
    """Unit-level fuzz: random chains (K in {1,3}, dil in {1,2}, rbb/
    conv-bn-relu/relu-only epilogues, identity and conv'd skips, emits,
    multi-band grids with dilated stages) vs a composed XLA reference."""
    from robocupvision_tpu.ops import nn
    from robocupvision_tpu.ops.pallas_packed import (ChainStage,
                                                     fused_conv_chain)

    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 3))
    H = int(rng.choice([8, 12, 16, 24]))
    W = int(rng.choice([8, 16]))
    band = int(rng.choice([b for b in (4, 8, H) if H % b == 0]))
    cs = [int(rng.choice([8, 16])) for _ in range(6)]
    x = jnp.asarray(rng.standard_normal((n, H, W, cs[0])) * 0.5, jnp.float32)
    n_stages = int(rng.integers(2, 5))

    skips, stages, want_feats = [], [], []
    for k in range(n_stages):
        cin, cout = cs[k], cs[k + 1]
        K = int(rng.choice([1, 3])) if k else 3
        dil = int(rng.choice([1, 2])) if K == 3 else 1
        kw = dict(
            w=jnp.asarray(rng.standard_normal((K, K, cin, cout)) * 0.3,
                          jnp.float32),
            b=rng.standard_normal(cout).astype(np.float32) * 0.1,
            dil=dil, emit=bool(rng.integers(0, 2)),
        )
        mode = rng.choice(["affine_rbb", "affine", "relu", "none"])
        if mode.startswith("affine"):
            kw["scale"] = 0.5 + rng.random(cout).astype(np.float32)
            kw["shift"] = rng.standard_normal(cout).astype(np.float32) * 0.1
            kw["rbb"] = mode == "affine_rbb"
        elif mode == "relu":
            kw["relu_only"] = True
        skip_mode = rng.choice(["none", "id", "conv1", "conv3"])
        if skip_mode != "none":
            kw["skip_idx"] = len(skips)
            skips.append(jnp.asarray(
                rng.standard_normal((n, H, W, cout if skip_mode == "id"
                                     else cs[k + 2])) * 0.5, jnp.float32))
            if skip_mode != "id":
                ks = 1 if skip_mode == "conv1" else 3
                kw["skip_w"] = jnp.asarray(
                    rng.standard_normal((ks, ks, skips[-1].shape[-1], cout))
                    * 0.3, jnp.float32)
        stages.append(ChainStage(**kw))

    # XLA reference
    h = x
    for st in stages:
        y = nn.conv2d(h, st.w, padding=st.dil * (st.k // 2), dilation=st.dil)
        if st.skip_w is not None:
            y = y + nn.conv2d(skips[st.skip_idx], st.skip_w,
                              padding=int(st.skip_w.shape[0]) // 2)
        y = y + jnp.asarray(st.b)
        if st.scale is not None:
            s, sh = jnp.asarray(st.scale), jnp.asarray(st.shift)
            y = nn.relu(y) * s + sh if st.rbb else nn.relu(y * s + sh)
        elif st.relu_only:
            y = nn.relu(y)
        if st.skip_idx >= 0 and st.skip_w is None:
            y = y + skips[st.skip_idx]
        if st.emit:
            want_feats.append(y)
        h = y
    if not stages[-1].emit:
        want_feats.append(h)

    got = fused_conv_chain(x, stages, skips=skips, band=band, interpret=True)
    assert len(got) == len(want_feats)
    for g, w in zip(got, want_feats):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_fused_conv_chain_banded_dilated():
    """Deterministic multi-band + dil=2 geometry (the VGA LabelProp mid
    chain shape: halo strips recomputed across band boundaries with
    2-row reach)."""
    from robocupvision_tpu.ops import nn
    from robocupvision_tpu.ops.pallas_packed import (ChainStage,
                                                     fused_conv_chain)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 60, 80, 16)) * 0.5, jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.3, jnp.float32)
          for _ in range(3)]
    stages = [ChainStage(w=w, b=np.zeros(16, np.float32), dil=2,
                         relu_only=True) for w in ws]
    want = x
    for w in ws:
        want = nn.relu(nn.conv2d(want, w, padding=2, dilation=2))
    got = fused_conv_chain(x, stages, band=20, interpret=True)[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _randomized_params(model, seed):
    """init() params with perturbed BN running stats so the BN fold is
    actually exercised (init gives rm=0, rv=1)."""
    rng = np.random.default_rng(seed)
    params = {k: np.array(v) for k, v in
              model.init(jax.random.PRNGKey(seed)).items()}
    for k in params:
        if k.endswith(".running_mean"):
            params[k] = rng.standard_normal(
                params[k].shape).astype(np.float32) * 0.3
        elif k.endswith(".running_var"):
            params[k] = (0.5 + rng.random(params[k].shape)).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in params.items()}


@pytest.mark.parametrize("fold_stem,mid", [(False, False), (True, False),
                                           (True, True)])
def test_pallas_chain_label_prop_matches_xla_packed(fold_stem, mid):
    """LabelProp fused chains (incl. the relu-free 1x1-conv'd channel-slice
    skip head, skip_w, and the dilated mid-belly chain) match the XLA packed
    path per-pixel."""
    model = zoo.make("label_prop")
    params = _randomized_params(model, 21)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 8)), jnp.float32)
    base = packed.build_packed_label_prop(model, params, dtype=jnp.float32)
    fused = packed.build_packed_label_prop(model, params, dtype=jnp.float32,
                                           pallas=True, pallas_interpret=True,
                                           pallas_fold_stem=fold_stem,
                                           pallas_mid=mid)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("no_scale,deep", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_pallas_chain_pb_fcn_matches_xla_packed(no_scale, deep):
    """PB_FCN fused chains (incl. the dilated packed stem, the affine-free
    relu_only pconv_nr stage, and the dilated deep chain with the absorbed
    ConvPool conv1) match the XLA packed path per-pixel."""
    model = zoo.make("pb_fcn", no_scale=no_scale)
    params = _randomized_params(model, 31 + no_scale)
    rng = np.random.default_rng(32)
    hw = (64, 64) if no_scale else (32, 64)
    x = jnp.asarray(rng.standard_normal((2, *hw, 3)), jnp.float32)
    base = packed.build_packed_pb_fcn(model, params, dtype=jnp.float32)
    fused = packed.build_packed_pb_fcn(model, params, dtype=jnp.float32,
                                       pallas=True, pallas_interpret=True,
                                       pallas_deep=deep)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


@pytest.mark.parametrize("no_scale,hw", [
    (False, (120, 160)),
    (True, (480, 640)),
])
def test_pallas_chain_fold_stem_matches_xla_packed_f32(no_scale, hw):
    """fold_stem variant: the chain starts at the RAW image with the grouped
    space-to-depth stem kernel as stage 0 (no XLA stem conv at all)."""
    model, params = _build(no_scale)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, *hw, 3), jnp.float32)
    base = packed.build_packed_infer(model, params, dtype=jnp.float32)
    fused = packed.build_packed_infer(model, params, dtype=jnp.float32,
                                      pallas=True, pallas_interpret=True,
                                      pallas_fold_stem=True)
    np.testing.assert_allclose(np.asarray(fused.logits(x)),
                               np.asarray(base.logits(x)),
                               rtol=2e-4, atol=2e-4)
    _assert_labels_match(fused, base, x)


# --- scratch-aware band chooser (r5): the real Mosaic compiler hard-crashes
# (tpu_compile_helper exit 1) past ~4 MB of chain VMEM scratch; the chooser
# budgets a strip-geometry scratch model against 3.7 MB and degrades, and
# explicit over-budget bands raise instead of crashing the compiler.


def _deep_chain(c=64, n_stages=3, W=256, seed=9):
    from robocupvision_tpu.ops.pallas_packed import ChainStage
    rng = np.random.default_rng(seed)
    stages = [ChainStage(
        w=jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32),
        b=rng.standard_normal(c).astype(np.float32) * 0.1,
        scale=(0.5 + rng.random(c)).astype(np.float32),
        shift=rng.standard_normal(c).astype(np.float32) * 0.1,
    ) for _ in range(n_stages)]
    x = jnp.asarray(rng.standard_normal((1, 32, W, c)) * 0.5, jnp.float32)
    return x, stages


def test_fused_conv_chain_over_budget_band_raises():
    """An explicit band whose scratch exceeds the Mosaic budget must raise a
    clear ValueError at build time (real-kernel mode only) — the r4 failure
    mode was an HTTP-500 compiler crash."""
    from robocupvision_tpu.ops.pallas_packed import fused_conv_chain
    x, stages = _deep_chain()
    with pytest.raises(ValueError, match="VMEM"):
        fused_conv_chain(x, stages, band=32, interpret=False)
    # interpret mode has no Mosaic ceiling: the same band must run and match
    from robocupvision_tpu.ops import nn
    h = x
    for st in stages:
        y = nn.conv2d(h, st.w, padding=1) + jnp.asarray(st.b)
        h = nn.relu(y) * jnp.asarray(st.scale) + jnp.asarray(st.shift)
    got = fused_conv_chain(x, stages, band=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got[-1]), np.asarray(h),
                               rtol=2e-4, atol=2e-4)


def test_auto_band_degrades_under_scratch_budget():
    """band=None must reject candidates whose scratch model exceeds the
    budget and still compute exactly at the degraded band."""
    from robocupvision_tpu.ops import nn
    from robocupvision_tpu.ops.pallas_packed import (
        _MOSAIC_SCRATCH_BUDGET, _halo_depths, _scratch_bytes,
        fused_conv_chain)
    x, stages = _deep_chain()
    depths = _halo_depths(stages)
    W = x.shape[2]
    # the preferred candidate (band == H == 32, single band) is over budget;
    # a smaller divisor fits — the chooser must degrade, not crash
    assert _scratch_bytes(stages, depths, 32, W, x.dtype) \
        > _MOSAIC_SCRATCH_BUDGET
    assert _scratch_bytes(stages, depths, 16, W, x.dtype) \
        <= _MOSAIC_SCRATCH_BUDGET
    h = x
    for st in stages:
        y = nn.conv2d(h, st.w, padding=1) + jnp.asarray(st.b)
        h = nn.relu(y) * jnp.asarray(st.scale) + jnp.asarray(st.shift)
    got = fused_conv_chain(x, stages, band=None, interpret=True)
    np.testing.assert_allclose(np.asarray(got[-1]), np.asarray(h),
                               rtol=2e-4, atol=2e-4)


def test_int8_scratch_model_prices_compute_width():
    """int8 stages must NOT discount scratch to 1 byte: the Mosaic crash
    tracks conv-window geometry at compute width (measured r5 — the int8
    pool chain crashes at the same band as bf16 despite half the declared
    bytes), so the quantized chain must budget like its float counterpart."""
    from robocupvision_tpu.ops.pallas_packed import (
        _halo_depths, _scratch_bytes, quantize_chain_stages)
    x, stages = _deep_chain()
    depths = _halo_depths(stages)
    qst = quantize_chain_stages(stages, [4.0] * len(stages))
    base = _scratch_bytes(stages, depths, 16, x.shape[2], x.dtype)
    quant = _scratch_bytes(qst, depths, 16, x.shape[2], x.dtype)
    assert quant == base
