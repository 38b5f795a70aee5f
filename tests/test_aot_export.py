"""AOT (jax.export) deployment artifacts: roundtrip + exactness.

The TPU-native deployment story (export/aot.py): the serving graph is
serialized with weights baked in and reloaded WITHOUT model code or
registry — the analog of the reference's net.cfg/weights.dat -> C++ engine
flow (tester.py:121-124), but carrying the compiled graph itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robocupvision_tpu.export import aot
from robocupvision_tpu.models import zoo


@pytest.fixture(scope="module")
def small_unet():
    model = zoo.make("robo_unet", planes=4, levels=2, belly_size=1,
                     belly_planes=8, num_classes=5)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_aot_roundtrip_packed_serving(tmp_path, small_unet):
    """Exported packed serving graph reloads from bytes alone and matches
    the live graph's uint8 labels exactly."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                             dtype=jnp.float32)
    fn = aot.load_serving(out)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)),
                   np.float32)

    from robocupvision_tpu.models import packed as pk

    live = pk.build_packed_infer(model, params, dtype=jnp.float32).infer_u8
    np.testing.assert_array_equal(np.asarray(fn(x)),
                                  np.asarray(jax.jit(live)(x)))


def test_aot_roundtrip_standard_graph(tmp_path, small_unet):
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                             dtype=jnp.float32, packed=False)
    fn = aot.load_serving(out)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)),
                   np.float32)
    pdev = {k: jnp.asarray(v) for k, v in params.items()}
    logits, _ = model.apply(pdev, jnp.asarray(x), train=False)
    want = np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.uint8))
    np.testing.assert_array_equal(np.asarray(fn(x)), want)


def test_aot_artifact_is_self_contained(tmp_path, small_unet):
    """The blob deserializes via jax.export alone — no package imports —
    proving a serving process needs neither the model zoo nor the registry."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(16, 16),
                             dtype=jnp.float32)
    with open(out, "rb") as f:
        blob = f.read()
    exp = jax.export.deserialize(blob)
    y = exp.call(np.zeros((1, 16, 16, 3), np.float32))
    assert np.asarray(y).shape == (1, 16, 16)
    assert np.asarray(y).dtype == np.uint8


def test_aot_raw_u8_roundtrip(tmp_path, small_unet):
    """raw_u8 export: the artifact takes raw uint8 RGB frames (preprocessing
    baked in) and matches the live infer_u8_io graph exactly."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                             dtype=jnp.float32, raw_u8=True,
                             fname="serving_raw.stablehlo")
    fn = aot.load_serving(out)
    frame = np.random.default_rng(3).integers(
        0, 256, (1, 32, 32, 3), dtype=np.uint8)

    from robocupvision_tpu.models import packed as pk

    live = pk.build_packed_infer(model, params, dtype=jnp.float32).infer_u8_io
    np.testing.assert_array_equal(np.asarray(fn(frame)),
                                  np.asarray(jax.jit(live)(frame)))


def test_aot_cross_platform_export_from_cpu(tmp_path, small_unet):
    """Dual-platform export: a CPU-only build host can emit an artifact
    that targets BOTH cpu and tpu (jax.export cross-lowers without the
    device); it still runs here on cpu. This is the deployment story for
    building robot/server artifacts off-device."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(16, 16),
                             dtype=jnp.float32, platforms=("cpu", "tpu"))
    fn = aot.load_serving(out)
    y = np.asarray(fn(np.zeros((1, 16, 16, 3), np.float32)))
    assert y.shape == (1, 16, 16) and y.dtype == np.uint8

def test_aot_pallas_roundtrip_cpu_target(tmp_path, small_unet):
    """pallas export for a CPU target bakes the interpreter form of the
    fused chains; the artifact roundtrips and matches the live chain graph
    exactly (f32)."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                             dtype=jnp.float32, pallas=True,
                             fname="serving_pallas.stablehlo")
    fn = aot.load_serving(out)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3)),
                   np.float32)

    from robocupvision_tpu.models import packed as pk

    live = pk.build_packed_infer(model, params, dtype=jnp.float32,
                                 pallas=True,
                                 pallas_interpret=True).infer_u8
    np.testing.assert_array_equal(np.asarray(fn(x)),
                                  np.asarray(jax.jit(live)(x)))


def test_aot_pallas_tpu_target_cross_lowered(tmp_path, small_unet):
    """A TPU-target pallas export from this CPU host cross-lowers the REAL
    Mosaic kernels into the artifact (jax.export serializes the
    tpu_custom_call); it deserializes anywhere but refuses to execute on a
    non-TPU backend — the platform binding the artifact format promises."""
    model, params = small_unet
    out = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                             dtype=jnp.float32, pallas=True,
                             platforms=("tpu",),
                             fname="serving_mosaic.stablehlo")
    with open(out, "rb") as f:
        blob = f.read()
    assert len(blob) > 1000
    exp = jax.export.deserialize(blob)
    assert tuple(exp.platforms) == ("tpu",)
    with pytest.raises(Exception):
        exp.call(np.zeros((1, 32, 32, 3), np.float32))


def test_aot_int8_roundtrip_and_size(tmp_path, small_unet):
    """int8 export: the artifact carries int8 weights (materially smaller
    than the float artifact), roundtrips, and matches the live quantized
    graph exactly."""
    model, params = small_unet
    calib = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                         (1, 32, 32, 3)), np.float32)
    out_f = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                               dtype=jnp.float32, pallas=True,
                               fname="serving_f32.stablehlo")
    out_q = aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                               dtype=jnp.float32, pallas=True, int8=True,
                               calib_x=calib,
                               fname="serving_int8.stablehlo")
    import os.path as osp
    assert osp.getsize(out_q) < osp.getsize(out_f)
    fn = aot.load_serving(out_q)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3)),
                   np.float32)

    from robocupvision_tpu.models import packed as pk

    live = pk.quantize_int8(
        pk.build_packed_infer(model, params, dtype=jnp.float32, pallas=True,
                              pallas_interpret=True),
        jnp.asarray(calib)).infer_u8
    np.testing.assert_array_equal(np.asarray(fn(x)),
                                  np.asarray(jax.jit(live)(x)))


def test_aot_int8_export_guards(tmp_path, small_unet):
    model, params = small_unet
    with pytest.raises(ValueError):   # int8 needs the chain kernels
        aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                           int8=True, calib_x=np.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError):   # zeros-free calibration is required
        aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                           pallas=True, int8=True)
    with pytest.raises(ValueError):   # chains live in the packed graph
        aot.export_serving(str(tmp_path), model, params, hw=(32, 32),
                           packed=False, pallas=True)
