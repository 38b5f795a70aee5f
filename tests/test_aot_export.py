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
