"""Structured belly pruning: identity at keep=all, valid smaller nets,
export self-consistency, CLI round trip."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import zoo
from robocupvision_tpu.ops.slim import belly_channel_scores, shrink_belly


def _model_and_params(**kw):
    m = zoo.make("robo_unet", **kw)
    params = {k: np.array(v) for k, v in m.init(jax.random.PRNGKey(0)).items()}
    return m, params


def test_keep_all_is_identity():
    m, params = _model_and_params(planes=4, depth=3, levels=1, belly_size=3,
                                  belly_planes=16)
    new, new_cfg, kept = shrink_belly(params, m.cfg, 16)
    assert new_cfg.belly_planes == 16
    np.testing.assert_array_equal(kept, np.tile(np.arange(16), (kept.shape[0], 1)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)), jnp.float32)
    a, _ = m.apply({k: jnp.asarray(v) for k, v in params.items()}, x)
    b, _ = zoo.Model("robo_unet", new_cfg).apply(
        {k: jnp.asarray(v) for k, v in new.items()}, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_shrunk_model_runs_and_exports(tmp_path):
    m, params = _model_and_params(planes=4, depth=3, levels=1, belly_size=3,
                                  belly_planes=16)
    new, new_cfg, kept = shrink_belly(params, m.cfg, 6)
    assert new_cfg.belly_planes == 6 and kept.shape[1] == 6
    nm = zoo.Model("robo_unet", new_cfg)
    assert all(new[k].shape == tuple(s.shape)
               for k, s in nm.registry.specs.items())

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)), jnp.float32)
    out, _ = nm.apply({k: jnp.asarray(v) for k, v in new.items()}, x)
    assert out.shape == (2, 32, 32, 5)
    assert np.isfinite(np.asarray(out)).all()

    from robocupvision_tpu.export import deploy

    d = str(tmp_path / "sb")
    deploy.export_deployment(d, nm, new)
    diff = deploy.verify_deployment(d, nm, new, np.asarray(x[:1]))
    assert diff < 1e-4


def test_scores_identify_zeroed_channels_per_layer():
    m, params = _model_and_params(planes=4, depth=3, levels=1, belly_size=3,
                                  belly_planes=16)
    # each layer has its OWN dead output channels: {3, 9} in Conv0, {1, 12}
    # in Conv1 — per-layer ranking must drop each layer's own set
    params["PB.PB_1.layers.Conv0.conv.weight"][..., [3, 9]] = 0
    params["PB.PB_1.layers.Conv1.conv.weight"][..., [1, 12]] = 0
    scores = belly_channel_scores(params, m.cfg)
    assert scores.shape == (2, 16)
    assert set(np.argsort(scores[0])[:2]) == {3, 9}
    assert set(np.argsort(scores[1])[:2]) == {1, 12}
    new, new_cfg, kept = shrink_belly(params, m.cfg, 14)
    assert 3 not in kept[0] and 9 not in kept[0]
    assert 1 not in kept[1] and 12 not in kept[1]
    # slicing stays consistent: Conv1's inputs follow Conv0's kept set
    assert new["PB.PB_1.layers.Conv1.conv.weight"].shape[2] == 14
    assert new["PB.PB_2.layers.Conv0.conv.weight"].shape[2] == 14


def test_cli_round_trip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    m, params = _model_and_params()  # train.py default architecture
    from robocupvision_tpu.train import checkpoint

    checkpoint.save("checkpoints/best.weights", m.registry, params)

    from robocupvision_tpu.tools import structured_prune

    rc = structured_prune.main(["--checkpoint", "checkpoints/best.weights",
                                "--keep", "64", "--out",
                                "checkpoints/bestSB64.weights",
                                "--deploy", "weightsSB64"])
    assert rc == 0
    assert osp.exists("checkpoints/bestSB64.weights")
    assert osp.exists("weightsSB64/net.cfg")

    # the shrunk checkpoint loads as a standard smaller ROBO_UNet
    import dataclasses

    small = zoo.Model("robo_unet", dataclasses.replace(m.cfg, belly_planes=64))
    back = checkpoint.load_any("checkpoints/bestSB64.weights", small.registry)
    assert back["PB.PB_1.layers.Conv0.conv.weight"].shape[-1] == 64
