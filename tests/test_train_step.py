"""Train/eval step + multi-chip sharding tests (virtual 8-device CPU mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import zoo
from robocupvision_tpu.parallel import mesh as pmesh
from robocupvision_tpu.train import optim, step as tstep

TINY = dict(planes=4, depth=3, levels=1, belly_size=2, belly_planes=16)


def _setup(l1=0.0, **cfg_kw):
    model = zoo.make("robo_unet", **TINY)
    tx = optim.adam()
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=l1, out_size=1.0 / (32 * 32), **cfg_kw)
    return model, tx, cfg


def _batch(b=4, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 5, (b, h, w)), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    return imgs, targets, mask


def test_train_step_reduces_loss():
    model, tx, cfg = _setup(l1=1e-6)
    step = tstep.make_train_step(model, tx, cfg, donate=False)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    imgs, targets, mask = _batch()
    lr = jnp.float32(1e-2)
    losses = []
    for i in range(8):
        state, out = step(state, imgs, targets, mask,
                          jax.random.PRNGKey(100), lr, None)  # fixed aug rng
        losses.append(float(out["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_gradient_masking_freezes_pruned_weights():
    model, tx, cfg = _setup(augment=False)
    step = tstep.make_train_step(model, tx, cfg, donate=False)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    imgs, targets, mask = _batch()

    name = next(n for n in model.param_order if n.endswith("conv.weight"))
    w0 = np.asarray(state.params[name])
    pm = {n: jnp.zeros_like(state.params[n])
          for n in model.param_order
          if n.endswith(".weight") and state.params[n].ndim > 1}
    pm[name] = jnp.ones_like(state.params[name])  # fully mask this tensor

    state, _ = step(state, imgs, targets, mask, jax.random.PRNGKey(1),
                    jnp.float32(1e-2), pm)
    np.testing.assert_array_equal(np.asarray(state.params[name]), w0)
    other = next(n for n in pm if n != name)
    assert not np.array_equal(np.asarray(state.params[other]),
                              np.zeros(1))  # sanity: others moved


def test_transfer_multipliers():
    model, _, _ = _setup()
    mult = optim.transfer_multipliers(model.param_order, transfer=2)
    assert mult["downPart.Level0.layers.Conv0.conv.weight"] == 10.0
    assert mult["downPart.Level1.layers.Conv0.conv.weight"] == 10.0
    assert mult["downPart.Level2.layers.Conv0.conv.weight"] == 1.0
    assert all(v == 1.0 for k, v in mult.items() if not k.startswith("downPart"))


def test_sgd_matches_torch_semantics():
    """One SGD+momentum+wd step equals torch.optim.SGD on the same tensors."""
    import torch

    w = np.random.default_rng(0).standard_normal((4, 4)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((4, 4)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.5, weight_decay=1e-3)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = optim.sgd(momentum=0.5, weight_decay=1e-3)
    params = {"w": jnp.asarray(w)}
    ostate = tx.init(params)
    for _ in range(3):
        direction, ostate = tx.update({"w": jnp.asarray(g)}, ostate, params)
        params = optim.apply_updates(params, direction, jnp.float32(0.1))
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_eval_step_metrics():
    model, tx, cfg = _setup(augment=False)
    estep = tstep.make_eval_step(model, cfg)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    imgs, targets, mask = _batch()
    out = estep(state.params, imgs, targets, mask)
    assert np.isfinite(float(out["loss"]))
    from robocupvision_tpu.ops.metrics import seg_finalize

    fin = seg_finalize(out["acc"], cfg.out_size)
    assert 0 <= float(fin["mean_iou"]) <= 100
    assert out["pred"].shape == targets.shape


def test_bf16_train_step_and_eval():
    """bfloat16 compute path: loss decreases, master weights stay f32, BN
    stats stay f32, and eval predictions closely match the f32 path."""
    model, tx, _ = _setup()
    cfg16 = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                          l1_decay=1e-6, out_size=1.0 / (32 * 32),
                          compute_dtype="bfloat16")
    step = tstep.make_train_step(model, tx, cfg16, donate=False)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    imgs, targets, mask = _batch()
    losses = []
    for i in range(6):
        state, out = step(state, imgs, targets, mask, jax.random.PRNGKey(100),
                          jnp.float32(1e-2), None)
        losses.append(float(out["loss"]))
    assert losses[-1] < losses[0]
    assert all(v.dtype == jnp.float32 for v in state.params.values())

    cfg32 = tstep.StepCfg(num_classes=5, augment=False,
                          out_size=1.0 / (32 * 32))
    cfg16e = tstep.StepCfg(num_classes=5, augment=False,
                           out_size=1.0 / (32 * 32), compute_dtype="bfloat16")
    e32 = tstep.make_eval_step(model, cfg32)(state.params, imgs, targets, mask)
    e16 = tstep.make_eval_step(model, cfg16e)(state.params, imgs, targets, mask)
    agree = float(jnp.mean((e32["pred"] == e16["pred"]).astype(jnp.float32)))
    assert agree > 0.97, agree


def test_multichip_dryrun_8_devices():
    assert len(jax.devices()) == 8
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_trainer_with_mesh_trains_on_8_devices():
    """Full Trainer (scan epochs) over a data-sharded cache on the CPU mesh."""
    import numpy as _np

    from robocupvision_tpu.data.device_cache import DeviceCache

    mesh = pmesh.make_mesh(8, spatial=1)
    model = zoo.make("robo_unet", **TINY)
    cfg = tstep.StepCfg(num_classes=5, augment=False, out_size=1.0 / (32 * 32))
    rng = _np.random.default_rng(0)
    imgs = rng.standard_normal((16, 32, 32, 3)).astype(_np.float32)
    labs = rng.integers(0, 5, (16, 32, 32)).astype(_np.int32)
    cache = DeviceCache.from_numpy(imgs, labs)

    from robocupvision_tpu.train.loop import Trainer

    with mesh:
        tr = Trainer(model, optim.sgd(momentum=0.5), cfg, cache, cache, 8,
                     mesh=mesh)
        tr.init(jax.random.PRNGKey(0))
        losses = [tr.train_epoch(1e-2).loss for _ in range(4)]
        val = tr.valid_epoch()
    assert losses[-1] < losses[0]
    assert np.isfinite(val["mean_iou"])
    # compare against unsharded run: same seed, same single-epoch result
    tr2 = Trainer(model, optim.sgd(momentum=0.5), cfg, cache, cache, 8)
    tr2.init(jax.random.PRNGKey(0))
    l2 = [tr2.train_epoch(1e-2).loss for _ in range(4)]
    np.testing.assert_allclose(losses, l2, rtol=1e-3)


def test_sharded_step_matches_single_device():
    """Data-parallel sharded train step == unsharded step (same batch).

    Uses SGD: Adam divides by sqrt(second moment), which amplifies the
    ~1e-8 cross-partition reduction-order differences to O(lr) on near-zero
    gradients; SGD updates are linear in the gradient, so parity is tight.
    """
    model, _, cfg = _setup(augment=False)
    tx = optim.sgd(momentum=0.5)
    step = tstep.make_train_step(model, tx, cfg, donate=False)
    imgs, targets, mask = _batch(b=8)
    lr = jnp.float32(1e-2)
    rng = jax.random.PRNGKey(7)

    s1 = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    s1, o1 = step(s1, imgs, targets, mask, rng, lr, None)

    mesh = pmesh.make_mesh(8, spatial=2)
    with mesh:
        s2 = tstep.init_state(model, tx, jax.random.PRNGKey(0))
        s2 = pmesh.replicate_state(mesh, s2)
        si, st, sm = pmesh.shard_batch(mesh, imgs, targets, mask)
        s2, o2 = step(s2, si, st, sm, rng, lr, None)

    assert abs(float(o1["loss"]) - float(o2["loss"])) < 1e-4
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), rtol=2e-3, atol=2e-5)


def test_padded_batch_does_not_contaminate_bn_stats():
    """BN running stats after a padded batch equal those from the unpadded
    batch alone (the review-found contamination bug)."""
    model, _, _ = _setup()
    tx = optim.sgd()
    cfg = tstep.StepCfg(num_classes=5, augment=False, out_size=1.0 / (32 * 32))
    step = tstep.make_train_step(model, tx, cfg, donate=False)

    imgs, targets, _ = _batch(b=3)
    pad = jnp.zeros((5,) + imgs.shape[1:], imgs.dtype)
    imgs_p = jnp.concatenate([imgs, pad])
    tgts_p = jnp.concatenate([targets, jnp.zeros((5, 32, 32), targets.dtype)])
    mask_p = jnp.asarray(np.array([1, 1, 1, 0, 0, 0, 0, 0], np.float32))

    s1 = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    s1, _ = step(s1, imgs, targets, jnp.ones((3,), jnp.float32),
                 jax.random.PRNGKey(1), jnp.float32(0.0), None)

    s2 = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    s2, _ = step(s2, imgs_p, tgts_p, mask_p, jax.random.PRNGKey(1),
                 jnp.float32(0.0), None)

    for k in s1.params:
        if k.endswith((".running_mean", ".running_var")):
            np.testing.assert_allclose(np.asarray(s2.params[k]),
                                       np.asarray(s1.params[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)


def test_remat_step_matches_plain():
    """StepCfg.remat recomputes activations in the backward pass; the update
    must be numerically identical to the plain step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep

    model = zoo.make("robo_unet", planes=4, depth=3, levels=1, belly_size=2,
                     belly_planes=8)
    tx = optim.adam()
    cfg = tstep.StepCfg(num_classes=5, out_size=1.0 / (48 * 64))
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((4, 48, 64, 3)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 5, (4, 48, 64)), jnp.int32)
    mask = jnp.ones((4,), jnp.float32)
    outs = {}
    for remat in ("none", "dots", "full"):
        step = tstep.make_train_step(model, tx,
                                     dataclasses.replace(cfg, remat=remat),
                                     donate=False)
        st = tstep.init_state(model, tx, jax.random.PRNGKey(0))
        st, out = step(st, imgs, tgt, mask, jax.random.PRNGKey(1),
                       jnp.float32(1e-3), None)
        outs[remat] = (st, out)
    for remat in ("dots", "full"):
        assert abs(float(outs[remat][1]["loss"])
                   - float(outs["none"][1]["loss"])) < 1e-6
        for k in outs["none"][0].params:
            np.testing.assert_allclose(
                np.asarray(outs[remat][0].params[k]),
                np.asarray(outs["none"][0].params[k]), atol=1e-6, rtol=1e-5,
                err_msg=k)
