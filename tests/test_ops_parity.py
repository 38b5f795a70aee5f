"""Numerics parity of core ops vs PyTorch (the reference's substrate).

These tests compare our NHWC/HWIO JAX ops against torch's NCHW ops on the
same weights, guaranteeing per-pixel parity of the building blocks used by
every model (BASELINE.md requires label maps within per-pixel tolerance).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from robocupvision_tpu.ops import nn as tnn

TOL = dict(rtol=1e-5, atol=1e-5)


def _rand(*shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    return rng.standard_normal(shape).astype(np.float32)


def _to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _from_nhwc(y_nhwc):
    return np.transpose(y_nhwc, (0, 3, 1, 2))


def conv_w_to_hwio(w_oihw):
    return np.transpose(w_oihw, (2, 3, 1, 0))


def tconv_w_to_flipped_hwio(w_iokk):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> our pre-flipped HWIO
    w = w_iokk[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,dil,bias",
    [
        (3, 8, 3, 1, 2, 2, False),   # ConvPoolSimple conv0 config
        (8, 16, 3, 2, 1, 1, False),  # strided "pool" conv
        (4, 8, 1, 1, 0, 1, True),    # 1x1 classifier
        (4, 8, (3, 1), 2, (2, 0), (2, 1), True),  # separable/nx1 variant
        (3, 8, 8, 2, 4, 1, True),    # BNNL 8x8 even kernel
        (4, 8, 5, 1, 1, 1, True),    # BNNMC first conv
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, pad, dil, bias):
    kh, kw = (k, k) if isinstance(k, int) else k
    x = _rand(2, cin, 17, 19)
    w = _rand(cout, cin, kh, kw)
    b = _rand(cout) if bias else None

    ref = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(b) if bias else None,
        stride=stride, padding=pad, dilation=dil,
    ).numpy()

    got = tnn.conv2d(
        jnp.asarray(_to_nhwc(x)), jnp.asarray(conv_w_to_hwio(w)),
        jnp.asarray(b) if bias else None,
        stride=stride, padding=pad, dilation=dil,
    )
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), ref, **TOL)


@pytest.mark.parametrize(
    "cin,cout,stride,pad,outpad",
    [(8, 4, 2, 1, 1), (16, 16, 2, 1, 1), (6, 3, 3, 1, 2), (5, 7, 2, 0, 1)],
)
def test_conv_transpose2d_matches_torch(cin, cout, stride, pad, outpad):
    x = _rand(2, cin, 9, 11)
    w = _rand(cin, cout, 3, 3)
    b = _rand(cout)

    ref = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=outpad,
    ).numpy()

    got = tnn.conv_transpose2d(
        jnp.asarray(_to_nhwc(x)), jnp.asarray(tconv_w_to_flipped_hwio(w)),
        jnp.asarray(b), stride=stride, padding=pad, output_padding=outpad,
    )
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), ref, **TOL)


def test_batch_norm_train_and_eval_match_torch():
    c = 6
    x = _rand(4, c, 8, 10)
    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(_rand(c)))
        bn.bias.copy_(torch.from_numpy(_rand(c)))
        bn.running_mean.copy_(torch.from_numpy(_rand(c)))
        bn.running_var.copy_(torch.from_numpy(np.abs(_rand(c)) + 0.5))

    g = bn.weight.detach().numpy().copy()
    be = bn.bias.detach().numpy().copy()
    rm = bn.running_mean.numpy().copy()
    rv = bn.running_var.numpy().copy()

    # train step
    bn.train()
    ref_y = bn(torch.from_numpy(x)).detach().numpy()
    got_y, new_rm, new_rv = tnn.batch_norm(
        jnp.asarray(_to_nhwc(x)), jnp.asarray(g), jnp.asarray(be),
        jnp.asarray(rm), jnp.asarray(rv), train=True,
    )
    np.testing.assert_allclose(_from_nhwc(np.asarray(got_y)), ref_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_rm), bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_rv), bn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    # eval step uses the updated running stats
    bn.eval()
    ref_y2 = bn(torch.from_numpy(x)).detach().numpy()
    got_y2, _, _ = tnn.batch_norm(
        jnp.asarray(_to_nhwc(x)), jnp.asarray(g), jnp.asarray(be),
        new_rm, new_rv, train=False,
    )
    np.testing.assert_allclose(_from_nhwc(np.asarray(got_y2)), ref_y2, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s", [(2, 2), (4, 2), (3, 3)])
def test_max_pool_matches_torch(k, s):
    x = _rand(2, 5, 13, 17)
    ref = F.max_pool2d(torch.from_numpy(x), k, s).numpy()
    got = tnn.max_pool(jnp.asarray(_to_nhwc(x)), k, s)
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), ref, **TOL)


def test_avg_pool_and_adaptive_match_torch():
    x = _rand(2, 5, 12, 16)
    ref = F.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = tnn.avg_pool(jnp.asarray(_to_nhwc(x)), 2, 2)
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), ref, **TOL)

    ref1 = F.adaptive_avg_pool2d(torch.from_numpy(x), 1).numpy()
    got1 = tnn.adaptive_avg_pool_1(jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(_from_nhwc(np.asarray(got1)), ref1, **TOL)


def test_pixel_shuffle_matches_torch():
    x = _rand(2, 8, 5, 7)
    ref = F.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = tnn.pixel_shuffle(jnp.asarray(_to_nhwc(x)), 2)
    np.testing.assert_allclose(_from_nhwc(np.asarray(got)), ref, **TOL)


def test_linear_matches_torch():
    x = _rand(4, 32)
    w = _rand(16, 32)
    b = _rand(16)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    got = tnn.linear(jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), ref, **TOL)


def test_init_distributions_match_torch_defaults():
    """Init bounds equal PyTorch kaiming_uniform_(a=sqrt(5)) bounds."""
    import jax

    from robocupvision_tpu.ops import init as tinit

    key = jax.random.PRNGKey(0)
    w = tinit.conv_weight(key, 3, 3, 16, 32)
    bound = 1.0 / np.sqrt(16 * 9)
    assert float(jnp.max(jnp.abs(w))) <= bound
    assert float(jnp.max(jnp.abs(w))) > bound * 0.9  # actually fills the range

    wt = tinit.tconv_weight(key, 3, 3, 16, 32)
    bound_t = 1.0 / np.sqrt(32 * 9)
    assert float(jnp.max(jnp.abs(wt))) <= bound_t


@pytest.mark.parametrize("cin,cout", [(16, 8), (8, 4), (32, 16)])
def test_conv_transpose2d_subpixel_equals_dilated(cin, cout):
    """The phase-decomposed transpose conv is exactly the standard one."""
    x = _rand(2, cin, 13, 17)
    w = _rand(cin, cout, 3, 3)
    b = _rand(cout)
    xj = jnp.asarray(_to_nhwc(x))
    wj = jnp.asarray(tconv_w_to_flipped_hwio(w))
    bj = jnp.asarray(b)
    a = tnn.conv_transpose2d(xj, wj, bj)
    c = tnn.conv_transpose2d_subpixel(xj, wj, bj)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-4,
                               atol=1e-5)
