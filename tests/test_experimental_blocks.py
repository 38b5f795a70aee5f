"""ConvSep / trConvSep parity vs the reference implementations."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from robocupvision_tpu.export.torch_io import from_torch_state_dict  # noqa: E402
from robocupvision_tpu.models import experimental as ex  # noqa: E402
from robocupvision_tpu.models.layers import Registry  # noqa: E402


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_sep_matches_reference(stride):
    import model as refmodel

    torch.manual_seed(0)
    tm = refmodel.ConvSep(6, 8, 3, stride=stride).eval()
    r = Registry()
    ex.conv_sep_def(r, "", 6, 8, 3)
    params = {k: jnp.asarray(v)
              for k, v in from_torch_state_dict(r, tm.state_dict()).items()}

    x = np.random.default_rng(0).standard_normal((2, 6, 12, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    mut = {}
    got = ex.conv_sep(params, mut, "", jnp.asarray(x.transpose(0, 2, 3, 1)),
                      3, stride, train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_tr_conv_sep_matches_reference():
    import model as refmodel

    torch.manual_seed(1)
    tm = refmodel.trConvSep(6, 8).eval()
    r = Registry()
    ex.tr_conv_sep_def(r, "", 6, 8)
    params = {k: jnp.asarray(v)
              for k, v in from_torch_state_dict(r, tm.state_dict()).items()}

    x = np.random.default_rng(1).standard_normal((2, 6, 10, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    mut = {}
    got = ex.tr_conv_sep(params, mut, "", jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)
