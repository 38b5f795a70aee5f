"""Experimental separable-conv blocks (reference model.py:333-377).

ConvSep (parallel nx1 + 1xn convs, concat, 1x1 mix) and trConvSep (1x1 then
parallel 1x3/3x1 transpose convs summed) exist in the reference as unused
experiments (only a commented line references trConvSep, model.py:439); they
are provided here with the same structure and a registry/apply interface so
model variants can adopt them.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import layers as L
from robocupvision_tpu.ops import nn

Params = Dict[str, jax.Array]


def _j(name: str, child: str) -> str:
    """Join a (possibly empty) block name with a child module name."""
    return child if not name else name + "." + child


def conv_sep_def(r: L.Registry, name: str, cin: int, cout: int, k: int) -> None:
    r.conv(_j(name, "conv_nx1"), cin, cout // 2, (k, 1), bias=False)
    r.conv(_j(name, "conv_1xn"), cin, cout // 2, (1, k), bias=False)
    r.bn(_j(name, "bn1"), cout)
    r.conv(_j(name, "conv_1x1"), cout, cout, 1, bias=False)
    r.bn(_j(name, "bn2"), cout)


def conv_sep(p: Params, mut: Params, name: str, x, k: int, stride: int,
             train: bool):
    dilation = 1 if stride > 1 else 2
    padding = k // 2 + dilation - 1
    a = L.conv(p, _j(name, "conv_nx1"), x, stride=stride, padding=(padding, 0),
               dilation=(dilation, dilation))
    b = L.conv(p, _j(name, "conv_1xn"), x, stride=stride, padding=(0, padding),
               dilation=(dilation, dilation))
    y = jnp.concatenate([a, b], axis=-1)
    y = nn.relu(L.bn(p, mut, _j(name, "bn1"), y, train))
    y = L.conv(p, _j(name, "conv_1x1"), y)
    return nn.relu(L.bn(p, mut, _j(name, "bn2"), y, train))


def tr_conv_sep_def(r: L.Registry, name: str, cin: int, cout: int) -> None:
    r.conv(_j(name, "conv"), cin, cout, 1, bias=False)
    r.tconv(_j(name, "trconv1x3"), cout, cout, (1, 3), bias=False)
    r.tconv(_j(name, "trconv3x1"), cout, cout, (3, 1), bias=False)
    r.bn(_j(name, "bn1"), cout)
    r.bn(_j(name, "bn2"), cout)


def tr_conv_sep(p: Params, mut: Params, name: str, x, train: bool):
    """2x upsample via summed 1x3 + 3x1 transpose convs (model.py:363-377);
    both produce (2h, 2w) thanks to output_padding=1 on the short axes."""
    y = nn.relu(L.bn(p, mut, _j(name, "bn1"), L.conv(p, _j(name, "conv"), x), train))
    a = nn.conv_transpose2d(y, p[_j(name, "trconv1x3.weight")], None, stride=2,
                            padding=(0, 1), output_padding=1)
    b = nn.conv_transpose2d(y, p[_j(name, "trconv3x1.weight")], None, stride=2,
                            padding=(1, 0), output_padding=1)
    return nn.relu(L.bn(p, mut, _j(name, "bn2"), a + b, train))
