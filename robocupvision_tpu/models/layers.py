"""Parameter registry + functional block helpers for the model zoo.

Models in this framework are (ordered param dict, pure apply function) pairs:

- ``Registry`` declares parameters in **PyTorch state_dict order** with
  **PyTorch state_dict names** (e.g. ``downPart.Level0.layers.Conv0.conv.weight``),
  so checkpoints, pruning masks, optimizer param groups, the flat
  ``weights.dat`` export (reference: paramSave.py:5-18) and torch-checkpoint
  import all share one naming scheme.
- Arrays are stored in TPU-native layouts (HWIO kernels; tconv kernels
  pre-flipped — see ops/nn.py) and converted only at the torch/export boundary.
- Apply helpers thread a ``mut`` dict that collects updated BatchNorm running
  stats; callers merge it back into the param dict after a training step.

Block helpers reproduce the reference's exact op orderings, including its
quirks (reference model.py:105-199):
  conv_block:        conv -> ReLU -> BN        (model.py:116 — BN after ReLU!)
  conv_pool_simple:  conv -> BN -> ReLU
  conv_pool:         conv(d2) -> ReLU -> conv(s2) -> BN -> ReLU
  conv_pool_double:  conv(d2) -> ReLU -> conv(d2) -> ReLU -> conv(s2) -> BN -> ReLU
  up_tconv:          tconv -> BN -> ReLU
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from robocupvision_tpu.ops import init as pinit
from robocupvision_tpu.ops import nn

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    name: str
    shape: Tuple[int, ...]
    kind: str  # conv_w|conv_b|tconv_w|tconv_b|lin_w|lin_b|bn_w|bn_b|bn_rm|bn_rv


class Registry:
    """Ordered parameter declaration mirroring torch module registration."""

    def __init__(self) -> None:
        self.specs: "OrderedDict[str, ParamSpec]" = OrderedDict()

    def _add(self, name: str, shape: Tuple[int, ...], kind: str) -> None:
        assert name not in self.specs, f"duplicate param {name}"
        self.specs[name] = ParamSpec(name, shape, kind)

    def conv(self, name: str, cin: int, cout: int, k, bias: bool = True) -> None:
        kh, kw = (k, k) if isinstance(k, int) else k
        self._add(name + ".weight", (kh, kw, cin, cout), "conv_w")
        if bias:
            self._add(name + ".bias", (cout,), "conv_b")

    def tconv(self, name: str, cin: int, cout: int, k=3, bias: bool = True) -> None:
        kh, kw = (k, k) if isinstance(k, int) else k
        self._add(name + ".weight", (kh, kw, cin, cout), "tconv_w")
        if bias:
            self._add(name + ".bias", (cout,), "tconv_b")

    def bn(self, name: str, c: int) -> None:
        self._add(name + ".weight", (c,), "bn_w")
        self._add(name + ".bias", (c,), "bn_b")
        self._add(name + ".running_mean", (c,), "bn_rm")
        self._add(name + ".running_var", (c,), "bn_rv")

    def linear(self, name: str, cin: int, cout: int, bias: bool = True) -> None:
        self._add(name + ".weight", (cin, cout), "lin_w")
        if bias:
            self._add(name + ".bias", (cout,), "lin_b")

    # ---- init -------------------------------------------------------------

    def init(self, rng: jax.Array) -> Params:
        """Initialize all params with PyTorch layer defaults.

        Weight/bias of the same layer share a fold of the rng; exact torch RNG
        streams are not reproduced (different generators), distributions are.
        """
        params: Params = {}
        names = list(self.specs)
        keys = jax.random.split(rng, max(len(names), 1))
        for key, name in zip(keys, names):
            spec = self.specs[name]
            k = spec.kind
            if k == "conv_w":
                kh, kw, cin, cout = spec.shape
                params[name] = pinit.conv_weight(key, kh, kw, cin, cout)
            elif k == "conv_b":
                wspec = self.specs[name[: -len(".bias")] + ".weight"]
                kh, kw, cin, cout = wspec.shape
                params[name] = pinit.conv_bias(key, kh, kw, cin, cout)
            elif k == "tconv_w":
                kh, kw, cin, cout = spec.shape
                params[name] = pinit.tconv_weight(key, kh, kw, cin, cout)
            elif k == "tconv_b":
                wspec = self.specs[name[: -len(".bias")] + ".weight"]
                kh, kw, cin, cout = wspec.shape
                params[name] = pinit.tconv_bias(key, kh, kw, cin, cout)
            elif k == "lin_w":
                cin, cout = spec.shape
                params[name] = pinit.linear_weight(key, cin, cout)
            elif k == "lin_b":
                wspec = self.specs[name[: -len(".bias")] + ".weight"]
                cin, cout = wspec.shape
                params[name] = pinit.linear_bias(key, cin, cout)
            elif k == "bn_w":
                params[name] = jnp.ones(spec.shape, jnp.float32)
            elif k in ("bn_b", "bn_rm"):
                params[name] = jnp.zeros(spec.shape, jnp.float32)
            elif k == "bn_rv":
                params[name] = jnp.ones(spec.shape, jnp.float32)
            else:  # pragma: no cover
                raise ValueError(k)
        return params

    @property
    def order(self) -> List[str]:
        return list(self.specs)


def is_weight(name: str) -> bool:
    """Trainable-vs-state split: BN running stats are state, the rest train."""
    return not (name.endswith(".running_mean") or name.endswith(".running_var"))


def split_params(params: Params) -> Tuple[Params, Params]:
    train = {k: v for k, v in params.items() if is_weight(k)}
    state = {k: v for k, v in params.items() if not is_weight(k)}
    return train, state


# ---- functional block applications -----------------------------------------


def conv(p: Params, name: str, x, stride=1, padding=0, dilation=1):
    return nn.conv2d(x, p[name + ".weight"], p.get(name + ".bias"),
                     stride=stride, padding=padding, dilation=dilation)


def tconv(p: Params, name: str, x, stride=2, padding=1, output_padding=1):
    return nn.conv_transpose2d(x, p[name + ".weight"], p.get(name + ".bias"),
                               stride=stride, padding=padding,
                               output_padding=output_padding)


import contextvars

# Ambient per-sample validity mask for BatchNorm statistics. The train step
# sets this (to the traced sample_mask) around model.apply so padded batch
# slots are excluded from batch stats without threading a mask parameter
# through every model signature. Trace-time capture only — the mask is always
# an argument of the enclosing jit, never a baked-in constant.
_BN_SAMPLE_MASK: contextvars.ContextVar = contextvars.ContextVar(
    "bn_sample_mask", default=None)


def bn_stats_mask(mask):
    """Context manager: exclude masked-out samples from BN batch statistics."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        token = _BN_SAMPLE_MASK.set(mask)
        try:
            yield
        finally:
            _BN_SAMPLE_MASK.reset(token)

    return _cm()


def bn(p: Params, mut: Params, name: str, x, train: bool):
    y, rm, rv = nn.batch_norm(
        x, p[name + ".weight"], p[name + ".bias"],
        p[name + ".running_mean"], p[name + ".running_var"], train=train,
        sample_mask=_BN_SAMPLE_MASK.get() if train else None,
    )
    if train:
        mut[name + ".running_mean"] = rm
        mut[name + ".running_var"] = rv
    return y


# Reference block: Conv = conv -> ReLU -> BN (model.py:105-116)
def conv_block_def(r: Registry, name: str, cin: int, cout: int, k: int) -> None:
    r.conv(name + ".conv", cin, cout, k, bias=True)
    r.bn(name + ".bn", cout)


def conv_block(p, mut, name, x, stride, k, train):
    y = conv(p, name + ".conv", x, stride=stride, padding=k // 2)
    return bn(p, mut, name + ".bn", nn.relu(y), train)


# Reference block: ConvPoolSimple = conv -> BN -> ReLU (model.py:166-176)
def conv_pool_simple_def(r: Registry, name: str, cin: int, cout: int, k: int,
                         bias: bool) -> None:
    r.conv(name + ".conv", cin, cout, k, bias=bias)
    r.bn(name + ".bn", cout)


def conv_pool_simple(p, mut, name, x, stride, padding, dilation, train):
    y = conv(p, name + ".conv", x, stride=stride, padding=padding, dilation=dilation)
    return nn.relu(bn(p, mut, name + ".bn", y, train))


# Reference block: ConvPool (model.py:126-142)
def conv_pool_def(r: Registry, name: str, cin: int, cout: int) -> None:
    r.conv(name + ".conv1", cin, cout, 3, bias=False)
    r.conv(name + ".pool", cout, cout, 3, bias=False)
    r.bn(name + ".bn", cout)


def conv_pool(p, mut, name, x, train):
    y = nn.relu(conv(p, name + ".conv1", x, padding=2, dilation=2))
    y = conv(p, name + ".pool", y, stride=2, padding=1)
    return nn.relu(bn(p, mut, name + ".bn", y, train))


# Reference block: ConvPoolDouble (model.py:144-164)
def conv_pool_double_def(r: Registry, name: str, cin: int, cout: int) -> None:
    r.conv(name + ".conv1", cin, cout, 3, bias=False)
    r.conv(name + ".conv2", cout, cout, 3, bias=False)
    r.conv(name + ".pool", cout, cout, 3, bias=False)
    r.bn(name + ".bn", cout)


def conv_pool_double(p, mut, name, x, train):
    y = nn.relu(conv(p, name + ".conv1", x, padding=2, dilation=2))
    y = nn.relu(conv(p, name + ".conv2", y, padding=2, dilation=2))
    y = conv(p, name + ".pool", y, stride=2, padding=1)
    return nn.relu(bn(p, mut, name + ".bn", y, train))


# Reference block: upSampleTransposeConv (model.py:178-194)
def up_tconv_def(r: Registry, name: str, cin: int, cout: int) -> None:
    r.tconv(name + ".conv", cin, cout, 3, bias=True)
    r.bn(name + ".bn", cout)


def up_tconv(p, mut, name, x, train):
    y = tconv(p, name + ".conv", x, stride=2, padding=1, output_padding=1)
    return nn.relu(bn(p, mut, name + ".bn", y, train))


# Reference block: LevelDown (model.py:379-401)
def level_down_def(r: Registry, name: str, cin: int, cout: int, levels: int,
                   do_pool: bool, pool: bool) -> None:
    if pool:
        # "Pool" submodule has no params
        if do_pool:
            levels -= 1
        r_levels = max(levels, 1)
        conv_block_def(r, name + ".layers.Conv0", cin, cout, 3)
        for i in range(r_levels - 1):
            conv_block_def(r, f"{name}.layers.Conv{i + 1}", cout, cout, 3)
    else:
        conv_block_def(r, name + ".layers.Conv0", cin, cout, 3)
        for i in range(levels - 1):
            conv_block_def(r, f"{name}.layers.Conv{i + 1}", cout, cout, 3)


def level_down(p, mut, name, x, levels, do_pool, pool, train):
    if pool:
        if do_pool:
            x = nn.max_pool(x, 2, 2)
            levels -= 1
        levels = max(levels, 1)
        x = conv_block(p, mut, name + ".layers.Conv0", x, 1, 3, train)
        for i in range(levels - 1):
            x = conv_block(p, mut, f"{name}.layers.Conv{i + 1}", x, 1, 3, train)
    else:
        x = conv_block(p, mut, name + ".layers.Conv0", x, 2 if do_pool else 1, 3, train)
        for i in range(levels - 1):
            x = conv_block(p, mut, f"{name}.layers.Conv{i + 1}", x, 1, 3, train)
    return x


# Reference block: UltClassifier (model.py:403-414)
def ult_classifier_def(r: Registry, name: str, cin: int, n_class: int,
                       size: int = 1) -> None:
    r.conv(name + ".layers.Class", cin, n_class, size, bias=True)


def ult_classifier(p, name, x, pool: bool, size: int, dropout_p: float,
                   train: bool, rng: Optional[jax.Array]):
    if pool:
        x = nn.adaptive_avg_pool_1(x)
        if rng is not None:
            x = nn.dropout2d(rng, x, dropout_p, train)
        elif train and dropout_p > 0:
            raise ValueError("dropout requires an rng in train mode")
    return conv(p, name + ".layers.Class", x, padding=size // 2)


def join(name: str, child: str) -> str:
    """Module-path join tolerating an empty prefix (standalone heads keep the
    reference's bare torch names, e.g. 'classifier.weight')."""
    return child if not name else name + "." + child


# Reference block: Classifier (model.py:256-267)
def classifier_def(r: Registry, name: str, cin: int, n_class: int,
                   kernel: int = 1) -> None:
    r.conv(join(name, "classifier"), cin, n_class, kernel, bias=True)


def classifier(p, name, x, pool_size: int, kernel: int):
    if pool_size > 1:
        x = nn.max_pool(x, pool_size, pool_size)
    return conv(p, join(name, "classifier"), x, padding=kernel // 2)
