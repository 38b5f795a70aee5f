"""Model zoo: every architecture family of the reference, TPU-native.

Implemented (reference locations cited for parity auditing):
- ROBO_UNet    — main segmentation net (reference model.py:461-536), incl.
                 noScale/v2(concat skips)/pool(vanilla U-Net)/bellySize=0.
- PB_FCN       — paper v1 net with classify/segment heads (model.py:269-309)
                 over the DownSampler encoder (model.py:201-232).
- PB_FCN_2     — v2 architecture (model.py:416-459).
- FCN          — plain FCN baseline over DownSamplerThick (model.py:311-330).
- LabelProp    — temporal label propagation net (model.py:538-567) with the
                 *intended* dropout wired through (the reference's __init__
                 passes a dropout arg its ConvPoolSimple cannot accept —
                 model.py:542 vs 166 — a staleness bug we fix, not replicate).
- BNNL / BNNMC — Hess-et-al. baseline classifiers (model.py:569-619).
- DownSampler + Classifier — standalone encoder/classifier pair used by the
                 classVal comparison workload (classVal.py:60-64).

Every model exposes:
    cfg                      frozen config dataclass
    registry(cfg)            ordered params (PyTorch state_dict names/order)
    init(cfg, rng)           param dict (incl. BN running stats)
    apply(cfg, params, x, train=..., rng=...) -> (out, mutated_stats)

Forwards are pure and jittable; activations NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import layers as L
from robocupvision_tpu.ops import nn

Params = Dict[str, jax.Array]


# =============================================================================
# DownSampler (PB-FCN encoder) — reference model.py:201-232
# =============================================================================


@dataclasses.dataclass(frozen=True)
class DownSamplerCfg:
    # NOTE: no dropout field — classVal.py:60 passes a dropout arg to a
    # 2-arg DownSampler (stale call, SURVEY §2.1); the module never had one.
    planes: int = 32
    no_scale: bool = False


def downsampler_registry(cfg: DownSamplerCfg, r: L.Registry, prefix: str = "") -> None:
    p = cfg.planes
    out = p // 4
    L.conv_pool_simple_def(r, prefix + "conv0", 3, out, 3, bias=False)
    L.conv_pool_simple_def(r, prefix + "conv1", out, p // 2, 3, bias=False)
    L.conv_pool_def(r, prefix + "conv2", p // 2, p)
    if cfg.no_scale:
        L.conv_pool_def(r, prefix + "conv_ext", p, p)
    L.conv_pool_def(r, prefix + "conv3", p, p * 2)
    L.conv_pool_simple_def(r, prefix + "conv4", p * 2, p * 4, 3, bias=False)
    L.conv_pool_simple_def(r, prefix + "conv5", p * 4, p * 4, 3, bias=False)
    L.conv_pool_simple_def(r, prefix + "conv6", p * 4, p * 4, 3, bias=False)
    L.conv_pool_simple_def(r, prefix + "conv7", p * 4, p * 4, 3, bias=False)
    L.conv_pool_simple_def(r, prefix + "conv8", p * 4, p * 2, 3, bias=False)


def downsampler_apply(cfg: DownSamplerCfg, p: Params, mut: Params, x,
                      train: bool, prefix: str = ""):
    """Returns (f4, f3, f2, f1, f0); f4 is None unless no_scale."""
    def cps(name, x, stride, padding, dilation):
        return L.conv_pool_simple(p, mut, prefix + name, x, stride, padding,
                                  dilation, train)

    x0 = cps("conv0", x, 1, 2, 2)
    x1 = cps("conv1", x0, 2, 1, 1)
    x2 = L.conv_pool(p, mut, prefix + "conv2", x1, train)

    def deep(h):
        h = L.conv_pool(p, mut, prefix + "conv3", h, train)
        h = cps("conv4", h, 1, 2, 2)
        h = cps("conv5", h, 1, 2, 2)
        h = cps("conv6", h, 1, 2, 2)
        h = cps("conv7", h, 1, 2, 2)
        return cps("conv8", h, 1, 2, 2)

    if cfg.no_scale:
        x3 = L.conv_pool(p, mut, prefix + "conv_ext", x2, train)
        x4 = deep(x3)
        return x4, x3, x2, x1, x0
    x3 = deep(x2)
    return None, x3, x2, x1, x0


# =============================================================================
# PB_FCN — reference model.py:269-309
# =============================================================================


@dataclasses.dataclass(frozen=True)
class PBFCNCfg:
    planes: int = 32
    num_classes: int = 5
    kernel_size: int = 1
    no_scale: bool = False
    classify: bool = False

    @property
    def img_shape(self) -> Tuple[int, int]:
        return (240, 320) if self.no_scale else (120, 160)


def pb_fcn_registry(cfg: PBFCNCfg) -> L.Registry:
    r = L.Registry()
    pl = cfg.planes
    mult = 2 if cfg.no_scale else 1
    out = pl // 4
    downsampler_registry(DownSamplerCfg(pl, cfg.no_scale), r, "FCN.")
    L.up_tconv_def(r, "up1", pl * 2, pl)
    L.up_tconv_def(r, "up2", pl, pl // 2 * mult)
    L.up_tconv_def(r, "up3", pl // 2 * mult, out * mult)
    if cfg.no_scale:
        L.up_tconv_def(r, "up4", pl // 2, out)
    L.classifier_def(r, "classifier", pl * 2, cfg.num_classes, cfg.kernel_size)
    L.classifier_def(r, "segmenter", out, cfg.num_classes, cfg.kernel_size)
    return r


def pb_fcn_apply(cfg: PBFCNCfg, p: Params, x, *, train: bool = False,
                 rng: Optional[jax.Array] = None):
    del rng
    mut: Params = {}
    ds = DownSamplerCfg(cfg.planes, cfg.no_scale)
    f4, f3, f2, f1, f0 = downsampler_apply(ds, p, mut, x, train, "FCN.")
    if cfg.classify:
        feat = f4 if cfg.no_scale else f3
        pool = 2 if cfg.no_scale else 4
        return L.classifier(p, "classifier", feat, pool, cfg.kernel_size), mut
    if cfg.no_scale:
        h = L.up_tconv(p, mut, "up1", f4, train) + f3
        h = L.up_tconv(p, mut, "up2", h, train) + f2
        h = L.up_tconv(p, mut, "up3", h, train) + f1
        h = L.up_tconv(p, mut, "up4", h, train) + f0
    else:
        h = L.up_tconv(p, mut, "up1", f3, train) + f2
        h = L.up_tconv(p, mut, "up2", h, train) + f1
        h = L.up_tconv(p, mut, "up3", h, train) + f0
    return L.classifier(p, "segmenter", h, 0, cfg.kernel_size), mut


# =============================================================================
# ROBO_UNet — reference model.py:461-536
# =============================================================================


@dataclasses.dataclass(frozen=True)
class RoboUNetCfg:
    no_scale: bool = False
    planes: int = 8
    num_classes: int = 5
    depth: int = 4
    levels: int = 2
    belly_size: int = 5
    belly_planes: int = 128
    pool: bool = False  # vanilla-UNet mode
    v2: bool = False    # concat skips instead of add
    class_size: int = 1

    @property
    def eff_depth(self) -> int:
        return self.depth + 1 if self.no_scale else self.depth

    @property
    def img_shape(self) -> Tuple[int, int]:
        return (240, 320) if self.no_scale else (120, 160)


def robo_unet_registry(cfg: RoboUNetCfg) -> L.Registry:
    r = L.Registry()
    depth = cfg.eff_depth
    pl = cfg.planes
    max_depth = pl * 2 ** (depth - 1)

    L.level_down_def(r, "downPart.Level0", 3, pl, cfg.levels - 1, False, cfg.pool)
    for i in range(depth - 1):
        n_ch = pl * 2 ** i
        L.level_down_def(r, f"downPart.Level{i + 1}", n_ch, n_ch * 2,
                         cfg.levels, True, cfg.pool)
    if cfg.belly_size > 0:
        L.level_down_def(r, "PB.PB_1", max_depth, cfg.belly_planes,
                         cfg.belly_size - 1, False, False)
        L.level_down_def(r, "PB.PB_2", cfg.belly_planes, max_depth, 1, False, False)
    for i in range(depth - 1):
        n_ch = pl * 2 ** (depth - 1 - i)
        o_ch = n_ch // 2
        if i > 0 and cfg.v2:
            n_ch *= 2
        L.up_tconv_def(r, f"upPart.Up{i}", n_ch, o_ch)
    L.ult_classifier_def(r, "segmenter", pl * 2 if cfg.v2 else pl,
                         cfg.num_classes, cfg.class_size)
    return r


def robo_unet_apply(cfg: RoboUNetCfg, p: Params, x, *, train: bool = False,
                    rng: Optional[jax.Array] = None):
    mut: Params = {}
    depth = cfg.eff_depth

    downs = [x]
    downs.append(L.level_down(p, mut, "downPart.Level0", x, cfg.levels - 1,
                              False, cfg.pool, train))
    for i in range(depth - 1):
        downs.append(L.level_down(p, mut, f"downPart.Level{i + 1}", downs[-1],
                                  cfg.levels, True, cfg.pool, train))
    if cfg.belly_size > 0:
        h = L.level_down(p, mut, "PB.PB_1", downs[-1], cfg.belly_size - 1,
                         False, False, train)
        downs[-1] = L.level_down(p, mut, "PB.PB_2", h, 1, False, False, train)

    up = downs[-1]
    for i in range(depth - 1):
        y = L.up_tconv(p, mut, f"upPart.Up{i}", up, train)
        skip = downs[-(i + 2)]
        up = jnp.concatenate([y, skip], axis=-1) if cfg.v2 else y + skip

    out = L.ult_classifier(p, "segmenter", up, False, cfg.class_size, 0.5,
                           train, rng)
    return out, mut


def robo_unet_get_computations(cfg: RoboUNetCfg, params: Optional[Params] = None,
                               pruned: bool = False):
    """Analytic per-layer op counts (reference model.py:513-536).

    Conv cost: k*k*W*H*Cin*Cout*2*nnz_ratio + W*H*Cout*4 (the BN/ReLU tail);
    pool cost: W*H*C; the final entry is the segmenter estimate
    H*W*nClass*planes*2 (kept verbatim from the reference formula).

    When ``params`` is given, per-layer widths are read from the actual
    kernel shapes, so structurally-compacted (slim, ops/slim.py) dicts
    report their true reduced cost; dense and masked dicts carry the cfg
    widths and are unchanged.
    """
    H, W = cfg.img_shape

    def ratio(name):
        if not pruned or params is None:
            return 1.0
        import numpy as np

        w = np.asarray(params[name + ".weight"])  # host-side: no device ops
        return float(np.count_nonzero(w)) / w.size

    comp = []
    depth = cfg.eff_depth
    pl = cfg.planes

    def conv_cost(name, cin, cout, k, stride, w, h):
        if params is not None and name + ".weight" in params:
            kshape = params[name + ".weight"].shape  # (kh, kw, cin, cout)
            k, cin, cout = int(kshape[0]), int(kshape[2]), int(kshape[3])
        w2, h2 = w // stride, h // stride
        comp.append(k * k * w2 * h2 * cin * cout * 2 * ratio(name) + w2 * h2 * cout * 4)
        return w2, h2

    def level_cost(name, cin, cout, levels, do_pool, pool, w, h):
        if pool:
            if do_pool:
                if params is not None and \
                        name + ".layers.Conv0.conv.weight" in params:
                    # pool preserves channels: actual cin is the consuming
                    # Conv0's in width (slim dicts)
                    cin = int(params[name + ".layers.Conv0.conv.weight"]
                              .shape[2])
                comp.append(w * h * cin)
                w, h = w // 2, h // 2
                levels -= 1
            levels = max(levels, 1)
            w, h = conv_cost(name + ".layers.Conv0.conv", cin, cout, 3, 1, w, h)
            for i in range(levels - 1):
                w, h = conv_cost(f"{name}.layers.Conv{i+1}.conv", cout, cout, 3, 1, w, h)
        else:
            w, h = conv_cost(name + ".layers.Conv0.conv", cin, cout, 3,
                             2 if do_pool else 1, w, h)
            for i in range(levels - 1):
                w, h = conv_cost(f"{name}.layers.Conv{i+1}.conv", cout, cout, 3, 1, w, h)
        return w, h

    w, h = W, H
    w, h = level_cost("downPart.Level0", 3, pl, cfg.levels - 1, False, cfg.pool, w, h)
    for i in range(depth - 1):
        n_ch = pl * 2 ** i
        w, h = level_cost(f"downPart.Level{i+1}", n_ch, n_ch * 2, cfg.levels,
                          True, cfg.pool, w, h)
    max_depth = pl * 2 ** (depth - 1)
    if cfg.belly_size > 0:
        w, h = level_cost("PB.PB_1", max_depth, cfg.belly_planes,
                          cfg.belly_size - 1, False, False, w, h)
        w, h = level_cost("PB.PB_2", cfg.belly_planes, max_depth, 1, False, False, w, h)
    for i in range(depth - 1):
        n_ch = pl * 2 ** (depth - 1 - i)
        o_ch = n_ch // 2
        if i > 0 and cfg.v2:
            n_ch *= 2
        name = f"upPart.Up{i}.conv"
        if params is not None and name + ".weight" in params:
            kshape = params[name + ".weight"].shape  # (kh, kw, cin, cout)
            n_ch, o_ch = int(kshape[2]), int(kshape[3])
        comp.append(3 * 3 * w * h * n_ch * o_ch * 2 * ratio(name) + w * h * o_ch * 4)
        w, h = w * 2, h * 2
    # segmenter estimate kept verbatim from the reference (nClass*planes*2,
    # even for v2 where the head's true cin is 2*planes); for slim dicts the
    # equivalent planes value is the actual head in-width / (2 if v2 else 1)
    if params is not None and "segmenter.layers.Class.weight" in params:
        head_cin = int(params["segmenter.layers.Class.weight"].shape[2])
        pl = head_cin // (2 if cfg.v2 else 1)
    comp.append(H * W * cfg.num_classes * pl * 2)
    return comp


# =============================================================================
# PB_FCN_2 — reference model.py:416-459
# =============================================================================


@dataclasses.dataclass(frozen=True)
class PBFCN2Cfg:
    classify: bool = False
    num_classes: int = 5
    planes: int = 8
    depth: int = 4
    levels: int = 2
    belly_size: int = 5
    belly_planes: int = 128

    @property
    def img_shape(self) -> Tuple[int, int]:
        return (120, 160)


def pb_fcn_2_registry(cfg: PBFCN2Cfg) -> L.Registry:
    r = L.Registry()
    pl = cfg.planes
    max_depth = pl * 2 ** (cfg.depth - 1)
    L.level_down_def(r, "downPart.Level0", 3, pl, 1, False, False)
    for i in range(cfg.depth - 1):
        n_ch = pl * 2 ** i
        L.level_down_def(r, f"downPart.Level{i + 1}", n_ch, n_ch * 2,
                         cfg.levels, True, False)
    L.level_down_def(r, "PB.PB_1", max_depth, cfg.belly_planes,
                     cfg.belly_size - 1, False, False)
    L.level_down_def(r, "PB.PB_2", cfg.belly_planes, max_depth, 1, False, False)
    for i in range(cfg.depth - 1):
        n_ch = pl * 2 ** (cfg.depth - 1 - i)
        L.up_tconv_def(r, f"upPart.Up{i}", n_ch, n_ch // 2)
    L.ult_classifier_def(r, "classifier", max_depth, cfg.num_classes, 1)
    L.ult_classifier_def(r, "segmenter", pl, cfg.num_classes, 1)
    return r


def pb_fcn_2_apply(cfg: PBFCN2Cfg, p: Params, x, *, train: bool = False,
                   rng: Optional[jax.Array] = None):
    mut: Params = {}
    downs = [x]
    downs.append(L.level_down(p, mut, "downPart.Level0", x, 1, False, False, train))
    for i in range(cfg.depth - 1):
        downs.append(L.level_down(p, mut, f"downPart.Level{i + 1}", downs[-1],
                                  cfg.levels, True, False, train))
    h = L.level_down(p, mut, "PB.PB_1", downs[-1], cfg.belly_size - 1,
                     False, False, train)
    downs[-1] = L.level_down(p, mut, "PB.PB_2", h, 1, False, False, train)

    if cfg.classify:
        out = L.ult_classifier(p, "classifier", downs[-1], True, 1, 0.5, train, rng)
        return out, mut

    up = downs[-1]
    for i in range(cfg.depth - 1):
        up = L.up_tconv(p, mut, f"upPart.Up{i}", up, train) + downs[-(i + 2)]
    return L.ult_classifier(p, "segmenter", up, False, 1, 0.5, train, rng), mut


# =============================================================================
# FCN baseline — reference model.py:235-254, 311-330
# =============================================================================


@dataclasses.dataclass(frozen=True)
class FCNCfg:
    planes: int = 32
    num_classes: int = 5


def fcn_registry(cfg: FCNCfg) -> L.Registry:
    r = L.Registry()
    pl = cfg.planes
    out = pl // 2
    L.conv_pool_simple_def(r, "FCN.conv0", 3, out, 3, bias=False)
    L.conv_pool_simple_def(r, "FCN.conv0_1", out, out, 3, bias=False)
    L.conv_pool_simple_def(r, "FCN.conv1", out, out, 3, bias=False)
    L.conv_pool_double_def(r, "FCN.conv2", out, pl)
    L.conv_pool_double_def(r, "FCN.conv3", pl, pl * 2)
    L.conv_pool_simple_def(r, "FCN.conv4", pl * 2, pl * 4, 3, bias=False)
    L.conv_pool_simple_def(r, "FCN.conv5", pl * 4, pl * 2, 3, bias=False)
    L.up_tconv_def(r, "up1", pl * 2, pl)
    L.up_tconv_def(r, "up2", pl, pl // 2)
    L.up_tconv_def(r, "up3", pl // 2, pl // 2)
    L.classifier_def(r, "classifier", pl // 2, cfg.num_classes, 1)
    return r


def fcn_apply(cfg: FCNCfg, p: Params, x, *, train: bool = False,
              rng: Optional[jax.Array] = None):
    del rng
    mut: Params = {}

    def cps(name, x, stride, padding, dilation):
        return L.conv_pool_simple(p, mut, name, x, stride, padding, dilation, train)

    x0 = cps("FCN.conv0_1", cps("FCN.conv0", x, 1, 2, 2), 1, 2, 2)
    x1 = cps("FCN.conv1", x0, 2, 1, 1)
    x2 = L.conv_pool_double(p, mut, "FCN.conv2", x1, train)
    x3 = L.conv_pool_double(p, mut, "FCN.conv3", x2, train)
    x3 = cps("FCN.conv5", cps("FCN.conv4", x3, 1, 2, 2), 1, 2, 2)

    h = L.up_tconv(p, mut, "up1", x3, train) + x2
    h = L.up_tconv(p, mut, "up2", h, train) + x1
    h = L.up_tconv(p, mut, "up3", h, train) + x0
    return L.classifier(p, "classifier", h, 0, 1), mut


# =============================================================================
# LabelProp — reference model.py:538-567 (with intended dropout, bug fixed)
# =============================================================================


@dataclasses.dataclass(frozen=True)
class LabelPropCfg:
    num_classes: int = 5
    planes: int = 32
    dropout: float = 0.0

    @property
    def in_channels(self) -> int:
        # Y_t, Y_other, Y_t - Y_other, one-hot prev label (num_classes)
        return 3 + self.num_classes


def label_prop_registry(cfg: LabelPropCfg) -> L.Registry:
    r = L.Registry()
    pl = cfg.planes
    cin = 8  # reference hard-codes 8 input channels (model.py:542)
    L.conv_pool_simple_def(r, "pre", cin, pl // 4, 3, bias=False)
    L.conv_pool_simple_def(r, "down1", pl // 4, pl // 2, 3, bias=False)
    L.conv_pool_simple_def(r, "down2", pl // 2, pl // 2, 3, bias=False)
    L.conv_pool_simple_def(r, "down3", pl // 2, pl, 3, bias=False)
    L.conv_pool_simple_def(r, "conv1", pl, pl * 2, 3, bias=False)
    L.conv_pool_simple_def(r, "conv2", pl * 2, pl * 2, 3, bias=False)
    L.conv_pool_simple_def(r, "conv3", pl * 2, pl, 3, bias=False)
    L.up_tconv_def(r, "upConv1", pl, pl // 2)
    L.up_tconv_def(r, "upConv2", pl // 2, pl // 2)
    L.up_tconv_def(r, "upConv3", pl // 2, pl // 2)
    r.conv("classifier", pl // 2, cfg.num_classes, 1, bias=True)
    return r


def label_prop_apply(cfg: LabelPropCfg, p: Params, x, *, train: bool = False,
                     rng: Optional[jax.Array] = None):
    mut: Params = {}

    def cps(name, x, stride, padding, dilation, key):
        y = L.conv_pool_simple(p, mut, name, x, stride, padding, dilation, train)
        if cfg.dropout > 0 and train:
            y = nn.dropout2d(key, y, cfg.dropout, train)
        return y

    keys = jax.random.split(rng, 7) if (rng is not None and cfg.dropout > 0) \
        else [None] * 7
    top = cps("pre", x, 1, 1, 1, keys[0])
    middle = cps("down1", top, 2, 1, 1, keys[1])
    bottom = cps("down2", middle, 2, 1, 1, keys[2])
    h = cps("down3", bottom, 2, 1, 1, keys[3])
    h = cps("conv3", cps("conv2", cps("conv1", h, 1, 2, 2, keys[4]),
                         1, 2, 2, keys[5]), 1, 2, 2, keys[6])
    h = bottom + L.up_tconv(p, mut, "upConv1", h, train)
    h = middle + L.up_tconv(p, mut, "upConv2", h, train)
    h = L.up_tconv(p, mut, "upConv3", h, train)
    # channel-slice skip: x[:, 0:8] += top (reference model.py:565), NHWC here
    pre_ch = top.shape[-1]
    h = h.at[..., :pre_ch].add(top)
    out = L.conv(p, "classifier", h, padding=0)
    return out, mut


# =============================================================================
# BNNL / BNNMC — reference model.py:569-619
# =============================================================================


@dataclasses.dataclass(frozen=True)
class BNNCfg:
    variant: str = "L"  # "L" or "MC"
    num_classes: int = 4


def bnn_registry(cfg: BNNCfg) -> L.Registry:
    r = L.Registry()
    if cfg.variant == "L":
        r.conv("conv1", 3, 8, 8)
        r.conv("conv2", 8, 16, 8)
        r.conv("conv3", 16, 16, 8)
        r.conv("fc", 16, 512, 1)
        r.conv("classifier", 512, cfg.num_classes, 1)
    else:
        r.conv("conv1", 3, 8, 5)
        r.conv("conv2", 8, 16, 3)
        r.conv("conv3", 16, 16, 3)
        r.conv("classifier", 16, cfg.num_classes, 3)
    return r


def bnn_apply(cfg: BNNCfg, p: Params, x, *, train: bool = False,
              rng: Optional[jax.Array] = None):
    mut: Params = {}
    keys = jax.random.split(rng, 4) if rng is not None else [None] * 4

    def do2(k, y, prob):
        return nn.dropout2d(k, y, prob, train) if k is not None else y

    if cfg.variant == "L":
        y = nn.relu(nn.max_pool(do2(keys[0], L.conv(p, "conv1", x, padding=4), 0.25), 4, 2))
        y = nn.relu(nn.max_pool(do2(keys[1], L.conv(p, "conv2", y, padding=3), 0.25), 4, 2))
        y = nn.relu(nn.max_pool(do2(keys[2], L.conv(p, "conv3", y, padding=3), 0.25), 4, 2))
        y = L.conv(p, "fc", y)
        if keys[3] is not None:
            y = nn.dropout(keys[3], y, 0.5, train)
        y = L.conv(p, "classifier", nn.relu(y))
    else:
        y = nn.relu(nn.max_pool(do2(keys[0], L.conv(p, "conv1", x, padding=1), 0.25), 4, 2))
        y = nn.relu(nn.max_pool(do2(keys[1], L.conv(p, "conv2", y, padding=1), 0.25), 4, 2))
        y = nn.relu(nn.max_pool(do2(keys[2], L.conv(p, "conv3", y, padding=1), 0.25), 2, 2))
        y = L.conv(p, "classifier", y)
    return y, mut


# =============================================================================
# Standalone Classifier head (classVal.py:61)
# =============================================================================


@dataclasses.dataclass(frozen=True)
class ClassifierCfg:
    in_planes: int = 64
    num_classes: int = 4
    pool_size: int = 4
    kernel_size: int = 1


def classifier_registry(cfg: ClassifierCfg) -> L.Registry:
    r = L.Registry()
    L.classifier_def(r, "", cfg.in_planes, cfg.num_classes, cfg.kernel_size)
    return r


def classifier_apply(cfg: ClassifierCfg, p: Params, x, *, train: bool = False,
                     rng: Optional[jax.Array] = None):
    del train, rng
    return L.classifier(p, "", x, cfg.pool_size, cfg.kernel_size), {}


# =============================================================================
# Standalone DownSampler (classVal.py:60) — returns the encoder feature tuple
# =============================================================================


def _downsampler_registry_standalone(cfg: DownSamplerCfg) -> L.Registry:
    r = L.Registry()
    downsampler_registry(cfg, r, "")
    return r


def _downsampler_apply_standalone(cfg: DownSamplerCfg, p: Params, x, *,
                                  train: bool = False,
                                  rng: Optional[jax.Array] = None):
    del rng
    mut: Params = {}
    feats = downsampler_apply(cfg, p, mut, x, train, "")
    return feats, mut


# =============================================================================
# Generic model handle
# =============================================================================

_FAMILIES = {
    "downsampler": (DownSamplerCfg, _downsampler_registry_standalone,
                    _downsampler_apply_standalone),
    "robo_unet": (RoboUNetCfg, robo_unet_registry, robo_unet_apply),
    "pb_fcn": (PBFCNCfg, pb_fcn_registry, pb_fcn_apply),
    "pb_fcn_2": (PBFCN2Cfg, pb_fcn_2_registry, pb_fcn_2_apply),
    "fcn": (FCNCfg, fcn_registry, fcn_apply),
    "label_prop": (LabelPropCfg, label_prop_registry, label_prop_apply),
    "bnn": (BNNCfg, bnn_registry, bnn_apply),
    "classifier": (ClassifierCfg, classifier_registry, classifier_apply),
}


@dataclasses.dataclass(frozen=True)
class Model:
    """A (config, registry, apply) bundle for a zoo architecture."""

    family: str
    cfg: object

    @property
    def registry(self) -> L.Registry:
        return _FAMILIES[self.family][1](self.cfg)

    def init(self, rng: jax.Array) -> Params:
        return self.registry.init(rng)

    def apply(self, params: Params, x, *, train: bool = False,
              rng: Optional[jax.Array] = None):
        return _FAMILIES[self.family][2](self.cfg, params, x, train=train, rng=rng)

    @property
    def param_order(self):
        return self.registry.order


def make(family: str, **kwargs) -> Model:
    cfg_cls = _FAMILIES[family][0]
    return Model(family, cfg_cls(**kwargs))


def random_host_params(model: Model, seed: int = 0):
    """Host-side (numpy) params of the registry's shapes — no device work.

    For measurement tooling that must not perform a device->host bulk fetch
    before a timed window (PERF.md #6: it degrades every subsequent dispatch
    in the process to ~RTT). Graph timing is value-independent, so N(0,0.1)
    weights with identity BN are as good as real init — NOT for training."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = {}
    for name, spec in model.registry.specs.items():
        if spec.kind in ("bn_w", "bn_rv"):
            out[name] = np.ones(spec.shape, np.float32)
        elif spec.kind in ("bn_b", "bn_rm"):
            out[name] = np.zeros(spec.shape, np.float32)
        else:
            out[name] = rng.standard_normal(spec.shape).astype(np.float32) * 0.1
    return out
