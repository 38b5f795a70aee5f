"""Lane-packed (space-to-depth) ROBO-UNet inference graph.

Why this exists (measured on TPU v5e, VGA batch-1 bf16):

The straightforward NHWC graph keeps tensors like (1, 480, 640, 8) alive at
the top of the U-Net. XLA:TPU lays the channel (minor) dimension out in
128-wide lanes, so an 8-channel buffer occupies 16x its logical bytes
(bf16[480,8,82,8]{..:T(8,128)} = 86.5 MB for a 4.9 MB tensor), and the
profiler shows ~1.0 ms/frame of pure layout-copy ops between fusions at
these shapes — the graph is bound by padded-HBM traffic, not FLOPs
(cost_analysis: 1.75 GB accessed/frame ~= the entire 2.2 ms latency at HBM
speed).

The fix is an *exact* graph rewrite: trade spatial resolution for channels
(space-to-depth) until every tensor fills the 128 lanes. Each original conv
becomes a conv on the packed grid whose kernel entries are a scatter of the
original weights (no arithmetic change beyond float reassociation):

    for output phase (qy, qx) and original tap (dy, dx):
        r = stride*q + d - k//2          (plain conv; packed-res preserving
                                          requires f_in == stride * f_out)
        r = (q + d - 1) / 2 if even      (k3/s2/p1/op1 tconv, pre-flipped
                                          kernel; f_out == 2 * f_in)
        packed tap  DY = r // f_in,  input phase  py = r %% f_in

Per-channel vectors (bias, folded BN scale/shift) tile across phases.
Packing factors by resolution level: 4 at full input resolution, 2 at half,
1 below — so a VGA graph runs entirely at 120x160 with 32..256 channels and
a QVGA graph at 30x40. Every tensor that used to be 480-res (C=8 or 5,
16-25x lane waste) becomes (120,160,{48,64,80,128}).

This is the TPU-native analog of the reference's deployment step (the
hand-written C++ engine consuming net.cfg, paramSave.py:5-18): an
inference-only compilation of the trained model. Training and the canonical
``zoo.robo_unet_apply`` semantics are untouched; per-pixel equivalence is
pinned by tests/test_packed_infer.py.

Measured (BENCH/PERF.md): VGA b1 2.24 ms -> ~0.4 ms (bf16).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import layers as L
from robocupvision_tpu.models.zoo import Model, RoboUNetCfg
from robocupvision_tpu.ops import nn

Params = Dict[str, jax.Array]

_BN_EPS = 1e-5


def space_to_depth(x: jax.Array, f: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/f, W/f, f*f*C), packed channel (py*f+px)*C + c."""
    if f == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    if f == 1:
        return x
    n, hp, wp, cp = x.shape
    c = cp // (f * f)
    x = x.reshape(n, hp, wp, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hp * f, wp * f, c)


def pack_conv_weight(w: np.ndarray, f_in: int, f_out: int, stride: int = 1,
                     transpose: bool = False) -> np.ndarray:
    """Scatter an HWIO kernel into its packed-grid equivalent.

    Plain conv: k in {1, 3}, torch padding k//2, requires
    f_in == stride * f_out (the packed spatial resolution is preserved).
    Transpose conv: the zoo's only config (k3, s2, p1, op1, pre-flipped
    kernel as used by nn.conv_transpose2d), requires f_out == 2 * f_in.
    Returns a (K, K, f_in^2*cin, f_out^2*cout) kernel for a packed conv with
    padding K//2 where K = 3 (K = 1 for 1x1 convs).
    """
    kh, kw, cin, cout = w.shape
    assert kh == kw and kh in (1, 3), w.shape
    if transpose:
        assert kh == 3 and f_out == 2 * f_in, (f_in, f_out)
    else:
        assert f_in == stride * f_out, (f_in, f_out, stride)
    K = 1 if (kh == 1 and f_in == f_out) else 3
    wp = np.zeros((K, K, f_in * f_in * cin, f_out * f_out * cout), w.dtype)

    def tap(q, d):
        """-> (packed tap offset, input phase) or None for a zero tap."""
        if transpose:
            num = q + d - 1  # z-index offset; z[2t] = in[t], odd = 0
            if num % 2:
                return None
            r = num // 2
        else:
            r = stride * q + d - kh // 2
        return r // f_in, r % f_in

    for qy in range(f_out):
        for qx in range(f_out):
            for dy in range(kh):
                for dx in range(kw):
                    ty, tx = tap(qy, dy), tap(qx, dx)
                    if ty is None or tx is None:
                        continue
                    (DY, py), (DX, px) = ty, tx
                    assert -1 <= DY <= 1 and -1 <= DX <= 1
                    ci0 = (py * f_in + px) * cin
                    co0 = (qy * f_out + qx) * cout
                    wp[DY + K // 2, DX + K // 2,
                       ci0:ci0 + cin, co0:co0 + cout] = w[dy, dx]
    return wp


def pack_stem_weight_grouped(w: np.ndarray, f: int = 4) -> np.ndarray:
    """Fold space-to-depth(f) into the stem conv, grouped-input form.

    The raw (N, H, W, 3) image is viewed as (N, H, W/f, f*3) — a free dense
    reshape — so the stem conv reads 12 lanes instead of 3 and no transpose
    op is ever materialized (the s2d reshape was the single most expensive
    op in the first packed graph: 165 us/frame). Returns a
    (f+2, 3, f*cin, f^2*cout) kernel such that
    ``conv2d(x.reshape(N, H, W//f, f*cin), W', stride=(f, 1), padding=1)``
    equals the packed Level0 output. Column tap g covers the previous /
    own / next f-pixel group; unused positions hold zeros.
    """
    kh, kw, cin, cout = w.shape
    assert kh == kw == 3, w.shape
    wp = np.zeros((f + 2, 3, f * cin, f * f * cout), w.dtype)
    for qy in range(f):
        for qx in range(f):
            for dy in range(3):
                for dx in range(3):
                    e = qx + dx - 1
                    g = 1 + (e // f)          # group tap: prev/own/next
                    px = e % f                # pixel within that group
                    wp[qy + dy, g, px * cin:(px + 1) * cin,
                       (qy * f + qx) * cout:(qy * f + qx + 1) * cout] = w[dy, dx]
    return wp


def _f_at(res_level: int) -> int:
    """Packing factor at a resolution level (0 = full input resolution)."""
    return {0: 4, 1: 2}.get(res_level, 1)


def _fold_bn(params: Params, name: str):
    """Inference BN as a single affine: scale = g/sqrt(rv+eps),
    shift = b - rm*scale."""
    g = np.asarray(params[name + ".weight"], np.float32)
    b = np.asarray(params[name + ".bias"], np.float32)
    rm = np.asarray(params[name + ".running_mean"], np.float32)
    rv = np.asarray(params[name + ".running_var"], np.float32)
    scale = g / np.sqrt(rv + _BN_EPS)
    return scale, b - rm * scale


@dataclasses.dataclass
class PackedInfer:
    """Compiled-for-inference ROBO-UNet. Call .infer(x) / .logits(x)."""

    cfg: RoboUNetCfg
    packed: Params       # packed/tiled tensors for the top of the net
    plain: Params        # original params (mid/low levels), cast to dtype
    dtype: jnp.dtype

    def logits(self, x: jax.Array) -> jax.Array:
        """(N, H, W, 3) image -> (N, H, W, num_classes) logits; exact
        (up to float reassociation) match of zoo.robo_unet_apply."""
        lp = self._logits_packed(x)
        return depth_to_space(lp, 4)

    def infer(self, x: jax.Array) -> jax.Array:
        """(N, H, W, 3) image -> (N, H, W) int32 label map. The argmax runs
        in the packed domain (per-phase over num_classes) so no wide-lane
        480-res buffer is ever materialized."""
        lp = self._logits_packed(x)
        n, hp, wp, _ = lp.shape
        lab = jnp.argmax(lp.reshape(n, hp, wp, 16, self.cfg.num_classes),
                         axis=-1).astype(jnp.int32)
        return depth_to_space(lab, 4)[..., 0]  # 16 phases == f^2 * (C=1)

    def infer_u8(self, x: jax.Array) -> jax.Array:
        """Like :meth:`infer` but uint8 labels (num_classes < 256): 4x fewer
        device->host bytes — the readback is a real part of serving latency
        (a VGA int32 map is 1.2 MB/frame; the robot consumes uint8 anyway,
        cf. the engine's uint8 label maps)."""
        return self.infer(x).astype(jnp.uint8)

    # -- internals ----------------------------------------------------------

    def _pblock(self, name: str, x: jax.Array, relu_before_bn: bool) -> jax.Array:
        """Packed conv + bias + (ReLU/BN in reference order)."""
        pp = self.packed
        w = pp[name + ".w"]
        y = nn.conv2d(x, w, pp[name + ".b"], padding=int(w.shape[0]) // 2)
        scale, shift = pp[name + ".scale"], pp[name + ".shift"]
        if relu_before_bn:  # conv_block: conv -> ReLU -> BN (model.py:116)
            return nn.relu(y) * scale + shift
        return nn.relu(y * scale + shift)  # up_tconv: tconv -> BN -> ReLU

    def _logits_packed(self, x: jax.Array) -> jax.Array:
        cfg, p = self.cfg, self.plain
        D = cfg.eff_depth
        mut: Params = {}
        x = x.astype(self.dtype)

        feats = {}
        # stem: s2d(4) folded into a (6,3)/stride-(4,1) conv on the grouped
        # input view (N, H, W/4, 12) — a free dense reshape; reads 12 lanes
        # instead of 3 (measured: 0.71 -> 0.56 ms full-graph vs the
        # stride-4 6x6 form)
        pp = self.packed
        name = "downPart.Level0.layers.Conv0"
        n, H, W, c = x.shape
        xg = x.reshape(n, H, W // 4, 4 * c)
        y = nn.conv2d(xg, pp[name + ".w"], pp[name + ".b"],
                      stride=(4, 1), padding=1)
        h = nn.relu(y) * pp[name + ".scale"] + pp[name + ".shift"]
        feats[0] = h
        h = self._pblock("downPart.Level1.layers.Conv0", h, True)
        h = self._pblock("downPart.Level1.layers.Conv1", h, True)
        feats[1] = h
        h = self._pblock("downPart.Level2.layers.Conv0", h, True)
        h = L.conv_block(p, mut, "downPart.Level2.layers.Conv1", h, 1, 3, False)
        feats[2] = h
        for i in range(3, D):
            h = L.level_down(p, mut, f"downPart.Level{i}", h, cfg.levels,
                             True, False, False)
            feats[i] = h
        h2 = L.level_down(p, mut, "PB.PB_1", h, cfg.belly_size - 1, False,
                          False, False)
        up = L.level_down(p, mut, "PB.PB_2", h2, 1, False, False, False)

        for j in range(D - 1):
            r = D - 2 - j  # output resolution level of this up stage
            if _f_at(r) == 1:
                up = L.up_tconv(p, mut, f"upPart.Up{j}", up, False) + feats[r]
            else:
                up = self._pblock(f"upPart.Up{j}", up, False) + feats[r]

        w = self.packed["segmenter.w"]
        return nn.conv2d(up, w, self.packed["segmenter.b"], padding=0)


# ---- packed TRAINING graph --------------------------------------------------
#
# The same exact rewrite, made differentiable: packed kernels are a *gather*
# of the original weights (each packed position reads one original weight or
# a structural zero), built inside the jitted step, so autodiff scatter-adds
# gradients back onto the original parameter tensors and the TrainState /
# checkpoints / optimizer / pruning masks stay in the canonical format.
# BatchNorm runs in true training mode with phase-grouped statistics: the
# packed activation (N, Hp, Wp, f^2*C) is viewed as (N, Hp, Wp, f^2, C) and
# nn.batch_norm reduces over every axis but the last — per *original*
# channel, over the identical set of values as the unpacked graph, so batch
# stats, normalization and running-stat updates are all exact (up to float
# reassociation). See tests/test_packed_infer.py::test_packed_train_step_*.


def _gather_index_map(shape, packer) -> np.ndarray:
    """Index map: packed kernel position -> flat original-weight index, with
    ``prod(shape)`` as the structural-zero sentinel (one zero is appended to
    the flattened weight at gather time)."""
    n = int(np.prod(shape))
    ids = np.arange(1, n + 1, dtype=np.int64).reshape(shape)
    packed = packer(ids)
    idx = packed - 1
    return np.where(idx < 0, n, idx).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class PackMaps:
    """Gather maps + tile factors for the packed-training forward."""

    cfg: RoboUNetCfg
    idx: Dict[str, np.ndarray]    # conv name -> packed-kernel gather map
    tile: Dict[str, int]          # conv name -> f_out^2 per-channel tiling


def build_train_pack_maps(model: Model) -> PackMaps:
    """Precompute (once, host-side) the gather maps for a ROBO-UNet config.

    Same supported family as build_packed_infer: pool=False, v2=False,
    levels=2, belly_size>0, class_size=1, eff_depth>=4."""
    cfg = model.cfg
    assert isinstance(cfg, RoboUNetCfg), "packed training is ROBO-UNet only"
    assert not cfg.pool and not cfg.v2, "pool/v2 variants not packed (yet)"
    assert cfg.levels == 2 and cfg.belly_size > 0 and cfg.class_size == 1
    assert cfg.eff_depth >= 4

    shapes = {k: s.shape for k, s in model.registry.specs.items()}
    idx: Dict[str, np.ndarray] = {}
    tile: Dict[str, int] = {}

    def add(name, packer, f_out):
        idx[name] = _gather_index_map(shapes[name + ".conv.weight"], packer)
        tile[name] = f_out * f_out

    add("downPart.Level0.layers.Conv0",
        lambda w: pack_stem_weight_grouped(w, 4), 4)
    add("downPart.Level1.layers.Conv0",
        lambda w: pack_conv_weight(w, 4, 2, 2), 2)
    add("downPart.Level1.layers.Conv1",
        lambda w: pack_conv_weight(w, 2, 2, 1), 2)
    add("downPart.Level2.layers.Conv0",
        lambda w: pack_conv_weight(w, 2, 1, 2), 1)
    D = cfg.eff_depth
    for j in range(D - 1):
        r = D - 2 - j
        if _f_at(r) > 1:
            add(f"upPart.Up{j}",
                lambda w, fi=_f_at(r + 1), fo=_f_at(r):
                    pack_conv_weight(w, fi, fo, transpose=True), _f_at(r))
    name = "segmenter.layers.Class"
    idx[name] = _gather_index_map(shapes[name + ".weight"],
                                  lambda w: pack_conv_weight(w, 4, 4, 1))
    tile[name] = 16
    return PackMaps(cfg, idx, tile)


def _gather_weight(p: Params, wname: str, idx: np.ndarray) -> jax.Array:
    w = p[wname]
    flat = jnp.concatenate([w.reshape(-1), jnp.zeros((1,), w.dtype)])
    return flat[idx]


def _packed_bn(p: Params, mut: Params, name: str, x: jax.Array, t: int,
               train: bool) -> jax.Array:
    """BatchNorm over the packed layout with per-original-channel stats."""
    n, hp, wp, cp = x.shape
    c = cp // t
    y = L.bn(p, mut, name, x.reshape(n, hp, wp, t, c), train)
    return y.reshape(n, hp, wp, cp)


def _pconv_block(maps: PackMaps, p, mut, name, x, train: bool) -> jax.Array:
    """Packed conv_block: conv -> ReLU -> BN (reference model.py:116)."""
    w = _gather_weight(p, name + ".conv.weight", maps.idx[name])
    t = maps.tile[name]
    y = nn.conv2d(x, w, jnp.tile(p[name + ".conv.bias"], t),
                  padding=int(w.shape[0]) // 2)
    return _packed_bn(p, mut, name + ".bn", nn.relu(y), t, train)


def _ptconv_block(maps: PackMaps, p, mut, name, x, train: bool) -> jax.Array:
    """Packed up_tconv: tconv -> BN -> ReLU."""
    w = _gather_weight(p, name + ".conv.weight", maps.idx[name])
    t = maps.tile[name]
    y = nn.conv2d(x, w, jnp.tile(p[name + ".conv.bias"], t),
                  padding=int(w.shape[0]) // 2)
    return nn.relu(_packed_bn(p, mut, name + ".bn", y, t, train))


def pack_targets(targets: jax.Array) -> jax.Array:
    """(N, H, W) int labels -> (N, H/4, W/4, 16) packed labels. Pixel-set
    preserving, so CE/metrics over the packed layout are exact."""
    return space_to_depth(targets[..., None], 4)


def packed_train_apply(maps: PackMaps, p: Params, x: jax.Array, *,
                       train: bool = True,
                       rng: Optional[jax.Array] = None):
    """Packed forward with live params + training-mode BN.

    Returns ((N, H/4, W/4, 16, num_classes) logits, mut). Exact rewrite of
    zoo.robo_unet_apply up to float reassociation; pair with pack_targets.
    ``rng`` is accepted for apply-signature parity (the segmentation head has
    no dropout — reference model.py:410 pool=False path)."""
    cfg = maps.cfg
    D = cfg.eff_depth
    mut: Params = {}
    n, H, W, c = x.shape
    assert H % 8 == 0 and W % 8 == 0, (H, W)

    feats = {}
    name = "downPart.Level0.layers.Conv0"
    xg = x.reshape(n, H, W // 4, 4 * c)
    y = nn.conv2d(xg, _gather_weight(p, name + ".conv.weight", maps.idx[name]),
                  jnp.tile(p[name + ".conv.bias"], 16), stride=(4, 1),
                  padding=1)
    h = _packed_bn(p, mut, name + ".bn", nn.relu(y), 16, train)
    feats[0] = h
    h = _pconv_block(maps, p, mut, "downPart.Level1.layers.Conv0", h, train)
    h = _pconv_block(maps, p, mut, "downPart.Level1.layers.Conv1", h, train)
    feats[1] = h
    h = _pconv_block(maps, p, mut, "downPart.Level2.layers.Conv0", h, train)
    h = L.conv_block(p, mut, "downPart.Level2.layers.Conv1", h, 1, 3, train)
    feats[2] = h
    for i in range(3, D):
        h = L.level_down(p, mut, f"downPart.Level{i}", h, cfg.levels,
                         True, False, train)
        feats[i] = h
    h2 = L.level_down(p, mut, "PB.PB_1", h, cfg.belly_size - 1, False,
                      False, train)
    up = L.level_down(p, mut, "PB.PB_2", h2, 1, False, False, train)

    for j in range(D - 1):
        r = D - 2 - j
        if _f_at(r) == 1:
            up = L.up_tconv(p, mut, f"upPart.Up{j}", up, train) + feats[r]
        else:
            up = _ptconv_block(maps, p, mut, f"upPart.Up{j}", up, train) \
                + feats[r]

    name = "segmenter.layers.Class"
    w = _gather_weight(p, name + ".weight", maps.idx[name])
    logits = nn.conv2d(up, w, jnp.tile(p[name + ".bias"], 16), padding=0)
    nl, hp, wp, _ = logits.shape
    return logits.reshape(nl, hp, wp, 16, cfg.num_classes), mut


def build_packed_infer(model: Model, params: Params,
                       dtype: jnp.dtype = jnp.bfloat16) -> PackedInfer:
    """Compile a trained ROBO-UNet for TPU inference (exact rewrite).

    Supports the train.py/tester.py flagship family: pool=False (strided
    convs), additive skips (v2=False), levels=2, belly_size>0, class_size=1.
    """
    cfg = model.cfg
    assert isinstance(cfg, RoboUNetCfg), "packed inference is ROBO-UNet only"
    assert not cfg.pool and not cfg.v2, "pool/v2 variants not packed (yet)"
    assert cfg.levels == 2 and cfg.belly_size > 0 and cfg.class_size == 1
    assert cfg.eff_depth >= 4

    np_params = {k: np.asarray(v) for k, v in params.items()}
    packed: Dict[str, jax.Array] = {}

    def put(key, arr):
        packed[key] = jnp.asarray(arr, dtype)

    def conv_block(name, f_in, f_out, stride):
        put(name + ".w", pack_conv_weight(np_params[name + ".conv.weight"],
                                          f_in, f_out, stride))
        t = f_out * f_out
        put(name + ".b", np.tile(np_params[name + ".conv.bias"], t))
        scale, shift = _fold_bn(np_params, name + ".bn")
        put(name + ".scale", np.tile(scale, t))
        put(name + ".shift", np.tile(shift, t))

    def tconv_block(name, f_in, f_out):
        put(name + ".w", pack_conv_weight(np_params[name + ".conv.weight"],
                                          f_in, f_out, transpose=True))
        t = f_out * f_out
        put(name + ".b", np.tile(np_params[name + ".conv.bias"], t))
        scale, shift = _fold_bn(np_params, name + ".bn")
        put(name + ".scale", np.tile(scale, t))
        put(name + ".shift", np.tile(shift, t))

    D = cfg.eff_depth
    name = "downPart.Level0.layers.Conv0"
    put(name + ".w",
        pack_stem_weight_grouped(np_params[name + ".conv.weight"], 4))
    put(name + ".b", np.tile(np_params[name + ".conv.bias"], 16))
    scale, shift = _fold_bn(np_params, name + ".bn")
    put(name + ".scale", np.tile(scale, 16))
    put(name + ".shift", np.tile(shift, 16))
    conv_block("downPart.Level1.layers.Conv0", 4, 2, 2)
    conv_block("downPart.Level1.layers.Conv1", 2, 2, 1)
    conv_block("downPart.Level2.layers.Conv0", 2, 1, 2)
    for j in range(D - 1):
        r = D - 2 - j
        if _f_at(r) > 1:
            tconv_block(f"upPart.Up{j}", _f_at(r + 1), _f_at(r))
    name = "segmenter.layers.Class"
    put("segmenter.w", pack_conv_weight(np_params[name + ".weight"], 4, 4, 1))
    put("segmenter.b", np.tile(np_params[name + ".bias"], 16))

    plain = {k: jnp.asarray(v, dtype) for k, v in np_params.items()}
    return PackedInfer(cfg, packed, plain, dtype)
