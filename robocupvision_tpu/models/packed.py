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
import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from robocupvision_tpu.models import layers as L
from robocupvision_tpu.models.zoo import (LabelPropCfg, Model, PBFCN2Cfg,
                                          PBFCNCfg, RoboUNetCfg)
from robocupvision_tpu.ops import nn
from robocupvision_tpu.ops.color import raw_camera_preprocess

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


def packed_max_pool(x: jax.Array, f_in: int) -> jax.Array:
    """2x2/s2 max pool on a packed tensor (vanilla-UNet mode): each packed
    cell holds f_in x f_in original pixels, so the pooled cell's
    (f_in/2)^2 outputs are each the max of a 2x2 block INSIDE the same cell
    — a pure lane op, no spatial communication. Output packing f_in/2."""
    assert f_in in (2, 4), f_in
    n, hp, wp, cp = x.shape
    fo = f_in // 2
    c = cp // (f_in * f_in)
    x = x.reshape(n, hp, wp, fo, 2, fo, 2, c)
    x = jnp.max(jnp.max(x, axis=6), axis=4)
    return x.reshape(n, hp, wp, fo * fo * c)


# NOTE on concat skips (v2) and the LabelProp channel-slice skip: a packed
# concat would need a phase-major (..., f^2, C) reshape pair that XLA:TPU
# materializes as padded relayout copies (measured: the v2 VGA graph dropped
# to 40 fps). The packed graphs therefore never materialize a concat —
# conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]),
# so the CONSUMING conv's packed weight is split instead (``split2`` blocks,
# _conv_packed), and the slice-add folds into a split classifier head.


def pack_conv_weight(w: np.ndarray, f_in: int, f_out: int, stride: int = 1,
                     transpose: bool = False, dilation: int = 1) -> np.ndarray:
    """Scatter an HWIO kernel into its packed-grid equivalent.

    Plain conv: k in {1, 3}, torch padding dilation*(k//2), requires
    f_in == stride * f_out (the packed spatial resolution is preserved) and
    dilation <= f_in (so every dilated tap stays within one packed-cell
    neighborhood).
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
        assert dilation in (1,) or dilation <= f_in, (dilation, f_in)
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
            r = stride * q + dilation * (d - kh // 2)
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


def pack_stem_weight_grouped(w: np.ndarray, f: int = 4,
                             group: Optional[int] = None) -> np.ndarray:
    """Fold space-to-depth(f) into the stem conv, grouped-input form.

    The raw (N, H, W, cin) image is viewed as (N, H, W/group, group*cin) —
    a free dense reshape — so the stem conv reads group*cin lanes instead
    of cin and no transpose op is ever materialized (the s2d reshape was
    the single most expensive op in the first packed graph: 165 us/frame).

    ``group`` (a multiple of f, default f) trades nominal FLOPs for lane
    density: the (8,128)-tiled input buffer pads group*cin lanes to 128, so
    wider groups shrink the padded input bytes ~linearly, while the dense
    kernel covers 3 groups and so grows MACs ~linearly. Measured on v5e:
    group=f WINS everywhere (flagship VGA 1815 vs 1700 fps at group 8-32;
    LabelProp 4060 vs 3368 at group 16) — the emitter's wide-kernel cost
    exceeds the padded-byte saving. The knob stays (correctness pinned for
    group in {4,8,16}) as the measured record.

    Returns a (f+2, 3, group*cin, (group/f)*f^2*cout) kernel such that
    ``conv2d(x.reshape(N, H, W//group, group*cin), W', stride=(f, 1),
    padding=1).reshape(N, H/f, W/f, f*f*cout)`` — the output reshape is
    contiguous, hence free — equals the packed Level0 output. Column tap g
    covers the previous / own / next pixel group; unused positions hold
    zeros.
    """
    kh, kw, cin, cout = w.shape
    assert kh == kw == 3, w.shape
    group = f if group is None else group
    assert group % f == 0, (group, f)
    cells = group // f
    wp = np.zeros((f + 2, 3, group * cin, cells * f * f * cout), w.dtype)
    for cell in range(cells):
        for qy in range(f):
            for qx in range(f):
                for dy in range(3):
                    for dx in range(3):
                        e = cell * f + qx + dx - 1  # pixel within group
                        g = 1 + (e // group)        # group tap: prev/own/next
                        p = e % group
                        co0 = (cell * f * f + qy * f + qx) * cout
                        wp[qy + dy, g, p * cin:(p + 1) * cin,
                           co0:co0 + cout] = w[dy, dx]
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


@dataclasses.dataclass(frozen=True)
class _Blk:
    """One block of a packed inference plan.

    kind: "stem"  — first conv with space-to-depth folded into a grouped-
                    input (f+2, 3) kernel over the free (N, H, W/f, f*cin)
                    reshape (no transpose op materialized);
          "pconv" — conv(+BN affine) on the packed grid (plain conv_block /
                    conv_pool_simple when f_in == f_out == 1);
          "ptconv"— k3/s2/p1/op1 transpose conv (plain up_tconv at f_out 1);
          "pool"  — 2x2/s2 max pool (packed_max_pool when f_in > 1);
          "head"  — bias-only classifier conv (no BN).
    rbb: conv -> ReLU -> BN (the reference conv_block quirk, model.py:116)
         vs conv -> BN -> ReLU (ConvPoolSimple / upSampleTransposeConv).
    pad/dil apply to the f==1 plain fallback only (packed taps encode them).
    """

    kind: str
    name: str = ""
    f_in: int = 1
    f_out: int = 1
    stride: int = 1
    rbb: bool = True
    k: int = 3
    pad: int = 1
    dil: int = 1
    # split2: this block consumes a 2-part concat (v2 skips) that is NEVER
    # materialized — the packed weight is split into .w0/.w1 halves applied
    # to the parts and summed (see the concat note above)
    split2: bool = False
    # stem blocks: input-group width in pixels (0 = f_out); wider groups
    # trade nominal FLOPs for lane density (pack_stem_weight_grouped)
    group: int = 0
    # param-key overrides for blocks whose conv/BN keys don't follow the
    # name+".conv"/name+".bn" convention (e.g. ConvPool's conv1/pool/bn)
    wkey: str = ""
    bnkey: str = ""

    @property
    def w_prefix(self) -> str:
        return self.wkey or self.name + ".conv"

    @property
    def bn_prefix(self) -> str:
        return self.bnkey or self.name + ".bn"


@dataclasses.dataclass(frozen=True)
class _Plan:
    downs: tuple     # per resolution level: tuple of _Blk
    ups: tuple       # one _Blk per up stage (skip combine handled by v2)
    head: _Blk
    v2: bool         # concat skips (packed_concat) instead of additive
    belly: bool      # PB.PB_1 / PB.PB_2 bottleneck between down and up


def _robo_unet_plan(cfg: RoboUNetCfg, stem_group: int = 0) -> _Plan:
    """Packed plan for the full ROBO-UNet family: flagship (strided convs,
    additive skips), --UNet (pool=True: maxpool downs), --v2 (concat skips,
    doubled up channels, 3x3 class head) — reference model.py:461-536."""
    D = cfg.eff_depth
    n0 = max(cfg.levels - 1, 1)          # conv blocks in Level0
    nI = max(cfg.levels - 1, 1) if cfg.pool else cfg.levels  # per Level i>=1

    downs = []
    f0 = _f_at(0)
    blks = [_Blk("stem", "downPart.Level0.layers.Conv0", f0, f0,
                 group=stem_group)]
    for i in range(1, n0):
        blks.append(_Blk("pconv", f"downPart.Level0.layers.Conv{i}", f0, f0))
    downs.append(tuple(blks))
    for lvl in range(1, D):
        f_in, f = _f_at(lvl - 1), _f_at(lvl)
        name = f"downPart.Level{lvl}"
        blks = []
        if cfg.pool:
            blks.append(_Blk("pool", f_in=f_in, f_out=f))
            blks.append(_Blk("pconv", f"{name}.layers.Conv0", f, f))
        else:
            blks.append(_Blk("pconv", f"{name}.layers.Conv0", f_in, f,
                             stride=2))
        for i in range(1, nI):
            blks.append(_Blk("pconv", f"{name}.layers.Conv{i}", f, f))
        downs.append(tuple(blks))

    ups = tuple(
        _Blk("ptconv", f"upPart.Up{j}", _f_at(D - 1 - j), _f_at(D - 2 - j),
             rbb=False, split2=cfg.v2 and j > 0 and _f_at(D - 1 - j) > 1)
        for j in range(D - 1))
    head = _Blk("head", "segmenter.layers.Class", 4, 4, k=cfg.class_size,
                pad=cfg.class_size // 2, split2=cfg.v2)
    return _Plan(tuple(downs), ups, head, cfg.v2, cfg.belly_size > 0)


class _PackedBase:
    """Shared interpreter for packed inference graphs."""

    # -- public api ---------------------------------------------------------

    def logits(self, x: jax.Array) -> jax.Array:
        """(N, H, W, Cin) input -> (N, H, W, num_classes) logits; exact
        (up to float reassociation) match of the zoo apply."""
        return depth_to_space(self._logits_packed(x), 4)

    def _labels_packed(self, x: jax.Array) -> jax.Array:
        """(N, H/4, W/4, 16) int32 per-phase labels. Chain (pallas) graphs
        fuse this argmax into the head stage's kernel
        (ops/pallas_packed.ChainStage.argmax_groups) — no separate XLA
        argmax fusion, and the head's HBM write shrinks from f^2*C logits
        to f^2 labels; the XLA packed path argmaxes the packed logits.
        ``pallas_argmax_head=False`` (builder knob) keeps the logits head
        + XLA argmax, as the on-chip ablation / Mosaic-support fallback."""
        ch = getattr(self, "chains", None)
        if ch is not None and ch.get("argmax_head", True):
            return self._logits_packed(x, argmax=True)
        lp = self._logits_packed(x)
        n, hp, wp, _ = lp.shape
        return jnp.argmax(lp.reshape(n, hp, wp, 16, self.cfg.num_classes),
                          axis=-1).astype(jnp.int32)

    def infer(self, x: jax.Array) -> jax.Array:
        """(N, H, W, Cin) input -> (N, H, W) int32 label map. The argmax
        runs in the packed domain (per-phase over num_classes) so no
        wide-lane full-res buffer is ever materialized. (The depth-to-space
        stays s32: a u8 variant measured SLOWER on v5e — 1672 vs 1808 fps —
        TPU sublane transposes handle 32-bit better than packed 8-bit.)"""
        lab = self._labels_packed(x)
        return depth_to_space(lab, 4)[..., 0]  # 16 phases == f^2 * (C=1)

    def infer_u8(self, x: jax.Array) -> jax.Array:
        """Like :meth:`infer` but uint8 labels (num_classes < 256): 4x fewer
        device->host bytes — the readback is a real part of serving latency
        (a VGA int32 map is 1.2 MB/frame; the robot consumes uint8 anyway,
        cf. the engine's uint8 label maps)."""
        return self.infer(x).astype(jnp.uint8)

    def infer_u8_io(self, x_u8: jax.Array) -> jax.Array:
        """Raw camera bytes in, label bytes out: (N, H, W, 3) uint8 RGB ->
        (N, H, W) uint8 labels. The legacy host preprocessing (/255, ToYUV,
        Normalize — reference transform.py:21-24) runs on device as one
        fused affine (ops/color.raw_camera_preprocess), so a serving host
        ships 1/4 the input wire bytes AND skips per-frame host math."""
        return self.infer_u8(raw_camera_preprocess(x_u8))

    def infer_u8_packed(self) -> Tuple:
        """Serving-optimal pair (device_fn, host_unpack): the device returns
        the (N, H/4, W/4, 16) packed uint8 labels — NO depth-to-space op on
        device at all (measured 1979 vs 1808 fps on v5e, the r2 profile's
        ~75 us d2s removed) — and ``host_unpack`` (pure numpy, ~0.1 ms/
        frame) rearranges the readback into the (N, H, W) map. Same bytes
        on the wire; removes the device-side label transpose entirely."""
        def device_fn(x):
            return self._labels_packed(x).astype(jnp.uint8)

        def host_unpack(packed_labels):
            a = np.asarray(packed_labels)
            n, hp, wp, _ = a.shape
            a = a.reshape(n, hp, wp, 4, 4)
            return np.ascontiguousarray(
                a.transpose(0, 1, 3, 2, 4)).reshape(n, hp * 4, wp * 4)

        return device_fn, host_unpack

    def infer_u4_packed(self) -> Tuple:
        """Half-wire serving pair (device_fn, host_unpack): like
        :meth:`infer_u8_packed` but the device packs TWO labels per byte
        (4 bits each — any num_classes <= 16 fits; this task has 5,
        reference transform.py:26-48), so the per-frame device->host label
        readback is half the bytes: 0.15 MB instead of 0.3 MB at VGA. On a
        bandwidth-limited serving transport (the ~40 MB/s axon tunnel;
        BASELINE.md's >30 fps/chip north star is measured over it) that's
        ~3.8 ms/frame of wire time back. The nibble pack is one shift+or on
        the (N, H/4, W/4, 16) packed labels — device cost is noise; the
        host unpack stays ~0.1 ms of numpy."""
        if self.cfg.num_classes > 16:
            raise ValueError("4-bit labels need num_classes <= 16")

        def device_fn(x):
            lab = self._labels_packed(x)  # (N, H/4, W/4, 16) int32
            return (lab[..., 0::2] | (lab[..., 1::2] << 4)) \
                .astype(jnp.uint8)        # (N, H/4, W/4, 8)

        def host_unpack(nibbles):
            a = np.asarray(nibbles)
            n, hp, wp, _ = a.shape
            out = np.empty((n, hp, wp, 16), np.uint8)
            out[..., 0::2] = a & 0xF
            out[..., 1::2] = a >> 4
            out = out.reshape(n, hp, wp, 4, 4)
            return np.ascontiguousarray(
                out.transpose(0, 1, 3, 2, 4)).reshape(n, hp * 4, wp * 4)

        return device_fn, host_unpack

    def _chain(self, tag: str, x, stages, skips=(), band=None):
        """One fused-region call: the Pallas kernel normally; the plain-XLA
        mirror when the chains dict carries a ``collect`` map (int8
        calibration — chain_reference appends each stage's max|input| to
        collect[tag]; :func:`quantize_int8` turns those into the static
        scales of an int8 serving graph)."""
        from robocupvision_tpu.ops import pallas_packed as ppk

        ch = self.chains
        col = ch.get("collect")
        if col is not None:
            return ppk.chain_reference(x, stages, skips=skips,
                                       collect=col.setdefault(tag, []),
                                       collect_pct=ch.get("collect_pct"))
        return ppk.fused_conv_chain(x, stages, skips=skips, band=band,
                                    interpret=ch["interpret"])

    # -- block interpreter --------------------------------------------------

    def _affine(self, key: str, y: jax.Array, rbb: bool) -> jax.Array:
        scale, shift = self.packed[key + ".scale"], self.packed[key + ".shift"]
        if rbb:  # conv_block: conv -> ReLU -> BN (model.py:116)
            return nn.relu(y) * scale + shift
        return nn.relu(y * scale + shift)  # ConvPoolSimple/up_tconv order

    def _conv_packed(self, key: str, x) -> jax.Array:
        """Packed conv; ``x`` may be a 2-tuple (an unmaterialized concat) —
        then the split .w0/.w1 halves are applied and summed."""
        pp = self.packed
        if isinstance(x, tuple):
            w0 = pp[key + ".w0"]
            pad = int(w0.shape[0]) // 2
            return nn.conv2d(x[0], w0, pp[key + ".b"], padding=pad) \
                + nn.conv2d(x[1], pp[key + ".w1"], padding=pad)
        w = pp[key + ".w"]
        return nn.conv2d(x, w, pp[key + ".b"], padding=int(w.shape[0]) // 2)

    def _blk(self, blk: _Blk, x, mut: Params) -> jax.Array:
        p = self.plain
        pp = self.packed
        if blk.kind == "pool":
            return packed_max_pool(x, blk.f_in) if blk.f_in > 1 \
                else nn.max_pool(x, 2, 2)
        if blk.kind == "stem":
            # s2d(f) folded into a (f+2, 3)/stride-(f, 1) conv on the grouped
            # input view (N, H, W/G, G*cin) — a free dense reshape; reads
            # G*cin lanes instead of cin (measured: 0.71 -> 0.56 ms
            # full-graph vs the stride-4 6x6 form at G=f; wider G shrinks
            # the padded-lane input further — pack_stem_weight_grouped)
            f = blk.f_out
            G = blk.group or f
            n, H, W, c = x.shape
            xg = x.reshape(n, H, W // G, G * c)
            y = nn.conv2d(xg, pp[blk.w_prefix + ".w"], pp[blk.w_prefix + ".b"],
                          stride=(f, 1), padding=1)
            y = self._affine(blk.w_prefix, y, blk.rbb)
            if G != f:  # (H/f, W/G, cells*f^2*cout) -> packed; contiguous
                n2, hp, wg, cg = y.shape
                y = y.reshape(n2, hp, wg * (G // f), cg // (G // f))
            return y
        if blk.kind == "head":
            return self._conv_packed(blk.name, x)
        if blk.kind == "ptconv":
            if blk.f_out == 1:
                return L.up_tconv(p, mut, blk.name, x, False)
            y = self._conv_packed(blk.w_prefix, x)
            return self._affine(blk.w_prefix, y, False)
        if blk.kind == "pconv_nr":  # conv + ReLU, no BN (ConvPool.conv1)
            return nn.relu(self._conv_packed(blk.w_prefix, x))
        assert blk.kind == "pconv", blk.kind
        if blk.f_in == 1 and blk.f_out == 1:
            if blk.rbb:
                return L.conv_block(p, mut, blk.name, x, blk.stride, blk.k,
                                    False)
            return L.conv_pool_simple(p, mut, blk.name, x, blk.stride,
                                      blk.pad, blk.dil, False)
        y = self._conv_packed(blk.w_prefix, x)
        return self._affine(blk.w_prefix, y, blk.rbb)


@dataclasses.dataclass
class PackedInfer(_PackedBase):
    """Compiled-for-inference ROBO-UNet. Call .infer(x) / .logits(x)."""

    cfg: RoboUNetCfg
    plan: _Plan
    packed: Params       # packed/tiled tensors for the top of the net
    plain: Params        # original params (mid/low levels), cast to dtype
    dtype: jnp.dtype
    # Pallas fused-region mode (build_packed_infer(pallas=True)): the top
    # region's conv chains run as two fused VMEM-resident kernels
    # (ops/pallas_packed.py) instead of separate XLA conv fusions
    chains: Optional[dict] = None

    def _logits_packed(self, x: jax.Array, argmax: bool = False) -> jax.Array:
        if self.chains is not None:
            return self._logits_packed_pallas(x, argmax)
        assert not argmax  # fused argmax is a chain-head epilogue
        cfg, p, plan = self.cfg, self.plain, self.plan
        mut: Params = {}
        h = x.astype(self.dtype)

        feats = {}
        for lvl, blks in enumerate(plan.downs):
            for blk in blks:
                h = self._blk(blk, h, mut)
            feats[lvl] = h
        if plan.belly:
            h = L.level_down(p, mut, "PB.PB_1", h, cfg.belly_size - 1, False,
                             False, False)
            h = L.level_down(p, mut, "PB.PB_2", h, 1, False, False, False)

        D = len(plan.downs)
        up = h
        for j, blk in enumerate(plan.ups):
            y = self._blk(blk, up, mut)
            skip = feats[D - 2 - j]
            if plan.v2:
                # concat skip — never materialized at f > 1: the consuming
                # split2 block applies .w0/.w1 to the parts (concat note)
                up = (y, skip) if blk.f_out > 1 else \
                    jnp.concatenate([y, skip], axis=-1)
            else:
                up = y + skip
        return self._blk(plan.head, up, mut)

    def _logits_packed_pallas(self, x: jax.Array,
                              argmax: bool = False) -> jax.Array:
        """Flagship plan with the two packed-grid conv regions fused into
        Pallas kernels: [L1C0, L1C1, L2C0, L2C1] after the stem and
        [Up(D-3)+skip, Up(D-2)+skip, head] before the output — the exact
        stages whose inter-fusion relayout copies dominate the XLA
        profile (PERF.md r3). ``argmax``: the head stage emits fused
        per-phase int32 labels (serving form) instead of logits."""
        from robocupvision_tpu.ops import pallas_packed as ppk

        cfg, p, plan = self.cfg, self.plain, self.plan
        ch = self.chains
        mut: Params = {}
        h = x.astype(self.dtype)
        feats = {}
        if ch["down"] is None:
            # deep per-level strided plans: downs stay on the XLA packed
            # path; the fused up-region chain still covers the full-res
            # half (--UNet pool downs DO chain: _pool_chain_stage)
            for lvl in range(3):
                for blk in plan.downs[lvl]:
                    h = self._blk(blk, h, mut)
                feats[lvl] = h
        elif ch["fold_stem"]:
            # the chain consumes the RAW image; stage 0 is the grouped
            # space-to-depth stem kernel and emits feats0 itself
            feats[0], feats[1], feats[2] = self._chain(
                "down", h, ch["down"], band=ch["band"])
        else:
            for blk in plan.downs[0]:
                h = self._blk(blk, h, mut)     # stem (XLA conv)
            feats[0] = h
            feats[1], feats[2] = self._chain(
                "down", h, ch["down"], band=ch["band"])
        h = feats[2]
        D = len(plan.downs)
        deep = ch.get("deep")
        for lvl in range(3, D):
            blks = plan.downs[lvl]
            if deep is not None and lvl == D - 1:
                # Level(D-1).Conv1 + the PB belly run as ONE single-band
                # chain on the deepest grid; only the strided Conv0 stays XLA
                h = self._blk(blks[0], h, mut)
                # band=None: the deepest grid is <= 32 rows at any deployed
                # resolution — one whole-image band, halo-free
                h = self._chain("deep", h, deep)[-1]
                break
            for blk in blks:
                h = self._blk(blk, h, mut)
            feats[lvl] = h
        if plan.belly and deep is None:
            h = L.level_down(p, mut, "PB.PB_1", h, cfg.belly_size - 1, False,
                             False, False)
            h = L.level_down(p, mut, "PB.PB_2", h, 1, False, False, False)
        up = h
        for j in range(D - 3):             # f==1 ups stay on the plain path
            y = self._blk(plan.ups[j], up, mut)
            skip = feats[D - 2 - j]
            # v2 concats at f==1 are materialized (cheap at plain lanes);
            # the chain's split2 stages consume the f>1 ones unmaterialized
            up = jnp.concatenate([y, skip], axis=-1) if plan.v2 else y + skip
        up_ch = ppk.with_argmax_head(ch["up"], 16) if argmax else ch["up"]
        out = self._chain("up", up, up_ch, skips=[feats[1], feats[0]],
                          band=ch["band"])
        return out[-1]


@dataclasses.dataclass
class PackedLabelPropInfer(_PackedBase):
    """Compiled-for-inference LabelProp net (reference model.py:538-567) —
    the worst lane-waste case in the repo (8/128 lanes at full resolution on
    the standard graph). Input: (N, H, W, 8) = [Y_t, Y_other, Y_t - Y_other,
    one-hot prev label]; exact rewrite of zoo.label_prop_apply."""

    cfg: LabelPropCfg
    packed: Params
    plain: Params
    dtype: jnp.dtype
    stem_group: int = 4    # wider groups measured slower on v5e (see
                           # pack_stem_weight_grouped docstring)
    chains: Optional[dict] = None   # Pallas fused regions (pallas=True)

    def _logits_packed(self, x: jax.Array, argmax: bool = False) -> jax.Array:
        p = self.plain
        mut: Params = {}
        h = x.astype(self.dtype)
        ch = self.chains
        assert not argmax or ch is not None  # fused argmax = chain head

        def cps(name, x, stride, padding, dilation):
            return L.conv_pool_simple(p, mut, name, x, stride, padding,
                                      dilation, False)

        if ch is not None and ch["fold_stem"]:
            top, middle, bottom = self._chain("down", h, ch["down"],
                                              band=ch["band"])
        else:
            top = self._blk(_Blk("stem", "pre", 4, 4, rbb=False,
                                 group=self.stem_group), h, mut)
            if ch is not None:
                middle, bottom = self._chain("down", top, ch["down"],
                                             band=ch["band"])
            else:
                middle = self._blk(_Blk("pconv", "down1", 4, 2, stride=2,
                                        rbb=False), top, mut)
                bottom = self._blk(_Blk("pconv", "down2", 2, 1, stride=2,
                                        rbb=False), middle, mut)
        h = cps("down3", bottom, 2, 1, 1)
        if ch is not None and ch.get("mid") is not None:
            # the dilated belly [conv1, conv2, conv3] as one chain on the
            # H/8 grid (fed by the XLA strided down3)
            h = self._chain("mid", h, ch["mid"])[-1]
        else:
            h = cps("conv3", cps("conv2", cps("conv1", h, 1, 2, 2), 1, 2, 2),
                    1, 2, 2)
        h = bottom + L.up_tconv(p, mut, "upConv1", h, False)
        if ch is not None:
            from robocupvision_tpu.ops import pallas_packed as ppk

            up_ch = ppk.with_argmax_head(ch["up"], 16) if argmax \
                else ch["up"]
            return self._chain("up", h, up_ch, skips=[middle, top],
                               band=ch["band"])[-1]
        h = middle + self._blk(_Blk("ptconv", "upConv2", 1, 2, rbb=False),
                               h, mut)
        h = self._blk(_Blk("ptconv", "upConv3", 2, 4, rbb=False), h, mut)
        # channel-slice skip x[:, :C_pre] += top (reference model.py:565),
        # folded into the 1x1 classifier instead of materialized:
        # conv(h + embed(top), W) == conv(h, W) + conv(top, W[:, :, :C_pre])
        return self._conv_packed("classifier", h) \
            + nn.conv2d(top, self.packed["classifier.wtop"], padding=0)


def _pb_fcn_blks(cfg: PBFCNCfg):
    """Packed blocks for the PB_FCN top (reference model.py:201-232,
    269-309). The stem is a dilated (d=2) ConvPoolSimple — handled as
    space-to-depth + a dilation-aware packed conv (pack_conv_weight taps
    r = q + dil*(d-1), valid for dil <= f). Deep levels (f=1) stay plain."""
    ups = []
    n_up = 4 if cfg.no_scale else 3
    for j in range(n_up):
        r = n_up - 1 - j  # output resolution level
        f_o = _f_at(r)
        ups.append(_Blk("ptconv", f"up{j + 1}", _f_at(r + 1), f_o, rbb=False))
    return [
        _Blk("pconv", "FCN.conv0", 4, 4, rbb=False, dil=2, pad=2),
        _Blk("pconv", "FCN.conv1", 4, 2, stride=2, rbb=False),
        _Blk("pconv_nr", "FCN.conv2", 2, 2, dil=2, wkey="FCN.conv2.conv1"),
        _Blk("pconv", "FCN.conv2", 2, 1, stride=2, rbb=False,
             wkey="FCN.conv2.pool", bnkey="FCN.conv2.bn"),
    ] + ups + [
        _Blk("head", "segmenter.classifier", 4, 4, k=cfg.kernel_size,
             pad=cfg.kernel_size // 2),
    ]


@dataclasses.dataclass
class PackedPBFCNInfer(_PackedBase):
    """Compiled-for-inference PB_FCN segmentation net (reference
    model.py:269-309 over the DownSampler encoder model.py:201-232) — the
    net tester.py latency-measures and exports. Exact rewrite of
    zoo.pb_fcn_apply (segment mode)."""

    cfg: PBFCNCfg
    packed: Params
    plain: Params
    dtype: jnp.dtype
    chains: Optional[dict] = None   # Pallas fused regions (pallas=True)

    def _logits_packed(self, x: jax.Array, argmax: bool = False) -> jax.Array:
        cfg, p = self.cfg, self.plain
        ch = self.chains
        assert not argmax or ch is not None  # fused argmax = chain head
        dc = ch.get("deep") if ch is not None else None
        mut: Params = {}
        blks = {b.kind + ":" + b.name: b for b in _pb_fcn_blks(cfg)}
        h = space_to_depth(x.astype(self.dtype), 4)

        def cps(name, x, stride, padding, dilation):
            return L.conv_pool_simple(p, mut, name, x, stride, padding,
                                      dilation, False)

        def pool_tail(name, y):
            # the stride-2 pool conv + BN tail of a ConvPool whose dilated
            # conv1 was absorbed into the preceding chain
            y = L.conv(p, name + ".pool", y, stride=2, padding=1)
            return nn.relu(L.bn(p, mut, name + ".bn", y, False))

        if ch is not None:
            outs = self._chain("down", h, ch["down"], band=ch["band"])
            x0, x1, x2 = outs[:3]
        else:
            x0 = self._blk(blks["pconv:FCN.conv0"], h, mut)
            x1 = self._blk(blks["pconv:FCN.conv1"], x0, mut)
            hh = self._blk(blks["pconv_nr:FCN.conv2"], x1, mut)
            x2 = self._blk(blks["pconv:FCN.conv2"], hh, mut)

        def deep(h):
            h = L.conv_pool(p, mut, "FCN.conv3", h, False)
            for i in range(4, 9):
                h = cps(f"FCN.conv{i}", h, 1, 2, 2)
            return h

        if dc is not None:
            # outs[3] is the dilated relu-only conv1 of the ConvPool that
            # FOLLOWS x2 (conv_ext when no_scale, conv3 otherwise)
            if cfg.no_scale:
                x3 = pool_tail("FCN.conv_ext", outs[3])
                y = L.conv_pool(p, mut, "FCN.conv3", x3, False)
            else:
                y = pool_tail("FCN.conv3", outs[3])
            y = self._chain("deep", y, dc)[-1]
            feats = [x0, x1, x2, x3, y] if cfg.no_scale else [x0, x1, x2, y]
        elif cfg.no_scale:
            x3 = L.conv_pool(p, mut, "FCN.conv_ext", x2, False)
            feats = [x0, x1, x2, x3, deep(x3)]
        else:
            feats = [x0, x1, x2, deep(x2)]

        up = feats[-1]
        n_up = len(feats) - 1
        if ch is not None:
            from robocupvision_tpu.ops import pallas_packed as ppk

            for j in range(n_up - 2):  # f==1 ups stay on the plain path
                up = self._blk(blks[f"ptconv:up{j + 1}"], up, mut) \
                    + feats[n_up - 1 - j]
            up_ch = ppk.with_argmax_head(ch["up"], 16) if argmax \
                else ch["up"]
            return self._chain("up", up, up_ch, skips=[x1, x0],
                               band=ch["band"])[-1]
        for j in range(n_up):
            blk = blks[f"ptconv:up{j + 1}"]
            up = self._blk(blk, up, mut) + feats[n_up - 1 - j]
        return self._blk(blks["head:segmenter.classifier"], up, mut)


# Per-family calibration defaults for quantize_int8(pct="auto"), set from
# the trained-net sweeps in tests/test_int8_families.py + test_slim.py::
# test_int8_agreement_on_trained_net (pct in {max, 99.9, 99.5} per family).
# max|act| calibration is the safe default for shallow chains; percentile
# clipping helps the deeper dilated stacks where one outlier activation
# stretches every quantization step of the stage.
INT8_PCT_DEFAULTS = {
    "robo_unet": 99.9,      # flagship: 0.9794 @99.9 vs 0.9746 @max (r4)
    "robo_unet_v2": 99.9,   # 0.9927 @99.9 vs 0.9925 @max (r5 sweep)
    "robo_unet_pool": None,
    "pb_fcn": 99.9,         # 0.9915 @99.9 vs 0.9855 @max, 0.9829 @99.5 (r5)
    "label_prop": None,     # 0.9987 @max = @99.9, 0.9933 @99.5 (r5)
}


def _int8_family_key(infer) -> str:
    if isinstance(infer, PackedLabelPropInfer):
        return "label_prop"
    if isinstance(infer, PackedPBFCNInfer):
        return "pb_fcn"
    cfg = infer.cfg
    if getattr(cfg, "pool", False):
        return "robo_unet_pool"
    return "robo_unet_v2" if getattr(cfg, "v2", False) else "robo_unet"


def quantize_int8(infer, calib_x: jax.Array, pct="auto"):
    """Static int8 post-training quantization of a Pallas chain graph
    (serving-only; beyond-reference capability — the v5e int8 MXU peak is
    2x bf16 and int8 scratch halves inter-stage VMEM bytes).

    ``calib_x`` is a batch of representative inputs (stack several frames
    along the leading axis for a better-conditioned calibration). ``pct``
    switches the per-stage scale statistic from max|activation| (pct=None)
    to the pct-th percentile of |activation| (percentile clipping: rare
    outliers saturate at +-127 instead of stretching every other value's
    quantization step — usually better for trained ReLU nets). The default
    ``pct="auto"`` resolves a per-family calibration default
    (INT8_PCT_DEFAULTS) from the trained-net sweeps in
    tests/test_int8_families.py.

    Runs ONE calibration pass of the plain-XLA chain mirror on ``calib_x``
    (representative inputs) to collect each chain stage's max|activation|,
    then rebuilds every chain with static per-stage input scales and
    symmetric per-out-channel int8 weights
    (ops/pallas_packed.quantize_chain_stages). The taps then accumulate
    s8 x s8 -> s32 on the MXU; bias/epilogue/skips stay f32. Approximate
    (unlike every other packed mode): exactness of the KERNEL vs the quant
    mirror is pinned per-pixel, label agreement vs the float graph is
    measured (tests + the on-chip probe's 'pallas_int8' rows).

    Accepts any Packed*Infer built with ``pallas=True``; returns a new
    instance (the input object is unchanged).
    """
    from robocupvision_tpu.ops import pallas_packed as ppk

    if isinstance(pct, str):
        assert pct == "auto", pct
        pct = INT8_PCT_DEFAULTS[_int8_family_key(infer)]
    ch = infer.chains
    assert ch is not None, "quantize_int8 needs a pallas chain graph"
    for tag in ("down", "mid", "deep", "up"):
        st = (ch.get(tag) or [None])[0]
        assert st is None or not st.x_scale, "already quantized"
    collect: dict = {}
    probe = dataclasses.replace(infer, chains={**ch, "collect": collect,
                                               "collect_pct": pct})
    probe._logits_packed(calib_x)   # plain-XLA mirror pass (see _chain)
    q = dict(ch)
    for tag in ("down", "mid", "deep", "up"):
        if q.get(tag):
            assert tag in collect, (tag, sorted(collect))
            q[tag] = ppk.quantize_chain_stages(q[tag], collect[tag])
    return dataclasses.replace(infer, chains=q)


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


def _pack_blocks(np_params: Params, blks, dtype) -> Params:
    """Pack + BN-fold the weights for every packed block of a plan."""
    packed: Dict[str, jax.Array] = {}

    def put(key, arr):
        packed[key] = jnp.asarray(arr, dtype)

    def put_w(blk, key, w, pack):
        """Store the packed kernel — split in half along ORIGINAL cin for
        split2 blocks (the unmaterialized-concat trick; a cin-slice of the
        original kernel packs to exactly the phase-major slice)."""
        if blk.split2:
            cin = w.shape[2]
            put(key + ".w0", pack(w[:, :, : cin // 2]))
            put(key + ".w1", pack(w[:, :, cin // 2:]))
        else:
            put(key + ".w", pack(w))

    def put_bias(blk, key, wname_prefix):
        t = blk.f_out * blk.f_out
        bias = np_params.get(wname_prefix + ".bias")
        if bias is None:  # bias=False conv (BN shift absorbs it)
            bias = np.zeros(np_params[wname_prefix + ".weight"].shape[-1],
                            np.float32)
        put(key + ".b", np.tile(bias, t))

    def put_affine(blk, key):
        t = blk.f_out * blk.f_out
        scale, shift = _fold_bn(np_params, blk.bn_prefix)
        put(key + ".scale", np.tile(scale, t))
        put(key + ".shift", np.tile(shift, t))

    for blk in blks:
        if blk.kind == "pool":
            continue
        if blk.kind == "head":
            w = np_params[blk.name + ".weight"]
            put_w(blk, blk.name, w,
                  lambda w: pack_conv_weight(w, blk.f_in, blk.f_out, 1))
            put(blk.name + ".b",
                np.tile(np_params[blk.name + ".bias"], blk.f_out * blk.f_out))
            continue
        if blk.kind == "stem":
            w = np_params[blk.w_prefix + ".weight"]
            G = blk.group or blk.f_out
            put(blk.w_prefix + ".w",
                pack_stem_weight_grouped(w, blk.f_out, G))
            t = (G // blk.f_out) * blk.f_out * blk.f_out
            bias = np_params.get(blk.w_prefix + ".bias")
            if bias is None:
                bias = np.zeros(w.shape[-1], np.float32)
            put(blk.w_prefix + ".b", np.tile(bias, t))
            scale, shift = _fold_bn(np_params, blk.bn_prefix)
            put(blk.w_prefix + ".scale", np.tile(scale, t))
            put(blk.w_prefix + ".shift", np.tile(shift, t))
            continue
        if blk.kind == "ptconv":
            if blk.f_out == 1:
                continue  # plain up_tconv path
            w = np_params[blk.w_prefix + ".weight"]
            put_w(blk, blk.w_prefix, w,
                  lambda w: pack_conv_weight(w, blk.f_in, blk.f_out,
                                             transpose=True))
            put_bias(blk, blk.w_prefix, blk.w_prefix)
            put_affine(blk, blk.w_prefix)
            continue
        assert blk.kind in ("pconv", "pconv_nr"), blk.kind
        if blk.f_in == 1 and blk.f_out == 1:
            continue  # plain conv_block / conv_pool_simple path
        w = np_params[blk.w_prefix + ".weight"]
        put_w(blk, blk.w_prefix, w,
              lambda w: pack_conv_weight(w, blk.f_in, blk.f_out, blk.stride,
                                         dilation=blk.dil))
        put_bias(blk, blk.w_prefix, blk.w_prefix)
        if blk.kind == "pconv":
            put_affine(blk, blk.w_prefix)
    return packed


def _plain_stage(np_params: Params, name: str, dtype, rbb: bool, **kw):
    """ChainStage for a plain (f==1) conv(+BN) block: eval-mode BN folded to
    the chain's affine form; bias-less convs get a zero bias."""
    from robocupvision_tpu.ops.pallas_packed import ChainStage

    w = np_params[name + ".conv.weight"]
    b = np_params.get(name + ".conv.bias")
    if b is None:
        b = np.zeros(w.shape[-1], np.float32)
    scale, shift = _fold_bn(np_params, name + ".bn")
    return ChainStage(w=jnp.asarray(w, dtype), b=b, scale=scale, shift=shift,
                      rbb=rbb, **kw)


def _packed_stage(packed: Params, prefix: str, **kw):
    """ChainStage from a packed-params block: the scatter-packed conv
    kernel + bias plus its folded-BN per-channel affine. Single lookup
    point for the packed key scheme (``<prefix>.{w,b,scale,shift}``) —
    every family's chain builder goes through here."""
    from robocupvision_tpu.ops.pallas_packed import ChainStage

    return ChainStage(w=packed[prefix + ".w"], b=packed[prefix + ".b"],
                      scale=packed[prefix + ".scale"],
                      shift=packed[prefix + ".shift"], **kw)


def _pool_chain_stage(f_in: int, c: int, dtype, **kw):
    """In-chain packed 2x2/s2 max pool: :func:`packed_max_pool`'s lane op as
    a ChainStage. Out lane (qy*fo+qx)*c + ch takes the max of the four input
    lanes ((2qy+ry)*f_in + (2qx+rx))*c + ch — expressed as four exact 0/1
    lane-selection matrices the kernel dots with and maxes over (the same
    Mosaic-safe selection-matmul trick as the fused argmax head; no
    minor-dim reshape). Bit-identical to packed_max_pool for any float
    dtype: a 0/1 dot is a value-preserving gather."""
    from robocupvision_tpu.ops.pallas_packed import ChainStage

    fo = f_in // 2
    cin, cout = f_in * f_in * c, fo * fo * c
    sel = np.zeros((1, 4, cin, cout), np.float32)
    eye = np.eye(c, dtype=np.float32)
    for t, (ry, rx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        for qy in range(fo):
            for qx in range(fo):
                src = ((2 * qy + ry) * f_in + (2 * qx + rx)) * c
                dst = (qy * fo + qx) * c
                sel[0, t, src:src + c, dst:dst + c] = eye
    return ChainStage(w=jnp.asarray(sel, dtype),
                      b=np.zeros(cout, np.float32), pool=True, **kw)


def _build_flagship_chains(cfg: RoboUNetCfg, packed: Params,
                           np_params: Params, dtype,
                           interpret: bool, band,
                           fold_stem: bool = False,
                           deep: bool = False) -> dict:
    """ChainStage lists for the flagship plan's two Pallas fused regions
    (ops/pallas_packed.py). Gated by build_packed_infer(pallas=True).
    ``fold_stem``: start the down chain at the RAW image with the grouped
    space-to-depth stem kernel as stage 0 (the chain then emits feats0
    itself and the XLA stem conv disappears entirely).
    ``deep``: also fuse the deepest-grid region — Level(D-1).Conv1 plus the
    whole PB belly, six consecutive s1/p1 conv_blocks on one (H/16, W/16)
    grid — as a third single-band chain."""
    from robocupvision_tpu.ops.pallas_packed import ChainStage

    D = cfg.eff_depth

    pk = functools.partial(_packed_stage, packed)

    def plain_block(name, **kw):
        return _plain_stage(np_params, name, dtype, rbb=True, **kw)

    nI = cfg.levels  # convs per down level (Conv0 strided + nI-1 preserving)
    if cfg.pool:
        # --UNet: maxpool downs are pure LANE ops on the packed grid
        # (packed_max_pool), in-chain as 4 lane-selection dots + max
        # (_pool_chain_stage) — every Level0-2 conv is grid-preserving, so
        # the whole down region fuses at ANY cfg.levels (the hyper-table
        # --UNet is levels=3: Level0 carries stem + Conv1, nI == levels-1)
        n0 = max(cfg.levels - 1, 1)   # Level0 convs (incl. stem)
        nP = max(cfg.levels - 1, 1)   # convs per Level i >= 1
        # pool input widths come from the consuming Conv0's packed cin
        c0 = int(np_params["downPart.Level1.layers.Conv0.conv.weight"].shape[2])
        c1 = int(np_params["downPart.Level2.layers.Conv0.conv.weight"].shape[2])
        down = [_pool_chain_stage(4, c0, dtype)]
        down += [pk(f"downPart.Level1.layers.Conv{i}.conv", rbb=True)
                 for i in range(nP)]
        down[-1] = dataclasses.replace(down[-1], emit=True)   # feats[1]
        down.append(_pool_chain_stage(2, c1, dtype))
        # Level2 runs at f == 1: plain conv_blocks
        down += [plain_block(f"downPart.Level2.layers.Conv{i}")
                 for i in range(nP)]
        down[-1] = dataclasses.replace(down[-1], emit=True)   # feats[2]
        if fold_stem:
            pre = [pk("downPart.Level0.layers.Conv0.conv", rbb=True,
                      stem_f=4)]
            pre += [pk(f"downPart.Level0.layers.Conv{i}.conv", rbb=True)
                    for i in range(1, n0)]
            pre[-1] = dataclasses.replace(pre[-1], emit=True)  # feats[0]
            down = pre + down
    elif cfg.levels not in (1, 2):
        # deep per-level conv runs (strided, off-hyper-table): the downs
        # stay on the XLA packed path and only the up region (the full-res
        # half of the graph) fuses
        down = None
    else:
        down = [pk(f"downPart.Level1.layers.Conv{i}.conv", rbb=True)
                for i in range(nI)]
        down[-1] = dataclasses.replace(down[-1], emit=True)   # feats[1]
        down.append(pk("downPart.Level2.layers.Conv0.conv", rbb=True))
        for i in range(1, nI):  # Level2 grid-preserving convs: plain (f==1)
            down.append(plain_block(f"downPart.Level2.layers.Conv{i}"))
        down[-1] = dataclasses.replace(down[-1], emit=True)   # feats[2]
        if fold_stem:
            down.insert(0, pk("downPart.Level0.layers.Conv0.conv", rbb=True,
                              emit=True, stem_f=4))
    if cfg.v2:
        # concat skips: the consuming stage applies its split halves — w0 to
        # the chain-internal tconv output, w1 to the skip (concat note in
        # models/packed.py); Up(D-3) consumes the MATERIALIZED f==1 concat
        # so its packed weight is whole
        up = [
            pk(f"upPart.Up{D - 3}.conv", rbb=False),
            ChainStage(w=packed[f"upPart.Up{D - 2}.conv.w0"],
                       b=packed[f"upPart.Up{D - 2}.conv.b"],
                       scale=packed[f"upPart.Up{D - 2}.conv.scale"],
                       shift=packed[f"upPart.Up{D - 2}.conv.shift"],
                       rbb=False, skip_idx=0,
                       skip_w=packed[f"upPart.Up{D - 2}.conv.w1"]),
            ChainStage(w=packed["segmenter.layers.Class.w0"],
                       b=packed["segmenter.layers.Class.b"], rbb=False,
                       skip_idx=1,
                       skip_w=packed["segmenter.layers.Class.w1"]),
        ]
    else:
        up = [
            pk(f"upPart.Up{D - 3}.conv", rbb=False, skip_idx=0),
            pk(f"upPart.Up{D - 2}.conv", rbb=False, skip_idx=1),
            ChainStage(w=packed["segmenter.layers.Class.w"],
                       b=packed["segmenter.layers.Class.b"], rbb=False),
        ]
    chains = {"down": down, "up": up, "interpret": interpret, "band": band,
              "fold_stem": fold_stem}
    if deep:
        # Level(D-1).Conv{1..nI-1} + PB_1.Conv0..Conv(belly_size-2) +
        # PB_2.Conv0: all stride-1 conv_blocks on the deepest grid (VGA
        # flagship: 30x40 x 128ch), fed by the XLA strided Level(D-1).Conv0
        names = [f"downPart.Level{D - 1}.layers.Conv{i}"
                 for i in range(1, nI)] \
            + [f"PB.PB_1.layers.Conv{i}"
               for i in range(max(cfg.belly_size - 1, 1))] \
            + ["PB.PB_2.layers.Conv0"]
        chains["deep"] = [plain_block(n) for n in names]
    return chains


def build_packed_infer(model: Model, params: Params,
                       dtype: jnp.dtype = jnp.bfloat16,
                       stem_group: int = 0, pallas: bool = False,
                       pallas_interpret: bool = False,
                       pallas_band: Optional[int] = None,
                       pallas_fold_stem: bool = False,
                       pallas_deep: bool = False,
                       pallas_argmax_head: bool = True) -> PackedInfer:
    """Compile a trained ROBO-UNet for TPU inference (exact rewrite).

    Supports the whole deployed ROBO-UNet family (reference model.py:461-536,
    train.py:302-307 hyper table): the flagship (strided convs, additive
    skips), --UNet (pool=True maxpool mode, belly_size 0), --v2 (concat
    skips, doubled up channels, 3x3 class head), any levels >= 1, QVGA and
    VGA (--noScale). Per-pixel equivalence pinned by tests/test_packed_infer.
    """
    cfg = model.cfg
    if isinstance(cfg, PBFCN2Cfg):
        # PB_FCN_2's segmentation graph (reference model.py:416-459) is
        # structurally the flagship plan: same block names, levels=2 Level0
        # with one conv, PB belly, additive-skip tconv ups, 1x1 segmenter —
        # only the unused classification head differs (stays in `plain`).
        assert not cfg.classify and cfg.levels == 2, cfg
        cfg = RoboUNetCfg(planes=cfg.planes, num_classes=cfg.num_classes,
                          depth=cfg.depth, levels=cfg.levels,
                          belly_size=cfg.belly_size,
                          belly_planes=cfg.belly_planes)
    assert isinstance(cfg, RoboUNetCfg), "use build_packed_label_prop etc."
    assert cfg.eff_depth >= 4
    # stem_group=0 (= f): wider groups measured SLOWER on v5e (see
    # pack_stem_weight_grouped's docstring for the sweep)
    plan = _robo_unet_plan(cfg, stem_group)

    np_params = {k: np.asarray(v) for k, v in params.items()}
    all_blks = [b for lvl in plan.downs for b in lvl] + list(plan.ups) \
        + [plan.head]
    packed = _pack_blocks(np_params, all_blks, dtype)
    plain = {k: jnp.asarray(v, dtype) for k, v in np_params.items()}
    chains = None
    if pallas:
        assert cfg.class_size in (1, 3), "class head kernels are 1x1/3x3"
        full_downs = cfg.pool or cfg.levels in (1, 2)
        assert not (pallas_fold_stem and not full_downs), \
            "fold_stem needs the fully-chained down region"
        assert not (pallas_deep and (cfg.pool or not full_downs
                                     or cfg.belly_size == 0)), \
            "the deep chain covers strided plans with a PB belly"
        assert not (pallas_fold_stem and stem_group not in (0, 4)), \
            "the folded stem uses the group == f kernel"
        chains = _build_flagship_chains(cfg, packed, np_params, dtype,
                                        pallas_interpret, pallas_band,
                                        pallas_fold_stem, pallas_deep)
        chains["argmax_head"] = pallas_argmax_head
    return PackedInfer(cfg, plan, packed, plain, dtype, chains)


def build_packed_label_prop(model: Model, params: Params,
                            dtype: jnp.dtype = jnp.bfloat16,
                            stem_group: int = 4, pallas: bool = False,
                            pallas_interpret: bool = False,
                            pallas_band: Optional[int] = None,
                            pallas_fold_stem: bool = False,
                            pallas_mid: bool = False,
                            pallas_argmax_head: bool = True
                            ) -> PackedLabelPropInfer:
    """Compile a trained LabelProp net for TPU inference (exact rewrite of
    zoo.label_prop_apply / reference model.py:538-567). The 8-channel
    full-resolution input is the repo's worst lane-waste case: the packed
    graph runs at 1/4 resolution with 128 input lanes."""
    cfg = model.cfg
    assert isinstance(cfg, LabelPropCfg), "packed LP is the LabelProp family"
    np_params = {k: np.asarray(v) for k, v in params.items()}
    if pallas_fold_stem:
        assert stem_group == 4, "the folded stem uses the group == f kernel"
    blks = [
        _Blk("stem", "pre", 4, 4, rbb=False, group=stem_group),
        _Blk("pconv", "down1", 4, 2, stride=2, rbb=False),
        _Blk("pconv", "down2", 2, 1, stride=2, rbb=False),
        _Blk("ptconv", "upConv2", 1, 2, rbb=False),
        _Blk("ptconv", "upConv3", 2, 4, rbb=False),
        _Blk("head", "classifier", 4, 4, k=1, pad=0),
    ]
    packed = _pack_blocks(np_params, blks, dtype)
    # the channel-slice skip's classifier half (see _logits_packed)
    c_pre = np_params["pre.conv.weight"].shape[-1]
    packed["classifier.wtop"] = jnp.asarray(
        pack_conv_weight(np_params["classifier.weight"][:, :, :c_pre], 4, 4, 1),
        dtype)
    plain = {k: jnp.asarray(v, dtype) for k, v in np_params.items()}
    chains = None
    if pallas:
        from robocupvision_tpu.ops.pallas_packed import ChainStage

        pk = functools.partial(_packed_stage, packed)

        down = [pk("down1.conv", rbb=False, emit=True),
                pk("down2.conv", rbb=False)]
        if pallas_fold_stem:
            down.insert(0, pk("pre.conv", rbb=False, emit=True, stem_f=4))
        up = [pk("upConv2.conv", rbb=False, skip_idx=0),
              pk("upConv3.conv", rbb=False),
              ChainStage(w=packed["classifier.w"], b=packed["classifier.b"],
                         skip_idx=1, skip_w=packed["classifier.wtop"])]
        chains = {"down": down, "up": up, "interpret": pallas_interpret,
                  "band": pallas_band, "fold_stem": pallas_fold_stem,
                  "argmax_head": pallas_argmax_head}
        if pallas_mid:
            # dilated belly convs (reference model.py:556-558): plain f==1
            # conv_pool_simple blocks, conv -> BN -> ReLU order
            chains["mid"] = [
                _plain_stage(np_params, n, dtype, rbb=False, dil=2)
                for n in ("conv1", "conv2", "conv3")]
    return PackedLabelPropInfer(cfg, packed, plain, dtype, stem_group, chains)


def build_packed_pb_fcn(model: Model, params: Params,
                        dtype: jnp.dtype = jnp.bfloat16,
                        pallas: bool = False,
                        pallas_interpret: bool = False,
                        pallas_band: Optional[int] = None,
                        pallas_deep: bool = False,
                        pallas_argmax_head: bool = True
                        ) -> PackedPBFCNInfer:
    """Compile a trained PB_FCN (segment mode) for TPU inference — the
    tester.py deployment/latency net (reference tester.py:142-144)."""
    cfg = model.cfg
    assert isinstance(cfg, PBFCNCfg) and not cfg.classify, \
        "packed PB_FCN is the segmentation PB_FCN family"
    np_params = {k: np.asarray(v) for k, v in params.items()}
    packed = _pack_blocks(np_params, _pb_fcn_blks(cfg), dtype)
    plain = {k: jnp.asarray(v, dtype) for k, v in np_params.items()}
    chains = None
    if pallas:
        from robocupvision_tpu.ops.pallas_packed import ChainStage

        pk = functools.partial(_packed_stage, packed)

        # no fold_stem variant: the PB_FCN stem (FCN.conv0) is DILATED, which
        # pack_stem_weight_grouped's raw-image kernel doesn't encode — the
        # chain starts at the already-packed s2d(4) input instead
        down = [pk("FCN.conv0.conv", rbb=False, emit=True),        # x0
                pk("FCN.conv1.conv", rbb=False, emit=True),        # x1
                ChainStage(w=packed["FCN.conv2.conv1.w"],          # pconv_nr
                           b=packed["FCN.conv2.conv1.b"],
                           relu_only=True),
                pk("FCN.conv2.pool", rbb=False)]                   # x2
        n_up = 4 if cfg.no_scale else 3
        up = [pk(f"up{n_up - 1}.conv", rbb=False, skip_idx=0),
              pk(f"up{n_up}.conv", rbb=False, skip_idx=1),
              ChainStage(w=packed["segmenter.classifier.w"],
                         b=packed["segmenter.classifier.b"])]
        chains = {"down": down, "up": up, "interpret": pallas_interpret,
                  "band": pallas_band, "argmax_head": pallas_argmax_head}
        if pallas_deep:
            # absorb the dilated relu-only conv1 of the ConvPool after x2
            # into the down chain (its stride-2 pool conv + BN stay XLA) and
            # run the five dilated deep convs as one chain (model.py:220-230)
            nxt = "FCN.conv_ext" if cfg.no_scale else "FCN.conv3"
            w = np_params[nxt + ".conv1.weight"]
            down[-1] = dataclasses.replace(down[-1], emit=True)  # x2
            down.append(ChainStage(
                w=jnp.asarray(w, dtype), b=np.zeros(w.shape[-1], np.float32),
                relu_only=True, dil=2))
            chains["deep"] = [
                _plain_stage(np_params, f"FCN.conv{i}", dtype, rbb=False,
                             dil=2) for i in range(4, 9)]
    return PackedPBFCNInfer(cfg, packed, plain, dtype, chains)
