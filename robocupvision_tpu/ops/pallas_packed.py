"""Pallas fused-region kernels for the lane-packed inference graph.

Round-3 device profile of the packed VGA serving graph (PERF.md): of 378 us
device time, ~205 us is 8 packed conv fusions each 2-4x off roofline and
~115 us is relayout copies BETWEEN those fusions (XLA's conv emitter
re-blocks every intermediate into its private 5-D tiled layout). The r2
single-op Pallas conv lost to XLA (kernel-call overhead + no epilogue
sharing), so this second attempt fuses a whole REGION instead:

Every conv in the packed graph's top region is 3x3/s1/p1 (or 1x1, or
3x3/s1 dilated with torch padding == dil) on the SAME (Hp, Wp, C<=128)
grid — space-to-depth already folded the strides and resolution changes
into the channel dimension. A region of N consecutive
convs therefore runs as ONE kernel: the chain input stays resident in VMEM,
each stage's output strip lives in VMEM scratch (with halo rows recomputed
per band), and only the emitted feature maps (skip inputs for the up path,
final logits) ever touch HBM. HBM traffic for the region drops from
"every intermediate + relayout copies" to "input once + emitted outputs
once", and the 9 static-tap MXU dots per stage see no layout copies at all.

Used by models/packed.py (``build_packed_infer(..., pallas=True)``) for the
flagship ROBO-UNet plan; per-pixel parity vs the XLA packed path is pinned
by tests/test_pallas_packed.py (interpret mode on CPU, real kernels on TPU).

The reference analog of this region is the C++ engine's fused
conv-BN-ReLU pipeline over net.cfg (SURVEY §2.6) — this is its TPU form.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@dataclasses.dataclass(frozen=True)
class ChainStage:
    """One conv(+epilogue) stage of a fused region.

    w: (K, K, Cin, Cout) kernel (K in {1, 3}), already packed/BN-folded.
    b: (Cout,) bias (tiled across phases by the packer).
    scale/shift: folded-BN affine (None for the bias-only head).
    rbb: conv -> ReLU -> affine (the reference conv_block order) when True,
         conv -> affine -> ReLU (ConvPoolSimple / up_tconv order) when False.
    skip_idx: index into the chain's ``skips`` list added AFTER the epilogue
              (the packed graph's additive skip), -1 for none.
    emit: write this stage's (1, H, W, Cout) output to HBM (skip feature
          maps for the up path; the final stage is always emitted).
    """

    w: Any
    b: Any
    scale: Any = None
    shift: Any = None
    rbb: bool = True
    skip_idx: int = -1
    emit: bool = False
    # stem stage (first stage only): the raw image's space-to-depth(f) is
    # folded into this (f+2, 3, f*cin, f^2*cout) grouped kernel
    # (models/packed.py pack_stem_weight_grouped with group == f); the chain
    # input is then the RAW (N, H*f, W*f, cin) image, pre-split into f
    # row-phase buffers so every tap is a static-phase strided row read
    stem_f: int = 0
    # relu(y) with NO affine (the packed graph's pconv_nr: ConvPool.conv1)
    relu_only: bool = False
    # kernel applied to the skip before adding, instead of an identity add:
    # 1x1 for LabelProp's channel-slice classifier half (conv(h, W) +
    # conv(top, W[:, :cpre])); 3x3 for the v2 concat skips' split halves
    # (conv(concat(y, skip), W) == conv(y, W0) + conv(skip, W1))
    skip_w: Any = None
    # 3x3 tap dilation (torch padding == dil), e.g. the reference's dilated
    # f==1 belly convs (LabelProp conv1-3, PB_FCN FCN.conv4-8)
    dil: int = 1
    # fused serving argmax (last stage only, the bias-only head): emit
    # per-phase int32 labels instead of logits — argmax_c over each group
    # of cout/groups adjacent lanes, computed with one tiny selection
    # matmul per class + elementwise max/select (no minor-dim reshape, so
    # Mosaic-safe). Removes the XLA argmax fusion AND shrinks the head's
    # HBM write from (.., f^2*C) logits to (.., f^2) labels.
    argmax_groups: int = 0
    # packed 2x2/s2 max pool (--UNet downs): a pure LANE op on the packed
    # grid (models/packed.packed_max_pool) expressed as 4 exact 0/1
    # lane-selection dots + elementwise max — the same Mosaic-safe
    # selection-matmul trick as the argmax head. ``w`` holds the
    # (1, 4, cin, cout) selection stack (k == 1, reach == 0); bias and
    # epilogue fields must stay at their defaults.
    pool: bool = False
    # int8 serving mode (static post-training quantization — a capability
    # the reference has none of; v5e int8 MXU peak is 2x bf16 and int8
    # scratch halves inter-stage VMEM bytes). x_scale > 0 marks the stage
    # quantized: its input is int8 at scale x_scale (set from a calibration
    # run's per-stage max|activation| / 127 — quantize_chain_stages), its
    # ``w`` is symmetric per-out-channel int8 with dequant row ``w_scale``
    # (pool stages keep their exact 0/1 selections, w_scale None), taps
    # accumulate in s32 on the MXU, and bias/epilogue/skips run in f32
    # after dequant. Inter-stage scratch is int8 (requantized with the
    # NEXT stage's x_scale); emitted outputs stay the chain dtype.
    # All stages of a chain are quantized together (fused_conv_chain
    # asserts homogeneity); skips and skip_w stay float.
    x_scale: float = 0.0
    w_scale: Any = None

    @property
    def k(self) -> int:
        return int(self.w.shape[0])

    @property
    def reach(self) -> int:
        """Rows/cols of input context beyond the center this stage reads."""
        return self.dil * (self.k // 2)


def _halo_depths(stages: Sequence[ChainStage]) -> List[int]:
    """d[k]: extra rows stage k must produce so later 3x3 stages see halos."""
    d = [0] * len(stages)
    for k in range(len(stages) - 2, -1, -1):
        d[k] = d[k + 1] + stages[k + 1].reach
    return d


# The real Mosaic compiler (tpu_compile_helper) hard-crashes — exit 1, no
# diagnostic — when a chain's total VMEM scratch grows past ~4 MB (it also
# has to fit the input/skip blocks, params and output strips alongside).
# Measured on v5e (r5 probe): 3.55 MB compiles (flagship stem chain band
# 30), 3.49 MB compiles (--UNet stem chain band 15, 8 stages), 4.24 MB
# crashes (--UNet band 20), 4.48 MB crashes (flagship band 40). The budget
# below keeps the automatic band chooser on the compiling side with margin.
_MOSAIC_SCRATCH_BUDGET = int(3.7e6)


def _scratch_bytes(stages: Sequence[ChainStage], depths: Sequence[int],
                   band: int, W: int, dtype) -> int:
    """Inter-stage VMEM scratch model the band chooser budgets against
    (strip geometry of fused_conv_chain's scratch_shapes at the CHAIN
    dtype). Deliberately does NOT discount int8 stages to 1 byte even
    though their declared scratch is int8: the Mosaic crash tracks the
    conv-window geometry at compute width, not the declared byte count
    (measured r5, --UNet pool chain on v5e: int8 band 24 crashes exactly
    like bf16 band 20+ despite half the declared bytes; int8 band <= 15
    compiles like bf16). The conservative model also keeps quantized
    chains on the same band their float counterpart chose."""
    total = 0
    for k, st in enumerate(stages[:-1]):
        r = stages[k + 1].reach
        strip = band + 2 * depths[k] + 2 * r
        total += strip * (W + 2 * r) * int(st.w.shape[3]) \
            * jnp.dtype(dtype).itemsize
    return total


def _chain_kernel(*refs, stages: Tuple, depths: Tuple[int, ...],
                  n_skips: int, band: int, H: int, W: int, x_pad: int,
                  skip_pad: int, skip_cpad: int, chain_dtype):
    """One (batch, row-band) cell of the fused chain. refs order: x (or f
    row-phase buffers for a stem chain), skips..., per-stage params
    (w, b[, scale, shift]), emitted outputs..., per-stage scratch (all but
    the last stage)."""
    i = pl.program_id(1)
    off = i * band

    stem_f = stages[0].stem_f
    n_x = stem_f if stem_f else 1
    x_refs = refs[:n_x]
    x_ref = x_refs[0]
    skip_refs = refs[n_x:n_x + n_skips]
    pos = n_x + n_skips
    stage_params = []
    for st in stages:
        n_p = (4 if st.scale is not None else 2) \
            + (1 if st.skip_w is not None else 0) \
            + (1 if st.w_scale is not None else 0)
        stage_params.append(refs[pos:pos + n_p])
        pos += n_p
    out_refs = refs[pos:pos + sum(1 for s in stages if s.emit)]
    scratch_refs = refs[pos + len(out_refs):]

    out_i = 0
    prev_scratch = None
    prev_d = None
    for k, st in enumerate(stages):
        prms = stage_params[k]
        w_ref, b_ref = prms[0], prms[1]
        d = depths[k]
        strip = band + 2 * d
        K = st.k
        cout = int(w_ref.shape[3])
        # int8 stage: taps run s8 x s8 -> s32 on the MXU; everything after
        # the dequant (bias, epilogue, skips, masks) is f32 as usual
        acc_t = jnp.int32 if st.x_scale else jnp.float32

        if st.pool:
            # packed 2x2 max pool (--UNet downs): one center read (reach 0),
            # then the max of 4 lane-selection dots — exact 0/1 gathers,
            # value-preserving for any float dtype, so the max is
            # bit-identical to packed_max_pool's lane op. No bias/epilogue.
            if k == 0:
                xs = x_ref[0, pl.ds(off - d + x_pad, strip), pl.ds(0, W), :]
            else:
                xs = prev_scratch[pl.ds(prev_d - d, strip), pl.ds(0, W), :]
            y = None
            for t in range(4):
                v = jax.lax.dot_general(
                    xs, w_ref[0, t],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
                y = v if y is None else jnp.maximum(y, v)
            if st.x_scale:  # dequant the int8 passthrough (0/1 selections)
                y = y.astype(jnp.float32) * st.x_scale
        else:
            acc = None
            if k == 0 and stem_f:
                # stem: 3 group-column taps x (f+2) pixel-row taps; pixel row
                # f*j + (dy-1) lives in phase buffer (dy-1) % f at block-row
                # offset (dy-1) // f
                for dy in range(stem_f + 2):
                    p = (dy - 1) % stem_f
                    bo = (dy - 1) // stem_f
                    for dx in range(3):
                        xs = x_refs[p][0, pl.ds(off - d + bo + x_pad, strip),
                                       pl.ds(dx, W), :]
                        t = jax.lax.dot_general(
                            xs, w_ref[dy, dx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=acc_t)
                        acc = t if acc is None else acc + t
            else:
                R = st.reach  # dil * (K // 2): tap offset and border width
                for dy in range(K):
                    for dx in range(K):
                        rel = st.dil * (dy - K // 2)
                        if k == 0:
                            # x buffer row = global row + x_pad; col = col+R
                            xs = x_ref[0,
                                       pl.ds(off - d + rel + x_pad, strip),
                                       pl.ds(st.dil * dx, W), :]
                        else:
                            # prev scratch stores its strip at row/col offset
                            # R (the border width THIS stage's taps need)
                            delta = prev_d - d
                            xs = prev_scratch[
                                pl.ds(delta + rel + R, strip),
                                pl.ds(st.dil * (dx - K // 2) + R, W), :]
                        t = jax.lax.dot_general(
                            xs, w_ref[dy, dx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=acc_t)
                        acc = t if acc is None else acc + t
            if st.x_scale:
                # int8 dequant: s32 accumulator x (per-out-channel weight
                # scale row, appended LAST in the stage params) x the static
                # input scale — everything downstream is f32 as usual
                y = acc.astype(jnp.float32) * (prms[-1][0] * st.x_scale)
            else:
                y = acc
            if st.skip_w is not None:
                # conv'd skip: the second half of a SPLIT conv (v2 concat /
                # LabelProp channel-slice) — skips stay FLOAT (int8 chains
                # dequant first), accumulated BEFORE bias + epilogue
                skw = prms[4 if st.scale is not None else 2]
                skr = skip_refs[st.skip_idx]
                ks = int(st.skip_w.shape[0])
                for dy in range(ks):
                    for dx in range(ks):
                        sk = skr[0, pl.ds(off - d + dy - ks // 2 + skip_pad,
                                          strip),
                                 pl.ds(dx + skip_cpad - ks // 2, W), :]
                        y = y + jax.lax.dot_general(
                            sk, skw[dy, dx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            y = y + b_ref[0].astype(jnp.float32)
            if st.scale is not None:
                scale = prms[2][0].astype(jnp.float32)
                shift = prms[3][0].astype(jnp.float32)
                if st.rbb:
                    y = jnp.maximum(y, 0.0) * scale + shift
                else:
                    y = jnp.maximum(y * scale + shift, 0.0)
            elif st.relu_only:
                y = jnp.maximum(y, 0.0)
            if st.skip_idx >= 0 and st.skip_w is None:
                # identity skip: the packed graph's residual add AFTER block
                sk = skip_refs[st.skip_idx][0,
                                            pl.ds(off - d + skip_pad, strip),
                                            pl.ds(skip_cpad, W), :]
                y = y + sk.astype(jnp.float32)

        # rows outside the image must be ZERO (they are conv padding for the
        # next stage), not the garbage the halo recompute produced there
        g = off - d + jax.lax.broadcasted_iota(jnp.int32, (strip, 1, 1), 0)
        y = jnp.where((g >= 0) & (g < H), y, 0.0)

        if st.argmax_groups:
            # fused serving head (last stage): per-phase argmax over each
            # group of C = cout/groups adjacent lanes. val_c = y @ S_c with
            # S_c[l, g] = [l == g*C + c] — one tiny MXU dot per class (the
            # selection matrices build from iotas, no minor-dim reshape) —
            # then first-max-wins select chains (jnp.argmax tie semantics).
            # The accumulator is rounded to the chain dtype FIRST so
            # infer() == argmax(logits()) bit-exactly (ties included) —
            # the logits form emits at chain_dtype.
            y = y.astype(chain_dtype).astype(jnp.float32)
            G = st.argmax_groups
            n_cls = cout // G
            lane = jax.lax.broadcasted_iota(jnp.int32, (cout, G), 0)
            grp = jax.lax.broadcasted_iota(jnp.int32, (cout, G), 1)
            best = idx = None
            for c in range(n_cls):
                sel = (lane == grp * n_cls + c).astype(jnp.float32)
                val = jax.lax.dot_general(
                    y, sel, dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if best is None:
                    best, idx = val, jnp.zeros(val.shape, jnp.int32)
                else:
                    m = val > best
                    best = jnp.where(m, val, best)
                    idx = jnp.where(m, c, idx)
            y = idx

        if st.emit:
            out_refs[out_i][0] = y[d:d + band].astype(out_refs[out_i].dtype)
            out_i += 1
        if k + 1 < len(stages):
            bw = stages[k + 1].reach  # border the NEXT stage's taps read
            sref = scratch_refs[k]
            if stages[k + 1].x_scale:
                # requantize for the next int8 stage (int8 VMEM scratch):
                # symmetric round-to-nearest-even at its static input scale
                y = jnp.clip(jnp.round(y * (1.0 / stages[k + 1].x_scale)),
                             -127.0, 127.0)
            sref[pl.ds(bw, strip), pl.ds(bw, W), :] = y.astype(sref.dtype)
            if bw:
                # zero the column borders the next stage's dx taps read
                # (scratch is uninitialized; row borders are never read)
                zc = jnp.zeros((strip + 2 * bw, bw, cout), sref.dtype)
                sref[:, pl.ds(0, bw), :] = zc
                sref[:, pl.ds(W + bw, bw), :] = zc
            prev_scratch, prev_d = sref, d


def fused_conv_chain(x: jax.Array, stages: Sequence[ChainStage],
                     skips: Sequence[jax.Array] = (),
                     band: Optional[int] = None,
                     interpret: bool = False) -> List[jax.Array]:
    """Run a fused chain of conv3x3(s1,p1)/conv1x1 (+epilogue, +skip) stages.

    x: (1, H, W, C0). Returns the emitted outputs, in stage order (the last
    stage is emitted implicitly). All chain-internal activations stay in
    VMEM; HBM sees x + skips once and the emitted outputs once.
    """
    stages = list(stages)
    if not stages[-1].emit:
        stages[-1] = dataclasses.replace(stages[-1], emit=True)
    assert all(not st.argmax_groups for st in stages[:-1]), \
        "argmax_groups is a final-stage (serving head) epilogue"
    for st in stages:
        if st.pool:  # pool stages carry ONLY the selection stack
            assert (st.w.ndim == 4 and st.w.shape[:2] == (1, 4)
                    and st.scale is None and not st.relu_only
                    and st.skip_idx < 0 and st.skip_w is None
                    and not st.stem_f and not st.argmax_groups), st
    quant = bool(stages[0].x_scale)
    assert all(bool(st.x_scale) == quant for st in stages), \
        "int8 chains quantize every stage together"
    assert all((st.w_scale is not None) == (quant and not st.pool)
               for st in stages), "w_scale iff quantized conv stage"
    if stages[-1].argmax_groups:
        st = stages[-1]
        assert st.scale is None and not st.relu_only, \
            "the argmax head is the bias-only classifier"
        assert int(st.w.shape[3]) % st.argmax_groups == 0
    depths = _halo_depths(stages)
    stem_f = stages[0].stem_f
    n = x.shape[0]
    # 3x3 skip kernels tap one row/col beyond the consuming stage's strip
    skip_cpad = max((int(st.skip_w.shape[0]) // 2 for st in stages
                     if st.skip_w is not None), default=0)
    if stem_f:
        # raw (N, H*f, W*f, cin) image in; the chain runs on the packed grid
        f = stem_f
        H, W = x.shape[1] // f, x.shape[2] // f
        c_in = x.shape[3]
        x_pad = depths[0] + 1  # block rows
        skip_pad = depths[0] + (f + 2) // 2 + skip_cpad
    else:
        H, W = x.shape[1], x.shape[2]
        x_pad = depths[0] + stages[0].reach
        skip_pad = x_pad + skip_cpad
    dtype = x.dtype
    fits = functools.partial(_scratch_bytes, stages, depths, W=W,
                             dtype=dtype)
    if band is None:
        # fastest-first preference order from the committed on-chip band
        # sweep (docs/BENCH_RUNS_r4.md flagship_vga_band_sweep), filtered by
        # the Mosaic VMEM-scratch budget — deep chains (--UNet's 8-stage
        # pool chain) auto-degrade to a smaller band instead of crashing
        # the compiler
        cands = ([H] if H <= 32 else []) + [
            b for b in (24, 20, 30, 15, 12, 10, 8, 6, 5, 4, 3, 2, 1)
            if b < H and H % b == 0]
        band = next((b for b in cands
                     if fits(band=b) <= _MOSAIC_SCRATCH_BUDGET), cands[-1])
    elif not interpret and fits(band=band) > _MOSAIC_SCRATCH_BUDGET:
        raise ValueError(
            f"band={band} needs ~{fits(band=band) / 1e6:.2f} MB of VMEM "
            f"scratch for this {len(stages)}-stage chain; the real Mosaic "
            f"compiler crashes past ~{_MOSAIC_SCRATCH_BUDGET / 1e6:.1f} MB "
            f"(tpu_compile_helper exit 1). Use a smaller band or band=None "
            f"for the automatic chooser.")
    assert H % band == 0, (H, band)
    if quant:
        # the chain's input enters pre-quantized at stage 0's static scale
        # (padding zeros are exact in int8); quantize in f32 so bf16 chains
        # round identically to chain_reference
        x = jnp.clip(jnp.round(x.astype(jnp.float32)
                               * (1.0 / stages[0].x_scale)),
                     -127.0, 127.0).astype(jnp.int8)

    if stem_f:
        # split the grouped view into f row-phase buffers: phase p holds
        # pixel rows f*j + p, so each stem tap is a static-phase read
        xg = x.reshape(n, H * f, W, f * c_in)
        xg = jnp.pad(xg, ((0, 0), (f * x_pad,) * 2, (1, 1), (0, 0)))
        xg = xg.reshape(n, H + 2 * x_pad, f, W + 2, f * c_in)
        x_bufs = [xg[:, :, p] for p in range(f)]
    else:
        x_bufs = [jnp.pad(x, ((0, 0), (x_pad, x_pad),
                              (stages[0].reach,) * 2, (0, 0)))]
    skips_p = [jnp.pad(s, ((0, 0), (skip_pad, skip_pad),
                           (skip_cpad, skip_cpad), (0, 0)))
               for s in skips]

    def whole(shape):  # one batch row resident in VMEM, indexed by b
        return pl.BlockSpec((1,) + tuple(shape[1:]), lambda b, i: (b, 0, 0, 0))

    def const(shape):  # replicated parameter block
        nd = len(shape)
        return pl.BlockSpec(tuple(shape), lambda b, i: (0,) * nd)

    operands = list(x_bufs) + skips_p
    in_specs = [whole(xb.shape) for xb in x_bufs] \
        + [whole(s.shape) for s in skips_p]
    for st in stages:
        cout = int(st.w.shape[3])
        # int8 stages ship int8 kernels (pool selections are 0/1 — exact in
        # any dtype); skip_w and the epilogue params stay float
        operands += [jnp.asarray(st.w, jnp.int8 if st.x_scale else dtype),
                     jnp.asarray(st.b, jnp.float32).reshape(1, cout)]
        in_specs += [const(st.w.shape), const((1, cout))]
        if st.scale is not None:
            operands += [jnp.asarray(st.scale, jnp.float32).reshape(1, cout),
                         jnp.asarray(st.shift, jnp.float32).reshape(1, cout)]
            in_specs += [const((1, cout))] * 2
        if st.skip_w is not None:
            operands.append(jnp.asarray(st.skip_w, dtype))
            in_specs.append(const(st.skip_w.shape))
        if st.w_scale is not None:  # appended LAST (kernel reads prms[-1])
            operands.append(
                jnp.asarray(st.w_scale, jnp.float32).reshape(1, cout))
            in_specs.append(const((1, cout)))

    out_shapes = [
        jax.ShapeDtypeStruct((n, H, W, st.argmax_groups), jnp.int32)
        if st.argmax_groups
        else jax.ShapeDtypeStruct((n, H, W, int(st.w.shape[3])), dtype)
        for st in stages if st.emit]
    out_specs = [pl.BlockSpec((1, band, W, s.shape[3]),
                              lambda b, i: (b, i, 0, 0)) for s in out_shapes]

    scratch_shapes = [
        pltpu_vmem((band + 2 * depths[k] + 2 * stages[k + 1].reach,
                    W + 2 * stages[k + 1].reach, int(st.w.shape[3])),
                   jnp.int8 if stages[k + 1].x_scale else dtype)
        for k, st in enumerate(stages[:-1])]

    kernel = functools.partial(
        _chain_kernel, stages=tuple(stages), depths=tuple(depths),
        n_skips=len(skips_p), band=band, H=H, W=W, x_pad=x_pad,
        skip_pad=skip_pad, skip_cpad=skip_cpad, chain_dtype=dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(n, H // band),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*operands)
    return list(outs) if isinstance(outs, (tuple, list)) else [outs]


def with_argmax_head(stages: Sequence[ChainStage],
                     groups: int) -> List[ChainStage]:
    """The chain's serving form: the final (classifier) stage emits fused
    per-phase int32 labels instead of logits (see ChainStage.argmax_groups).
    """
    stages = list(stages)
    stages[-1] = dataclasses.replace(stages[-1], argmax_groups=groups,
                                     emit=True)
    return stages


def pltpu_vmem(shape, dtype):
    """VMEM scratch allocation that degrades to interpret-compatible form."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


def _conv_ref(x, w, pad, dil=1, stride=(1, 1), pt=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(stride),
        padding=[(pad, pad), (pad, pad)], rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt)


def chain_reference(x: jax.Array, stages: Sequence[ChainStage],
                    skips: Sequence[jax.Array] = (),
                    collect: Optional[list] = None,
                    collect_pct: Optional[float] = None) -> List[jax.Array]:
    """Plain-XLA mirror of :func:`fused_conv_chain` — same math at the same
    rounding points (inter-stage rounding to the chain dtype; for int8
    stages the identical quantize/dequantize forms, with integer convs so
    the s32 accumulation is exact). Two uses:

    - int8 calibration: run with FLOAT stages and a ``collect`` list — it
      appends each stage's pre-quant max|input| (the statistic
      :func:`quantize_chain_stages` turns into static scales), or the
      ``collect_pct``-th percentile of |input| when set (percentile
      clipping: outliers saturate at +-127 instead of stretching the
      scale — usually better for trained ReLU nets);
    - a test oracle for the kernel (including the quantized form).
    """
    stages = list(stages)
    if not stages[-1].emit:
        stages[-1] = dataclasses.replace(stages[-1], emit=True)
    chain_dtype = x.dtype
    h = x
    outs = []
    for k, st in enumerate(stages):
        if collect is not None:
            a = jnp.abs(h.astype(jnp.float32))
            collect.append(float(jnp.quantile(a, collect_pct / 100.0))
                           if collect_pct is not None else float(jnp.max(a)))
        q = bool(st.x_scale)
        if q:
            if k == 0:
                h = jnp.clip(jnp.round(h.astype(jnp.float32)
                                       * (1.0 / st.x_scale)), -127., 127.)
            hi = h.astype(jnp.int32)  # int8 values; s32 convs stay exact
        cout = int(st.w.shape[3])
        if st.pool:
            xs = (hi if q else h).astype(jnp.int32 if q else jnp.float32)
            y = None
            for t in range(4):
                v = jnp.einsum("nhwc,cd->nhwd", xs,
                               jnp.asarray(st.w)[0, t].astype(xs.dtype))
                y = v if y is None else jnp.maximum(y, v)
            y = y.astype(jnp.float32) * (st.x_scale if q else 1.0)
        else:
            pt = jnp.int32 if q else jnp.float32
            w = jnp.asarray(st.w).astype(jnp.int32 if q else jnp.float32)
            if st.stem_f:
                f = st.stem_f
                n, Hf, Wf, cin = h.shape
                xg = (hi if q else h).reshape(n, Hf, Wf // f, f * cin)
                acc = _conv_ref(xg.astype(pt), w, pad=1, stride=(f, 1),
                                pt=pt)
            else:
                acc = _conv_ref((hi if q else h).astype(pt), w,
                                pad=st.reach, dil=st.dil, pt=pt)
            y = acc.astype(jnp.float32)
            if q:
                y = y * (jnp.asarray(st.w_scale, jnp.float32) * st.x_scale)
            if st.skip_w is not None:
                sk = skips[st.skip_idx].astype(jnp.float32)
                y = y + _conv_ref(sk, jnp.asarray(st.skip_w, jnp.float32),
                                  pad=int(st.skip_w.shape[0]) // 2)
            y = y + jnp.asarray(st.b, jnp.float32)
            if st.scale is not None:
                s = jnp.asarray(st.scale, jnp.float32)
                sh = jnp.asarray(st.shift, jnp.float32)
                y = jnp.maximum(y, 0.) * s + sh if st.rbb \
                    else jnp.maximum(y * s + sh, 0.)
            elif st.relu_only:
                y = jnp.maximum(y, 0.)
            if st.skip_idx >= 0 and st.skip_w is None:
                y = y + skips[st.skip_idx].astype(jnp.float32)
        if st.argmax_groups:
            yr = y.astype(chain_dtype).astype(jnp.float32)
            n, H, W, _ = yr.shape
            lab = jnp.argmax(yr.reshape(n, H, W, st.argmax_groups,
                                        cout // st.argmax_groups), axis=-1)
            outs.append(lab.astype(jnp.int32))
            break
        if st.emit:
            outs.append(y.astype(chain_dtype))
        if k + 1 < len(stages):
            nxt = stages[k + 1]
            if nxt.x_scale:
                h = jnp.clip(jnp.round(y * (1.0 / nxt.x_scale)),
                             -127., 127.)
            else:
                h = y.astype(chain_dtype)
    return outs


def quantize_chain_stages(stages: Sequence[ChainStage],
                          in_maxes: Sequence[float]) -> List[ChainStage]:
    """Static int8 PTQ of a chain: per-stage input scales from a
    calibration run's max|input| (``in_maxes``, one per stage — the list
    :func:`chain_reference` collects), symmetric per-out-channel int8
    weights. Pool stages keep their exact 0/1 selections (passthrough)."""
    assert len(stages) == len(in_maxes), (len(stages), len(in_maxes))
    out = []
    for st, mx in zip(stages, in_maxes):
        s = max(float(mx), 1e-6) / 127.0
        if st.pool:
            out.append(dataclasses.replace(st, x_scale=s))
            continue
        w = np.asarray(st.w, np.float32)
        ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
        out.append(dataclasses.replace(
            st, w=jnp.asarray(wq), w_scale=jnp.asarray(ws, jnp.float32),
            x_scale=s))
    return out
