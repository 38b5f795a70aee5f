"""Structured channel pruning with exact compaction.

The reference prunes unstructured (magnitude masks, model.py:45-57/621-672),
which gives parity but no TPU speedup — the MXU runs dense (SURVEY §7 "hard
parts"). This module adds the structured path the reference's deployment
story implies: score whole channels, zero them as *structured* masks (the
same ``masks`` format the masked-gradient finetune already consumes,
reference train.py:59-65), then **compact** — physically remove the dead
channels so the slim network is smaller and faster everywhere downstream:
the zoo apply (shape-driven), the packed/Pallas serving graphs, the net.cfg
export and the native C++ engine.

Exactness: a pruned channel is zeroed post-BatchNorm (kernel out-slice,
bias, BN gamma AND beta all zero), so its activation is exactly 0 in both
train and eval mode and removing it — together with every consumer's
corresponding in-slice — is an exact graph rewrite up to float reassociation
(dropping a channel shortens the conv reduction). Channels coupled by
additive skips (reference model.py:495-511: ``up + skip``) are pruned as one
*group* so both sides stay aligned; concat (v2) and channel-slice
(LabelProp, model.py:565) consumers are handled with in-axis offsets.

Pinned by tests/test_slim.py: masked-vs-compacted per-pixel equality across
families/variants, packed-graph parity on slim params, and the CLI e2e.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

Params = Dict[str, np.ndarray]


@dataclasses.dataclass(frozen=True)
class OutSlice:
    """One producer of a group's channels.

    ``conv`` names a conv/tconv kernel (HWIO layout — out axis is -1);
    ``start`` is the offset of the group's channels within that out axis
    (non-zero when a tensor's out channels belong to several groups, e.g.
    LabelProp's upConv3 whose first ``pre`` channels alias the slice-add).
    """

    conv: str
    bias: Optional[str] = None
    bn: Optional[str] = None  # bn prefix: <bn>.weight/.bias/.running_*
    start: int = 0


@dataclasses.dataclass(frozen=True)
class InSlice:
    """One consumer: ``conv``'s in axis (HWIO axis 2) at ``start``."""

    conv: str
    start: int = 0


@dataclasses.dataclass(frozen=True)
class Group:
    """A set of channels that must be pruned together (skip-add coupling)."""

    size: int
    outs: Tuple[OutSlice, ...]
    ins: Tuple[InSlice, ...]


def _block(name: str, start: int = 0) -> OutSlice:
    """OutSlice for a conv_block / conv_pool_simple style block
    (``<name>.conv`` + ``<name>.bn``, models/layers.py)."""
    return OutSlice(conv=f"{name}.conv.weight", bias=f"{name}.conv.bias",
                    bn=f"{name}.bn", start=start)


# ---------------------------------------------------------------------------
# group builders (one per zoo family)
# ---------------------------------------------------------------------------


def _robo_unet_groups(cfg, extra_belly_consumer: Optional[str] = None,
                      level0_convs: Optional[int] = None) -> List[Group]:
    """Channel groups for zoo.robo_unet (reference model.py:461-536).

    Covers the full deployed family: flagship (additive skips), --v2 (concat
    skips: level and up outputs decouple, consumers see [up | skip] in-axis
    offsets), --UNet (pool mode — maxpool is channel-preserving so the same
    wiring applies), any levels/belly. ``extra_belly_consumer`` threads
    PB_FCN_2's classification head (it consumes downs[-1], model.py:449).
    """
    D = cfg.eff_depth
    pl = cfg.planes

    def n_convs(levels: int, do_pool: bool) -> int:
        # mirrors layers.level_down_def (reference LevelDown model.py:379-401)
        if cfg.pool and do_pool:
            levels -= 1
        return max(levels, 1)

    lvl_n = [level0_convs if level0_convs is not None
             else n_convs(cfg.levels - 1, False)] + \
        [n_convs(cfg.levels, True) for _ in range(D - 1)]
    lvl_w = [pl * 2 ** i for i in range(D)]

    def lvl_conv(lvl: int, i: int) -> str:
        return f"downPart.Level{lvl}.layers.Conv{i}"

    def up_out(j: int) -> OutSlice:
        return OutSlice(conv=f"upPart.Up{j}.conv.weight",
                        bias=f"upPart.Up{j}.conv.bias", bn=f"upPart.Up{j}.bn")

    def after_add_consumer(j: int) -> str:
        # the (up_j + skip) / concat output feeds Up_{j+1}, or the class head
        if j < D - 2:
            return f"upPart.Up{j + 1}.conv.weight"
        return "segmenter.layers.Class.weight"

    groups: List[Group] = []

    # intra-level chains (free channels: single consumer, no skip)
    for lvl in range(D):
        for i in range(lvl_n[lvl] - 1):
            groups.append(Group(lvl_w[lvl], (_block(lvl_conv(lvl, i)),),
                                (InSlice(lvl_conv(lvl, i + 1) + ".conv.weight"),)))

    # level outputs (skip-coupled for lvl <= D-2). Additive skips NEED the
    # joint group (the add is per-channel); v2's concat would allow
    # independent keep sets, but the packed graph's split-weight concat
    # trick (models/packed.py put_w split2) splits consumer kernels at
    # cin//2, so the up half and skip half (equal widths by construction:
    # Up_{D-2-l} emits pl*2^l) keep one shared set here too.
    for lvl in range(D - 1):
        j = D - 2 - lvl
        ins = [InSlice(lvl_conv(lvl + 1, 0) + ".conv.weight"),
               InSlice(after_add_consumer(j))]
        if cfg.v2:
            # concat consumer sees [up | skip]: the skip's channels start
            # after the up output's (robo_unet_apply concatenates [y, skip])
            ins.append(InSlice(after_add_consumer(j), start=lvl_w[lvl]))
        groups.append(Group(
            lvl_w[lvl],
            (_block(lvl_conv(lvl, lvl_n[lvl] - 1)), up_out(j)),
            tuple(ins)))

    # deepest level output -> belly (or straight into the up path)
    deep_out = _block(lvl_conv(D - 1, lvl_n[D - 1] - 1))
    if cfg.belly_size > 0:
        groups.append(Group(lvl_w[D - 1], (deep_out,),
                            (InSlice("PB.PB_1.layers.Conv0.conv.weight"),)))
        nb1 = max(cfg.belly_size - 1, 1)
        for i in range(nb1 - 1):
            groups.append(Group(
                cfg.belly_planes, (_block(f"PB.PB_1.layers.Conv{i}"),),
                (InSlice(f"PB.PB_1.layers.Conv{i + 1}.conv.weight"),)))
        groups.append(Group(cfg.belly_planes,
                            (_block(f"PB.PB_1.layers.Conv{nb1 - 1}"),),
                            (InSlice("PB.PB_2.layers.Conv0.conv.weight"),)))
        belly_ins = [InSlice("upPart.Up0.conv.weight")]
        if extra_belly_consumer:
            belly_ins.append(InSlice(extra_belly_consumer))
        groups.append(Group(lvl_w[D - 1], (_block("PB.PB_2.layers.Conv0"),),
                            tuple(belly_ins)))
    else:
        deep_ins = [InSlice("upPart.Up0.conv.weight")]
        if extra_belly_consumer:
            deep_ins.append(InSlice(extra_belly_consumer))
        groups.append(Group(lvl_w[D - 1], (deep_out,), tuple(deep_ins)))

    return groups


def _pb_fcn_2_groups(cfg) -> List[Group]:
    """PB_FCN_2 (reference model.py:416-459): structurally the flagship
    ROBO-UNet plan (additive skips, PB belly) plus the classification head
    consuming downs[-1]."""
    from robocupvision_tpu.models.zoo import RoboUNetCfg

    rcfg = RoboUNetCfg(planes=cfg.planes, num_classes=cfg.num_classes,
                       depth=cfg.depth, levels=cfg.levels,
                       belly_size=cfg.belly_size,
                       belly_planes=cfg.belly_planes)
    # pb_fcn_2_registry hardcodes Level0 to ONE conv for any cfg.levels
    # (zoo.py: level_down_def(..., 1, False, False)) — override it
    return _robo_unet_groups(
        rcfg, extra_belly_consumer="classifier.layers.Class.weight",
        level0_convs=1)


def _cps_out(name: str, start: int = 0) -> OutSlice:
    """conv_pool_simple: single conv + bn (models/layers.py)."""
    return OutSlice(conv=f"{name}.conv.weight", bias=None,
                    bn=f"{name}.bn", start=start)


def _label_prop_groups(cfg) -> List[Group]:
    """LabelProp (reference model.py:538-567). Additive skips couple
    down2+upConv1 and down1+upConv2; the channel-slice skip
    ``h[:, :pre] += top`` (model.py:565) couples ``pre`` with the FIRST
    ``pre``-width slice of upConv3's output — the remaining upConv3
    channels form their own group (consumed only by the classifier)."""
    pl = cfg.planes
    pre, half = pl // 4, pl // 2

    def up(name, start=0):
        return OutSlice(conv=f"{name}.conv.weight", bias=f"{name}.conv.bias",
                        bn=f"{name}.bn", start=start)

    return [
        # pre couples with upConv3[:pre] via the slice-add
        Group(pre, (_cps_out("pre"), up("upConv3")),
              (InSlice("down1.conv.weight"), InSlice("classifier.weight"))),
        Group(half - pre, (up("upConv3", start=pre),),
              (InSlice("classifier.weight", start=pre),)),
        # down1 + upConv2 (middle skip)
        Group(half, (_cps_out("down1"), up("upConv2")),
              (InSlice("down2.conv.weight"), InSlice("upConv3.conv.weight"))),
        # down2 + upConv1 (bottom skip)
        Group(half, (_cps_out("down2"), up("upConv1")),
              (InSlice("down3.conv.weight"), InSlice("upConv2.conv.weight"))),
        # belly chain
        Group(pl, (_cps_out("down3"),), (InSlice("conv1.conv.weight"),)),
        Group(pl * 2, (_cps_out("conv1"),), (InSlice("conv2.conv.weight"),)),
        Group(pl * 2, (_cps_out("conv2"),), (InSlice("conv3.conv.weight"),)),
        Group(pl, (_cps_out("conv3"),), (InSlice("upConv1.conv.weight"),)),
    ]


def _pb_fcn_groups(cfg) -> List[Group]:
    """PB_FCN over the DownSampler encoder (reference model.py:201-309).

    ConvPool blocks carry an internal conv1->pool channel set (free) and a
    post-BN output; the up path's additive skips couple encoder feature
    outputs with up-tconv outputs. Both heads (classifier over f4/f3,
    segmenter over the last up) are width consumers, so classify and
    segment graphs stay loadable from one slim dict."""
    p = cfg.planes
    F = "FCN."

    def cp_groups(name: str, cout: int, nxt: List[InSlice]) -> List[Group]:
        # ConvPool: conv1(d2) -> relu -> pool(s2) -> bn -> relu
        return [
            Group(cout, (OutSlice(conv=f"{F}{name}.conv1.weight"),),
                  (InSlice(f"{F}{name}.pool.weight"),)),
            Group(cout, (OutSlice(conv=f"{F}{name}.pool.weight",
                                  bn=f"{F}{name}.bn"),), tuple(nxt)),
        ]

    def up(name):
        return OutSlice(conv=f"{name}.conv.weight", bias=f"{name}.conv.bias",
                        bn=f"{name}.bn")

    g: List[Group] = []
    last_up = "up4" if cfg.no_scale else "up3"
    # conv0 (f0) + last up (skip add) -> conv1 + segmenter
    g.append(Group(p // 4, (_cps_out(F + "conv0"), up(last_up)),
                   (InSlice(F + "conv1.conv.weight"),
                    InSlice("segmenter.classifier.weight"))))
    if cfg.no_scale:
        # f1=conv1 + up3; f2=conv2 + up2; f3=conv_ext + up1; f4=conv8 chain
        g.append(Group(p // 2, (_cps_out(F + "conv1"), up("up3")),
                       (InSlice(F + "conv2.conv1.weight"),
                        InSlice("up4.conv.weight"))))
        g += cp_groups("conv2", p, [InSlice(F + "conv_ext.conv1.weight"),
                                    InSlice("up3.conv.weight")])
        g[-1] = Group(g[-1].size, g[-1].outs + (up("up2"),), g[-1].ins)
        g += cp_groups("conv_ext", p, [InSlice(F + "conv3.conv1.weight"),
                                       InSlice("up2.conv.weight")])
        g[-1] = Group(g[-1].size, g[-1].outs + (up("up1"),), g[-1].ins)
    else:
        g.append(Group(p // 2, (_cps_out(F + "conv1"), up("up2")),
                       (InSlice(F + "conv2.conv1.weight"),
                        InSlice("up3.conv.weight"))))
        g += cp_groups("conv2", p, [InSlice(F + "conv3.conv1.weight"),
                                    InSlice("up2.conv.weight")])
        g[-1] = Group(g[-1].size, g[-1].outs + (up("up1"),), g[-1].ins)
    # deep chain conv3..conv8 (f3/f4): conv8's output feeds up1 + classifier
    g += cp_groups("conv3", p * 2, [InSlice(F + "conv4.conv.weight")])
    for a, b, w in (("conv4", "conv5", p * 4), ("conv5", "conv6", p * 4),
                    ("conv6", "conv7", p * 4), ("conv7", "conv8", p * 4)):
        g.append(Group(w, (_cps_out(F + a),),
                       (InSlice(f"{F}{b}.conv.weight"),)))
    g.append(Group(p * 2, (_cps_out(F + "conv8"),),
                   (InSlice("up1.conv.weight"),
                    InSlice("classifier.classifier.weight"))))
    return g


def _fcn_groups(cfg) -> List[Group]:
    """FCN baseline (reference model.py:235-254, 311-330)."""
    p = cfg.planes
    out = p // 2
    F = "FCN."

    def up(name):
        return OutSlice(conv=f"{name}.conv.weight", bias=f"{name}.conv.bias",
                        bn=f"{name}.bn")

    def cpd_groups(name: str, cout: int, nxt: List[InSlice]) -> List[Group]:
        # ConvPoolDouble: conv1 -> conv2 -> pool -> bn
        return [
            Group(cout, (OutSlice(conv=f"{F}{name}.conv1.weight"),),
                  (InSlice(f"{F}{name}.conv2.weight"),)),
            Group(cout, (OutSlice(conv=f"{F}{name}.conv2.weight"),),
                  (InSlice(f"{F}{name}.pool.weight"),)),
            Group(cout, (OutSlice(conv=f"{F}{name}.pool.weight",
                                  bn=f"{F}{name}.bn"),), tuple(nxt)),
        ]

    g: List[Group] = [
        Group(out, (_cps_out(F + "conv0"),),
              (InSlice(F + "conv0_1.conv.weight"),)),
        # x0 = conv0_1 out, skip-added with up3
        Group(out, (_cps_out(F + "conv0_1"), up("up3")),
              (InSlice(F + "conv1.conv.weight"),
               InSlice("classifier.classifier.weight"))),
        # x1 = conv1 out, skip-added with up2
        Group(out, (_cps_out(F + "conv1"), up("up2")),
              (InSlice(F + "conv2.conv1.weight"), InSlice("up3.conv.weight"))),
    ]
    # x2 = conv2 out + up1
    g += cpd_groups("conv2", p, [InSlice(F + "conv3.conv1.weight"),
                                 InSlice("up2.conv.weight")])
    g[-1] = Group(g[-1].size, g[-1].outs + (up("up1"),), g[-1].ins)
    g += cpd_groups("conv3", p * 2, [InSlice(F + "conv4.conv.weight")])
    g.append(Group(p * 4, (_cps_out(F + "conv4"),),
                   (InSlice(F + "conv5.conv.weight"),)))
    g.append(Group(p * 2, (_cps_out(F + "conv5"),),
                   (InSlice("up1.conv.weight"),)))
    return g


def channel_groups(model) -> List[Group]:
    """Channel-coupling groups for a zoo.Model. Every hidden channel of the
    network belongs to exactly one group; class-head outputs are untouchable."""
    cfg = model.cfg
    if model.family == "robo_unet":
        return _robo_unet_groups(cfg)
    if model.family == "pb_fcn_2":
        return _pb_fcn_2_groups(cfg)
    if model.family == "label_prop":
        return _label_prop_groups(cfg)
    if model.family == "pb_fcn":
        return _pb_fcn_groups(cfg)
    if model.family == "fcn":
        return _fcn_groups(cfg)
    raise ValueError(f"no structured-pruning groups for family {model.family}")


# ---------------------------------------------------------------------------
# scoring / pruning / compaction
# ---------------------------------------------------------------------------


def channel_scores(params: Params, g: Group) -> np.ndarray:
    """Per-channel saliency: mean |kernel out-slice| x |BN gamma| summed over
    the group's producers (network-slimming style; BN gamma gates the
    channel's actual contribution)."""
    s = np.zeros(g.size, np.float64)
    for o in g.outs:
        w = np.asarray(params[o.conv])
        sl = w[..., o.start:o.start + g.size]
        m = np.abs(sl).mean(axis=tuple(range(w.ndim - 1)))
        if o.bn is not None:
            m = m * np.abs(np.asarray(params[o.bn + ".weight"])
                           [o.start:o.start + g.size])
        s += m
    return s


def _dead_positions(o: OutSlice, g: Group, pruned_idx: np.ndarray):
    return o.start + pruned_idx


def prune_channels(params: Params, groups: List[Group], ratio: float,
                   min_keep: int = 1, round_to: int = 1,
                   verbose: bool = True) -> Tuple[Params, Dict[str, np.ndarray]]:
    """Structurally zero the lowest-scoring ``ratio`` of each group's channels.

    Returns (new_params, masks) in the exact format of ops/pruning.py — masks
    are full-shape booleans, True at pruned positions — so the existing
    masked-gradient finetune (train.py:59-65 semantics) applies unchanged.
    Kept counts are clamped to >= ``min_keep`` and rounded up to a multiple
    of ``round_to`` (lane-friendly widths for the packed serving graphs).
    """
    new = {k: np.array(v, np.float32, copy=True) for k, v in params.items()}
    masks: Dict[str, np.ndarray] = {}

    def mask_of(name: str) -> np.ndarray:
        if name not in masks:
            masks[name] = np.zeros(np.shape(new[name]), bool)
        return masks[name]

    total = kept_total = 0
    for g in groups:
        n_keep = g.size - int(g.size * ratio)
        n_keep = max(n_keep, min_keep, 1)
        if round_to > 1:
            n_keep = min(-(-n_keep // round_to) * round_to, g.size)
        order = np.argsort(channel_scores(params, g), kind="stable")
        pruned_idx = order[: g.size - n_keep]
        total += g.size
        kept_total += n_keep
        if pruned_idx.size == 0:
            continue
        for o in g.outs:
            pos = _dead_positions(o, g, pruned_idx)
            new[o.conv][..., pos] = 0.0
            mask_of(o.conv)[..., pos] = True
            if o.bias is not None and o.bias in new:
                new[o.bias][pos] = 0.0
                mask_of(o.bias)[pos] = True
            if o.bn is not None:
                for suffix in (".weight", ".bias"):
                    new[o.bn + suffix][pos] = 0.0
                    mask_of(o.bn + suffix)[pos] = True
    if verbose:
        print("Structured prune: kept %d of %d channels (%.1f%% pruned)"
              % (kept_total, total, 100.0 * (1 - kept_total / max(total, 1))))
    return new, masks


def _group_dead(params: Params, g: Group) -> np.ndarray:
    """Channels of ``g`` that are exactly zero at EVERY producer (kernel
    out-slice, bias, BN gamma+beta) — the compactable set."""
    dead = np.ones(g.size, bool)
    for o in g.outs:
        w = np.asarray(params[o.conv])[..., o.start:o.start + g.size]
        d = ~np.any(w, axis=tuple(range(w.ndim - 1)))
        if o.bias is not None and o.bias in params:
            d &= np.asarray(params[o.bias])[o.start:o.start + g.size] == 0
        if o.bn is not None:
            d &= np.asarray(params[o.bn + ".weight"])[o.start:o.start + g.size] == 0
            d &= np.asarray(params[o.bn + ".bias"])[o.start:o.start + g.size] == 0
        dead &= d
    return dead


def compact(model, params: Params, min_keep: int = 1
            ) -> Tuple[Params, Dict[str, int]]:
    """Remove structurally-dead channels: an exact rewrite up to float
    reassociation (the zoo apply on the returned slim dict matches the
    masked dict — tests/test_slim.py). Returns (slim_params, per-group
    kept counts).

    Works on any params whose dead channels satisfy the post-BN-zero
    invariant :func:`prune_channels` establishes (and the masked-gradient
    finetune preserves)."""
    groups = channel_groups(model)
    np_params = {k: np.asarray(v) for k, v in params.items()}

    out_keep: Dict[str, np.ndarray] = {}   # weight name -> out-axis keep vec
    in_keep: Dict[str, np.ndarray] = {}    # weight name -> in-axis keep vec
    vec_keep: Dict[str, np.ndarray] = {}   # bias/bn vector name -> keep vec
    kept: Dict[str, int] = {}

    def keep_vec(store, name, axis_len):
        if name not in store:
            store[name] = np.ones(axis_len, bool)
        return store[name]

    for gi, g in enumerate(groups):
        dead = _group_dead(np_params, g)
        if dead.sum() > g.size - min_keep:  # keep at least min_keep
            alive_order = np.nonzero(dead)[0]
            for idx in alive_order[: int(dead.sum()) - (g.size - min_keep)]:
                dead[idx] = False
        kept[f"group{gi}"] = int(g.size - dead.sum())
        if not dead.any():
            continue
        for o in g.outs:
            kv = keep_vec(out_keep, o.conv, np_params[o.conv].shape[-1])
            kv[o.start:o.start + g.size] &= ~dead
            if o.bias is not None and o.bias in np_params:
                bv = keep_vec(vec_keep, o.bias, np_params[o.bias].shape[0])
                bv[o.start:o.start + g.size] &= ~dead
            if o.bn is not None:
                for suffix in (".weight", ".bias", ".running_mean",
                               ".running_var"):
                    n = o.bn + suffix
                    bv = keep_vec(vec_keep, n, np_params[n].shape[0])
                    bv[o.start:o.start + g.size] &= ~dead
        for i in g.ins:
            kv = keep_vec(in_keep, i.conv, np_params[i.conv].shape[2])
            kv[i.start:i.start + g.size] &= ~dead

    slim: Params = {}
    for name, arr in np_params.items():
        a = arr
        if name in out_keep:
            a = a[..., out_keep[name]]
        if name in in_keep:
            a = a[:, :, in_keep[name], :]
        if name in vec_keep:
            a = a[vec_keep[name]]
        slim[name] = np.ascontiguousarray(a)
    return slim, kept


def param_count(params: Params) -> int:
    return int(sum(np.size(v) for v in params.values()))


def validate_groups(model, params: Params) -> None:
    """Structural sanity of a family's groups against actual param shapes:
    every referenced tensor exists, every slice is in range, out-axis ranges
    within one tensor don't overlap across groups, and every group's
    producers/consumers agree on the group width. Raises on violation."""
    groups = channel_groups(model)
    covered: Dict[str, np.ndarray] = {}
    for g in groups:
        assert g.outs and g.size > 0, g
        for o in g.outs:
            w = np.asarray(params[o.conv])
            assert w.ndim == 4, (o.conv, w.shape)
            assert o.start + g.size <= w.shape[-1], (o, g.size, w.shape)
            cov = covered.setdefault(o.conv, np.zeros(w.shape[-1], bool))
            seg = cov[o.start:o.start + g.size]
            assert not seg.any(), f"overlapping out groups on {o.conv}"
            seg[:] = True
            if o.bias is not None and o.bias in params:
                assert np.asarray(params[o.bias]).shape[0] >= o.start + g.size
            if o.bn is not None:
                assert np.asarray(params[o.bn + ".weight"]).shape[0] \
                    >= o.start + g.size, o
        for i in g.ins:
            w = np.asarray(params[i.conv])
            assert w.ndim == 4, (i.conv, w.shape)
            assert i.start + g.size <= w.shape[2], (i, g.size, w.shape)
    # every out axis referenced is fully covered by its groups (no orphan
    # channels inside a touched tensor — a naming bug would leave gaps)
    for name, cov in covered.items():
        assert cov.all(), f"{name}: channels {np.nonzero(~cov)[0]} uncovered"


# =============================================================================
# Belly-only precursor (r4 measured record)
# =============================================================================
# The first structured-pruning cut removed channels from ROBO-UNet's
# bottleneck only (reference model.py:480-483 — a plain conv chain with no
# skip couplings, so each layer keeps an independent channel set). Superseded
# by the whole-network group pruning above (prune_structured/compact), but
# kept as the measured record behind tools/structured_prune.py --keep:
# 128 -> 64 belly channels on a trained checkpoint = mIoU 83.2 -> 82.3 with
# no finetuning, 1.79x faster on the C++ robot engine (PERF.md 1d).


def _belly_layer_names(cfg):
    """PB_1 conv chain names (Conv0 enters the belly; Conv1.. are internal)
    and the PB_2 conv that exits it (reference model.py:480-487)."""
    n_pb1 = max(cfg.belly_size - 1, 1)
    pb1 = [f"PB.PB_1.layers.Conv{i}" for i in range(n_pb1)]
    return pb1, "PB.PB_2.layers.Conv0"


def belly_channel_scores(params: Params, cfg) -> np.ndarray:
    """Per-layer L1 importances, one row per PB_1 conv: row i ranks conv i's
    OUTPUT channels by that conv's own filter norms (Li et al.). Shape
    (n_pb1, belly_planes)."""
    pb1, _ = _belly_layer_names(cfg)
    return np.stack([
        np.abs(np.asarray(params[n + ".conv.weight"])).sum(axis=(0, 1, 2))
        for n in pb1])


def shrink_belly(params: Params, cfg, keep: int):
    """Physically remove the lowest-importance belly channels, each layer
    keeping its own channel set.

    Returns (new params, new cfg with belly_planes=keep, kept index rows —
    shape (n_pb1, keep), row i ascending, the channels conv i keeps). The
    result is a standard ROBO_UNet — it exports, deploys and evaluates like
    any other.
    """
    if cfg.belly_size <= 0:
        raise ValueError("model has no belly (belly_size == 0)")
    if not (0 < keep <= cfg.belly_planes):
        raise ValueError(f"keep={keep} out of range (1..{cfg.belly_planes})")
    scores = belly_channel_scores(params, cfg)
    kept = np.stack([np.sort(np.argsort(row)[::-1][:keep]) for row in scores])

    pb1, pb2 = _belly_layer_names(cfg)
    new = dict(params)

    def slice_out(name, idx):  # conv out channels + bias + bn vectors
        new[name + ".conv.weight"] = \
            np.asarray(params[name + ".conv.weight"])[..., idx]
        for suffix in (".conv.bias", ".bn.weight", ".bn.bias",
                       ".bn.running_mean", ".bn.running_var"):
            key = name + suffix
            if key in params:
                new[key] = np.asarray(params[key])[idx]

    def slice_in(name, idx):
        new[name + ".conv.weight"] = \
            np.asarray(new[name + ".conv.weight"])[:, :, idx, :]

    for i, name in enumerate(pb1):
        slice_out(name, kept[i])
        if i > 0:
            slice_in(name, kept[i - 1])
    slice_in(pb2, kept[-1])

    new_cfg = dataclasses.replace(cfg, belly_planes=int(keep))
    return new, new_cfg, kept
