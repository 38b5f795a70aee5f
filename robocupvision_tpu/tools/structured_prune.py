"""Structured-pruning CLI (framework extension — ops/slim.py).

Two modes over a train.py-family ROBO-UNet checkpoint:

- ``--keep N``: belly-only pruning (ops/slim.py shrink_belly, the r4 precursor) — removes bottleneck
  channels; the result is a *standard* ROBO_UNet with belly_planes=N.
- ``--ratio R``: whole-network structured pruning (ops/slim.py) — scores
  every channel group (skip-coupled sets prune jointly), zeroes the lowest
  R fraction, and compacts to a slim checkpoint with non-uniform per-layer
  widths (saved with the slim marker; every consumer — zoo apply, packed
  serving, exports, the C++ engine — is width-driven). For the
  accuracy-recovering masked finetune between prune and compact, use
  ``cli.train --pruneStruct`` instead.

  python -m robocupvision_tpu.tools.structured_prune \\
      --checkpoint checkpoints/bestFinetune.weights --ratio 0.5 \\
      --out checkpoints/bestFinetuneSlim.weights --deploy weightsSlim/
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Structured pruning")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--keep", type=int, help="belly channels to keep "
                      "(belly-only mode)")
    mode.add_argument("--ratio", type=float, help="fraction of each channel "
                      "group to prune (whole-network mode)")
    p.add_argument("--roundTo", type=int, default=8, help="round kept widths "
                   "up to a multiple (lane-friendly; whole-network mode)")
    p.add_argument("--minKeep", type=int, default=8,
                   help="minimum kept channels per group")
    p.add_argument("--deploy", default="", help="optional deployment dir")
    p.add_argument("--family", default="robo_unet",
                   choices=["robo_unet", "pb_fcn", "label_prop"],
                   help="checkpoint's model family (whole-network mode "
                        "supports every deployable family; belly mode is "
                        "robo_unet only)")
    # architecture flags (train.py / trainer.py / labelPropTrain defaults)
    p.add_argument("--noScale", action="store_true", default=False)
    p.add_argument("--v2", action="store_true", default=False)
    p.add_argument("--UNet", action="store_true", default=False)
    p.add_argument("--numClasses", type=int, default=5)
    p.add_argument("--planes", type=int, default=0,
                   help="override planes (pb_fcn/label_prop default 32)")
    opt = p.parse_args(argv)

    from robocupvision_tpu.cli.train import model_hyper
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import checkpoint

    if opt.family == "robo_unet":
        hyper = model_hyper(opt.UNet, opt.v2)
        if opt.planes:
            hyper["planes"] = opt.planes
        model = zoo.make("robo_unet", no_scale=opt.noScale, pool=opt.UNet,
                         num_classes=opt.numClasses, v2=opt.v2, **hyper)
        before = sum(zoo.robo_unet_get_computations(model.cfg))
    elif opt.family == "pb_fcn":
        model = zoo.make("pb_fcn", planes=opt.planes or 32,
                         num_classes=opt.numClasses, no_scale=opt.noScale)
        before = 0
    else:
        model = zoo.make("label_prop", planes=opt.planes or 32,
                         num_classes=opt.numClasses)
        before = 0
    if opt.keep is not None and opt.family != "robo_unet":
        p.error("--keep (belly mode) is robo_unet only; use --ratio")
    params = checkpoint.load_any(opt.checkpoint, model.registry)

    if opt.keep is not None:
        from robocupvision_tpu.ops.slim import shrink_belly

        new_params, new_cfg, kept = shrink_belly(params, model.cfg, opt.keep)
        new_model = zoo.Model("robo_unet", new_cfg)
        after = sum(zoo.robo_unet_get_computations(new_cfg))
        print(f"belly {model.cfg.belly_planes} -> {opt.keep} channels; "
              f"{before / 1e6:.0f} -> {after / 1e6:.0f} MFLOPs "
              f"({100 * (1 - after / before):.1f}% fewer)")
        checkpoint.save(opt.out, new_model.registry, new_params)
    else:
        from robocupvision_tpu.ops import slim

        groups = slim.channel_groups(model)
        masked, _ = slim.prune_channels(params, groups, opt.ratio,
                                        min_keep=opt.minKeep,
                                        round_to=opt.roundTo)
        new_params, kept = slim.compact(model, masked)
        new_model = model
        n0, n1 = slim.param_count(params), slim.param_count(new_params)
        msg = f"slim: {n0} -> {n1} params ({100 * (1 - n1 / n0):.1f}% fewer)"
        if before:  # analytic op model exists for robo_unet only
            # widths read from the compacted shapes -> the slim net's TRUE
            # cost (the masked nnz ratio misses consumers' dead in-slices)
            after = sum(zoo.robo_unet_get_computations(model.cfg, new_params,
                                                       pruned=True))
            msg += (f"; {before / 1e6:.0f} -> {after / 1e6:.0f} MFLOPs "
                    f"({100 * (1 - after / before):.1f}% fewer)")
        print(msg)
        checkpoint.save(opt.out, model.registry, new_params, slim=True)
    print(f"saved {opt.out}")
    if opt.deploy:
        from robocupvision_tpu.export import deploy

        deploy.export_deployment(opt.deploy, new_model, new_params)
        print(f"exported {opt.deploy}/net.cfg + weights.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
