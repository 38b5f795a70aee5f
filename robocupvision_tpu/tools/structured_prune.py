"""Structured belly-pruning CLI (framework extension — see ops/structured.py).

Loads a train.py-family ROBO-UNet checkpoint, removes the lowest-importance
bottleneck channels, reports the analytic op counts before/after, and saves a
standard (smaller) checkpoint plus optional deployment artifacts.

  python -m robocupvision_tpu.tools.structured_prune \
      --checkpoint checkpoints/bestFinetune.weights --keep 64 \
      --out checkpoints/bestFinetuneSB64.weights --deploy weightsSB64/
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Structured belly pruning")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--keep", type=int, required=True,
                   help="belly channels to keep")
    p.add_argument("--deploy", default="", help="optional deployment dir")
    # architecture flags (train.py defaults)
    p.add_argument("--noScale", action="store_true", default=False)
    p.add_argument("--v2", action="store_true", default=False)
    p.add_argument("--numClasses", type=int, default=5)
    opt = p.parse_args(argv)

    from robocupvision_tpu.cli.train import model_hyper
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops.structured import shrink_belly
    from robocupvision_tpu.train import checkpoint

    hyper = model_hyper(False, opt.v2)
    model = zoo.make("robo_unet", no_scale=opt.noScale,
                     num_classes=opt.numClasses, v2=opt.v2, **hyper)
    params = checkpoint.load_any(opt.checkpoint, model.registry)

    before = sum(zoo.robo_unet_get_computations(model.cfg))
    new_params, new_cfg, kept = shrink_belly(params, model.cfg, opt.keep)
    new_model = zoo.Model("robo_unet", new_cfg)
    after = sum(zoo.robo_unet_get_computations(new_cfg))
    print(f"belly {model.cfg.belly_planes} -> {opt.keep} channels; "
          f"{before / 1e6:.0f} -> {after / 1e6:.0f} MFLOPs "
          f"({100 * (1 - after / before):.1f}% fewer)")

    checkpoint.save(opt.out, new_model.registry, new_params)
    print(f"saved {opt.out}")
    if opt.deploy:
        from robocupvision_tpu.export import deploy

        deploy.export_deployment(opt.deploy, new_model, new_params)
        print(f"exported {opt.deploy}/net.cfg + weights.dat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
