"""Classification pretraining CLI — the reference's ``python classTrainer.py``.

Reproduces classTrainer.py:14-193: ImageFolder data, PB_FCN(classify=True) or
PB_FCN_2(classify=True), SGD(momentum 0.9, wd 1e-5) with plateau-rollback
(factor 0.5, patience 20, threshold 1e-3), best on validation loss, saved to
pth/bestModel{VGA}{v2}{ablations}.pth for trainer.py to consume.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Classification pretraining")
    for flag in ["--noScale", "--v2", "--noBall", "--noGoal", "--noRobot",
                 "--noLine"]:
        p.add_argument(flag, action="store_true", default=False)
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--epochs", type=int, default=200)
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    from robocupvision_tpu.data.datasets import ImageFolder
    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import naming, optim
    from robocupvision_tpu.train.legacy import run_plateau_training
    from robocupvision_tpu.train.loop import Trainer
    from robocupvision_tpu.train.step import StepCfg

    flags = naming.Flags(v2=opt.v2, no_scale=opt.noScale, no_ball=opt.noBall,
                         no_goal=opt.noGoal, no_robot=opt.noRobot,
                         no_line=opt.noLine)
    if flags.num_classes <= 1:
        print("You need to have at least one non-background class!")
        return -1
    num_classes = flags.num_classes

    train_ds = ImageFolder(os.path.join(opt.root, "Classification", "train"))
    val_ds = ImageFolder(os.path.join(opt.root, "Classification", "val"))
    if len(train_ds) == 0 or len(val_ds) == 0:
        print(f"No classification data under {opt.root}")
        return -1
    train_cache = DeviceCache.from_numpy(*train_ds.load_all())
    val_cache = DeviceCache.from_numpy(*val_ds.load_all())

    if opt.v2:
        model = zoo.make("pb_fcn_2", classify=True, num_classes=num_classes)
    else:
        model = zoo.make("pb_fcn", planes=32, num_classes=num_classes,
                         kernel_size=1, no_scale=opt.noScale, classify=True)

    batch = 64 if opt.v2 else 32
    cfg = StepCfg(num_classes=num_classes, loss="ce",
                  mask_flags=(opt.noBall, opt.noRobot, opt.noGoal, opt.noLine),
                  augment=True, augment_mode="legacy_hflip", jitter=True,
                  out_size=1.0)
    tx = optim.sgd(momentum=0.9, weight_decay=1e-5)
    tr = Trainer(model, tx, cfg, train_cache, val_cache, batch)
    tr.init()

    save_path = naming.legacy_model_name(flags)
    best = run_plateau_training(tr, opt.epochs, 1e-2, save_path, patience=20,
                                factor=0.5, threshold=1e-3, select="loss")
    print("Finished: Best Validation Loss: %.4f Best Validation Acc: %.2f"
          % (best["loss"], best["acc"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
