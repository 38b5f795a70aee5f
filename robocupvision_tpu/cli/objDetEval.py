"""BNN classifier evaluation CLI — the reference's ``python objDetEval.py``.

Reproduces objDetEval.py:15-189: trains BNNL (default; --hessMC for the small
net) on Classification/correctBBsTrain, validates on
Classification/correctBBs, tracking accuracy / false-negative /
false-positive rates over the non-background 3x3 block of the confusion
matrix, with SGD + plateau rollback.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="BNN object-detection evaluation")
    p.add_argument("--hessL", action="store_true", default=False)
    p.add_argument("--hessMC", action="store_true", default=False)
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--epochs", type=int, default=40)
    return p


def fp_fn_stats(conf: np.ndarray):
    """objDetEval.py:171-179: accuracy/FN/FP over the foreground block."""
    total = float(conf[:, 1:4].sum())
    tot_acc = float(conf[1, 1] + conf[2, 2] + conf[3, 3])
    fp = float(conf[1:4, :].sum()) - tot_acc
    if total == 0:
        return 0.0, 0.0, 0.0
    return tot_acc / total * 100, 100 - tot_acc / total * 100, fp / total * 100


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)
    hess_l = opt.hessL
    if not opt.hessMC:
        hess_l = True

    from robocupvision_tpu.data.datasets import ImageFolder
    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim
    from robocupvision_tpu.train.legacy import run_plateau_training
    from robocupvision_tpu.train.loop import Trainer
    from robocupvision_tpu.train.step import StepCfg

    num_classes = 4
    train_ds = ImageFolder(os.path.join(opt.root, "Classification",
                                        "correctBBsTrain"))
    val_ds = ImageFolder(os.path.join(opt.root, "Classification", "correctBBs"))
    if len(train_ds) == 0 or len(val_ds) == 0:
        print(f"No classification data under {opt.root}")
        return -1
    train_cache = DeviceCache.from_numpy(*train_ds.load_all())
    val_cache = DeviceCache.from_numpy(*val_ds.load_all())

    model = zoo.make("bnn", variant="MC" if opt.hessMC else "L",
                     num_classes=num_classes)
    save_path = "pth/bestModelHess" + ("MC" if opt.hessMC else "L") + ".pth"

    cfg = StepCfg(num_classes=num_classes, loss="ce", augment=True,
                  augment_mode="legacy_hflip", jitter=True, out_size=1.0)
    tx = optim.sgd(momentum=0.9, weight_decay=5e-4)
    tr = Trainer(model, tx, cfg, train_cache, val_cache, 64)
    tr.init()

    def report(val):
        acc, fn, fp = fp_fn_stats(np.asarray(val["conf"]))
        print("Best: Accuracy: %.4f False Neg: %.2f False Pos: %.2f"
              % (acc, fn, fp))

    best = run_plateau_training(tr, opt.epochs, 1e-2, save_path, patience=10,
                                factor=0.2, threshold=1e-3, select="acc",
                                on_best=report)
    print("Finished: Best Validation Loss: %.4f Best Validation Acc: %.2f"
          % (best["loss"], best["acc"]))
    if best.get("conf") is not None:
        acc, fn, fp = fp_fn_stats(np.asarray(best["conf"]))
        print("Finished: Accuracy: %.4f False Neg: %.2f False Pos: %.2f"
              % (acc, fn, fp))
    return 0


if __name__ == "__main__":
    sys.exit(main())
