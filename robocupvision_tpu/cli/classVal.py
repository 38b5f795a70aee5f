"""Baseline-comparison training CLI — the reference's ``python classVal.py``.

Reproduces classVal.py:14-207 with the *intended* behavior (the reference's
``DownSampler(numFeat, False, dropout)`` call is stale against its own 2-arg
signature — SURVEY.md §2.1): trains either the DownSampler+Classifier pair or
a Hess-et-al. BNN baseline (--hessL / --hessMC) on the
Classification/trainBig tree, evaluating on Classification/test, with SGD +
plateau rollback, best on validation accuracy.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Classifier baseline comparison")
    p.add_argument("--hessL", action="store_true", default=False)
    p.add_argument("--hessMC", action="store_true", default=False)
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--epochs", type=int, default=80)
    return p


class _ComboModel:
    """DownSampler encoder + Classifier head as one model handle.

    classVal.py:130-134 classifies from the encoder's second feature (f3).
    The reference's dropout argument there is stale (its DownSampler takes
    none — SURVEY §2.1), so there is no dropout here either."""

    def __init__(self, num_feat: int, num_classes: int):
        from robocupvision_tpu.models import zoo

        self.down = zoo.make("downsampler", planes=num_feat)
        self.head = zoo.make("classifier", in_planes=num_feat * 2,
                             num_classes=num_classes, pool_size=4)
        self.family = "downsampler+classifier"

    @property
    def param_order(self):
        return (["down." + n for n in self.down.param_order]
                + ["head." + n for n in self.head.param_order])

    @property
    def registry(self):
        from robocupvision_tpu.models.layers import Registry

        r = Registry()
        for n, s in self.down.registry.specs.items():
            r.specs["down." + n] = s.__class__("down." + n, s.shape, s.kind)
        for n, s in self.head.registry.specs.items():
            r.specs["head." + n] = s.__class__("head." + n, s.shape, s.kind)
        return r

    def init(self, rng):
        import jax

        k1, k2 = jax.random.split(rng)
        p = {"down." + k: v for k, v in self.down.init(k1).items()}
        p.update({"head." + k: v for k, v in self.head.init(k2).items()})
        return p

    def apply(self, params, x, *, train=False, rng=None):
        pd = {k[len("down."):]: v for k, v in params.items()
              if k.startswith("down.")}
        ph = {k[len("head."):]: v for k, v in params.items()
              if k.startswith("head.")}
        feats, mut = self.down.apply(pd, x, train=train, rng=rng)
        out, _ = self.head.apply(ph, feats[1], train=train)
        return out, {"down." + k: v for k, v in mut.items()}


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    from robocupvision_tpu.data.datasets import ImageFolder
    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim
    from robocupvision_tpu.train.legacy import run_plateau_training
    from robocupvision_tpu.train.loop import Trainer
    from robocupvision_tpu.train.step import StepCfg

    num_classes = 4
    train_ds = ImageFolder(os.path.join(opt.root, "Classification", "trainBig"))
    val_ds = ImageFolder(os.path.join(opt.root, "Classification", "test"))
    if len(train_ds) == 0 or len(val_ds) == 0:
        print(f"No classification data under {opt.root}")
        return -1
    train_cache = DeviceCache.from_numpy(*train_ds.load_all())
    val_cache = DeviceCache.from_numpy(*val_ds.load_all())

    save_fn = load_fn = None
    if opt.hessL or opt.hessMC:
        model = zoo.make("bnn", variant="MC" if opt.hessMC else "L",
                         num_classes=num_classes)
        save_path = "pth/bestModelHess" + ("MC" if opt.hessMC else "L") + ".pth"
    else:
        model = _ComboModel(32, num_classes)
        save_path = "pth/bestModelB.pth"  # encoder; head goes to bestClassB

        # the reference saves encoder and head as separate state dicts
        # (classVal.py:201-202: bestModelB.pth + bestClassB.pth) — preserve
        # that layout so files interoperate with reference-era artifacts
        from robocupvision_tpu.train import checkpoint as ckpt

        def save_fn(params):
            down = {k[len("down."):]: v for k, v in params.items()
                    if k.startswith("down.")}
            head = {k[len("head."):]: v for k, v in params.items()
                    if k.startswith("head.")}
            ckpt.save("pth/bestModelB.pth", model.down.registry, down)
            ckpt.save("pth/bestClassB.pth", model.head.registry, head)

        def load_fn():
            if not (ckpt.exists("pth/bestModelB.pth")
                    and ckpt.exists("pth/bestClassB.pth")):
                return None
            down = ckpt.load_any("pth/bestModelB.pth", model.down.registry)
            head = ckpt.load_any("pth/bestClassB.pth", model.head.registry)
            return {**{"down." + k: v for k, v in down.items()},
                    **{"head." + k: v for k, v in head.items()}}

    cfg = StepCfg(num_classes=num_classes, loss="ce", augment=True,
                  augment_mode="legacy_hflip", jitter=True, out_size=1.0)
    tx = optim.sgd(momentum=0.9, weight_decay=5e-4)
    tr = Trainer(model, tx, cfg, train_cache, val_cache, 64)
    tr.init()

    best = run_plateau_training(tr, opt.epochs, 1e-2, save_path, patience=10,
                                factor=0.2, threshold=1e-3, select="acc",
                                save_fn=save_fn, load_fn=load_fn)
    print("Finished: Best Validation Loss: %.4f Best Validation Acc: %.2f"
          % (best["loss"], best["acc"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
