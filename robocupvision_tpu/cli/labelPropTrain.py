"""Label-propagation training CLI — the reference's ``python labelPropTrain.py``.

Reproduces labelPropTrain.py:18-319: LPDataSet frame pairs expanded into both
temporal directions as 8-channel inputs [Y_t, Y_other, Y_t - Y_other,
labelToPred(label_other)] (labelPropTrain.py:178-193), LabelProp net trained
with weighted CE, SGD lr 2e-1 (x0.25 finetune), plateau-rollback, optional
--prune with masked gradients; best-val-loss checkpoint
pth/bestModelLP{Finetuned}{Pruned}.pth.

Validation prints per-image mean IoU (the reference's printed IoU carries a
x2 from accumulating batch-joint IoU against a per-sample counter,
labelPropTrain.py:297 — model selection uses val loss in both, so behavior
is unchanged).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Label propagation training")
    p.add_argument("--finetune", action="store_true", default=False)
    p.add_argument("--prune", action="store_true", default=False)
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batchSize", type=int, default=8)
    return p


def build_lp_pairs(imgs: np.ndarray, labs: np.ndarray, num_classes: int):
    """(N,2,H,W,3) YUV images + (N,2,H,W) labels ->
    (2N,H,W,3+C) inputs and (2N,H,W) targets (both directions)."""
    n, _, h, w, _ = imgs.shape
    y = imgs[..., 0]  # (N,2,H,W) luma channel
    oh = np.eye(num_classes, dtype=np.float32) * 2.0 - 1.0  # labelToPred rows
    inputs = np.zeros((2 * n, h, w, 3 + num_classes), np.float32)
    targets = np.zeros((2 * n, h, w), np.int32)
    for k, (a, b) in enumerate([(0, 1), (1, 0)]):
        inputs[k::2, ..., 0] = y[:, a]
        inputs[k::2, ..., 1] = y[:, b]
        inputs[k::2, ..., 2] = y[:, a] - y[:, b]
        inputs[k::2, ..., 3:] = oh[labs[:, b]]
        targets[k::2] = labs[:, a]
    return inputs, targets


def load_lp_cache(root: str, finetune: bool, train: bool, num_classes: int,
                  img_size=(120, 160)):
    from robocupvision_tpu.data.datasets import LPDataSet
    from robocupvision_tpu.data.device_cache import DeviceCache

    ds = LPDataSet(root, train=train, img_size=img_size, finetune=finetune,
                   len_seq=2)
    if len(ds) == 0:
        return None
    all_imgs, all_labs = [], []
    for i in range(len(ds)):
        imgs, labs, _ = ds[i]
        all_imgs.append(imgs)
        all_labs.append(labs)
    inputs, targets = build_lp_pairs(np.stack(all_imgs), np.stack(all_labs),
                                     num_classes)
    return DeviceCache.from_numpy(inputs, targets)


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops import pruning as prune_ops
    from robocupvision_tpu.train import checkpoint, optim
    from robocupvision_tpu.train.legacy import run_plateau_training
    from robocupvision_tpu.train.loop import Trainer
    from robocupvision_tpu.train.step import StepCfg

    num_classes = 5
    fine_str = "Finetuned" if opt.finetune else ""
    prune_str = "Pruned" if opt.prune else ""

    train_cache = load_lp_cache(opt.root, opt.finetune, True, num_classes)
    val_cache = load_lp_cache(opt.root, opt.finetune, False, num_classes)
    if train_cache is None or val_cache is None:
        print(f"No LabelProp data under {opt.root}")
        return -1
    h, w = train_cache.images.shape[1:3]

    model = zoo.make("label_prop", num_classes=num_classes, planes=32)

    cw = (1, 6, 1, 3, 2) if not opt.finetune else (1, 3, 0.5, 2, 1)
    lr = 2e-1 * (0.25 if opt.finetune else 1.0)
    momentum = 0.1 if opt.finetune else 0.5
    epochs = opt.epochs if opt.epochs is not None else \
        (500 if opt.finetune else 200)
    patience = 50 if opt.finetune else 20

    # reference LP training flips horizontally AND vertically
    # (labelPropTrain.py:49-66); color jitter is inapplicable to the prebuilt
    # 8-channel (Y, Y_other, diff, one-hot) inputs, so geometry-only here.
    cfg = StepCfg(num_classes=num_classes, loss="ce2d", class_weights=cw,
                  augment=True, augment_mode="legacy", jitter=False,
                  out_size=1.0 / (h * w))
    tx = optim.sgd(momentum=momentum, weight_decay=1e-3)
    tr = Trainer(model, tx, cfg, train_cache, val_cache, opt.batchSize * 2)
    tr.init()

    if opt.finetune:
        load_path = "pth/bestModelLP" + ("Finetuned" if opt.prune else "") + ".pth"
        print(f"Loading {load_path}")
        tr.set_params(checkpoint.load_any(load_path, model.registry))

    prune_masks = None
    if opt.finetune and opt.prune:
        params, prune_masks = prune_ops.prune_band(tr.params_numpy(),
                                                   model.param_order)
        tr.set_params(params)

    save_path = "pth/bestModelLP" + fine_str + prune_str + ".pth"
    # loss curves, like the reference's LinePlotter (labelPropTrain.py:143,221,303)
    from robocupvision_tpu.utils.plotting import LinePlotter

    plotter = LinePlotter("main")
    best = run_plateau_training(tr, epochs, lr, save_path, patience=patience,
                                prune_masks=prune_masks, select="loss",
                                plotter=plotter)
    plotter.render()
    print("Optimization finished Validation Loss: %.4f Total Acc: %.2f "
          "Mean Class Acc: %.2f IoU: %.2f"
          % (best["loss"], best.get("pixel_acc", 0),
             best.get("mean_class_acc", 0), best.get("mean_iou", 0)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
