"""Full evaluation CLI — the reference's ``python test.py``.

Reproduces test.py:215-353: evaluates the family of checkpoints selected by
the flags (transfer/pruned variants sorted descending, then the base),
printing pixel/class/IoU metrics plus object-level precision-recall at the
IoU thresholds {0.75,0.5,0.25,0.1,0.05} and centroid-distance thresholds
{1.25,2.5,5,10,20} (x2 at VGA); ``--lProp`` chains Farneback-warped
predictions across LPDataSet sequences and scores the propagation too.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Segmentation evaluation")
    for flag, h in [("--finetune", "Finetuning"), ("--v2", "Use v2 architecture"),
                    ("--noScale", "Use VGA resolution"), ("--UNet", "Use Vanilla U-Net"),
                    ("--useDice", "Use Dice Loss"), ("--noBall", "Treat Ball as Background"),
                    ("--noGoal", "Treat Goal as Background"),
                    ("--noRobot", "Treat Robot as Background"),
                    ("--noLine", "Treat Lines as Background"),
                    ("--topCam", "Use Top Camera images only"),
                    ("--bottomCam", "Use Bottom Camera images only"),
                    ("--transfer", "Evaluate transfer checkpoints"),
                    ("--lProp", "Test label propagation")]:
        p.add_argument(flag, help=h, action="store_true", default=False)
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "../../Data/RoboCup"))
    p.add_argument("--batchSize", type=int, default=None)
    p.add_argument("--bf16", help="bfloat16 compute (f32 master weights)",
                   action="store_true", default=False)
    p.add_argument("--labSize", help="Override working resolution H W "
                   "(testing aid; the reference sizes are the default)",
                   type=int, nargs=2, default=None)
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.cli.train import model_hyper
    from robocupvision_tpu.data.datasets import LPDataSet, SSYUVDataset
    from robocupvision_tpu.data.device_cache import DeviceCache, epoch_batches
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops import objmetrics, optflow
    from robocupvision_tpu.ops.labels import mask_label_table
    from robocupvision_tpu.ops.metrics import SegAccum, seg_finalize, to_host
    from robocupvision_tpu.train import checkpoint, naming
    from robocupvision_tpu.train.step import StepCfg, make_eval_step

    flags = naming.Flags(finetune=opt.finetune, v2=opt.v2, no_scale=opt.noScale,
                         unet=opt.UNet, no_ball=opt.noBall, no_goal=opt.noGoal,
                         no_robot=opt.noRobot, no_line=opt.noLine,
                         top_cam=opt.topCam, bottom_cam=opt.bottomCam)
    if flags.num_classes <= 1:
        print("You need to have at least one non-background class!")
        return -1
    camera = flags.camera
    if camera != "both" and not opt.finetune:
        print("You can only select camera images for the finetune dataset. "
              "Using both cameras by default")
        camera = "both"

    scale = 2 if opt.noScale else 4
    lab_size = tuple(opt.labSize) if opt.labSize else (480 // scale, 640 // scale)
    out_size = 1.0 / (lab_size[0] * lab_size[1])
    thresholds = [0.75, 0.5, 0.25, 0.1, 0.05]
    d_thresholds = [1.25, 2.5, 5, 10, 20]
    if opt.noScale:
        d_thresholds = [d * 2 for d in d_thresholds]
    len_seq = 4

    # checkpoint family selection (test.py:264-288)
    name = naming.test_ckpt_glob_base(flags)
    weights_path = []
    if opt.transfer:
        weights_path = sorted(glob.glob(name + "T*.weights"), reverse=True)
    elif opt.finetune:
        weights_path = sorted(glob.glob(name + "*_*.weights"), reverse=True)
    weights_path += [name + ".weights"]
    for token, enabled in [("VGA", opt.noScale), ("v2", opt.v2),
                           ("UNet", opt.UNet), ("NoBall", opt.noBall),
                           ("NoGoal", opt.noGoal), ("NoRobot", opt.noRobot),
                           ("NoLine", opt.noLine)]:
        if not enabled:
            weights_path = [p for p in weights_path if token not in p]
    if opt.lProp:
        weights_path = weights_path[:1]

    num_classes = flags.num_classes
    hyper = model_hyper(opt.UNet, opt.v2)
    weights = [1, 2, 6, 3, 2] if opt.useDice else [1, 10, 30, 5, 2]
    if opt.finetune:
        weights = [1, 5, 2, 6, 4]
    keep = [True, not opt.noBall, not opt.noRobot, not opt.noGoal, not opt.noLine]
    cw = tuple(w for w, k in zip(weights, keep) if k)
    mask_flags = (opt.noBall, opt.noRobot, opt.noGoal, opt.noLine)
    batch_size = opt.batchSize or (16 if (opt.finetune or opt.noScale) else 64)

    # data
    if opt.lProp:
        lp = LPDataSet(opt.root, train=False, img_size=lab_size,
                       finetune=opt.finetune, len_seq=len_seq)
        if len(lp) == 0:
            print(f"No LabelProp data under {opt.root}")
            return -1
    else:
        ds = SSYUVDataset(opt.root, lab_size, False, opt.finetune, camera)
        if len(ds) == 0:
            print(f"No data found under {opt.root}")
            return -1
        cache = DeviceCache.from_numpy(*ds.load_all())

    table = mask_label_table(*mask_flags)

    for w_path in weights_path:
        if not os.path.exists(w_path):
            print(f"(skipping missing {w_path})")
            continue
        print("#" * 54)
        print(f"###### Testing {w_path} ######")
        print("#" * 54)

        model = zoo.make("robo_unet", no_scale=opt.noScale,
                         num_classes=num_classes, pool=opt.UNet, v2=opt.v2,
                         **hyper)
        params_np = checkpoint.load_any(w_path, model.registry)
        comp = zoo.robo_unet_get_computations(model.cfg, params_np, pruned=True)
        print([round(c) for c in comp])
        print(round(sum(comp)))
        params = {k: jnp.asarray(v) for k, v in params_np.items()}

        cfg = StepCfg(num_classes=num_classes,
                      loss="dice" if opt.useDice else "ce2d", class_weights=cw,
                      mask_flags=mask_flags, augment=False, out_size=out_size,
                      compute_dtype="bfloat16" if opt.bf16 else "float32")
        eval_step = make_eval_step(model, cfg)

        acc = SegAccum.zero(num_classes)
        tot_loss, n_batches = 0.0, 0
        rec_prec = np.zeros((2, 5))
        rec_prec_lp = np.zeros((2, 5))
        img_cnt = 0

        def eval_batch(bimgs, btgt, bmask, cvimgs=None):
            nonlocal acc, tot_loss, n_batches, img_cnt, rec_prec, rec_prec_lp
            out = eval_step(params, bimgs, btgt, bmask)
            acc = acc + to_host(out["acc"])
            tot_loss += float(out["loss"])
            n_batches += 1
            pred = np.asarray(out["pred"])
            tgt = table[np.asarray(btgt)]
            valid = np.asarray(bmask) > 0
            pred, tgt = pred[valid], tgt[valid]
            b = pred.shape[0]
            img_cnt += b

            mask_pred = np.stack([(pred == c).astype(np.int64)
                                  for c in range(num_classes)])
            mask_tgt = np.stack([(tgt == c).astype(np.int64)
                                 for c in range(num_classes)])
            rec_prec += objmetrics.get_prec_recall_multi(
                mask_pred, mask_tgt, thresholds, d_thresholds)

            if cvimgs is not None:
                pred_lp = np.zeros_like(pred)
                for i in range(b):
                    if i == 0:
                        pred_lp[i] = optflow.update_labels_cv2(
                            pred[i + 1], optflow.optflow_cv2(cvimgs[i], cvimgs[i + 1]))
                    else:
                        pred_lp[i] = optflow.update_labels_cv2(
                            pred_lp[i - 1], optflow.optflow_cv2(cvimgs[i], cvimgs[i - 1]))
                mask_lp = np.stack([(pred_lp == c).astype(np.int64)
                                    for c in range(num_classes)])
                rec_prec_lp += objmetrics.get_prec_recall_multi(
                    mask_lp, mask_tgt, thresholds, d_thresholds)

        if opt.lProp:
            for si in range(len(lp)):
                imgs, labs, grays = lp[si]
                bimgs = jnp.asarray(imgs)
                btgt = jnp.asarray(labs)
                bmask = jnp.ones((imgs.shape[0],), jnp.float32)
                eval_batch(bimgs, btgt, bmask, cvimgs=grays)
        else:
            for bimgs, btgt, bmask in epoch_batches(cache, batch_size, None):
                eval_batch(bimgs, btgt, bmask)

        fin = seg_finalize(acc, out_size)
        rec_prec /= max(img_cnt, 1)
        rec_prec_lp /= max(img_cnt, 1)
        from robocupvision_tpu.ops.pruning import count_zero_weights

        prune = count_zero_weights(params_np, model.param_order)
        print("[Validate][Losses: pruned %f, total %f, avg: %f]"
              "[Pixel Acc: %f, Mean Class Acc: %f, Mean IoU: %f]"
              % (prune, tot_loss / max(n_batches, 1), float(fin["score"]),
                 float(fin["pixel_acc"]), float(fin["mean_class_acc"]),
                 float(fin["mean_iou"])))
        print("Normal")
        print("IoU:", rec_prec[0])
        print("Dist:", rec_prec[1])
        if opt.lProp:
            print("LP")
            print("IoU:", rec_prec_lp[0])
            print("Dist:", rec_prec_lp[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
