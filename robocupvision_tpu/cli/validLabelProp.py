"""Label-propagation evaluation CLI — the reference's ``python validLabelProp.py``.

Reproduces validLabelProp.py:14-180: evaluates either the LP net (with
weights export to ./weightsLP) or the classical Farneback optical-flow
baseline (``--optFlow``), printing pixel acc / mean class acc / mean IoU,
writing colorized predictions to output/LabelProp/..., and the average
per-pair inference latency in ms. ``--jaxFlow`` uses the TPU Farneback
instead of cv2 (framework extension).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Label propagation evaluation")
    p.add_argument("--finetuned", action="store_true", default=False)
    p.add_argument("--pruned", action="store_true", default=False)
    p.add_argument("--optFlow", action="store_true", default=False)
    p.add_argument("--jaxFlow", action="store_true", default=False,
                   help="use the TPU Farneback implementation for --optFlow")
    p.add_argument("--packed", action="store_true", default=False,
                   help="lane-packed LP inference graph (exact rewrite; the "
                   "8-ch full-res input is the repo's worst lane-waste case)")
    p.add_argument("--pallas", action="store_true", default=False,
                   help="with --packed: fused Pallas chain kernels "
                   "(exact rewrite; framework extension)")
    p.add_argument("--int8", action="store_true", default=False,
                   help="with --packed --pallas: static int8 PTQ serving — "
                   "calibrates per-stage activation scales on the first "
                   "val pair (approximate; framework extension, "
                   "models/packed.quantize_int8)")
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.cli.labelPropTrain import build_lp_pairs
    from robocupvision_tpu.data.datasets import LPDataSet
    from robocupvision_tpu.export import deploy
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops import optflow
    from robocupvision_tpu.ops.labels import colorize
    from robocupvision_tpu.ops.metrics import SegAccum, seg_batch_stats_host, seg_finalize
    from robocupvision_tpu.train import checkpoint

    num_classes = 5
    if opt.int8 and not (opt.packed and opt.pallas):
        print("--int8 requires --packed --pallas")
        return -1
    fine_str = "Finetuned" if opt.finetuned else ""
    prune_str = "Pruned" if opt.pruned else ""
    out_dir = os.path.join("output", "LabelProp",
                           "Real" if opt.finetuned else "Synthetic")
    os.makedirs(out_dir, exist_ok=True)

    ds = LPDataSet(opt.root, train=False, img_size=(120, 160),
                   finetune=opt.finetuned, len_seq=2)
    if len(ds) == 0:
        print(f"No LabelProp data under {opt.root}")
        return -1
    h, w = 120, 160
    out_size = 1.0 / (h * w)

    model = zoo.make("label_prop", num_classes=num_classes, planes=32)
    params = None
    infer = None
    if not opt.optFlow:
        path = "pth/bestModelLP" + fine_str + prune_str + ".pth"
        print(f"Loading {path}")
        params_np = checkpoint.load_any(path, model.registry)
        deploy.export_deployment("./weightsLP", model, params_np)
        params = {k: jnp.asarray(v) for k, v in params_np.items()}

        if opt.packed:
            from robocupvision_tpu.models import packed as packed_mod

            # f32 keeps the XLA packed path's label maps byte-identical to
            # the plain path; --pallas compiles real Mosaic kernels on TPU
            # (interpret mode elsewhere) whose f32 tap accumulation order
            # differs from XLA's convs — exact-tie labels can flip there
            pk = dict(pallas=True, pallas_fold_stem=True, pallas_mid=True,
                      pallas_interpret=jax.default_backend() != "tpu") \
                if opt.pallas else {}
            pi = packed_mod.build_packed_label_prop(model, params_np,
                                                    dtype=jnp.float32, **pk)
            if opt.int8:
                imgs0, labs0, _ = ds[0]
                calib, _ = build_lp_pairs(imgs0[None], labs0[None],
                                          num_classes)
                pi = packed_mod.quantize_int8(pi, jnp.asarray(calib))
            packed_infer = jax.jit(pi.infer)

            def infer(params, x):
                return packed_infer(x)
        else:
            @jax.jit
            def infer(params, x):
                logits, _ = model.apply(params, x, train=False)
                return jnp.argmax(logits, axis=-1)

    acc = SegAccum.zero(num_classes)
    t_total = 0.0
    img_cnt = 0
    for i in range(len(ds)):
        imgs, labs, grays = ds[i]
        if opt.optFlow:
            pred = np.zeros((2, h, w), np.int64)
            if opt.jaxFlow:
                f01 = optflow.optflow_jax(grays[1], grays[0])
                f10 = optflow.optflow_jax(grays[0], grays[1])
                pred[0] = np.asarray(optflow.warp_labels_jax(labs[1], f01))
                pred[1] = np.asarray(optflow.warp_labels_jax(labs[0], f10))
            else:
                pred[0] = optflow.update_labels_cv2(
                    labs[1], optflow.optflow_cv2(grays[1], grays[0]))
                pred[1] = optflow.update_labels_cv2(
                    labs[0], optflow.optflow_cv2(grays[0], grays[1]))
            targets = labs
        else:
            inputs, targets = build_lp_pairs(imgs[None], labs[None], num_classes)
            x = jnp.asarray(inputs)
            beg = time.perf_counter()
            out = infer(params, x)
            out.block_until_ready()
            t_total += time.perf_counter() - beg
            pred = np.asarray(out)

        from PIL import Image

        for j in range(pred.shape[0]):
            Image.fromarray(colorize(pred[j], 5)).save(
                os.path.join(out_dir, "%d.png" % (img_cnt + j)))
        img_cnt += pred.shape[0]
        acc = acc + seg_batch_stats_host(jnp.asarray(pred), jnp.asarray(targets),
                                    num_classes)

    fin = seg_finalize(acc, out_size)
    print("Validation Pixel Acc: %.2f Mean Class Acc: %.2f Mean IoU: %.2f"
          % (float(fin["pixel_acc"]), float(fin["mean_class_acc"]),
             float(fin["mean_iou"])))
    print(np.array_str(np.asarray(fin["conf"]), precision=2, suppress_small=True))
    print(t_total / max(img_cnt, 1) * 1000)
    return 0


if __name__ == "__main__":
    sys.exit(main())
