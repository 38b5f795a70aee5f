"""Combined seg + label-propagation inference dump over LP sequences.

The reference's makeLPImages.py is unrunnable Python 2 (print statements,
stale imports — SURVEY.md §2.1); this implements its intended behavior with
the current stack: for each LabelProp validation sequence, run the
segmentation net on frame t, propagate with the LP net to frame t+1, and
write colorized (seg, prop) image pairs.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Seg + LP inference dump")
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--finetuned", action="store_true")
    p.add_argument("--out", type=str, default="output/LPImages")
    opt = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from robocupvision_tpu.cli.labelPropTrain import build_lp_pairs
    from robocupvision_tpu.data.datasets import LPDataSet
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops.labels import colorize
    from robocupvision_tpu.train import checkpoint

    # trainer.py saves finetuned checkpoints with the camera string inserted
    # (pth/bestModelSegbothFinetuned.pth for the default both-cameras run)
    seg_name = "pth/bestModelSeg" + ("bothFinetuned" if opt.finetuned else "") + ".pth"
    lp_name = "pth/bestModelLP" + ("Finetuned" if opt.finetuned else "") + ".pth"
    ds = LPDataSet(opt.root, train=False, img_size=(120, 160),
                   finetune=opt.finetuned, len_seq=2)
    if len(ds) == 0:
        print(f"No LabelProp data under {opt.root}")
        return -1

    seg = zoo.make("pb_fcn", planes=32, num_classes=5, kernel_size=1)
    lp = zoo.make("label_prop", num_classes=5, planes=32)
    seg_params = {k: jnp.asarray(v) for k, v in checkpoint.load_any(
        seg_name, seg.registry).items()}
    lp_params = {k: jnp.asarray(v) for k, v in checkpoint.load_any(
        lp_name, lp.registry).items()}

    @jax.jit
    def infer_seg(params, x):
        logits, _ = seg.apply(params, x)
        return jnp.argmax(logits, axis=-1)

    @jax.jit
    def infer_lp(params, x):
        logits, _ = lp.apply(params, x)
        return jnp.argmax(logits, axis=-1)

    os.makedirs(opt.out, exist_ok=True)
    for i in range(len(ds)):
        imgs, labs, _ = ds[i]
        seg_pred = np.asarray(infer_seg(seg_params, jnp.asarray(imgs)))
        inputs, _ = build_lp_pairs(imgs[None], labs[None], 5)
        lp_pred = np.asarray(infer_lp(lp_params, jnp.asarray(inputs)))
        Image.fromarray(colorize(seg_pred[0])).save(
            osp.join(opt.out, "%d_seg.png" % i))
        Image.fromarray(colorize(lp_pred[0])).save(
            osp.join(opt.out, "%d_lp.png" % i))
    print(f"wrote {len(ds)} (seg, lp) pairs to {opt.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
