"""Batch-1 mask dump CLI — the reference's ``python detect.py``.

Reproduces detect.py:25-141: loads the train.py-family checkpoint, prints the
sparsity-aware op counts, runs over the val split at batch 1 and writes
colorized argmax masks (BGR like the reference's cv2.imwrite) to output/.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Mask dumping")
    for flag in ["--finetune", "--v2", "--noScale", "--UNet", "--useDice",
                 "--noBall", "--noGoal", "--noRobot", "--noLine", "--topCam",
                 "--bottomCam"]:
        p.add_argument(flag, action="store_true", default=False)
    p.add_argument("--packed", action="store_true", default=False,
                   help="use the lane-packed inference graph (framework "
                        "extension, ~4x faster on TPU; identical outputs — "
                        "see PERF.md; default architecture only)")
    p.add_argument("--root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "../../Data/RoboCup"))
    p.add_argument("--ckpt", type=str, default="",
                   help="explicit checkpoint path override (framework "
                        "extension) — e.g. a structurally-pruned .slim "
                        "artifact from --pruneStruct / structured_prune; "
                        "slim widths flow through the graph and the op "
                        "counts automatically")
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.data.datasets import SSYUVDataset
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops.labels import colorize
    from robocupvision_tpu.train import checkpoint, naming

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
    lab_size = (480 // scale, 640 // scale)
    # detect.py's own hyper table (detect.py:96-100) differs from train.py's:
    num_planes = 16 if opt.v2 else 8
    levels = 3 if opt.UNet else (1 if opt.v2 else 2)
    depth = 4
    belly_size = 0 if opt.UNet else (2 if opt.v2 else 5)
    belly_planes = num_planes * 2 ** (depth - 1) if opt.v2 else num_planes * 2 ** depth

    name = naming.test_ckpt_glob_base(flags)
    weights_path = opt.ckpt or (name + ".weights")

    ds = SSYUVDataset(opt.root, lab_size, False, opt.finetune, camera)
    if len(ds) == 0:
        print(f"No data found under {opt.root}")
        return -1

    print("#" * 54)
    print("##################### Detection ######################")
    print("#" * 54)

    model = zoo.make("robo_unet", no_scale=opt.noScale,
                     num_classes=flags.num_classes, planes=num_planes,
                     depth=depth, levels=levels, belly_size=belly_size,
                     belly_planes=belly_planes, pool=opt.UNet, v2=opt.v2)
    params_np = checkpoint.load_any(weights_path, model.registry)
    comp = zoo.robo_unet_get_computations(model.cfg, params_np, pruned=True)
    print([round(c) for c in comp])
    print(round(sum(comp)))
    params = {k: jnp.asarray(v) for k, v in params_np.items()}

    if opt.packed:
        from robocupvision_tpu.models import packed as packed_mod

        # f32: measured the same speed as bf16 on v5e (both bound by fixed
        # costs, PERF.md) and keeps masks byte-identical to the plain path
        pi = packed_mod.build_packed_infer(model, params_np,
                                           dtype=jnp.float32)
        packed_infer = jax.jit(pi.infer)

        def infer(params, x):
            return packed_infer(x)
    else:
        @jax.jit
        def infer(params, x):
            logits, _ = model.apply(params, x, train=False)
            return jnp.argmax(logits, axis=-1)

    os.makedirs("output", exist_ok=True)
    print("\nPerforming object detection:")
    from PIL import Image

    for i in range(len(ds)):
        img, _ = ds[i]
        pred = np.asarray(infer(params, jnp.asarray(img[None]))[0])
        mask = colorize(pred, 5)[..., ::-1]  # BGR on disk, like cv2.imwrite
        Image.fromarray(mask).save("output/%d.png" % i)
    print(f"wrote {len(ds)} masks to output/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
