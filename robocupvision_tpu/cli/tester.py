"""Per-image inference CLI — the reference's ``python tester.py``.

Reproduces tester.py:15-189: loads the legacy-pipeline checkpoint
(pth/bestModelSeg...), runs batch-1 inference over the SSDataSet val split,
writes colorized PNG masks to output/, prints confusion/accuracy/mIoU and the
average per-frame latency in ms; ``--dump`` exports the weights.dat (+ the
generated net.cfg) deployment artifacts.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Per-image inference + export")
    for flag, h in [("--finetuned", "Use finetuned net and dataset"),
                    ("--pruned", "Use pruned net"), ("--pruned2", "Use pruned2 net"),
                    ("--noScale", "Use VGA resolution"), ("--v2", "Use PB-FCNv2"),
                    ("--noBall", "Treat Ball as Background"),
                    ("--noGoal", "Treat Goal as Background"),
                    ("--noRobot", "Treat Robot as Background"),
                    ("--noLine", "Treat Lines as Background"),
                    ("--topCam", "Use Top Camera images only"),
                    ("--bottomCam", "Use Bottom Camera images only"),
                    ("--dump", "Dump model parameters"),
                    ("--aot", "with --dump: also write the AOT-compiled "
                     "serving graph (serving.stablehlo, jax.export — "
                     "framework extension, export/aot.py)"),
                    ("--useCuda", "(accepted for compatibility; TPU is used)"),
                    ("--packed", "lane-packed inference graph "
                     "(exact rewrite; framework extension)"),
                    ("--pallas", "with --packed: run the packed conv regions "
                     "as fused Pallas chain kernels (exact rewrite; "
                     "framework extension, ops/pallas_packed.py)"),
                    ("--int8", "with --packed --pallas: static int8 PTQ "
                     "serving — calibrates per-stage activation scales on "
                     "the first val frame (approximate; framework "
                     "extension, models/packed.quantize_int8)")]:
        p.add_argument(flag, help=h, action="store_true", default=False)
    p.add_argument("--root", type=str, default=os.environ.get("ROBOCUP_DATA", "./data"))
    p.add_argument("--pipeline", type=int, default=1, metavar="DEPTH",
                   help="keep DEPTH frames in flight (software-pipelined "
                   "serving; overlaps dispatch/compute/readback — framework "
                   "extension, utils/serving.py). 1 = the reference's serial "
                   "per-frame timing (tester.py:142-144)")
    return p


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.data.datasets import SSDataSet
    from robocupvision_tpu.export import deploy
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.ops.labels import colorize, mask_label_table
    from robocupvision_tpu.ops.metrics import SegAccum, seg_batch_stats_host, seg_finalize
    from robocupvision_tpu.train import checkpoint, naming

    flags = naming.Flags(v2=opt.v2, no_scale=opt.noScale, no_ball=opt.noBall,
                         no_goal=opt.noGoal, no_robot=opt.noRobot,
                         no_line=opt.noLine, top_cam=opt.topCam,
                         bottom_cam=opt.bottomCam)
    if flags.num_classes <= 1:
        print("You need to have at least one non-background class!")
        return -1
    if opt.int8 and not (opt.packed and opt.pallas):
        print("--int8 requires --packed --pallas")
        return -1

    prune_str = "Pruned" if opt.pruned else ("Pruned2" if opt.pruned2 else "")
    camera = flags.camera
    cam_load = camera if opt.finetuned else ""
    scale = 1 if opt.noScale else 4
    lab_size = (480 // scale, 640 // scale)
    out_size = 1.0 / (lab_size[0] * lab_size[1])
    num_classes = flags.num_classes

    root = os.path.join(opt.root, "FinetuneHorizon") if opt.finetuned else opt.root
    out_dir = "./output/FinetuneHorizon/" if opt.finetuned else "./output/"
    os.makedirs(out_dir, exist_ok=True)

    ds = SSDataSet(root, split="val", camera=camera, scale=scale)
    if len(ds) == 0:
        print(f"No data found under {root}")
        return -1

    if opt.v2:
        model = zoo.make("pb_fcn_2", classify=False, num_classes=num_classes)
    else:
        model = zoo.make("pb_fcn", planes=32, num_classes=num_classes,
                         kernel_size=1, no_scale=opt.noScale, classify=False)

    path = naming.legacy_model_name(flags, seg=True, finetuned=opt.finetuned,
                                    pruned=prune_str,
                                    camera=cam_load)
    print(f"Loading {path}")
    params_np = checkpoint.load_any(path, model.registry)
    params = {k: jnp.asarray(v) for k, v in params_np.items()}

    if opt.dump:
        # reference path formula (tester.py:122): "./weights/" + variant parts
        dump_dir = "./weights/" + ("VGA" if opt.noScale else "") + \
            ("v2" if opt.v2 else "") + ("NoBall" if opt.noBall else "") + \
            ("NoGoal" if opt.noGoal else "") + ("NoRobot" if opt.noRobot else "") + \
            ("NoLine" if opt.noLine else "") + cam_load
        fname = "weights.dat" if opt.pruned else "weights2.dat"
        if opt.v2:
            from robocupvision_tpu.export import weights_io

            os.makedirs(dump_dir, exist_ok=True)
            weights_io.save_params(dump_dir, model.registry, params_np,
                                   fname=fname, skip_classifier=True)
        else:
            deploy.export_deployment(dump_dir, model, params_np, fname=fname)
        print(f"Dumped weights to {dump_dir}/{fname}")
        if opt.aot:
            from robocupvision_tpu.export import aot

            # bake the actual frame shape (the compiled artifact is
            # shape-specialized, like the benchmarked serving graph) and
            # the serving mode under test: --pallas bakes the fused chain
            # kernels (real Mosaic for a TPU backend), --int8 the static
            # PTQ graph calibrated on the first val frame
            hw = tuple(ds[0][0].shape[:2])
            out = aot.export_serving(
                dump_dir, model, params_np, hw=hw, dtype=jnp.float32,
                pallas=opt.pallas, int8=opt.int8,
                calib_x=ds[0][0][None] if opt.int8 else None)
            print(f"Dumped AOT serving graph to {out}")

    table = mask_label_table(opt.noBall, opt.noRobot, opt.noGoal, opt.noLine)

    if opt.packed:
        from robocupvision_tpu.models import packed as packed_mod

        # f32 keeps the XLA packed path's label maps byte-identical to the
        # plain path; --pallas compiles real Mosaic kernels on TPU
        # (interpret mode elsewhere) whose f32 tap accumulation order
        # differs from XLA's convs — exact-tie labels can flip there
        pk = dict(pallas=True,
                  pallas_interpret=jax.default_backend() != "tpu") \
            if opt.pallas else {}
        pi = (packed_mod.build_packed_infer(model, params_np, jnp.float32,
                                            **pk)
              if opt.v2 else
              packed_mod.build_packed_pb_fcn(model, params_np, jnp.float32,
                                             **pk))
        if opt.int8:
            pi = packed_mod.quantize_int8(pi, jnp.asarray(ds[0][0][None]))
        packed_infer = jax.jit(pi.infer)

        def infer(params, x):
            return packed_infer(x)
    else:
        @jax.jit
        def infer(params, x):
            logits, _ = model.apply(params, x, train=False)
            return jnp.argmax(logits, axis=-1)

    from PIL import Image

    acc = SegAccum.zero(num_classes)

    def consume(i: int, pred_np, lab):
        Image.fromarray(colorize(pred_np[0], 5)).save(
            os.path.join(out_dir, "%d.png" % i))
        return seg_batch_stats_host(jnp.asarray(pred_np),
                                    jnp.asarray(lab[None]), num_classes)

    if opt.pipeline > 1:
        # throughput mode: decode/save/metrics overlap device compute and
        # readback; the printed ms/frame is END-TO-END wall per frame
        from robocupvision_tpu.utils.serving import ServingPipeline

        pipe = ServingPipeline(lambda x: infer(params, x), depth=opt.pipeline)
        labs = []
        done = 0
        t0 = time.perf_counter()
        for i in range(len(ds)):
            img, lab = ds[i]
            labs.append(table[lab])
            got = pipe.submit(jnp.asarray(img[None]))
            if got is not None:
                acc = acc + consume(done, got, labs[done])
                done += 1
        for got in pipe.flush():
            acc = acc + consume(done, got, labs[done])
            done += 1
        t_total = time.perf_counter() - t0
        print(f"Pipelined serving (depth {opt.pipeline}): end-to-end wall "
              f"per frame below")
    else:
        t_total = 0.0
        for i in range(len(ds)):
            img, lab = ds[i]
            lab = table[lab]
            x = jnp.asarray(img[None])
            beg = time.perf_counter()
            pred = infer(params, x)
            pred.block_until_ready()
            t_total += time.perf_counter() - beg
            acc = acc + consume(i, np.asarray(pred), lab)

    fin = seg_finalize(acc, out_size)
    print("Validation Pixel Acc: %.2f Mean Class Acc: %.2f Mean IoU: %.2f"
          % (float(fin["pixel_acc"]), float(fin["mean_class_acc"]),
             float(fin["mean_iou"])))
    print(np.array_str(np.asarray(fin["conf"]), precision=2, suppress_small=True))
    print(t_total / max(len(ds), 1) * 1000)
    return 0


if __name__ == "__main__":
    sys.exit(main())
