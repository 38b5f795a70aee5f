"""Main segmentation training CLI — the reference's ``python train.py``.

Preserves the full flag surface and control flow of reference train.py:205-389:
decay sweeps for finetune, transfer sweeps (10x LR on the first N encoder
levels), Adam + per-epoch CosineAnnealingLR, L1 regularization, best-model
selection on (meanClassAcc + meanIoU)/2, checkpoint name mangling, and the
post-finetune prune(1%-of-max) + 25-epoch masked-gradient phase.

TPU-native differences (behavior-preserving):
- dataset is decoded once and cached in HBM; augmentation runs on device
- metrics are computed on device (no python confusion loops)
- checkpoints are .npz under the reference's exact file names; reference
  torch checkpoints also load (train/checkpoint.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ROBO-UNet segmentation training")
    p.add_argument("--finetune", help="Finetuning", action="store_true", default=False)
    p.add_argument("--v2", help="Use v2 architecture", action="store_true", default=False)
    p.add_argument("--noScale", help="Use VGA resolution", action="store_true", default=False)
    p.add_argument("--UNet", help="Use Vanilla U-Net", action="store_true", default=False)
    p.add_argument("--useDice", help="Use Dice Loss", action="store_true", default=False)
    p.add_argument("--noBall", help="Treat Ball as Background", action="store_true")
    p.add_argument("--noGoal", help="Treat Goal as Background", action="store_true")
    p.add_argument("--noRobot", help="Treat Robot as Background", action="store_true")
    p.add_argument("--noLine", help="Treat Lines as Background", action="store_true")
    p.add_argument("--topCam", help="Use Top Camera images only", action="store_true")
    p.add_argument("--bottomCam", help="Use Bottom Camera images only", action="store_true")
    p.add_argument("--lr", help="Learning rate", type=float, default=1e-3)
    p.add_argument("--decay", help="Weight decay", type=float, default=1e-5)
    p.add_argument("--transfer", help="Layers to truly train", action="store_true")
    # framework extensions (default values preserve reference behavior)
    p.add_argument("--root", help="Dataset root", type=str,
                   default=os.environ.get("ROBOCUP_DATA", "../../Data/RoboCup"))
    p.add_argument("--epochs", help="Override epoch count", type=int, default=None)
    p.add_argument("--batchSize", help="Override batch size", type=int, default=None)
    p.add_argument("--spatial", help="Spatial mesh axis size", type=int, default=1)
    p.add_argument("--bf16", help="bfloat16 compute (f32 master weights)",
                   action="store_true", default=False)
    p.add_argument("--labSize", help="Override working resolution H W "
                   "(testing aid; the reference sizes are the default)",
                   type=int, nargs=2, default=None)
    p.add_argument("--chunkEpochs", help="Epochs per device dispatch: prints "
                   "stream and the best checkpoint is written after every "
                   "chunk (durable mid-run, reference train.py:197-201 "
                   "semantics at chunk granularity); 0 = one dispatch for "
                   "the whole run", type=int, default=25)
    p.add_argument("--resume", help="Write a per-chunk resume snapshot "
                   "(full TrainState + optimizer + best + rng) and, if one "
                   "exists, continue the killed run from it bit-identically",
                   action="store_true", default=False)
    p.add_argument("--pruneStruct", help="Structured pruning ratio for the "
                   "post-finetune phase: prune whole channel groups "
                   "(ops/slim.py) instead of individual weights, run the "
                   "same 25-epoch masked finetune, then compact the best "
                   "params to a slim checkpoint (<pruned name>.slim) with "
                   "genuinely fewer MACs everywhere downstream (packed "
                   "serving, net.cfg export, the C++ engine); 0 = reference "
                   "unstructured pruning", type=float, default=0.0)
    p.add_argument("--slimRound", help="--pruneStruct: round kept widths up "
                   "to a multiple (lane-friendly packed serving; same "
                   "default as tools/structured_prune)", type=int, default=8)
    p.add_argument("--slimMinKeep", help="--pruneStruct: minimum kept "
                   "channels per group", type=int, default=8)
    return p


def model_hyper(unet: bool, v2: bool):
    """train.py:302-307 architecture hyperparameter table."""
    num_planes = 8
    levels = 3 if unet else (1 if v2 else 2)
    depth = 4
    belly_size = 0 if unet else (9 if v2 else 5)
    class_size = 3 if v2 else 1
    belly_planes = num_planes * 2 ** (depth - 1) if v2 else num_planes * 2 ** depth
    return dict(planes=num_planes, levels=levels, depth=depth,
                belly_size=belly_size, class_size=class_size,
                belly_planes=belly_planes)


def main(argv=None) -> int:
    opt = build_parser().parse_args(argv)

    import jax

    from robocupvision_tpu.data.datasets import SSYUVDataset
    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import checkpoint, naming, optim
    from robocupvision_tpu.train.loop import Trainer
    from robocupvision_tpu.train.schedules import CosineAnnealingLR
    from robocupvision_tpu.train.step import StepCfg
    from robocupvision_tpu.ops import pruning as prune_ops

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

    finetune = opt.finetune
    learning_rate = opt.lr
    dec = opt.decay if finetune and not opt.transfer else opt.decay / 10
    transfers = [1, 2, 3, 4] if opt.transfer else [0]
    decays = [10 * dec, 5 * dec, 2 * dec, dec] if (finetune and not opt.transfer) else [dec]

    scale = 2 if opt.noScale else 4
    lab_size = tuple(opt.labSize) if opt.labSize else (480 // scale, 640 // scale)
    out_size = 1.0 / (lab_size[0] * lab_size[1])
    epochs = opt.epochs if opt.epochs is not None else (200 if finetune else 100)
    batch_size = opt.batchSize if opt.batchSize is not None else \
        (16 if finetune else (32 if opt.noScale else 64))

    os.makedirs("output", exist_ok=True)
    os.makedirs("checkpoints", exist_ok=True)

    print(f"Loading dataset from {opt.root} at {lab_size} ...")
    train_ds = SSYUVDataset(opt.root, lab_size, True, finetune, camera)
    val_ds = SSYUVDataset(opt.root, lab_size, False, finetune, camera)
    if len(train_ds) == 0 or len(val_ds) == 0:
        print(f"No data found under {opt.root}")
        return -1
    train_cache = DeviceCache.from_numpy(*train_ds.load_all())
    val_cache = DeviceCache.from_numpy(*val_ds.load_all())
    print(f"train={train_cache.n} val={val_cache.n} images cached on device")

    num_classes = flags.num_classes
    hyper = model_hyper(opt.UNet, opt.v2)

    # class-weight table (train.py:309-313)
    weights = [1, 2, 6, 3, 2] if opt.useDice else [1, 10, 30, 10, 2]
    if finetune:
        weights = [1, 6, 2, 10, 4]
    keep = [True, not opt.noBall, not opt.noRobot, not opt.noGoal, not opt.noLine]
    weights = tuple(w for w, k in zip(weights, keep) if k)

    mask_flags = (opt.noBall, opt.noRobot, opt.noGoal, opt.noLine)

    best_loss_final = 0.0
    done_markers: list = []
    for transfer in transfers:
        if len(transfers) > 1:
            print("#" * 54)
            print(f"############# Finetune with transfer: {transfer} #############")
            print("#" * 54)
        for decay in decays:
            if len(decays) > 1:
                print("#" * 54)
                print(f"############ Finetune with decay: {decay:.1E} ############")
                print("#" * 54)

            # restart bookkeeping FIRST (needs only flags+transfer+decay):
            # a restarted --resume sweep must not re-train combos (or combo
            # phases) that already finished — a fresh rerun would overwrite
            # the best checkpoint with differently-shuffled weights. The
            # marker records the completed PHASE: "main" (training done,
            # pruning finetune possibly not) or "done" (everything).
            path = naming.train_ckpt_name(flags, transfer)
            resume_path = None
            marker = None
            main_done = False
            if opt.resume:
                resume_path = f"{path}.resume-T{transfer}-{decay:g}.npz"
                marker = resume_path + ".done"
                if os.path.exists(marker):
                    with open(marker) as f:
                        txt = f.read().split()
                    best_loss_final = float(txt[1]) if len(txt) > 1 else 0.0
                    done_markers.append(marker)
                    if txt[:1] == ["done"]:
                        print(f"Skipping completed combo transfer={transfer} "
                              f"decay={decay:g} (resume marker)")
                        continue
                    main_done = True
                    print(f"Skipping completed main phase transfer={transfer} "
                          f"decay={decay:g} (resume marker)")

            model = zoo.make("robo_unet", no_scale=opt.noScale,
                             num_classes=num_classes, pool=opt.UNet, v2=opt.v2,
                             **hyper)
            comp = zoo.robo_unet_get_computations(model.cfg)
            print([round(c) for c in comp])
            print(round(sum(comp)))

            if not main_done:
                cfg = StepCfg(num_classes=num_classes,
                              loss="dice" if opt.useDice else "ce2d",
                              class_weights=weights, l1_decay=decay,
                              mask_flags=mask_flags, out_size=out_size,
                              compute_dtype="bfloat16" if opt.bf16 else "float32")
                tx = optim.adam()
                mult = optim.transfer_multipliers(model.param_order, transfer)
                mesh = None
                if len(jax.devices()) > 1 or opt.spatial > 1:
                    from robocupvision_tpu.parallel.mesh import make_mesh

                    mesh = make_mesh(spatial=opt.spatial)
                    print(f"mesh: data={mesh.shape['data']} "
                          f"spatial={mesh.shape['spatial']}")
                tr = Trainer(model, tx, cfg, train_cache, val_cache, batch_size,
                             multipliers=mult, mesh=mesh)
                tr.init(jax.random.PRNGKey(12345678))

                if finetune:
                    load_path = naming.train_load_name(flags)
                    print(f"Loading {load_path}")
                    tr.set_params(checkpoint.load_any(load_path, model.registry))

                eta_min = learning_rate / 25 if opt.transfer else learning_rate / 10
                sched = CosineAnnealingLR([learning_rate], epochs, eta_min)
                lrs = []
                for _ in range(epochs):
                    lrs.append(sched.get_lr()[0])
                    sched.step()

                # the epoch loop runs as scanned device programs in
                # --chunkEpochs-sized dispatches; per-epoch prints stream after
                # each chunk and the best checkpoint is written the moment a
                # chunk improves it — a killed run keeps its best weights
                def on_chunk(off, ms, chunk_best):
                    for i in range(len(ms["better"])):
                        epoch = off + i
                        lr = lrs[epoch]
                        print("[Epoch Train %d/%d lr: %.4f][Losses: reg %f, "
                              "pruned %f, total %f][Pixel Acc: %f]"
                              % (epoch + 1, epochs, lr / learning_rate,
                                 ms["train_reg"][i], ms["pruned"][i],
                                 ms["train_loss"][i], ms["train_pixel_acc"][i]))
                        print("[Epoch Val %d/%d lr: %.4f][Losses: total %f]"
                              "[Pixel Acc: %f, Mean Class Acc: %f, Mean IoU: %f]"
                              % (epoch + 1, epochs, lr / learning_rate,
                                 ms["val_loss"][i], ms["pixel_acc"][i],
                                 ms["mean_class_acc"][i], ms["mean_iou"][i]))
                        if ms["better"][i]:
                            print("Saving best model")
                            print(np.array_str(ms["conf"][i], precision=2,
                                               suppress_small=True))
                    if chunk_best is not None:
                        checkpoint.save(path, model.registry, chunk_best)

                best_loss, best_params, ms = tr.train_run(
                    epochs, lrs, chunk_epochs=opt.chunkEpochs or None,
                    on_chunk=on_chunk, resume_path=resume_path)
                if resume_path is not None and os.path.exists(resume_path):
                    os.remove(resume_path)  # run completed; snapshot obsolete
                if best_params is not None:
                    checkpoint.save(path, model.registry, best_params)
                best_loss_final = best_loss
                if marker is not None:
                    # main phase durable; a restart mid-pruning must not
                    # re-train it (the pruning finetune below is a whole
                    # 25-epoch run — a real crash window)
                    with open(marker, "w") as f:
                        f.write(f"main {float(best_loss_final)!r}")
                    done_markers.append(marker)

            # post-finetune pruning phase (train.py:375-388)
            if finetune and transfer == 0:
                best_path = naming.train_ckpt_name(flags, 0)
                params = checkpoint.load_any(best_path, model.registry)
                if opt.pruneStruct > 0:
                    from robocupvision_tpu.ops import slim as slim_ops

                    slim_groups = slim_ops.channel_groups(model)
                    params, masks = slim_ops.prune_channels(
                        params, slim_groups, opt.pruneStruct,
                        min_keep=opt.slimMinKeep, round_to=opt.slimRound)
                else:
                    params, masks = prune_ops.prune_threshold(
                        params, model.param_order)

                cfg_p = StepCfg(num_classes=num_classes,
                                loss="dice" if opt.useDice else "ce2d",
                                class_weights=weights, l1_decay=0.0,
                                mask_flags=mask_flags, out_size=out_size,
                                compute_dtype="bfloat16" if opt.bf16 else "float32")
                tr = Trainer(model, optim.adam(), cfg_p, train_cache, val_cache,
                             batch_size)
                tr.set_params(params)
                print("Finetuning")

                def on_prune_chunk(off, ms, chunk_best):
                    for i in range(len(ms["better"])):
                        epoch = off + i
                        print("[Epoch Train %d/25][pruned %f, total %f]"
                              "[Pixel Acc: %f]"
                              % (epoch + 1, ms["pruned"][i],
                                 ms["train_loss"][i], ms["train_pixel_acc"][i]))
                        print("[Epoch Val %d/25][total %f][Pixel Acc: %f, "
                              "Mean Class Acc: %f, Mean IoU: %f]"
                              % (epoch + 1, ms["val_loss"][i],
                                 ms["pixel_acc"][i], ms["mean_class_acc"][i],
                                 ms["mean_iou"][i]))
                        if ms["better"][i]:
                            print("Saving best model")

                # mode-tagged snapshot name: a stale snapshot from the OTHER
                # prune mode must never resume into this one (its params
                # don't satisfy this mode's masks — compact() would then
                # silently find nothing to remove)
                mode = "pruneS" if opt.pruneStruct > 0 else "prune"
                prune_resume = f"{path}.resume-{mode}-{decay:g}.npz" \
                    if opt.resume else None
                # unstructured masks barely move the function (near-zero
                # weights zeroed): lr/20 suffices (reference train.py:377).
                # A structured cut removes whole channels — recovery needs
                # the real finetune lr (measured: lr/20 recovers 0.16 vs
                # dense 0.51 mIoU on the tiny harness; lr recovers fully,
                # tests/test_trained_accuracy_parity.py).
                lr_ft = learning_rate if opt.pruneStruct > 0 \
                    else learning_rate / 20
                best_loss, best_params, ms = tr.train_run(
                    25, [lr_ft] * 25, prune_masks=masks,
                    chunk_epochs=opt.chunkEpochs or None,
                    on_chunk=on_prune_chunk, resume_path=prune_resume)
                if prune_resume is not None and os.path.exists(prune_resume):
                    os.remove(prune_resume)
                if best_params is not None:
                    if len(ms) and np.any(ms["better"]):
                        # pct from the epoch that produced best_params: the
                        # filename is an API (train/naming.py)
                        best_epoch = int(np.nonzero(ms["better"])[0][-1])
                        prune_pct = round(float(ms["pruned"][best_epoch]) * 100)
                    else:
                        # resumed run whose best epoch lies in the already-
                        # finished portion (or no metrics at all): recompute
                        # the SAME near-zero metric ms["pruned"] carries
                        # directly on the best params — never ms["pruned"][-1],
                        # which labels the LAST epoch, not the best one
                        prune_pct = round(100.0 * prune_ops.count_zero_weights(
                            best_params, model.param_order))
                    mflops = round(sum(zoo.robo_unet_get_computations(
                        model.cfg, best_params, pruned=True)) / 1e6)
                    pruned_path = naming.train_ckpt_name(flags, 0, pruned=True,
                                                         prune_pct=prune_pct,
                                                         mflops=mflops)
                    checkpoint.save(pruned_path, model.registry, best_params)
                    if opt.pruneStruct > 0:
                        # compact the structurally-dead channels: a slim
                        # sibling artifact with real per-layer width cuts
                        from robocupvision_tpu.ops import slim as slim_ops

                        bp = {k: np.asarray(v) for k, v in best_params.items()}
                        slim_params, _ = slim_ops.compact(model, bp)
                        slim_path = pruned_path + ".slim"
                        checkpoint.save(slim_path, model.registry,
                                        slim_params, slim=True)
                        n0 = slim_ops.param_count(bp)
                        n1 = slim_ops.param_count(slim_params)
                        print("Compacted %s: %d -> %d params (%.1f%% fewer)"
                              % (slim_path, n0, n1, 100.0 * (1 - n1 / n0)))

            # combo fully done (incl. pruning phase) — mark it so a
            # restarted sweep skips it entirely
            if marker is not None:
                with open(marker, "w") as f:
                    f.write(f"done {float(best_loss_final)!r}")
                if marker not in done_markers:
                    done_markers.append(marker)
    for m in done_markers:  # whole sweep finished; a fresh rerun retrains
        if os.path.exists(m):
            os.remove(m)
    return 0


if __name__ == "__main__":
    sys.exit(main())
