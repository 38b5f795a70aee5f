"""Deployment verification CLI (framework extension).

Validates a deployment directory (net.cfg + weights.dat) three ways:
1. JAX interpreter output == live model forward (softmax'd) on random input;
2. native C++ engine output == JAX interpreter, per final output;
3. argmax label maps agree between engine and model.

Usage:
  python -m robocupvision_tpu.cli.verifyDeploy --dir weights/ \
      --family pb_fcn --checkpoint pth/bestModelSeg.pth

This is the user-facing version of the golden-vector contract the reference
delegated to an external engine team (testDumper.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Verify a cfg+weights deployment")
    p.add_argument("--dir", required=True, help="deployment directory")
    p.add_argument("--family", default="pb_fcn",
                   choices=["pb_fcn", "label_prop", "robo_unet"])
    p.add_argument("--checkpoint", default="",
                   help="optional checkpoint to re-export and compare against")
    p.add_argument("--planes", type=int, default=32)
    p.add_argument("--numClasses", type=int, default=5)
    p.add_argument("--kernelSize", type=int, default=1)
    p.add_argument("--noScale", action="store_true", default=False)
    p.add_argument("--height", type=int, default=48)
    p.add_argument("--width", type=int, default=64)
    opt = p.parse_args(argv)

    from robocupvision_tpu.export import deploy, netcfg
    from robocupvision_tpu.export.engine import NativeEngine
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import checkpoint

    kwargs = dict(planes=opt.planes, num_classes=opt.numClasses)
    if opt.family == "pb_fcn":
        kwargs.update(no_scale=opt.noScale, kernel_size=opt.kernelSize)
    model = zoo.make(opt.family, **kwargs)

    cfg_path = os.path.join(opt.dir, "net.cfg")
    dat = [f for f in os.listdir(opt.dir)
           if f.endswith(".dat")] if os.path.isdir(opt.dir) else []
    if not os.path.exists(cfg_path) or not dat:
        print(f"missing net.cfg / *.dat under {opt.dir}")
        return -1
    dat_path = os.path.join(opt.dir, sorted(dat)[0])

    in_ch = 8 if opt.family == "label_prop" else 3
    x = np.random.default_rng(0).standard_normal(
        (1, opt.height, opt.width, in_ch)).astype(np.float32)

    secs = netcfg.parse_cfg(cfg_path)
    flat = np.fromfile(dat_path, dtype="<f4")
    try:
        jax_out = np.asarray(netcfg.run_cfg(secs, flat, x))
        eng = NativeEngine(cfg_path, dat_path)
    except (ValueError, RuntimeError) as e:
        print(f"FAIL: artifacts do not describe a consistent network ({e})")
        return 1
    if not eng.weights_fully_consumed:
        print("FAIL: weights.dat length does not match the cfg graph")
        return 1
    eng_out = eng.forward(np.ascontiguousarray(x[0].transpose(2, 0, 1)))
    diff = float(np.abs(eng_out - jax_out[0].transpose(2, 0, 1)).max())
    agree = float((eng_out.argmax(0) == np.asarray(jax_out[0]).argmax(-1)).mean())
    print(f"engine vs JAX interpreter: max|diff|={diff:.2e}, "
          f"label agreement={agree:.6f}")
    # the engine builds with FMA contraction; ~1e-3 absolute drift on the
    # softmax outputs is expected — label agreement is the operative check
    ok = diff < 5e-3 and agree > 0.999

    if opt.checkpoint:
        try:
            params = checkpoint.load_any(opt.checkpoint, model.registry)
            d = deploy.verify_deployment(opt.dir, model, params, x,
                                         fname=os.path.basename(dat_path))
            print(f"artifacts vs live model: max|diff|={d:.2e}")
        except (AssertionError, KeyError, ValueError, FileNotFoundError,
                RuntimeError) as e:
            print(f"FAIL: checkpoint comparison ({e})")
            ok = False

    print("OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
