"""Benchmark: the reference's headline metric on real TPU hardware.

Measures 480x640 (--noScale / tester.py-style) ROBO-UNet segmentation
inference throughput at batch 1 on one chip, plus train steps/sec at the
train.py default config, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.md north star >30 fps per chip at 640x480.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def bench_vga_inference(iters: int = 200) -> float:
    from robocupvision_tpu.models import zoo

    model = zoo.make("robo_unet", no_scale=True)
    params = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def infer(params, x):
        logits, _ = model.apply(params, x)
        return jnp.argmax(logits, axis=-1)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3), jnp.float32)
    infer(params, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = infer(params, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def bench_train_steps(iters: int = 50) -> float:
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep

    model = zoo.make("robo_unet")
    tx = optim.adam()
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160))
    train_step = tstep.make_train_step(model, tx, cfg)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
    b = 64  # train.py synthetic-pretrain default batch
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 120, 160, 3))
    targets = jnp.zeros((b, 120, 160), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    lr = jnp.float32(1e-3)
    state, _ = train_step(state, imgs, targets, mask, jax.random.PRNGKey(2), lr, None)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(iters):
        state, out = train_step(state, imgs, targets, mask,
                                jax.random.fold_in(jax.random.PRNGKey(3), i),
                                lr, None)
    jax.block_until_ready(state.params)
    return iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    fps = bench_vga_inference()
    steps_s = bench_train_steps()
    print(json.dumps({
        "metric": "robo_unet_vga_640x480_inference_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 2),
        "extra": {"train_steps_per_sec_b64_qvga": round(steps_s, 2)},
    }))
