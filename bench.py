"""Benchmark: the reference's headline metric on real TPU hardware.

Measures ROBO-UNet 480x640 (--noScale, tester.py-style) segmentation
inference on one chip — bf16 batch-1 latency-mode fps as the headline, plus
f32 fps, batched bf16 throughput, and pipelined train steps/sec at the
train.py default config — and prints ONE JSON line:

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


def _time(fn, *args, iters=100):
    """Median of 3 timed runs — the axon tunnel occasionally produces one
    wildly-off measurement (observed 20x-fast once), a single run is not
    trustworthy."""
    fn(*args).block_until_ready()

    def once():
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        y.block_until_ready()
        return (time.perf_counter() - t0) / iters

    return sorted(once() for _ in range(3))[1]


def bench_vga_inference():
    from robocupvision_tpu.models import packed, zoo

    model = zoo.make("robo_unet", no_scale=True)
    params = model.init(jax.random.PRNGKey(0))

    def make_infer(dtype):
        @jax.jit
        def infer(params, x):
            logits, _ = model.apply(params, x.astype(dtype))
            return jnp.argmax(logits, axis=-1)
        return infer

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 480, 640, 3), jnp.float32)
    fps_f32 = 1.0 / _time(make_infer(jnp.float32), params, x1)
    fps_bf16 = 1.0 / _time(make_infer(jnp.bfloat16), params, x1)
    x4 = jax.random.normal(jax.random.PRNGKey(1), (4, 480, 640, 3), jnp.float32)
    fps_b4 = 4.0 / _time(make_infer(jnp.bfloat16), params, x4, iters=50)

    # lane-packed inference graph (exact rewrite; PERF.md) — the headline
    pi = packed.build_packed_infer(model, params, dtype=jnp.bfloat16)
    pfn = jax.jit(pi.infer)
    fps_packed = 1.0 / _time(pfn, x1, iters=300)
    fps_packed_b4 = 4.0 / _time(pfn, x4, iters=100)
    return fps_f32, fps_bf16, fps_b4, fps_packed, fps_packed_b4


def bench_train_steps(iters: int = 50):
    import dataclasses

    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep

    model = zoo.make("robo_unet")
    tx = optim.adam()
    b = 64  # train.py synthetic-pretrain default batch
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 120, 160, 3))
    targets = jnp.zeros((b, 120, 160), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    lr = jnp.float32(1e-3)

    def measure(cfg):
        train_step = tstep.make_train_step(model, tx, cfg)
        state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
        state, _ = train_step(state, imgs, targets, mask, jax.random.PRNGKey(2),
                              lr, None)
        jax.block_until_ready(state.params)

        def once():
            nonlocal state
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = train_step(state, imgs, targets, mask,
                                      jax.random.fold_in(jax.random.PRNGKey(3), i),
                                      lr, None)
            jax.block_until_ready(state.params)
            return iters / (time.perf_counter() - t0)

        return sorted(once() for _ in range(3))[1]

    out = {}
    for dtype in ("float32", "bfloat16"):
        cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                            l1_decay=1e-6, out_size=1.0 / (120 * 160),
                            compute_dtype=dtype)
        out[dtype] = measure(cfg)
        # lane-packed training graph (exact rewrite; models/packed.py)
        out[dtype + "_packed"] = measure(dataclasses.replace(cfg, packed=True))
    # the fastest exact path is the headline train configuration
    out["best"] = max(out.values())
    return out


def bench_scan_epoch(n: int = 512, batch: int = 64, epochs: int = 5):
    """Whole-epoch lax.scan training throughput (images/sec) through the
    Trainer on an HBM-cached synthetic dataset — the pipeline cli.train uses."""
    import numpy as np

    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((n, 120, 160, 3)).astype(np.float32)
    labs = rng.integers(0, 5, (n, 120, 160)).astype(np.int32)
    cache = DeviceCache.from_numpy(imgs, labs)
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype="bfloat16")
    tr = Trainer(zoo.make("robo_unet"), optim.adam(), cfg, cache, cache, batch)
    tr.init()
    tr.train_epoch(1e-3)  # compile
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch(1e-3)
    return n * epochs / (time.perf_counter() - t0)


def bench_streamed_epoch(n: int = 512, batch: int = 64, epochs: int = 3):
    """Streamed training (prefetching host pipeline, data/streaming.py) vs
    the same per-step path fed from the HBM cache — the big-dataset story.
    The host dataset pays a realistic per-item decode cost (uint8 ->
    normalized f32). Returns (streamed_ips, cached_ips)."""
    import numpy as np

    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (n, 120, 160, 3), np.uint8)
    labs = rng.integers(0, 5, (n, 120, 160)).astype(np.int32)
    mean = np.float32(127.5)

    class HostDataset:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return ((raw[i].astype(np.float32) - mean) / mean, labs[i])

    ds = HostDataset()
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype="bfloat16")
    tr = Trainer(zoo.make("robo_unet"), optim.adam(), cfg, None, None, batch,
                 scan_epochs=False)
    tr.init()
    tr.train_epoch_streamed(1e-3, ds)  # compile
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch_streamed(1e-3, ds)
    streamed = n * epochs / (time.perf_counter() - t0)

    imgs_f32 = np.stack([ds[i][0] for i in range(n)])
    tr.train_cache = DeviceCache.from_numpy(imgs_f32, labs)
    tr.train_epoch(1e-3)  # compile/warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch(1e-3)
    cached = n * epochs / (time.perf_counter() - t0)
    return streamed, cached


def bench_torch_cpu_baseline(iters: int = 3):
    """The reference's own model on torch-CPU (this host), same workload:
    batch-64 QVGA fwd+bwd+Adam step. Returns steps/sec or None if the
    reference isn't mounted. This is the BASELINE.md >=5x comparison point."""
    import os

    if not os.path.isdir("/root/reference"):
        return None
    try:
        import sys

        sys.path.insert(0, "/root/reference")
        import torch

        import model as refmodel

        tm = refmodel.ROBO_UNet()
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
        crit = refmodel.CrossEntropyLoss2d(torch.tensor([1., 10, 30, 10, 2]))
        x = torch.randn(64, 3, 120, 160)
        t = torch.zeros(64, 120, 160, dtype=torch.long)
        tm.train()
        # warmup
        opt.zero_grad()
        crit(tm(x), t).backward()
        opt.step()
        t0 = time.perf_counter()
        for _ in range(iters):
            opt.zero_grad()
            loss = crit(tm(x), t)
            loss.backward()
            opt.step()
        return iters / (time.perf_counter() - t0)
    except Exception:
        return None


def analytic_gflops():
    """Analytic forward-pass GFLOPs (reference get_computations formulas) for
    the VGA inference graph and the QVGA train graph, so BENCH_r*.json makes
    achieved GFLOP/s (and hence MFU drift) visible across rounds."""
    from robocupvision_tpu.models import zoo

    vga = sum(zoo.robo_unet_get_computations(
        zoo.make("robo_unet", no_scale=True).cfg)) / 1e9
    qvga = sum(zoo.robo_unet_get_computations(zoo.make("robo_unet").cfg)) / 1e9
    return vga, qvga


_V5E_BF16_PEAK_GFLOPS = 197_000.0  # TPU v5e: 197 bf16 TFLOP/s per chip


if __name__ == "__main__":
    fps_f32, fps_bf16, fps_b4, fps_packed, fps_packed_b4 = bench_vga_inference()
    steps = bench_train_steps()
    epoch_ips = bench_scan_epoch()
    streamed_ips, cached_ips = bench_streamed_epoch()
    torch_steps = bench_torch_cpu_baseline()
    gf_vga, gf_qvga = analytic_gflops()
    # train ~= 3x forward cost (fwd + 2x in bwd), x64 images per step
    train_gflops = 3 * 64 * gf_qvga * steps["best"]
    print(json.dumps({
        "metric": "robo_unet_vga_640x480_inference_fps_per_chip",
        "value": round(fps_packed, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_packed / 30.0, 2),
        "extra": {
            "fps_packed_bf16_b1": round(fps_packed, 2),
            "fps_packed_bf16_b4_throughput": round(fps_packed_b4, 2),
            "fps_bf16_b1_standard_graph": round(fps_bf16, 2),
            "fps_f32_b1": round(fps_f32, 2),
            "fps_bf16_b4_throughput": round(fps_b4, 2),
            "train_steps_per_sec_b64_qvga_f32": round(steps["float32"], 2),
            "train_steps_per_sec_b64_qvga_bf16": round(steps["bfloat16"], 2),
            "train_steps_per_sec_b64_qvga_f32_packed":
                round(steps["float32_packed"], 2),
            "train_steps_per_sec_b64_qvga_bf16_packed":
                round(steps["bfloat16_packed"], 2),
            "train_steps_per_sec_b64_qvga_best": round(steps["best"], 2),
            "scan_epoch_train_imgs_per_sec_bf16": round(epoch_ips, 1),
            "streamed_train_imgs_per_sec_bf16": round(streamed_ips, 1),
            "streamed_vs_cached_per_step_pct":
                round(100 * streamed_ips / cached_ips, 1),
            "analytic_fwd_gflops_vga": round(gf_vga, 3),
            "infer_bf16_b1_gflops_per_sec": round(gf_vga * fps_packed, 1),
            "infer_bf16_b1_mfu_pct":
                round(100 * gf_vga * fps_packed / _V5E_BF16_PEAK_GFLOPS, 3),
            "train_bf16_analytic_gflops_per_sec": round(train_gflops, 1),
            "train_bf16_mfu_pct":
                round(100 * train_gflops / _V5E_BF16_PEAK_GFLOPS, 3),
            **({"torch_cpu_reference_steps_per_sec": round(torch_steps, 3),
                "train_speedup_vs_torch_cpu":
                    round(steps["best"] / torch_steps, 1),
                "train_speedup_vs_torch_cpu_f32":
                    round(max(steps["float32"], steps["float32_packed"])
                          / torch_steps, 1)}
               if torch_steps else {}),
        },
    }))
