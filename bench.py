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
    """Median of 3 timed runs, synchronized by FETCHING a scalar derived from
    the last output — block_until_ready can return before execution completes
    on the axon transport (see PERF.md "phantom timings"), so only a D2H
    fetch is a trustworthy barrier. The single ~29 ms fetch RTT inside each
    window biases fps DOWN by <= RTT/window — conservative, never flattering.
    """
    import numpy as np

    y = fn(*args)
    np.asarray(jnp.ravel(y)[0])  # warm + first-fetch stall out of the way

    def once():
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        np.asarray(jnp.ravel(y)[0])
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

    # serving-loop rate: infer + full uint8 label readback per frame (the
    # robot consumes the mask on host; int32 readback would be 4x the bytes)
    import numpy as np
    import time as _t

    pfn8 = jax.jit(pi.infer_u8)
    np.asarray(pfn8(x1))  # warm + first-fetch stall
    def serve_once():
        t0 = _t.perf_counter()
        for _ in range(50):
            lab = np.asarray(pfn8(x1))
        return 50 / (_t.perf_counter() - t0)
    fps_serve = sorted(serve_once() for _ in range(3))[1]
    return fps_f32, fps_bf16, fps_b4, fps_packed, fps_packed_b4, fps_serve


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

    # One throwaway fetch first: the axon tunnel's FIRST device->host copy
    # can stall for minutes (one-time); get it out of the timed region.
    jax.device_get(jnp.zeros(1))

    def measure(cfg):
        train_step = tstep.make_train_step(model, tx, cfg)
        state = tstep.init_state(model, tx, jax.random.PRNGKey(0))
        state, out = train_step(state, imgs, targets, mask,
                                jax.random.PRNGKey(2), lr, None)
        float(out["loss"])

        def once():
            nonlocal state
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = train_step(state, imgs, targets, mask,
                                      jax.random.fold_in(jax.random.PRNGKey(3), i),
                                      lr, None)
            # sync on a VALUE derived from the last step: block_until_ready
            # can return before execution completes on the axon transport
            # (measured: phantom 500+ steps/s vs 16 ms/step in the device
            # trace), so only a D2H fetch is a trustworthy barrier.
            float(m["loss"])
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
        # rematerialized backward (exact; StepCfg.remat)
        out[dtype + "_remat"] = measure(dataclasses.replace(cfg, remat="dots"))
    # the fastest exact path is the headline train configuration
    out["best"] = max(out.values())
    return out


def bench_scan_epoch(n: int = 2048, batch: int = 64, epochs: int = 5):
    """Whole-epoch lax.scan training throughput (images/sec) through the
    Trainer on an HBM-cached synthetic dataset — the pipeline cli.train uses.
    n is sized so the fixed per-epoch cost (one metrics device_get: ~29 ms
    tunnel RTT) amortizes over 32 scanned batches."""
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

    The dataset ships raw uint8 and normalizes ON DEVICE (StreamingBatches
    device_transform): host->device transfer bandwidth is the streaming
    roofline (the axon tunnel moves ~35-40 MB/s — a local PCIe host does
    GB/s), so bytes-on-the-wire is the honest thing to optimize. Returns
    (streamed_ips, cached_ips, transfer_roofline_ips)."""
    import numpy as np

    from robocupvision_tpu.data.device_cache import DeviceCache
    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (n, 120, 160, 3), np.uint8)
    labs = rng.integers(0, 5, (n, 120, 160)).astype(np.int32)

    labs8 = labs.astype(np.uint8)

    class HostDataset:  # ship compact: uint8 frames AND uint8 labels
        def __len__(self):
            return n

        def __getitem__(self, i):
            return (raw[i], labs8[i])

    def normalize(x, t):
        return (x.astype(jnp.float32) - 127.5) / 127.5, t.astype(jnp.int32)

    ds = HostDataset()
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype="bfloat16")
    tr = Trainer(zoo.make("robo_unet"), optim.adam(), cfg, None, None, batch,
                 scan_epochs=False)
    tr.init()
    tr.train_epoch_streamed(1e-3, ds, device_transform=normalize)  # compile
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch_streamed(1e-3, ds, device_transform=normalize)
    streamed = n * epochs / (time.perf_counter() - t0)

    # transfer roofline: time pure host->device puts of the same bytes
    sample = np.stack([raw[i] for i in range(batch)])
    lab_b = labs8[:batch]
    jax.device_put(sample).block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        a = jax.device_put(sample)
        b = jax.device_put(lab_b)
        jax.block_until_ready((a, b))
    roofline = batch * reps / (time.perf_counter() - t0)

    imgs_f32 = (raw.astype(np.float32) - 127.5) / 127.5
    tr.train_cache = DeviceCache.from_numpy(imgs_f32, labs)
    tr.train_epoch(1e-3)  # compile/warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        tr.train_epoch(1e-3)
    cached = n * epochs / (time.perf_counter() - t0)
    return streamed, cached, roofline


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


def _run_stage(stage: str):
    """Execute one bench stage in THIS process and print its JSON result.

    Stages run in separate interpreters: one workload per process is how
    production jobs run, and it keeps each stage's numbers independent of
    the axon tunnel's per-process state (first-fetch stall, sync-mode
    changes — see PERF.md "measuring through the axon tunnel").
    """
    import numpy as _np

    if stage == "vga":
        out = bench_vga_inference()
    elif stage == "train":
        out = bench_train_steps()
    elif stage == "scan":
        out = bench_scan_epoch()
    elif stage == "streamed":
        out = bench_streamed_epoch()
    elif stage == "torch":
        out = bench_torch_cpu_baseline()
    else:
        raise SystemExit(f"unknown stage {stage}")
    print("STAGE_RESULT:" + json.dumps(
        out if not isinstance(out, tuple) else list(out),
        default=lambda o: float(o) if isinstance(o, _np.floating) else o))


def _stage_subprocess(stage: str, fallback=None, retries: int = 1):
    """Run one stage in a fresh interpreter; retry once (the axon tunnel
    intermittently stalls at first compile/fetch), then fall back so a
    single broken stage can't take down the whole benchmark report."""
    import os
    import subprocess

    for _ in range(retries + 1):
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                                   "--stage", stage], env=dict(os.environ),
                                  capture_output=True, text=True, timeout=3000)
        except subprocess.TimeoutExpired:
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("STAGE_RESULT:"):
                return json.loads(line[len("STAGE_RESULT:"):])
        sys.stderr.write(proc.stdout + proc.stderr)
    sys.stderr.write(f"bench stage {stage} failed; reporting fallback\n")
    return fallback


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--stage":
        _run_stage(sys.argv[2])
        sys.exit(0)

    fps_f32, fps_bf16, fps_b4, fps_packed, fps_packed_b4, fps_serve = \
        _stage_subprocess("vga", fallback=[0.0] * 6)
    steps = _stage_subprocess("train", fallback={
        "float32": 0.0, "float32_packed": 0.0, "float32_remat": 0.0,
        "bfloat16": 0.0, "bfloat16_packed": 0.0, "bfloat16_remat": 0.0,
        "best": 0.0})
    epoch_ips = _stage_subprocess("scan", fallback=0.0)
    streamed_ips, cached_ips, transfer_roof_ips = \
        _stage_subprocess("streamed", fallback=[0.0, 1.0, 1.0])
    torch_steps = _stage_subprocess("torch")
    gf_vga, gf_qvga = analytic_gflops()
    # train ~= 3x forward cost (fwd + 2x in bwd); rate = the best of the
    # per-step microbench and the fused scan pipeline (imgs/s / batch) —
    # the scan path is the production pipeline and the steadier measurement
    train_rate = max(steps["best"], epoch_ips / 64.0)
    train_gflops = 3 * 64 * gf_qvga * train_rate
    print(json.dumps({
        "metric": "robo_unet_vga_640x480_inference_fps_per_chip",
        "value": round(fps_packed, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_packed / 30.0, 2),
        "extra": {
            "fps_packed_bf16_b1": round(fps_packed, 2),
            "fps_packed_bf16_b4_throughput": round(fps_packed_b4, 2),
            "fps_serving_incl_u8_label_readback": round(fps_serve, 2),
            "fps_bf16_b1_standard_graph": round(fps_bf16, 2),
            "fps_f32_b1": round(fps_f32, 2),
            "fps_bf16_b4_throughput": round(fps_b4, 2),
            "train_steps_per_sec_b64_qvga_f32": round(steps["float32"], 2),
            "train_steps_per_sec_b64_qvga_bf16": round(steps["bfloat16"], 2),
            "train_steps_per_sec_b64_qvga_f32_packed":
                round(steps["float32_packed"], 2),
            "train_steps_per_sec_b64_qvga_bf16_packed":
                round(steps["bfloat16_packed"], 2),
            "train_steps_per_sec_b64_qvga_bf16_remat":
                round(steps["bfloat16_remat"], 2),
            "train_steps_per_sec_b64_qvga_best": round(steps["best"], 2),
            "scan_epoch_train_imgs_per_sec_bf16": round(epoch_ips, 1),
            "streamed_train_imgs_per_sec_bf16": round(streamed_ips, 1),
            "streamed_vs_cached_per_step_pct":
                round(100 * streamed_ips / cached_ips, 1),
            "streamed_vs_transfer_roofline_pct":
                round(100 * streamed_ips / transfer_roof_ips, 1),
            "analytic_fwd_gflops_vga": round(gf_vga, 3),
            "infer_bf16_b1_gflops_per_sec": round(gf_vga * fps_packed, 1),
            "infer_bf16_b1_mfu_pct":
                round(100 * gf_vga * fps_packed / _V5E_BF16_PEAK_GFLOPS, 3),
            "train_bf16_analytic_gflops_per_sec": round(train_gflops, 1),
            "train_bf16_mfu_pct":
                round(100 * train_gflops / _V5E_BF16_PEAK_GFLOPS, 3),
            **({"torch_cpu_reference_steps_per_sec": round(torch_steps, 3),
                "train_speedup_vs_torch_cpu":
                    round(train_rate / torch_steps, 1),
                "train_speedup_vs_torch_cpu_f32":
                    round(max(steps["float32"], steps["float32_packed"])
                          / torch_steps, 1)}
               if torch_steps else {}),
        },
    }))
