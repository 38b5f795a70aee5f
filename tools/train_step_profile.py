"""Per-op device profile of the flagship train step (bf16 vs f32).

Motivation (round 5): the driver bench read bf16 59.5 steps/s vs f32 90.6
at QVGA b64, with the devtrace cross-check agreeing (~15.7 ms/step device
busy on the bf16 graph) — i.e. bf16 is slower than f32 ON DEVICE for
training, opposite of inference. This tool traces one config's steady-state
steps and aggregates the device track's op durations by fusion name, so the
extra bf16 cost can be attributed (convert/relayout ops vs conv fusions).

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_step_profile.py \
        [bfloat16|float32] [steps]

Methodology per PERF.md: throwaway fetch first, value-fetch sync inside the
traced run, one process per config (trace collection is a bulk D2H fetch —
never time anything after it in the same process).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dtype: str = "bfloat16", steps: int = 30) -> None:
    import jax
    import jax.numpy as jnp

    from robocupvision_tpu.models import zoo
    from robocupvision_tpu.train import optim, step as tstep
    from robocupvision_tpu.utils.profiling import interval_union_length

    model = zoo.make("robo_unet")
    tx = optim.adam()
    b = 64
    imgs = jax.random.normal(jax.random.PRNGKey(1), (b, 120, 160, 3))
    targets = jnp.zeros((b, 120, 160), jnp.int32)
    mask = jnp.ones((b,), jnp.float32)
    lr = jnp.float32(1e-3)
    cfg = tstep.StepCfg(num_classes=5, class_weights=(1, 10, 30, 10, 2),
                        l1_decay=1e-6, out_size=1.0 / (120 * 160),
                        compute_dtype=dtype)
    train_step = tstep.make_train_step(model, tx, cfg)
    state = tstep.init_state(model, tx, jax.random.PRNGKey(0))

    jax.device_get(jnp.zeros(1))  # first-copy stall out of the timed region
    for i in range(3):            # compile + settle
        state, m = train_step(state, imgs, targets, mask,
                              jax.random.fold_in(jax.random.PRNGKey(2), i),
                              lr, None)
    float(m["loss"])

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(steps):
                state, m = train_step(state, imgs, targets, mask,
                                      jax.random.fold_in(
                                          jax.random.PRNGKey(3), i),
                                      lr, None)
            float(m["loss"])
        files = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        with gzip.open(files[0], "rt") as f:
            trace = json.load(f)

    ev = trace.get("traceEvents", [])
    pid_names = {e["pid"]: str(e.get("args", {}).get("name", ""))
                 for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, nm in pid_names.items()
                if ("TPU" in nm or "/device" in nm) and "host" not in nm.lower()}
    # leaf op events only: group total duration by event name
    by_name: dict = {}
    spans = []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = float(e.get("dur", 0.0))
        spans.append((e["ts"], e["ts"] + dur))
        nm = str(e.get("name", "?"))
        agg = by_name.setdefault(nm, [0.0, 0])
        agg[0] += dur
        agg[1] += 1
    busy = interval_union_length(spans)
    print(f"config={dtype} steps={steps}")
    print(f"device busy: {busy / steps / 1e3:.3f} ms/step "
          f"({steps / (busy / 1e6):.1f} steps/s)")
    print(f"{'us/step':>9}  {'count':>5}  name")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    for nm, (tot, cnt) in rows[:28]:
        print(f"{tot / steps:9.1f}  {cnt:5d}  {nm[:110]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bfloat16",
         int(sys.argv[2]) if len(sys.argv) > 2 else 30)
