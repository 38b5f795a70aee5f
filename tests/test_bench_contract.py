"""bench.py output contract: the driver parses the LAST stdout JSON line,
so _assemble must always produce a complete, honest report — explicit
failure markers, no fabricated 0.0 headline values (VERDICT r2 weak #6)."""

import importlib.util
import os.path as osp

import pytest


@pytest.fixture(scope="module")
def bench():
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_assemble_empty_reports_null_headline(bench):
    out = bench._assemble({}, ["vga", "train:skipped"])
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["extra"]["failed_stages"] == ["train:skipped", "vga"]
    assert out["metric"] == "robo_unet_vga_640x480_inference_fps_per_chip"


def test_assemble_full_derives_and_renames(bench):
    extra = {
        "fps_packed_bf16_b1": 1600.0,
        "bfloat16": 140.0, "float32": 70.0, "best": 140.0,
        "torch_cpu_reference_steps_per_sec": 0.42,
        "scan_epoch_train_imgs_per_sec_bf16": 11000.0,
        "streamed_train_imgs_per_sec_bf16": 400.0,
        "transfer_roofline_imgs_per_sec": 500.0,
    }
    out = bench._assemble(extra, [])
    e = out["extra"]
    assert out["value"] == 1600.0
    assert out["vs_baseline"] == pytest.approx(1600.0 / 30.0, rel=1e-3)
    # per-step keys renamed to self-describing names
    assert "bfloat16" not in e and "train_steps_per_sec_b64_qvga_bf16" in e
    assert e["train_speedup_vs_torch_cpu"] == pytest.approx(
        max(140.0, 11000.0 / 64.0) / 0.42, rel=1e-2)
    assert e["streamed_vs_transfer_roofline_pct"] == pytest.approx(80.0)
    assert e["infer_bf16_b1_mfu_pct"] > 0
    assert "failed_stages" not in e
    # the caller's dict must not be mutated (emit() runs repeatedly)
    assert "bfloat16" in extra and "analytic_fwd_gflops_vga" not in extra


def test_assemble_headline_falls_back_to_standard_graph(bench):
    out = bench._assemble({"fps_bf16_b1_standard_graph": 400.0}, ["vga"])
    assert out["value"] == 400.0
    assert out["extra"]["failed_stages"] == ["vga"]


def test_assemble_always_carries_last_good(bench):
    """Even a total-outage report (null headline) embeds the committed
    last-good run, so the artifact is never evidence-free (VERDICT r3 #1)."""
    out = bench._assemble({}, ["vga:skipped"])
    assert out["value"] is None
    lg = out["last_good"]
    assert lg["value"] and lg["unit"] == "frames/sec"
    assert lg["timestamp_utc"] and lg["commit"]
    assert "note" not in lg  # prose stripped from the machine block


def test_store_last_good_roundtrip(bench, tmp_path, monkeypatch):
    """Transient run markers (stage failures, recovered-stall/outage
    bookkeeping, error strings) must NOT survive into the committed
    clean-run record — it is replayed as evidence by every later outage
    run (r4 review finding)."""
    monkeypatch.setattr(bench, "_LAST_GOOD", str(tmp_path / "lg.json"))
    payload = {"metric": "m", "value": 1234.5, "unit": "frames/sec",
               "vs_baseline": 41.2,
               "extra": {"fps_packed_bf16_b1": 1234.5,
                         "failed_stages": ["train"],
                         "infra_init_stall_kills": 2,
                         "outage_probe_failures": 2,
                         "outage_wait_secs": 310.5,
                         "pallas_fused_error": "Mosaic..."}}
    bench._store_last_good(payload)
    lg = bench._load_last_good()
    assert lg["value"] == 1234.5
    assert lg["extra"] == {"fps_packed_bf16_b1": 1234.5}  # markers stripped
    assert lg["timestamp_utc"].endswith("Z") and lg["commit"]


def test_stage_plan_orders_scarce_train_metric_first(bench):
    """When the previous driver artifact lacks a train number, torch+train
    run before vga (VERDICT r4 #2: outage pressure must starve the
    thrice-confirmed headline, not the evidence-free metric)."""
    order_tf = [s for s, *_ in bench._stage_plan(train_first=True)]
    assert order_tf[:3] == ["torch", "train", "vga"]
    order_std = [s for s, *_ in bench._stage_plan(train_first=False)]
    assert order_std[0] == "vga" and set(order_std) == set(order_tf)
    # every stage in both plans has a primary key for resume-skip
    for s in order_std:
        assert s in bench._STAGE_KEY


def test_prev_artifact_has_train_reads_newest_bench_json(bench):
    """BENCH_r04.json (the newest committed artifact) lacks the train key,
    so the r5 driver run must schedule train first."""
    assert bench._prev_artifact_has_train() is False


def test_partial_results_roundtrip(bench, tmp_path, monkeypatch):
    """Stage results persist across invocations at the same commit until a
    run completes cleanly; a complete marker or a commit change invalidates
    them (never replay stale numbers)."""
    monkeypatch.setattr(bench, "_PARTIAL", str(tmp_path / "p.json"))
    bench._save_partial({"fps_packed_bf16_b1": 1900.0}, complete=False)
    assert bench._load_partial() == {"fps_packed_bf16_b1": 1900.0}
    # stale by age
    assert bench._load_partial(max_age_secs=0.0) == {}
    # a clean run invalidates the partial
    bench._save_partial({"fps_packed_bf16_b1": 1900.0, "bfloat16": 100.0},
                        complete=True)
    assert bench._load_partial() == {}
    # a different commit invalidates the partial
    bench._save_partial({"fps_packed_bf16_b1": 1.0}, complete=False)
    monkeypatch.setattr(bench, "_git_head", lambda: "somethingelse")
    assert bench._load_partial() == {}


def test_outage_probe_times_out_fast_and_recovers(bench, monkeypatch):
    """A stalled backend init must cost `cap` seconds, not the stage budget;
    a healthy backend must pass. The child is pinned to the CPU backend so
    the semantics under test are the capped-subprocess mechanics, not the
    live tunnel's health."""
    import time

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", "/root/repo")
    t0 = time.monotonic()
    status, _ = bench._outage_probe(0.2)
    assert status == "stall"
    assert time.monotonic() - t0 < 5.0
    status, detail = bench._outage_probe(120.0)
    assert status == "ok", detail


def test_outage_probe_reports_deterministic_failure_as_broken(
        bench, monkeypatch):
    """A probe child that EXITS with an error (ImportError, plugin
    regression) is a deterministic failure, not an outage — the bench must
    not sleep its budget away on it (r4 review finding). Simulated by
    breaking the child's jax import via PYTHONPATH."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with open(td + "/jax.py", "w") as f:
            f.write("raise ImportError('broken plugin — simulated')\n")
        monkeypatch.setenv("PYTHONPATH", td)
        status, detail = bench._outage_probe(60.0)
    assert status == "broken"
    assert "broken plugin" in detail
