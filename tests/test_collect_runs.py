"""tools/collect_r4_runs.py turns the chip-session log into committed
evidence (docs/BENCH_RUNS_r4.md) — a parsing bug would corrupt the round's
measurement record, so the log grammar is pinned here."""

import subprocess
import sys

LOG = """\
=== probe: flagship+qvga (trace) (attempt 1) — 2026-08-18T09:55:00Z ===
ROW:{"row": "flagship_vga_b1", "variant": "xla_packed", "fps": 120.0, "iters": 700}
ROW:{"row": "flagship_vga_b1", "variant": "pallas_stem", "error": "init stall"}
rc=124 (attempt 1)
=== probe: flagship+qvga (trace) (attempt 2) — 2026-08-18T10:00:00Z ===
ROW:{"row": "flagship_vga_b1", "variant": "xla_packed", "fps": 1830.0, "iters": 700}
ROW:{"row": "flagship_vga_b1", "variant": "pallas_stem", "fps": 2400.0, "agree": 1.0, "iters": 700}
ROW:{"row": "flagship_vga_b1", "variant": "pallas_deep", "error": "Mosaic..."}
ROW:{"row": "flagship_vga_b1", "variant": "xla_packed", "device_us_per_frame": 378.2}
ROW:{"row": "flagship_vga_b1", "variant": "pallas_stem", "device_us_per_frame": 240.1}
=== bench run 1 (driver-style) — 2026-08-18T10:30:00Z ===
{"metric": "robo_unet_vga_640x480_inference_fps_per_chip", "value": 1500.0, "unit": "frames/sec", "vs_baseline": 50.0}
{"metric": "robo_unet_vga_640x480_inference_fps_per_chip", "value": 1836.0, "unit": "frames/sec", "vs_baseline": 61.2}
bench run 1 rc=0
=== bench run 2 (driver-style) — 2026-08-18T10:50:00Z ===
bench run 2 rc=124
=== DONE — 2026-08-18T11:00:00Z ===
"""


def test_collector_parses_probe_rows_and_final_bench_json(tmp_path):
    p = tmp_path / "chip.log"
    p.write_text(LOG)
    r = subprocess.run(
        [sys.executable, "tools/collect_r4_runs.py", str(p)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    out = r.stdout
    # probe table: both variants + the error row, one table per family row
    assert "## probe: flagship_vga_b1" in out
    assert "pallas_stem" in out and "2400.0" in out and "Mosaic" in out
    # the retried attempt supersedes attempt 1's rows: one xla_packed row
    # (the retry's fps), no stale attempt-1 numbers or errors
    assert out.count("xla_packed") == 1
    assert "120.0" not in out
    assert "init stall" not in out
    # the deferred device-trace rows merge into their timing rows
    row = next(ln for ln in out.splitlines() if "pallas_stem" in ln)
    assert "2400.0" in row and "240.1" in row and "1.0" in row
    # bench run 1: only the LAST cumulative JSON (the final artifact)
    assert '"value": 1836.0' in out
    assert '"value": 1500.0' not in out
    assert "rc=0" in out
    # bench run 2 produced no JSON before its rc marker
    assert "rc=124" in out
    assert "no final JSON captured" in out
