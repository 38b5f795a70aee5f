#!/bin/bash
# r5 chip-measurement session: the round's on-chip agenda. Each block is a
# FRESH process (PERF.md #6: parity bulk fetches and timing must not share
# a process; init stalls re-roll per process) and is retried once - the
# tunnel's init stalls hit roughly every other process (CLAUDE.md).
# Appends everything to $LOG; safe to re-run.
#
#   LOG=/tmp/r5_chip.log bash tools/r5_chip_session.sh
#   python tools/collect_r4_runs.py /tmp/r5_chip.log > docs/BENCH_RUNS_r5.md
#
# Order: the round's open questions first - (1) does the scratch-aware band
# chooser make the --UNet pool chain compile on the real Mosaic compiler
# (r4 it crashed tpu_compile_helper)? (2) does the b8 batched-throughput
# row beat 1x fps at b1? - then full driver-style bench runs.
set -u
LOG="${LOG:-/tmp/r5_chip.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
cd /root/repo

stamp() { echo "=== $1 — $(date -u +%FT%TZ) ===" >> "$LOG"; }

try2() {  # try2 <cap_secs> <label> <cmd...>: one retry on non-zero rc
    local cap="$1" label="$2"; shift 2
    for attempt in 1 2; do
        stamp "$label (attempt $attempt)"
        timeout "$cap" "$@" >> "$LOG" 2>&1 && return 0
        echo "rc=$? (attempt $attempt)" >> "$LOG"
    done
    return 1
}

try2 1500 "probe: unet auto-band (scratch-aware chooser)" \
    python tools/pallas_chip_probe.py --families unet
try2 1200 "probe: flagship regression" \
    python tools/pallas_chip_probe.py --families flagship

for run in 1 2; do
    stamp "bench run $run (driver-style)"
    timeout 1800 python bench.py >> "$LOG" 2>&1
    echo "bench run $run rc=$?" >> "$LOG"
done
stamp "DONE"
