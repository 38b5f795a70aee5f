#!/bin/bash
# r4 chip-measurement session: runs the round's on-chip agenda once the
# tunnel is up. Each block is a FRESH process (PERF.md #6: parity bulk
# fetches and timing must not share a process; init stalls re-roll per
# process) and is retried once — the tunnel's init stalls hit roughly
# every other process (CLAUDE.md). Appends everything to $LOG; safe to
# re-run.
#
#   LOG=/tmp/r4_chip.log bash tools/r4_chip_session.sh
#
# Order: probe head-to-heads first (the round's open question — is the
# fused-chain Pallas path faster than XLA packed?), then full driver-style
# bench runs for docs/BENCH_RUNS_r4.md.
set -u
LOG="${LOG:-/tmp/r4_chip.log}"
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

try2 1500 "probe: flagship+qvga (trace)" \
    python tools/pallas_chip_probe.py --families flagship,qvga --trace
try2 1500 "probe: lp,pbfcn,v2,unet (trace)" \
    python tools/pallas_chip_probe.py --families lp,pbfcn,v2,unet --trace
try2 900 "probe: band sweep" \
    python tools/pallas_chip_probe.py --families bands
try2 900 "probe: structured-slim head-to-head" \
    python tools/pallas_chip_probe.py --families flagship,slim

for run in 1 2 3; do
    stamp "bench run $run (driver-style)"
    timeout 1500 python bench.py >> "$LOG" 2>&1
    echo "bench run $run rc=$?" >> "$LOG"
done
stamp "DONE"
