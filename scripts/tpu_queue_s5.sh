#!/bin/bash
# Session-5 TPU measurement queue — drains once the tunneled backend answers.
#
# Stages (short first so a late recovery cannot starve them):
#  1. exp_lsd_device.py — on-chip validation + timing of the device-reduced
#     pairwise-LSD summary vs the full-fetch path (expected: the ~27 min
#     fetch-bound battery stage becomes minutes).
#  2. A fresh EMA regime battery in a NEW workdir with the device-LSD
#     default — the updated end-to-end protocol wall-clock headline.
#  3. bench.py — confirms the driver's BENCH run will hit a warm cache.
#
# Safe to relaunch: stages skip on completion markers; the protocol resumes
# via protocol_state.json.
#
# Usage: nohup bash scripts/tpu_queue_s5.sh >> artifacts/tpu_queue_s5.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts
LOG() { echo "[queue $(date +%H:%M:%S)] $*"; }

WAIT_QUIET() {
    for i in $(seq 1 120); do
        load=$(cut -d' ' -f1 /proc/loadavg)
        awk "BEGIN{exit !($load < 0.8)}" && return 0
        LOG "host busy (load $load), waiting"
        sleep 60
    done
}

GATE() { python -m prdisagg_tpu.cli doctor --wait 36000 \
             || { LOG "backend down before $1; aborting queue"; exit 1; }; }

GATE "queue-start"
LOG "backend healthy — draining queue"

# 1. Device-reduced LSD summary: on-chip validation + timing.
if [ ! -f artifacts/exp_lsd_device.txt ]; then
    GATE "lsd-experiment"
    WAIT_QUIET
    LOG "stage lsd-experiment"
    timeout 3600 python scripts/exp_lsd_device.py \
        || LOG "stage lsd-experiment FAILED (rc $?)"
fi

# 2. Fresh EMA regime battery with the device-LSD default (new workdir so
#    nothing is cached) — the updated end-to-end wall-clock headline.
if [ ! -f artifacts/paper_protocol_regime_ema2/paper_protocol_summary.json ]; then
    GATE "regime-battery-ema2"
    WAIT_QUIET
    LOG "stage regime-battery-ema2"
    python -m prdisagg_tpu.cli supervise --stall-timeout 900 --max-restarts 4 -- \
        python scripts/paper_protocol.py \
            --workdir artifacts/paper_protocol_regime_ema2 --ema-decay 0.999 \
        || LOG "stage regime-battery-ema2 FAILED (rc $?)"
fi

# 3. Bench — leaves the persistent compile cache warm for the driver.
if [ ! -f artifacts/.queue_s5_bench_done ]; then
    GATE "bench"
    WAIT_QUIET
    LOG "stage bench"
    # pipefail makes a crashed bench fail the pipeline; the positive
    # grep rejects an empty/truncated output file (a bench killed before
    # printing must NOT satisfy the gate)
    python bench.py | tee artifacts/bench_s5_queue.json \
        && grep -q '"metric"' artifacts/bench_s5_queue.json \
        && ! grep -q '"value": 0' artifacts/bench_s5_queue.json \
        && touch artifacts/.queue_s5_bench_done \
        || LOG "stage bench FAILED"
fi

LOG "queue drained"
