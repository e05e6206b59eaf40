#!/bin/bash
# Session-11 TPU queue — backend wedged after the s10 queue drained.
# Stages (skip on completion markers; gate on backend recovery):
#
#  1. exp_wire_dtype.py — on-chip measurement of the f16 wire-dtype
#     serving lever (f32 arm shapes are cached; the f16 arm compiles one
#     new jaxpr at the 4000-chunk + the 1000 shape, one-time).
#  2. bench.py — confirm the driver-bench cache is still warm.
#
# Usage: nohup bash scripts/tpu_queue_s11.sh >> artifacts/tpu_queue_s11.log 2>&1 &
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

if [ ! -f artifacts/.queue_s11_wire_done ]; then
    GATE "wire-dtype"
    WAIT_QUIET
    LOG "stage wire-dtype"
    timeout 5400 python scripts/exp_wire_dtype.py \
        > artifacts/exp_wire_dtype.txt 2>artifacts/exp_wire_dtype.err \
        && python -c "
import json
txt = open('artifacts/exp_wire_dtype.txt').read()
r = json.loads(txt[txt.index('{'):])
assert r['wire_f16']['scenarios_per_sec'] > 0" \
        && touch artifacts/.queue_s11_wire_done \
        || LOG "stage wire-dtype FAILED (see artifacts/exp_wire_dtype.err)"
fi

if [ ! -f artifacts/.queue_s11_bench_done ]; then
    GATE "bench"
    WAIT_QUIET
    LOG "stage bench"
    python bench.py | tee artifacts/bench_s11_final.json \
        && grep -q '"metric"' artifacts/bench_s11_final.json \
        && ! grep -Eq '"value": 0(\.0+)?[,}]' artifacts/bench_s11_final.json \
        && touch artifacts/.queue_s11_bench_done \
        || LOG "stage bench FAILED"
fi

LOG "queue drained"
