#!/bin/bash
# Session-12 TPU queue — fresh VM (empty compile cache), backend wedged at
# session start, and the s11 queue never ran (VM restart).  Self-contained
# replacement that folds in the s11 stages:
#
#  1. bench.py COLD-CACHE FIRST — warms the persistent compile cache so the
#     driver's end-of-round bench is protected whatever else happens.
#  2. exp_wire_dtype.py — first on-chip measurement of the f16 wire-dtype
#     serving lever (never ran: s11 queue died with the VM).
#  3. exp_serve_bench.py — full SLA table rerun incl. the unbatched
#     concurrency stage the s11 EAGAIN fix repaired.
#  4. bench.py warm confirmation — final state: warm cache + fresh number.
#
# Usage: nohup bash scripts/tpu_queue_s12.sh >> artifacts/tpu_queue_s12.log 2>&1 &
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
    return 0
}

GATE() { python -m prdisagg_tpu.cli doctor --wait 36000 \
             || { LOG "backend down before $1; aborting queue"; exit 1; }; }

BENCH_OK() {
    grep -q '"metric"' "$1" && ! grep -Eq '"value": 0(\.0+)?[,}]' "$1"
}

if [ ! -f artifacts/.queue_s12_bench_cold_done ]; then
    GATE "bench-cold"
    WAIT_QUIET
    LOG "stage bench-cold (cache warm-up; cold compiles can take ~26 min/phase)"
    python bench.py | tee artifacts/bench_s12_cold.json \
        && BENCH_OK artifacts/bench_s12_cold.json \
        && touch artifacts/.queue_s12_bench_cold_done \
        || LOG "stage bench-cold FAILED"
fi

if [ ! -f artifacts/.queue_s12_wire_done ]; then
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
        && touch artifacts/.queue_s12_wire_done \
        || LOG "stage wire-dtype FAILED (see artifacts/exp_wire_dtype.err)"
fi

if [ ! -f artifacts/.queue_s12_serve_done ]; then
    GATE "serve-bench-r2"
    WAIT_QUIET
    LOG "stage serve-bench-r2"
    timeout 7200 python scripts/exp_serve_bench.py \
        > artifacts/exp_serve_bench_r2.txt 2>artifacts/exp_serve_bench_r2.err \
        && python -c "
import json
txt = open('artifacts/exp_serve_bench_r2.txt').read()
r = json.loads(txt[txt.index('{'):])
assert 'requests_per_sec' in r['concurrent_1scen_unbatched']
assert 'requests_per_sec' in r['concurrent_1scen_window8ms']" \
        && touch artifacts/.queue_s12_serve_done \
        || LOG "stage serve-bench-r2 FAILED"
fi

if [ ! -f artifacts/.queue_s12_bench_warm_done ]; then
    GATE "bench-warm"
    WAIT_QUIET
    LOG "stage bench-warm"
    python bench.py | tee artifacts/bench_s12_final.json \
        && BENCH_OK artifacts/bench_s12_final.json \
        && touch artifacts/.queue_s12_bench_warm_done \
        || LOG "stage bench-warm FAILED"
fi

LOG "queue drained"
