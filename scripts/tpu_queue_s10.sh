#!/bin/bash
# Session-10 TPU queue — fresh VM again: EMPTY compile cache, backend wedged
# at arm time (doctor detail="timeout").  The session-9 queue never ran.
# Ordered so the driver's end-of-round bench is protected first:
#
#  1. bench.py — cold-cache compile of every driver-bench phase (~26 min
#     per fused-step jaxpr through the tunnel; bench's per-phase timeout
#     is 45 min).  Populates ~/.cache/prdisagg_jax_cache.
#  2. exp_serve_bench.py — first on-chip numbers for the session-9 serving
#     stack (b64 inline encoding, threaded connections, --warm startup,
#     dynamic micro-batching).  Expect latency_ms_100scen_b64 well under
#     the ~1 s float-list encode and a warm batched_100x100.
#  3. bench.py again — cheap when warm; confirms the cache the driver
#     will hit at end of round.
#
# Safe to relaunch: stages skip on completion markers.
#
# Usage: nohup bash scripts/tpu_queue_s10.sh >> artifacts/tpu_queue_s10.log 2>&1 &
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

# 1. Cold-cache bench: warms every driver-bench compile.  RETRY until it
#    succeeds — bench's preflight probe cannot distinguish a wedged tunnel
#    from a saturated 1-core host, so a single failure is not conclusive.
attempt=0
while [ ! -f artifacts/.queue_s10_bench_warm_done ] && [ $attempt -lt 8 ]; do
    attempt=$((attempt + 1))
    GATE "bench-warm"
    WAIT_QUIET
    LOG "stage bench-warm attempt $attempt (cold cache: expect long compiles)"
    python bench.py | tee artifacts/bench_s10_warm.json \
        && grep -q '"metric"' artifacts/bench_s10_warm.json \
        && ! grep -Eq '"value": 0(\.0+)?[,}]' artifacts/bench_s10_warm.json \
        && touch artifacts/.queue_s10_bench_warm_done \
        || { LOG "stage bench-warm attempt $attempt FAILED; backing off"; \
             sleep 300; }
done

# 2. Serving-daemon benchmark (daemon warms its chunk + bucket shapes at
#    startup; those compiles are NOT in the driver-bench cache).
if [ -f artifacts/.queue_s10_bench_warm_done ] \
       && [ ! -f artifacts/.queue_s10_serve_done ]; then
    GATE "serve-bench"
    WAIT_QUIET
    LOG "stage serve-bench"
    timeout 7200 python scripts/exp_serve_bench.py \
        > artifacts/exp_serve_bench.txt 2>&1 \
        && python -c "
import json
# stderr is merged into the artifact (fixture notices land first):
# parse the JSON block starting at the first '{' line
txt = open('artifacts/exp_serve_bench.txt').read()
r = json.loads(txt[txt.index('{'):])
assert 'requests_per_sec' in r['concurrent_1scen_window8ms']" \
        && touch artifacts/.queue_s10_serve_done \
        || LOG "stage serve-bench FAILED (see artifacts/exp_serve_bench.txt)"
fi

# 3. Final warm bench: confirms the cache the driver will hit.
if [ ! -f artifacts/.queue_s10_bench_done ]; then
    GATE "bench"
    WAIT_QUIET
    LOG "stage bench"
    python bench.py | tee artifacts/bench_s10_final.json \
        && grep -q '"metric"' artifacts/bench_s10_final.json \
        && ! grep -Eq '"value": 0(\.0+)?[,}]' artifacts/bench_s10_final.json \
        && touch artifacts/.queue_s10_bench_done \
        || LOG "stage bench FAILED"
fi

LOG "queue drained"
