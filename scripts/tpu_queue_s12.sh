#!/bin/bash
# Session-11 follow-up queue — waits for tpu_queue_s11.sh to finish, then
# re-runs the full serve bench: session 11 fixed the EAGAIN connect burst
# that killed the unbatched concurrency stage on-chip, so this run captures
# the complete SLA table (incl. concurrent_1scen_unbatched) with the new
# backlog/lock behavior.
#
# Usage: nohup bash scripts/tpu_queue_s12.sh >> artifacts/tpu_queue_s12.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts
LOG() { echo "[queue $(date +%H:%M:%S)] $*"; }

# serialize behind the s11 queue: one chip, one queue at a time
for i in $(seq 1 720); do
    [ -f artifacts/.queue_s11_bench_done ] && break
    sleep 60
done
if [ ! -f artifacts/.queue_s11_bench_done ]; then
    LOG "s11 queue never drained; aborting"
    exit 1
fi

GATE() { python -m prdisagg_tpu.cli doctor --wait 36000 \
             || { LOG "backend down before $1; aborting queue"; exit 1; }; }

if [ ! -f artifacts/.queue_s12_serve_done ]; then
    GATE "serve-bench-r2"
    LOG "stage serve-bench-r2"
    timeout 7200 python scripts/exp_serve_bench.py \
        > artifacts/exp_serve_bench_r2.txt 2>&1 \
        && python -c "
import json
txt = open('artifacts/exp_serve_bench_r2.txt').read()
r = json.loads(txt[txt.index('{'):])
assert 'requests_per_sec' in r['concurrent_1scen_unbatched']
assert 'requests_per_sec' in r['concurrent_1scen_window8ms']" \
        && touch artifacts/.queue_s12_serve_done \
        || LOG "stage serve-bench-r2 FAILED"
fi

LOG "queue drained"
