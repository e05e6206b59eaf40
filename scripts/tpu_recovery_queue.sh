#!/bin/bash
# Round-4 TPU measurement queue — drains once the tunneled backend answers.
#
# The backend wedges for hours at a time (docs/PERF.md "Backend outage
# engineering"); this script is the durable form of the recovery plan so a
# container reset cannot lose it (the round-4 /tmp copy did not survive).
# Safe to relaunch: every stage is skipped when its completion marker
# exists, and the paper protocol itself resumes stage-by-stage via
# protocol_state.json.
#
# Usage:  nohup bash scripts/tpu_recovery_queue.sh >> artifacts/tpu_queue_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts
LOG() { echo "[queue $(date +%H:%M:%S)] $*"; }

# 0. Wait for a quiet host: TPU step-rate numbers are dispatch-bound and a
#    concurrent pytest run on this 1-core box skews them 5-30% (CLAUDE.md).
WAIT_QUIET() {
    for i in $(seq 1 120); do
        load=$(cut -d' ' -f1 /proc/loadavg)
        awk "BEGIN{exit !($load < 0.8)}" && return 0
        LOG "host busy (load $load), waiting"
        sleep 60
    done
}
WAIT_QUIET

# 1. Gate on backend health (poll up to 10 h).
python -m prdisagg_tpu.cli doctor --wait 36000 || { LOG "backend never recovered"; exit 1; }
LOG "backend healthy — draining queue"

# Re-gate on health before every TPU stage: a wedge that outlasts one
# stage's supervisor must not cascade into the next stage hanging until
# its timeout (observed: LSD-stage wedge 18:xx; variants would then burn
# 2 h against a dead backend).  Polls up to 10 h, exits nonzero so a
# relaunch retries from the same marker.
GATE() { python -m prdisagg_tpu.cli doctor --wait 36000 \
             || { LOG "backend down before $1; aborting queue"; exit 1; }; }

# 2. Bench (warms the persistent compile cache for the driver's BENCH_r04 run).
if [ ! -f artifacts/.queue_bench_done ]; then
    LOG "stage bench"
    python bench.py | tee artifacts/bench_r4_queue.json \
        && grep -q '"value": 0.0' artifacts/bench_r4_queue.json \
        || touch artifacts/.queue_bench_done
fi

# 3. Architecture-restructure step-rate experiment (VERDICT round-3 item 4).
if [ ! -f artifacts/exp_arch_restructure.txt ]; then
    GATE "arch-experiment"
    LOG "stage arch-experiment"
    timeout 3600 python scripts/exp_arch_restructure.py \
        || LOG "stage arch-experiment FAILED (rc $?)"
fi

# 4. Flagship regime paper protocol (VERDICT item 1 / run 3) under supervision.
if [ ! -f artifacts/paper_protocol_regime/paper_protocol_summary.json ]; then
    GATE "regime-battery"
    LOG "stage regime-battery"
    python -m prdisagg_tpu.cli supervise --stall-timeout 900 --max-restarts 4 -- \
        python scripts/paper_protocol.py --workdir artifacts/paper_protocol_regime
fi

# 5. doy/lon variants at flagship width on-chip (VERDICT item 5).
if [ ! -f artifacts/.queue_variants_done ]; then
    GATE "variants"
    LOG "stage variants"
    timeout 7200 python scripts/variants_tpu.py \
        && touch artifacts/.queue_variants_done \
        || LOG "stage variants FAILED (rc $?)"
fi

# 6. Large-domain abbreviated end-to-end protocol (VERDICT item 7).
if [ ! -f artifacts/.queue_largedomain_done ]; then
    GATE "large-domain"
    LOG "stage large-domain"
    timeout 10800 python scripts/large_domain_tpu.py \
        && touch artifacts/.queue_largedomain_done \
        || LOG "stage large-domain FAILED (rc $?)"
fi

# 7. Clean variant step-rate anchors on a QUIET host.  Stage 5's feasibility
#    run measured steady rates with only 312 steps/epoch (per-epoch export
#    cadence dominates) and a concurrent CPU job in the doy window; this
#    rerun uses 1280 days (32000 patches -> spe=1000, so the fused chunk
#    is a full K=100 — 1200 days gave PRIME spe=937, K=1, and the ~40 ms
#    dispatch+fetch floor capped it at 25 steps/s) and fresh workdirs so
#    resume cannot void the anchor.  Rewrites artifacts/variants_tpu.txt
#    (the stage-5 feasibility numbers are committed and in PERF.md).
#    Runs BEFORE the ~2.6 h EMA battery: with a late backend recovery the
#    short high-value stages must not starve behind it.
if [ ! -f artifacts/.queue_variants_anchor_done ]; then
    GATE "variants-anchor"
    WAIT_QUIET
    LOG "stage variants-anchor"
    rm -rf artifacts/variant_doy artifacts/variant_lon
    timeout 7200 python scripts/variants_tpu.py 1280 5 \
        && touch artifacts/.queue_variants_anchor_done \
        || LOG "stage variants-anchor FAILED (rc $?)"
fi

# 8. EMA arm of the regime protocol (VERDICT r3 weak #1: quality wander).
#    Same data/scale as stage 4; TrainConfig.ema_decay=0.999 (Karras et al.
#    practice) adds gen_ema_* exports that compete in epoch selection —
#    measures whether the EMA curve is flatter and whether an EMA pick
#    beats the raw pick on the full battery.  Longest stage, so it runs
#    last; protocol_state.json makes partial progress durable.
if [ ! -f artifacts/paper_protocol_regime_ema/paper_protocol_summary.json ]; then
    GATE "regime-battery-ema"
    LOG "stage regime-battery-ema"
    python -m prdisagg_tpu.cli supervise --stall-timeout 900 --max-restarts 4 -- \
        python scripts/paper_protocol.py \
            --workdir artifacts/paper_protocol_regime_ema --ema-decay 0.999 \
        || LOG "stage regime-battery-ema FAILED (rc $?)"
fi

LOG "queue drained"
