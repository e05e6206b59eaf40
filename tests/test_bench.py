"""bench.py fault-tolerance tests (VERDICT round-3 item 1).

The round-2 driver bench was erased by ONE transient FAILED_PRECONDITION
tunnel fault because bench.py had no retry.  These tests pin the new
contract: backend faults are retried in fresh subprocesses, genuine
non-finite losses are NOT retried, and the one-line JSON is emitted even
when secondary phases fail.
"""

import json
import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_spawn(script):
    """spawn(phase, attempt, tiny, timeout_s) stub driven by a
    {phase: [result, ...]} script; attempts beyond the script length repeat
    the last entry."""
    calls = []

    def spawn(phase, attempt, tiny, timeout_s=None):
        calls.append((phase, attempt))
        seq = script.get(phase)
        if seq is None:  # unscripted (e.g. soft MFU phases): benign failure
            return {"ok": False, "kind": "other",
                    "error": f"phase {phase} not scripted"}
        return dict(seq[min(attempt, len(seq) - 1)])

    spawn.calls = calls
    return spawn


OK_BF16 = {"ok": True, "value": 96.0, "device": "cpu"}
OK_F32 = {"ok": True, "value": 75.0, "device": "cpu"}
OK_SCEN = {"ok": True, "value": 15000.0}
OK_FLOPS = {"ok": True, "flops_per_step": 5_000_000_000}
BACKEND_FAIL = {"ok": False, "kind": "backend",
                "error": "JaxRuntimeError: FAILED_PRECONDITION: TPU backend error"}
NONFINITE = {"ok": False, "kind": "nonfinite", "error": "non-finite loss"}


def test_backend_fault_retried_and_recovered():
    spawn = _fake_spawn({
        "bf16": [BACKEND_FAIL, BACKEND_FAIL, OK_BF16],
        "f32": [OK_F32],
        "scen": [OK_SCEN],
        "flops": [OK_FLOPS],
    })
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    assert report["value"] == 96.0
    assert report["extras"]["attempts"]["bf16"] == 3
    assert report["extras"]["f32_steps_per_sec"] == 75.0
    assert report["extras"]["compute_dtype"] == "bfloat16"
    # each retry was a separate (fresh-process) spawn call
    assert [c for c in spawn.calls if c[0] == "bf16"] == [
        ("bf16", 0), ("bf16", 1), ("bf16", 2)]


def test_nonfinite_not_retried():
    spawn = _fake_spawn({
        "bf16": [NONFINITE, OK_BF16],  # would succeed if (wrongly) retried
        "f32": [OK_F32],
        "scen": [OK_SCEN],
        "flops": [OK_FLOPS],
    })
    report, rc = bench.orchestrate(spawn=spawn)
    # nonfinite is a real result: bf16 reported failed, headline falls back
    assert [c for c in spawn.calls if c[0] == "bf16"] == [("bf16", 0)]
    assert rc == 0
    assert report["value"] == 75.0
    assert report["extras"]["compute_dtype"] == "float32"
    assert "non-finite" in report["extras"]["bf16_error"]


def test_secondary_failure_still_emits_headline():
    spawn = _fake_spawn({
        "bf16": [OK_BF16],
        "f32": [BACKEND_FAIL],
        "scen": [BACKEND_FAIL],
        "flops": [OK_FLOPS],
    })
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    assert report["value"] == 96.0
    assert "FAILED_PRECONDITION" in report["extras"]["f32_error"]
    assert "FAILED_PRECONDITION" in report["extras"]["scen_error"]
    # secondary backend faults were still retried the full budget
    assert report["extras"]["attempts"]["f32"] == bench.MAX_ATTEMPTS


def test_total_failure_emits_parseable_line_rc1():
    spawn = _fake_spawn({ph: [BACKEND_FAIL] for ph in bench.PHASES})
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 1
    assert report["value"] == 0.0
    json.dumps(report)  # one parseable line no matter what


def test_classify():
    assert bench._classify(bench.NonFiniteLoss("x")) == "nonfinite"
    assert bench._classify(RuntimeError("FAILED_PRECONDITION: dead")) == "backend"
    assert bench._classify(ValueError("bad arg")) == "other"


def test_forced_fault_end_to_end_subprocess():
    """Real subprocess run (tiny model, CPU): the first bf16 attempt raises a
    forced backend fault; the orchestrator must recover in a fresh process
    and still print the one-line JSON with rc 0."""
    env = dict(os.environ)
    env["BENCH_FORCE_FAULT"] = "bf16:1"
    env["JAX_PLATFORMS"] = "cpu"
    # this test targets the retry path; the preflight probe (tested
    # separately) can flake on a contended 1-core host and mask it
    env["BENCH_NO_PREFLIGHT"] = "1"
    env.pop("BENCH_ATTEMPT", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--tiny"],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    report = json.loads(line)
    assert report["value"] > 0
    assert report["extras"]["attempts"]["bf16"] == 2  # fault + recovery
    assert report["extras"]["attempts"]["f32"] == 1


TIMEOUT_FAIL = {"ok": False, "kind": "timeout",
                "error": "phase bf16 timed out after 2700s"}


def test_hang_timeouts_retry_once_not_thrice():
    """A wedged backend (compute hangs, device listing fine — observed on
    the tunneled platform) rarely unwedges; each wait costs up to 45 min,
    so timeouts get ONE retry instead of the full attempt budget."""
    spawn = _fake_spawn({
        "bf16": [TIMEOUT_FAIL],
        "f32": [OK_F32],
        "scen": [OK_SCEN],
        "flops": [OK_FLOPS],
    })
    report, rc = bench.orchestrate(spawn=spawn)
    assert [c for c in spawn.calls if c[0] == "bf16"] == [
        ("bf16", 0), ("bf16", 1)]  # exactly one retry
    assert rc == 0 and report["value"] == 75.0  # f32 fallback headline


def test_global_budget_bounds_wall_clock(monkeypatch):
    """With the backend hanging every phase, the global budget must stop
    spawning once exhausted instead of burning phases x attempts x 45 min."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(bench, "GLOBAL_BUDGET_S", 1000)

    def hanging_spawn(phase, attempt, tiny, timeout_s):
        assert timeout_s <= bench.PHASE_TIMEOUT_S
        clock["t"] += timeout_s  # simulate waiting out the full timeout
        return dict(TIMEOUT_FAIL)

    report, rc = bench.orchestrate(spawn=hanging_spawn)
    assert rc == 1
    # first phase consumed the budget; later phases were skipped up-front
    assert "budget exhausted" in report["extras"]["f32_error"]
    assert "budget exhausted" in report["extras"]["scen_error"]


def test_preflight_healthy_returns_none(monkeypatch):
    import prdisagg_tpu.utils.watchdog as wd

    monkeypatch.setattr(
        wd, "probe_backend",
        lambda timeout_s=90: {"ok": True, "latency_s": 0.1, "detail": "ok"})
    assert bench._preflight(bench.time.monotonic() + 7200) is None


def test_preflight_polls_until_recovery(monkeypatch):
    """VERDICT round-4 item 1: a wedge that clears mid-budget must NOT lose
    the round — the preflight keeps probing every interval and enters the
    phase plan the moment a probe passes."""
    import prdisagg_tpu.utils.watchdog as wd

    calls = {"n": 0}

    def probe(timeout_s=90):
        calls["n"] += 1
        if calls["n"] < 5:  # wedged for 4 probes, then recovers
            return {"ok": False, "latency_s": None, "detail": "timeout"}
        return {"ok": True, "latency_s": 0.2, "detail": "ok"}

    clock = {"t": 0.0}
    monkeypatch.setattr(wd, "probe_backend", probe)
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])

    def sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", sleep)
    assert bench._preflight(7200.0) is None
    assert calls["n"] == 5


def test_preflight_surrender_carries_probe_stats(monkeypatch):
    """A wedge outlasting the budget surrenders with an explicit record of
    how long/hard it tried, not after a single 60 s retry."""
    import prdisagg_tpu.utils.watchdog as wd

    calls = {"n": 0}

    def dead_probe(timeout_s=90):
        calls["n"] += 1
        return {"ok": False, "latency_s": None, "detail": "timeout"}

    clock = {"t": 0.0}
    monkeypatch.setattr(wd, "probe_backend", dead_probe)
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])

    def sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", sleep)
    res = bench._preflight(7200.0)  # 2 h budget, 120 s probe interval
    assert res is not None and res["detail"] == "timeout"
    # kept probing across (nearly) the whole budget: (7200-300-120)/120 ≈ 56
    assert res["probe_attempts"] >= 50
    assert res["probe_wall_s"] > 6000


def test_preflight_surrender_report_attaches_last_verified(
        monkeypatch, tmp_path):
    """The official record of a fully-wedged round must carry last-known-
    good provenance from the newest artifacts/bench_*.json (VERDICT round-4
    weak #1: BENCH_r04 read 0.0 with no provenance while bench_r4_quiet.json
    held 95.5)."""
    import prdisagg_tpu.utils.watchdog as wd

    monkeypatch.setattr(
        wd, "probe_backend",
        lambda timeout_s=90: {"ok": False, "latency_s": None,
                              "detail": "timeout"})
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])

    def sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", sleep)
    report, rc = bench.orchestrate()  # real-spawn path => preflight runs
    assert rc == 1 and report["value"] == 0.0
    lv = report["extras"]["last_verified"]
    # the repo's newest real bench artifact backs the provenance
    assert lv["value"] > 0
    assert lv["source_artifact"].startswith("artifacts/")
    assert "timestamp" in lv and "metric" in lv
    json.dumps(report)


def test_last_verified_picks_newest_nonzero():
    lv = bench._last_verified()
    assert lv is not None and lv["value"] > 0


def test_preflight_skipped_for_injected_spawn():
    """Hermetic orchestrate runs (tests) must not dial the backend: the
    preflight only guards the real _spawn_phase path, so this must pass
    with no probe_backend monkeypatch and no real backend."""
    spawn = _fake_spawn({
        "bf16": [OK_BF16], "f32": [OK_F32], "scen": [OK_SCEN],
        "flops": [OK_FLOPS]})
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0


def test_flops_fallback_phase_feeds_mfu():
    """When the winning train phase lacks FLOPs (the tunneled TPU PJRT
    client has no cost_analysis), the orchestrator must spawn the CPU-
    lowering flops phase and derive tflops/MFU from the headline rate."""
    spawn = _fake_spawn({
        "bf16": [OK_BF16], "f32": [OK_F32], "scen": [OK_SCEN],
        "flops": [OK_FLOPS]})
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    ex = report["extras"]
    assert ex["flops_source"] == "cpu_lowering"
    assert ex["flops_per_step"] == OK_FLOPS["flops_per_step"]
    assert ex["tflops_per_sec"] == round(96.0 * 5e9 / 1e12, 2)
    assert ex["mfu_vs_bf16_peak"] == round(
        ex["tflops_per_sec"] / bench.PEAK_TFLOPS_DEFAULT, 4)
    assert [c for c in spawn.calls if c[0] == "flops"] == [("flops", 0)]


def test_device_counted_flops_skips_fallback():
    """A train phase that DID count FLOPs on-device must not spawn the
    fallback phase."""
    bf16 = dict(OK_BF16, flops_per_step=4_000_000_000,
                tflops_per_sec=0.38)
    spawn = _fake_spawn({
        "bf16": [bf16], "f32": [OK_F32], "scen": [OK_SCEN]})
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    assert report["extras"]["flops_per_step"] == 4_000_000_000
    assert "flops_source" not in report["extras"]
    assert not [c for c in spawn.calls if c[0] == "flops"]


def test_mfu_context_phases_populate_extras():
    """VERDICT round-4 item 5: the b128 schedule stage and the 64x64 step
    carry their own steps/s + tflops + MFU in extras, with CPU-lowering
    flops fallback per phase."""
    spawn = _fake_spawn({
        "bf16": [OK_BF16], "f32": [OK_F32], "scen": [OK_SCEN],
        "flops": [OK_FLOPS],
        "b128": [{"ok": True, "value": 36.0, "batch_size": 128}],
        "ld64": [{"ok": True, "value": 5.5, "batch_size": 32,
                  "flops_per_step": 7_157_000_000_000}],
        "flops_b128": [{"ok": True, "flops_per_step": 160_000_000_000}],
    })
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    ex = report["extras"]
    assert ex["b128_steps_per_sec"] == 36.0
    assert ex["b128_sample_updates_per_sec"] == round(36.0 * 128 * 6, 1)
    assert ex["b128_tflops_per_sec"] == round(36.0 * 160e9 / 1e12, 2)
    # ld64 counted flops in-process: no fallback spawn for it
    assert ex["ld64_tflops_per_sec"] == round(5.5 * 7.157e12 / 1e12, 2)
    assert ex["ld64_mfu_vs_bf16_peak"] == round(
        5.5 * 7.157e12 / 1e12 / bench.PEAK_TFLOPS_DEFAULT, 4)
    assert not [c for c in spawn.calls if c[0] == "flops_ld64"]
    assert [c for c in spawn.calls if c[0] == "flops_b128"] == [
        ("flops_b128", 0)]


def test_mfu_context_phase_failure_is_soft():
    """A failing b128/ld64 phase must not fail the bench or erase the
    headline."""
    spawn = _fake_spawn({
        "bf16": [OK_BF16], "f32": [OK_F32], "scen": [OK_SCEN],
        "flops": [OK_FLOPS]})  # b128/ld64 unscripted -> benign failure
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    assert report["value"] == 96.0
    assert "b128_error" in report["extras"]
    assert "ld64_error" in report["extras"]


def test_flops_fallback_failure_is_soft():
    """MFU is best-effort: a failing flops phase must not fail the bench."""
    spawn = _fake_spawn({
        "bf16": [OK_BF16], "f32": [OK_F32], "scen": [OK_SCEN],
        "flops": [{"ok": False, "kind": "other", "error": "no cost model"}]})
    report, rc = bench.orchestrate(spawn=spawn)
    assert rc == 0
    assert report["value"] == 96.0
    assert "flops_error" in report["extras"]
    assert "tflops_per_sec" not in report["extras"]


def test_preflight_env_disable(monkeypatch):
    monkeypatch.setenv("BENCH_NO_PREFLIGHT", "1")
    import prdisagg_tpu.utils.watchdog as wd

    def boom(timeout_s=90):
        raise AssertionError("probe must not run when disabled")

    monkeypatch.setattr(wd, "probe_backend", boom)
    assert bench._preflight(bench.time.monotonic() + 7200) is None
