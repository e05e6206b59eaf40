"""64x64 large-domain lever table (VERDICT round-4 item 2).

Round 4 put on-chip correctness numbers on the large-domain variant
(reference: alternative_domains/gan_train_cwgangp_pixelnorm_largedomain.py:
323-335) but every lever table in docs/PERF.md was 16x16.  This script
builds the same table at ndomain=64 / n_thresh=40 — the shape regime where
the MXU actually has work per dispatch:

  * batch scaling (16 / 32 / 64; OOM candidates are recorded, not fatal)
  * steps_per_call chunking (K=1 vs K=5)
  * fused-upsample generator on/off
  * bf16 vs f32 compute
  * fused_gen_forward architecture lever (measured NEGATIVE at 16x16)
  * FLOPs/step via CPU lowering of the SAME program -> TFLOP/s + MFU

Every config runs in its OWN subprocess (an OOM or backend fault cannot
poison the next config; same isolation pattern as bench.py).  Results are
appended to artifacts/exp_largedomain_levers.json + a human table in
artifacts/exp_largedomain_levers.txt.

Usage:
  python scripts/exp_largedomain_levers.py              # full matrix
  python scripts/exp_largedomain_levers.py --one KEY    # internal: one config
  python scripts/exp_largedomain_levers.py --flops KEY  # internal: CPU FLOPs
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
ART = os.path.join(REPO, "artifacts")
PEAK_TFLOPS = 197.0  # v5e bf16 dense peak (bench.py PEAK_TFLOPS_BF16)
CONFIG_TIMEOUT_S = 2700  # cold remote compiles can take ~25 min

# key -> (dtype, batch, steps_per_call, fused_upsample, fused_gen_forward
#          [, hoisted_chunks])
CONFIGS = {
    "bf16_b32_k1": ("bfloat16", 32, 1, True, False),
    "bf16_b32_k5": ("bfloat16", 32, 5, True, False),
    "bf16_b16_k1": ("bfloat16", 16, 1, True, False),
    "bf16_b64_k1": ("bfloat16", 64, 1, True, False),
    "bf16_b32_k1_unfused": ("bfloat16", 32, 1, False, False),
    "bf16_b32_k1_genfwd": ("bfloat16", 32, 1, True, True),
    "f32_b32_k1": ("float32", 32, 1, True, False),
    "f32_b64_k1": ("float32", 64, 1, True, False),
    # hoisted_chunks memory lever (TrainConfig.hoisted_chunks): chunk the
    # (n_disc*B) hoisted generator forward to fit shapes that OOM one-shot
    "f32_b64_c5": ("float32", 64, 1, True, False, 5),
    "bf16_b128_c5": ("bfloat16", 128, 1, True, False, 5),
    "bf16_b64_c5": ("bfloat16", 64, 1, True, False, 5),
    "bf16_b128_c2": ("bfloat16", 128, 1, True, False, 2),
    "bf16_b256_c10": ("bfloat16", 256, 1, True, False, 10),
}


def _setup_jax(platform=None):
    import jax
    p = platform or os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _build(key, for_flops=False):
    dtype, batch, k, fused_up, gen_fwd, *rest = CONFIGS[key]
    # FLOP counting always lowers the ONE-SHOT form: chunking does not
    # change the arithmetic, but cost_analysis counts a lax.map body once
    # (measured: bf16_b64_c5 read 8.7T vs the true 14.3T)
    chunks = 1 if for_flops else (rest[0] if rest else 1)
    from prdisagg_tpu.core.config import (DataConfig, ModelConfig,
                                          TrainConfig)
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.train import create_train_state, make_train_step
    from scripts.full_protocol_scale_run import make_scale_dataset

    dcfg = DataConfig(ndomain=64, n_thresh=40)
    data, indices = make_scale_dataset(6, 128, 128, 17, dcfg)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    mcfg = ModelConfig(ndomain=64, compute_dtype=dtype,
                      fused_upsample=fused_up)
    tcfg = TrainConfig(seed=0)
    state, gen, critic = create_train_state(mcfg, tcfg)
    step = make_train_step(gen, critic, mcfg, tcfg, batch,
                           steps_per_call=k, fused_gen_forward=gen_fwd,
                           hoisted_chunks=chunks)
    return step, state, ds, k, batch


def _one(key):
    """Measure one config on the default (TPU) platform; print one JSON."""
    jax = _setup_jax()
    step, state, ds, k, batch = _build(key)
    t0 = time.perf_counter()
    state, m = step(state, ds)  # compile + warmup
    if bool(m["nonfinite"]):
        raise RuntimeError("non-finite loss in warmup")
    compile_s = time.perf_counter() - t0
    # time one call (host fetch = the only reliable sync on axon)
    t0 = time.perf_counter()
    state, m = step(state, ds)
    float(m["d_loss"])
    t_call = time.perf_counter() - t0
    n = max(3, min(200, int(round(30.0 / max(t_call, 1e-3)))))
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, ds)
    float(m["d_loss"])
    dt = time.perf_counter() - t0
    if bool(m["nonfinite"]):
        raise RuntimeError("non-finite loss during timing")
    sps = n * k / dt
    print(json.dumps({
        "ok": True, "key": key, "steps_per_sec": round(sps, 3),
        "sample_updates_per_sec": round(sps * batch * 6, 1),
        "n_calls": n, "compile_plus_warmup_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
        "host_load_1min": round(os.getloadavg()[0], 2),
    }))


def _flops(key):
    """FLOPs/step of the config's program, counted on a CPU lowering (the
    axon PJRT client lacks cost_analysis; the op-graph count is
    backend-independent — same fallback bench.py uses)."""
    _setup_jax("cpu")
    step, state, ds, k, _ = _build(key, for_flops=True)
    cost = step.lower(state, ds).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(json.dumps({"ok": True, "key": key,
                      "flops_per_step": round(float(cost["flops"]) / k)}))


def _spawn(mode, key):
    cmd = [sys.executable, os.path.abspath(__file__), mode, key]
    env = dict(os.environ)
    if mode == "--flops":
        env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=CONFIG_TIMEOUT_S, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"ok": False, "key": key,
                "error": f"timed out after {CONFIG_TIMEOUT_S}s"}
    line = next((ln for ln in reversed(proc.stdout.strip().splitlines())
                 if ln.startswith("{")), None)
    if line is None:
        err = proc.stderr[-500:]
        kind = "oom" if "RESOURCE_EXHAUSTED" in proc.stderr else "error"
        return {"ok": False, "key": key, "kind": kind, "error": err}
    return json.loads(line)


def _write_results(results):
    """Persist the table NOW — called after every config so a queue
    timeout (SIGTERM) or mid-loop crash never discards finished
    measurements (hours of chip time)."""
    with open(os.path.join(ART, "exp_largedomain_levers.json"), "w") as f:
        json.dump(results, f, indent=1)
    lines = ["64x64 large-domain lever table (v5e, n_thresh=40; "
             "steps/s are FUSED 5+1 steps)",
             f"{'config':26s} {'steps/s':>8s} {'samp-upd/s':>10s} "
             f"{'TFLOP/s':>8s} {'MFU':>7s}"]
    for key, r in results.items():
        if r.get("ok"):
            lines.append(
                f"{key:26s} {r['steps_per_sec']:8.2f} "
                f"{r['sample_updates_per_sec']:10.0f} "
                f"{r.get('tflops_per_sec', float('nan')):8.2f} "
                f"{r.get('mfu_vs_bf16_peak', float('nan')):7.4f}")
        else:
            lines.append(f"{key:26s}  FAILED({r.get('kind', 'error')}): "
                         f"{r.get('error', '')[:120]}")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(ART, "exp_largedomain_levers.txt"), "w") as f:
        f.write(out)
    return out


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        return _one(sys.argv[2])
    if len(sys.argv) >= 3 and sys.argv[1] == "--flops":
        return _flops(sys.argv[2])

    # queue timeouts deliver SIGTERM; convert to SystemExit so the
    # incremental writes (and subprocess cleanup) are the final state
    import signal
    signal.signal(signal.SIGTERM, lambda *a: sys.exit(143))

    only = sys.argv[1:] if len(sys.argv) > 1 else list(CONFIGS)
    os.makedirs(ART, exist_ok=True)
    # partial runs (explicit key args) merge into the existing table
    # instead of clobbering the other configs' results
    results = {}
    prev = os.path.join(ART, "exp_largedomain_levers.json")
    if os.path.exists(prev):
        with open(prev) as f:
            results.update(json.load(f))
    # FLOP counts are dtype-independent: count once per distinct
    # (batch, fused_up, gen_fwd) shape on CPU, reuse across dtypes
    flops_cache = {}
    for key in only:
        dtype, batch, k, fused_up, gen_fwd, *rest = CONFIGS[key]
        shape_sig = (batch, fused_up, gen_fwd)  # one-shot flops, see _build
        if shape_sig not in flops_cache:
            fl = _spawn("--flops", key)
            flops_cache[shape_sig] = fl.get("flops_per_step")
            print(f"# flops[{shape_sig}] = {flops_cache[shape_sig]}",
                  flush=True)
        res = _spawn("--one", key)
        fps = flops_cache[shape_sig]
        if res.get("ok") and fps:
            res["flops_per_step"] = fps
            res["tflops_per_sec"] = round(
                res["steps_per_sec"] * fps / 1e12, 2)
            res["mfu_vs_bf16_peak"] = round(
                res["tflops_per_sec"] / PEAK_TFLOPS, 4)
        results[key] = res
        print(json.dumps(res), flush=True)
        _write_results(results)  # incremental: survive timeout/crash

    print(_write_results(results))


if __name__ == "__main__":
    main()
