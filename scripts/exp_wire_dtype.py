"""Measure the f16 wire-dtype lever on the serving daemon.

Bulk scenario export is fetch-bound: 24.6 KB/scenario f32 through the
~8-10 MB/s tunnel (docs/PERF.md session 11).  `--wire-dtype float16`
casts the fractions on device before the fetch, halving wire bytes.
This script launches the daemon once per wire dtype and times the same
sustained 1000-scenario request loop against each, plus a client-side
conservation check on the f16 arm.

Usage:  python scripts/exp_wire_dtype.py [--smoke]
Prints ONE JSON block; progress goes to stderr.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from exp_serve_bench import ensure_weights, wait_ready, DEFAULT_W  # noqa: E402

SOCK = "/tmp/prdisagg_wire_dtype.sock"


def run_arm(weights, wire_dtype, n_req, n_scen, max_batch=None):
    from prdisagg_tpu.api.server import request

    argv = [sys.executable, "-m", "prdisagg_tpu.cli", "serve",
            "--weights", weights, "--socket", SOCK]
    if wire_dtype:
        argv += ["--wire-dtype", wire_dtype]
    if max_batch:  # smoke: warming the real 4000-chunk takes ~10 min on CPU
        argv += ["--max-batch", str(max_batch)]
    with open(f"/tmp/wire_dtype_{wire_dtype or 'f32'}.log", "wb") as log:
        srv = subprocess.Popen(argv, stdout=log, stderr=subprocess.STDOUT)
        try:
            wait_ready(SOCK, srv=srv,
                       log_path=log.name)
            rng = np.random.RandomState(7)
            conds = np.abs(rng.rand(8, 16, 16)).astype(np.float32) * 20.0
            os.makedirs("/tmp/wire_dtype_out", exist_ok=True)
            # warm the n_scen forward shape (one compile, untimed).  The
            # daemon only pre-warms its max_batch chunk, so this request can
            # pay a cold remote compile — on a fresh VM's empty cache that
            # exceeds request()'s default 600 s; give it wait_ready headroom.
            assert request(SOCK, {"cond": conds[0].tolist(),
                                  "n_scenarios": n_scen,
                                  "out": "/tmp/wire_dtype_out/w.npy"},
                           timeout=1800.0)["ok"]
            t0 = time.perf_counter()
            for i in range(n_req):
                r = request(SOCK, {"cond": conds[i % 8].tolist(),
                                   "n_scenarios": n_scen,
                                   "out": f"/tmp/wire_dtype_out/{i}.npy"})
                assert r["ok"], r
            dt = time.perf_counter() - t0
            out = np.load(f"/tmp/wire_dtype_out/{n_req - 1}.npy")
            cons = float(np.abs(out.sum(axis=1)
                                - conds[(n_req - 1) % 8]).max())
            request(SOCK, {"cmd": "shutdown"})
            srv.wait(timeout=60)
            return {
                "scenarios_per_sec": round(n_req * n_scen / dt, 0),
                "seconds_per_request": round(dt / n_req, 3),
                "max_abs_conservation_err_mm": cons,
            }
        finally:
            if srv.poll() is None:
                srv.terminate()
                try:
                    srv.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    srv.kill()


def main():
    # the TPU queues wrap this script in `timeout N`: timeout's SIGTERM
    # would kill the interpreter WITHOUT running run_arm's finally block,
    # orphaning a serve daemon that holds the chip for every later queue
    # stage.  Convert it to SystemExit so cleanup runs.
    signal.signal(signal.SIGTERM, lambda s, f: sys.exit(143))
    smoke = "--smoke" in sys.argv[1:]
    weights = ensure_weights(DEFAULT_W)
    n_req, n_scen, mb = (3, 50, 64) if smoke else (15, 1000, None)
    res = {"weights": os.path.basename(weights),
           "n_requests": n_req, "n_scenarios": n_scen}
    for wd, key in ((None, "wire_f32"), ("float16", "wire_f16")):
        print(f"# arm {key}", file=sys.stderr, flush=True)
        res[key] = run_arm(weights, wd, n_req, n_scen, max_batch=mb)
    f32 = res["wire_f32"]["scenarios_per_sec"]
    f16 = res["wire_f16"]["scenarios_per_sec"]
    res["speedup_f16_over_f32"] = round(f16 / f32, 2) if f32 else None
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
