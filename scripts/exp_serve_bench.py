"""On-chip benchmark of the scenario-serving daemon (`cli serve`).

Measures the production serving stack end-to-end — Unix-socket JSON
protocol, resident weights, traced forward — on the real TPU:

  1. single-scenario request latency (RTT through socket + dispatch),
  2. 100-scenario request latency (the reference example.py shape),
  3. sustained 1000-scenario requests with .npy output (throughput), and
  4. one batched request: 100 conditions x 100 scenarios as ONE forward.

The reference has no serving story at all (consumers import
raindisagg_gan_pretrained.py and pay TF import + .h5 load + a fresh
predict graph per process, raindisagg_gan_pretrained.py:43-49); these are
the anchors for the only-here daemon.  Writes one JSON block to stdout.

Usage (quiet host, healthy backend):
    python scripts/exp_serve_bench.py [weights.h5] > artifacts/exp_serve_bench.txt
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SOCK = "/tmp/prdisagg_serve_bench.sock"
DEFAULT_W = (
    "artifacts/paper_protocol_regime_ema2/trained_models/paper_protocol/"
    "gen_ema_20090101-20161231-tp_thresh_daily5_n_thresh20_ndomain16_"
    "stride16_0050.h5"
)


def wait_ready(timeout=1800):
    from prdisagg_tpu.api.server import request

    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(SOCK):
            try:
                if request(SOCK, {"cmd": "ping"}, timeout=60).get("pong"):
                    return
            except (ConnectionError, OSError):
                pass
        time.sleep(2.0)
    raise TimeoutError("server never became ready")


def main():
    weights = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_W
    from prdisagg_tpu.api.server import request

    srv = subprocess.Popen(
        [sys.executable, "-m", "prdisagg_tpu.cli", "serve",
         "--weights", weights, "--socket", SOCK],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    res = {"weights": os.path.basename(weights)}
    try:
        t0 = time.time()
        wait_ready()
        res["startup_seconds"] = round(time.time() - t0, 1)

        rng = np.random.RandomState(7)
        conds = np.abs(rng.rand(100, 16, 16)).astype(np.float32) * 20.0
        cond1 = conds[0].tolist()

        # warm every forward shape used below (trace/compile once)
        os.makedirs("/tmp/serve_bench_out", exist_ok=True)
        for ns in (1, 100):
            assert request(SOCK, {"cond": cond1, "n_scenarios": ns})["ok"]
        assert request(SOCK, {"cond": cond1, "n_scenarios": 1000,
                              "out": "/tmp/serve_bench_out/w.npy"})["ok"]

        # 1. single-scenario latency, 50 sequential requests
        lats = []
        for i in range(50):
            t = time.perf_counter()
            r = request(SOCK, {"cond": conds[i % 100].tolist(),
                               "n_scenarios": 1})
            lats.append(time.perf_counter() - t)
            assert r["ok"]
        res["latency_ms_1scen"] = {
            "p50": round(float(np.percentile(lats, 50)) * 1e3, 1),
            "p95": round(float(np.percentile(lats, 95)) * 1e3, 1),
        }

        # 2. 100-scenario request latency (reference example shape), on
        #    both inline wire formats: the float-list default pays ~1 µs
        #    per float of repr on this 1-core host; b64 is two memcpy-rate
        #    passes over the same bytes
        for enc, key in (("list", "latency_ms_100scen"),
                         ("b64", "latency_ms_100scen_b64")):
            lats = []
            for i in range(20):
                t = time.perf_counter()
                r = request(SOCK, {"cond": conds[i % 100].tolist(),
                                   "n_scenarios": 100, "encoding": enc})
                lats.append(time.perf_counter() - t)
                assert r["ok"]
            res[key] = {
                "p50": round(float(np.percentile(lats, 50)) * 1e3, 1),
                "p95": round(float(np.percentile(lats, 95)) * 1e3, 1),
            }

        # 3. sustained 1000-scenario requests, .npy output
        n_req, t0 = 20, time.perf_counter()
        for i in range(n_req):
            r = request(SOCK, {"cond": conds[i % 100].tolist(),
                               "n_scenarios": 1000,
                               "out": f"/tmp/serve_bench_out/{i}.npy"})
            assert r["ok"]
        dt = time.perf_counter() - t0
        res["sustained_1000scen"] = {
            "requests_per_sec": round(n_req / dt, 2),
            "scenarios_per_sec": round(n_req * 1000 / dt, 0),
        }

        # 4. batched: 100 conds x 100 scenarios as ONE fused request
        np.save("/tmp/serve_bench_out/conds.npy", conds)
        t0 = time.perf_counter()
        r = request(SOCK, {"cond_npy": "/tmp/serve_bench_out/conds.npy",
                           "n_scenarios": 100,
                           "out": "/tmp/serve_bench_out/batch.npy"})
        dt = time.perf_counter() - t0
        assert r["ok"], r
        res["batched_100x100"] = {
            "seconds": round(dt, 2),
            "scenarios_per_sec": round(100 * 100 / dt, 0),
            "shape": r["shape"],
        }

        # conservation through the whole stack (client-side check)
        out = np.load("/tmp/serve_bench_out/batch.npy")
        daily = out.sum(axis=2)  # (K, S, nd, nd) mm summed over hours
        err = float(np.abs(daily - conds[:, None]).max())
        res["max_abs_conservation_err_mm"] = err

        request(SOCK, {"cmd": "shutdown"})
        srv.wait(timeout=60)
    finally:
        if srv.poll() is None:
            srv.terminate()
            try:
                srv.wait(timeout=30)
            except subprocess.TimeoutExpired:
                srv.kill()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
