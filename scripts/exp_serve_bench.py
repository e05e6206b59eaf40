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


def wait_ready(sock=SOCK, timeout=1800, srv=None, log_path=None):
    """Poll the daemon socket; fail FAST if the daemon process died.

    The session-10 on-chip run burned the full 30 min here because the
    daemon had crashed at startup (missing weights file) and the poll
    loop only watched the socket.
    """
    from prdisagg_tpu.api.server import request

    t0 = time.time()
    while time.time() - t0 < timeout:
        if srv is not None and srv.poll() is not None:
            tail = ""
            if log_path and os.path.exists(log_path):
                with open(log_path, errors="replace") as fh:
                    tail = "".join(fh.readlines()[-15:])
            raise RuntimeError(
                f"serve daemon exited rc={srv.returncode} before ready; "
                f"log tail:\n{tail}")
        if os.path.exists(sock):
            try:
                if request(sock, {"cmd": "ping"}, timeout=60).get("pong"):
                    return
            except (ConnectionError, OSError):
                pass
        time.sleep(2.0)
    raise TimeoutError(f"server on {sock} never became ready")


FIXTURE_W = "artifacts/serve_bench_fixture/gen_fixture.h5"

_MAKE_FIXTURE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os, sys
sys.path.insert(0, %(repo)r)
from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.train.state import create_train_state
from prdisagg_tpu.models.io import save_keras_generator_h5
cfg = ModelConfig()
state, gen, critic = create_train_state(cfg, TrainConfig(), seed=20)
os.makedirs(os.path.dirname(%(path)r), exist_ok=True)
save_keras_generator_h5(%(path)r, state.gen_params, cfg)
print("fixture written:", %(path)r, file=sys.stderr)
"""


def ensure_weights(weights):
    """Fall back to a deterministic random-init fixture if `weights` is gone.

    Serving throughput/latency do not depend on the weight VALUES, and
    conservation holds by construction (hour_softmax), so a seed-20
    random-init export benches the daemon identically to a trained
    checkpoint.  Synthesized in a CPU subprocess so this process never
    touches the TPU (the daemons own the chip).
    """
    if os.path.exists(weights):
        return weights
    print(f"# weights {weights} missing; using fixture {FIXTURE_W}",
          file=sys.stderr)
    if not os.path.exists(FIXTURE_W):
        repo = os.path.join(os.path.dirname(__file__), "..")
        code = _MAKE_FIXTURE % {"repo": repo, "path": FIXTURE_W}
        # stdout routed to stderr: this script's stdout is ONE JSON block
        # (artifacts/exp_serve_bench.txt is json.loads'd by the queue gate)
        subprocess.run([sys.executable, "-c", code], check=True, timeout=600,
                       stdout=sys.stderr)
    return FIXTURE_W


def main():
    # The TPU queues wrap this script in `timeout N`: timeout's SIGTERM
    # would kill the interpreter WITHOUT running the finally-block daemon
    # cleanup below, orphaning serve daemons that hold the chip for every
    # later queue stage.  Convert it to SystemExit so cleanup runs.
    import signal
    signal.signal(signal.SIGTERM, lambda s, f: sys.exit(143))
    argv = [a for a in sys.argv[1:] if a != "--smoke"]
    smoke = "--smoke" in sys.argv[1:]  # tiny counts: validate the script
    weights = ensure_weights(argv[0] if argv else DEFAULT_W)
    n_lat1, n_lat100, n_sus, n_conds, n_scen = (
        (5, 3, 3, 5, 10) if smoke else (50, 20, 20, 100, 100))
    from prdisagg_tpu.api.server import request

    log = open("/tmp/serve_bench_daemon.log", "wb")
    srv = subprocess.Popen(
        [sys.executable, "-m", "prdisagg_tpu.cli", "serve",
         "--weights", weights, "--socket", SOCK],
        stdout=log, stderr=subprocess.STDOUT,
    )
    res = {"weights": os.path.basename(weights)}
    try:
        t0 = time.time()
        wait_ready(srv=srv, log_path="/tmp/serve_bench_daemon.log")
        res["startup_seconds"] = round(time.time() - t0, 1)

        rng = np.random.RandomState(7)
        conds = np.abs(rng.rand(100, 16, 16)).astype(np.float32) * 20.0
        cond1 = conds[0].tolist()

        n_big = 50 if smoke else 1000
        # warm every forward shape used below (trace/compile once);
        # timeout=1800 survives a COLD remote compile through the tunnel
        # (ADVICE r4: the 600 s default died on a fresh VM's empty cache)
        os.makedirs("/tmp/serve_bench_out", exist_ok=True)
        for ns in (1, n_scen):
            assert request(SOCK, {"cond": cond1, "n_scenarios": ns},
                           timeout=1800.0)["ok"]
        assert request(SOCK, {"cond": cond1, "n_scenarios": n_big,
                              "out": "/tmp/serve_bench_out/w.npy"},
                       timeout=1800.0)["ok"]

        # 1. single-scenario latency, sequential requests
        lats = []
        for i in range(n_lat1):
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
            for i in range(n_lat100):
                t = time.perf_counter()
                r = request(SOCK, {"cond": conds[i % 100].tolist(),
                                   "n_scenarios": n_scen, "encoding": enc})
                lats.append(time.perf_counter() - t)
                assert r["ok"]
            res[key] = {
                "p50": round(float(np.percentile(lats, 50)) * 1e3, 1),
                "p95": round(float(np.percentile(lats, 95)) * 1e3, 1),
            }

        # 3. sustained 1000-scenario requests, .npy output
        t0 = time.perf_counter()
        for i in range(n_sus):
            r = request(SOCK, {"cond": conds[i % 100].tolist(),
                               "n_scenarios": n_big,
                               "out": f"/tmp/serve_bench_out/{i}.npy"})
            assert r["ok"]
        dt = time.perf_counter() - t0
        res["sustained_1000scen"] = {
            "requests_per_sec": round(n_sus / dt, 2),
            "scenarios_per_sec": round(n_sus * n_big / dt, 0),
        }

        # 4. batched: 100 conds x 100 scenarios as ONE fused request,
        #    twice — the daemon pre-warms its max_batch chunk shape at
        #    startup, so both passes should be pure device + fetch; a
        #    first/repeat gap means something still compiled lazily
        np.save("/tmp/serve_bench_out/conds.npy", conds[:n_conds])
        for key in ("batched_100x100", "batched_100x100_repeat"):
            t0 = time.perf_counter()
            r = request(SOCK, {"cond_npy": "/tmp/serve_bench_out/conds.npy",
                               "n_scenarios": n_scen,
                               "out": "/tmp/serve_bench_out/batch.npy"})
            dt = time.perf_counter() - t0
            assert r["ok"], r
            res[key] = {
                "seconds": round(dt, 2),
                "scenarios_per_sec": round(n_conds * n_scen / dt, 0),
                "shape": r["shape"],
            }

        # conservation through the whole stack (client-side check)
        out = np.load("/tmp/serve_bench_out/batch.npy")
        daily = out.sum(axis=2)  # (K, S, nd, nd) mm summed over hours
        err = float(np.abs(daily - conds[:n_conds, None]).max())
        res["max_abs_conservation_err_mm"] = err

        # daemon-side observability: server-observed latency percentiles
        # (admission -> response built) + counters for the artifact
        st = request(SOCK, {"cmd": "stats"})
        res["daemon_stats"] = {k: v for k, v in st.items() if k != "ok"}

        request(SOCK, {"cmd": "shutdown"})
        srv.wait(timeout=60)
        log.flush()
        with open("/tmp/serve_bench_daemon.log") as fh:
            for ln in fh:
                if ln.startswith("warmed forward"):
                    res["daemon_warm_line"] = ln.strip()
    finally:
        log.close()
        if srv.poll() is None:
            srv.terminate()
            try:
                srv.wait(timeout=30)
            except subprocess.TimeoutExpired:
                srv.kill()

    # 5. concurrent 1-scenario clients, micro-batching OFF vs ON — the
    #    daemon relaunches per mode (the window is a server-level setting;
    #    OFF keeps the sequential key chain, ON fuses concurrent requests
    #    into one forward, trading ~window of queueing for one dispatch)
    n_threads, n_each = (4, 3) if smoke else (16, 25)
    for window, key in ((0.0, "concurrent_1scen_unbatched"),
                        (8.0, "concurrent_1scen_window8ms")):
        try:
            res[key] = _concurrency_stage(weights, window, n_threads, n_each)
        except Exception as err:  # keep stages 1-4 even if stage 5 dies
            res[key] = {"error": f"{type(err).__name__}: {err}"}
    print(json.dumps(res, indent=1))


def _concurrency_stage(weights, window_ms, n_threads, n_each):
    import concurrent.futures

    from prdisagg_tpu.api.server import request

    sock = SOCK + ".conc"
    with open("/tmp/serve_bench_conc.log", "wb") as log:
        # no explicit --warm: window 0 warms "max", window > 0 auto-warms
        # "max,buckets:16" (the fused shapes this load produces)
        srv = subprocess.Popen(
            [sys.executable, "-m", "prdisagg_tpu.cli", "serve",
             "--weights", weights, "--socket", sock,
             "--batch-window-ms", str(window_ms)],
            stdout=log, stderr=subprocess.STDOUT,
        )
        try:
            wait_ready(sock, srv=srv, log_path="/tmp/serve_bench_conc.log")
            rng = np.random.RandomState(11)
            cond = (np.abs(rng.rand(16, 16)) * 20.0).astype(
                np.float32).tolist()
            def one(_):
                r = request(sock, {"cond": cond, "n_scenarios": 1},
                            timeout=600)
                assert r["ok"], r
                return r

            # untimed warmup burst: fused totals 1..n_threads hit up to
            # ~log2 bucket shapes, each a cold compile on first encounter
            # (they land in the persistent cache for later runs)
            with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
                list(ex.map(one, range(n_threads * 2)))

            t0 = time.perf_counter()
            with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
                list(ex.map(one, range(n_threads * n_each)))
            dt = time.perf_counter() - t0
            st = request(sock, {"cmd": "stats"})
            request(sock, {"cmd": "shutdown"})
            srv.wait(timeout=60)
            return {
                "window_ms": window_ms,
                "clients": n_threads,
                "requests": n_threads * n_each,
                "requests_per_sec": round(n_threads * n_each / dt, 1),
                "fused_batches": st.get("fused_batches"),
                # server-observed per-request wall (queueing included):
                # under the window, p50 ~ window + device time
                "latency_ms_server": st.get("latency_ms"),
            }
        finally:
            if srv.poll() is None:
                srv.terminate()
                try:
                    srv.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    srv.kill()


if __name__ == "__main__":
    main()
