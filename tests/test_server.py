"""Scenario-serving daemon (api/server.py): protocol, parity with the
direct inference API, fused-batch path, error isolation, shutdown."""

import json
import threading

import numpy as np
import pytest

from prdisagg_tpu.api import PretrainedGenerator, ScenarioServer
from prdisagg_tpu.api.server import request, scenarios_array
from prdisagg_tpu.core.config import ModelConfig, TrainConfig
from prdisagg_tpu.train import create_train_state

TINY = ModelConfig(
    ndomain=16, latent_dim=8,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path_factory.mktemp("srv") / "scenarios.sock")
    gen = PretrainedGenerator(state.gen_params, TINY, seed=11)
    server = ScenarioServer(gen, sock)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield sock, state
    if thread.is_alive():
        try:
            request(sock, {"cmd": "shutdown"}, timeout=10)
        except OSError:
            pass
    thread.join(timeout=30)


def test_server_ping_info(served):
    sock, _ = served
    assert request(sock, {"cmd": "ping"}) == {"ok": True, "pong": True}
    info = request(sock, {"cmd": "info"})
    assert info["ok"] and info["ndomain"] == 16 and info["latent_dim"] == 8


def test_server_single_request_matches_direct_api(served):
    sock, state = served
    cond = 10.0 * np.ones((16, 16), dtype=np.float32)
    resp = request(sock, {"cond": cond.tolist(), "n_scenarios": 3})
    assert resp["ok"] and resp["shape"] == [3, 24, 16, 16]
    got = np.asarray(resp["scenarios"], dtype=np.float32)
    # a fresh generator with the server's seed replays the same key chain
    ref = PretrainedGenerator(state.gen_params, TINY, seed=11)
    want = ref.generate_scenarios(cond, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # conservation survives the JSON round-trip
    np.testing.assert_allclose(
        got.sum(axis=1), np.broadcast_to(cond, got.sum(axis=1).shape),
        rtol=1e-3)


def test_server_batch_and_npy_out(served, tmp_path):
    sock, _ = served
    conds = np.stack([np.full((16, 16), 5.0, np.float32),
                      np.full((16, 16), 20.0, np.float32)])
    inp = str(tmp_path / "conds.npy")
    out = str(tmp_path / "scen.npy")
    np.save(inp, conds)
    resp = request(sock, {"cond_npy": inp, "n_scenarios": 4, "out": out})
    assert resp["ok"] and resp["out"] == out
    scen = np.load(out)
    assert scen.shape == (2, 4, 24, 16, 16)
    np.testing.assert_allclose(
        scen.sum(axis=2), np.broadcast_to(conds[:, None], (2, 4, 16, 16)),
        rtol=1e-3)


def test_server_b64_encoding_bit_exact(tmp_path):
    """'encoding': 'b64' carries the generator's f32 output VERBATIM (raw
    bytes, no decimal round-trip): the decode equals a direct-API replay of
    the same key chain bit for bit."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=5),
        str(tmp_path / "b.sock"))
    try:
        cond = np.linspace(1.0, 30.0, 256, dtype=np.float32).reshape(16, 16)
        resp = server.handle_request(
            {"cond": cond.tolist(), "n_scenarios": 2, "encoding": "b64"})
        assert resp["ok"] and resp["dtype"] == "float32"
        got = scenarios_array(resp)
        ref = PretrainedGenerator(state.gen_params, TINY, seed=5)
        want = ref.generate_scenarios(cond, 2).astype(np.float32)
        np.testing.assert_array_equal(got, want)
    finally:
        server.close()


def test_server_b64_over_list_cap_through_socket(served):
    """A result over the float-list INLINE_CAP still serves inline under
    b64, and conservation survives the binary round-trip."""
    sock, _ = served
    cond = np.linspace(1.0, 30.0, 256, dtype=np.float32).reshape(16, 16)
    big = request(sock, {"cond": cond.tolist(), "n_scenarios": 400,
                         "encoding": "b64"})
    assert big["ok"] and scenarios_array(big).shape == (400, 24, 16, 16)
    np.testing.assert_allclose(
        scenarios_array(big).sum(axis=1),
        np.broadcast_to(cond, (400, 16, 16)), rtol=1e-3)


def test_server_b64_errors(served, monkeypatch):
    sock, _ = served
    cond16 = np.ones((16, 16), dtype=np.float32)
    bad = request(sock, {"cond": cond16.tolist(), "n_scenarios": 1,
                         "encoding": "raw"})
    assert not bad["ok"] and "encoding" in bad["error"]
    # over the b64 cap -> refused with 'out' guidance (cap shrunk so the
    # test doesn't have to build a 134 MB response)
    import prdisagg_tpu.api.server as server_mod

    monkeypatch.setattr(server_mod, "B64_CAP", 1000)
    capped = request(sock, {"cond": cond16.tolist(), "n_scenarios": 1,
                            "encoding": "b64"})
    assert not capped["ok"] and "out" in capped["error"]
    with pytest.raises(ValueError, match="not a success"):
        scenarios_array(bad)
    with pytest.raises(ValueError, match="no inline scenarios"):
        scenarios_array({"ok": True, "shape": [1], "out": "x.npy"})


def test_server_errors_do_not_kill_it(served):
    sock, _ = served
    bad_shape = request(sock, {"cond": [[1.0, 2.0]], "n_scenarios": 2})
    assert not bad_shape["ok"] and "cond shape" in bad_shape["error"]
    assert not request(sock, {"cmd": "nope"})["ok"]
    assert not request(sock, {"n_scenarios": 2})["ok"]
    assert not request(sock, {"cond_npy": "/does/not/exist.npy"})["ok"]
    # inline cap: a too-large inline result is refused with guidance
    big = request(sock, {
        "cond": np.ones((16, 16)).tolist(), "n_scenarios": 400})
    assert not big["ok"] and "out" in big["error"]
    # and the server still answers
    assert request(sock, {"cmd": "ping"})["ok"]


def test_stalled_client_does_not_block_others(served):
    """A connected-but-silent client must not serialize the service: other
    clients' requests are answered while it idles (connections are handled
    in threads; only compute is single-file)."""
    import socket as socketlib
    import time

    sock, _ = served
    stalled = socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM)
    stalled.connect(sock)  # sends nothing — pre-threading this held the
    try:                   # accept loop for the full 60 s client timeout
        t0 = time.perf_counter()
        assert request(sock, {"cmd": "ping"}, timeout=30)["ok"]
        assert time.perf_counter() - t0 < 20.0
    finally:
        stalled.close()


def test_concurrent_clients_all_served(served):
    """Parallel clients each get a correct, whole response (per-connection
    threads share one compute lock and one generator key chain)."""
    import concurrent.futures

    sock, _ = served
    cond = np.full((16, 16), 7.0, np.float32)

    def one(i):
        r = request(sock, {"cond": cond.tolist(), "n_scenarios": 2,
                           "encoding": "b64"}, timeout=120)
        assert r["ok"], r
        a = scenarios_array(r)
        np.testing.assert_allclose(
            a.sum(axis=1), np.broadcast_to(cond, a.sum(axis=1).shape),
            rtol=1e-3)
        return a

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(one, range(4)))
    assert len(outs) == 4 and all(o.shape == (2, 24, 16, 16) for o in outs)


def test_bucket_sizes():
    from prdisagg_tpu.api.pretrained import _bucket

    assert [_bucket(n) for n in (1, 2, 3, 4, 5, 6, 7, 8, 9, 13)] == \
        [1, 2, 3, 4, 6, 6, 8, 8, 12, 16]
    assert _bucket(768) == 768 and _bucket(769) == 1024
    # padding stays under 50% (worst case n = 2^k + 1 -> 1.5 * 2^k)
    for n in range(1, 600):
        assert n <= _bucket(n) < max(2.1, 1.5 * n)


def test_generate_scenarios_multi_matches_and_conserves():
    """One fused forward serves heterogeneous requests: each slice has the
    right shape, conserves its own daily sum, and bucket padding (total 5
    -> shape 6) never leaks padded rows into the outputs."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, TINY, seed=3)
    rng = np.random.RandomState(5)
    c1 = rng.gamma(2.0, 5.0, (16, 16)).astype(np.float32)
    c2 = rng.gamma(2.0, 5.0, (16, 16, 1)).astype(np.float32)
    outs = pg.generate_scenarios_multi([c1, c2], [2, 3])  # total 5 -> 6
    assert [o.shape for o in outs] == [(2, 24, 16, 16), (3, 24, 16, 16)]
    np.testing.assert_allclose(
        outs[0].sum(axis=1), np.broadcast_to(c1, (2, 16, 16)), rtol=1e-3)
    np.testing.assert_allclose(
        outs[1].sum(axis=1), np.broadcast_to(c2[..., 0], (3, 16, 16)),
        rtol=1e-3)
    # requests differ (independent latents within the fused draw)
    assert not np.allclose(outs[0][0], outs[0][1])


def test_run_batch_splits_map_and_stack_entries():
    """The batcher's split/reassembly: a fused batch of one map request
    and one (K, nd, nd) stack request reproduces exactly what
    generate_scenarios_multi returns for the flattened layout."""
    from prdisagg_tpu.api.server import _Pending

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    rng = np.random.RandomState(8)
    cmap = rng.gamma(2.0, 5.0, (16, 16)).astype(np.float32)
    cstack = rng.gamma(2.0, 5.0, (2, 16, 16)).astype(np.float32)

    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=17),
        "/tmp/test_run_batch.sock")
    try:
        a = _Pending(cmap, 3, False)
        b = _Pending(cstack, 2, True)
        server._run_batch([a, b])
        assert a.event.is_set() and b.event.is_set()
        assert a.error is None and b.error is None
        assert a.scenarios.shape == (3, 24, 16, 16)
        assert b.scenarios.shape == (2, 2, 24, 16, 16)
        # replay: same seed, same flattened request layout
        ref = PretrainedGenerator(state.gen_params, TINY, seed=17)
        want = ref.generate_scenarios_multi(
            [cmap, cstack[0], cstack[1]], [3, 2, 2])
        np.testing.assert_array_equal(a.scenarios, want[0])
        np.testing.assert_array_equal(b.scenarios, np.stack(want[1:]))
        # a compute error fails the batch without killing anything
        bad = _Pending(np.full((16, 16), np.inf, np.float32), 1, False)
        server.generator = None  # force an exception inside _run_batch
        server._run_batch([bad])
        assert bad.event.is_set() and bad.error is not None
    finally:
        server.generator = object()
        server.close()


def test_server_micro_batching_fuses_concurrent_requests(tmp_path):
    """With a batch window, concurrent clients are answered from fused
    forwards: every response is correct and the daemon reports fewer
    fused batches than requests."""
    import concurrent.futures
    import threading as th

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path / "mb.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=2), sock,
        batch_window_ms=1500.0)
    thread = th.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    cond = np.full((16, 16), 9.0, np.float32)
    barrier = th.Barrier(4)

    def one(_):
        barrier.wait(timeout=60)
        r = request(sock, {"cond": cond.tolist(), "n_scenarios": 2,
                           "encoding": "b64"}, timeout=120)
        assert r["ok"], r
        a = scenarios_array(r)
        np.testing.assert_allclose(
            a.sum(axis=1), np.broadcast_to(cond, (2, 16, 16)), rtol=1e-3)
        return a

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(one, range(4)))
    assert all(o.shape == (2, 24, 16, 16) for o in outs)
    info = request(sock, {"cmd": "info"})
    assert info["batch_window_ms"] == 1500.0
    assert 1 <= info["fused_batches"] < 4  # fusion actually happened
    # errors are rejected at parse time, not inside a fused batch
    bad = request(sock, {"cond": [[1.0]], "n_scenarios": 1})
    assert not bad["ok"] and "cond shape" in bad["error"]
    assert request(sock, {"cmd": "shutdown"})["ok"]
    thread.join(timeout=60)
    assert not thread.is_alive()


def test_run_batch_isolates_a_failing_request():
    """One request's compute failure must not fail innocent co-batched
    clients: the batch retries item-by-item, isolating the offender."""
    from prdisagg_tpu.api.server import _Pending

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=6),
        "/tmp/test_isolate.sock")
    real_multi = server.generator.generate_scenarios_multi
    poison = np.full((16, 16), -1.0, np.float32)

    def flaky_multi(conds, ns):
        if any(c is poison or (np.asarray(c) == -1.0).all() for c in conds):
            if len(conds) > 1:
                raise RuntimeError("fused allocation failed")
            raise RuntimeError("poison request")
        return real_multi(conds, ns)

    try:
        server.generator.generate_scenarios_multi = flaky_multi
        good = _Pending(np.full((16, 16), 5.0, np.float32), 2, False)
        bad = _Pending(poison, 1, False)
        server._run_batch([good, bad])
        assert good.error is None and good.scenarios.shape == (2, 24, 16, 16)
        assert bad.error is not None and "poison" in bad.error
    finally:
        server.close()


def test_zero_row_stack_rejected_at_parse():
    """(0, nd, nd) stacks are refused as a parse error — before the fix
    they reached the batcher and np.stack([]) killed its thread."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY), "/tmp/test_zrow.sock")
    try:
        parsed = server._parse_scenario(
            {"cond": np.zeros((0, 16, 16)).tolist(), "n_scenarios": 1})
        assert isinstance(parsed, dict) and not parsed["ok"]
        assert "cond shape" in parsed["error"]
    finally:
        server.close()


def test_cmd_null_routes_through_the_batcher(tmp_path):
    """{'cmd': null, 'cond': ...} must not compute in the handler thread
    when micro-batching is on (it would race the batcher's key chain)."""
    import threading as th

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path / "cn.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=4), sock,
        batch_window_ms=20.0)
    thread = th.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    cond = np.full((16, 16), 3.0, np.float32)
    r = request(sock, {"cmd": None, "cond": cond.tolist(), "n_scenarios": 1},
                timeout=120)
    assert r["ok"], r
    info = request(sock, {"cmd": "info"})
    assert info["fused_batches"] == 1  # it went through the batcher
    assert request(sock, {"cmd": "shutdown"})["ok"]
    thread.join(timeout=60)


def test_warm_buckets_spec():
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, TINY, seed=1, max_batch=8)
    assert pg.warm(("buckets:6",)) >= 0.0  # warms {1, 2, 3, 4, 6}
    assert pg.warm(("buckets",)) >= 0.0    # default limit, capped at max


def test_server_stats_and_hot_reload(tmp_path):
    """The operability surface: 'stats' counts requests/errors/scenarios
    with wire-level latency percentiles, and 'reload' hot-swaps same-
    architecture weights without touching the key chain (a mismatched
    file is refused and the old weights keep serving)."""
    import jax

    from prdisagg_tpu.models.io import save_params_npz

    state_a, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    state_b, _, _ = create_train_state(TINY, TrainConfig(seed=1))
    sock = str(tmp_path / "st.sock")
    server = ScenarioServer(
        PretrainedGenerator(state_a.gen_params, TINY, seed=7), sock)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        cond = np.full((16, 16), 4.0, np.float32)
        ok1 = request(sock, {"cond": cond.tolist(), "n_scenarios": 3,
                             "encoding": "b64"})
        assert ok1["ok"]
        assert not request(sock, {"cond": [[1.0]], "n_scenarios": 1})["ok"]
        st = request(sock, {"cmd": "stats"})
        assert st["ok"] and st["scenario_requests"] == 2
        assert st["errors"] == 1 and st["scenarios"] == 3
        assert st["reloads"] == 0 and st["uptime_s"] >= 0
        assert st["latency_ms"]["count"] == 1
        assert 0 < st["latency_ms"]["p50"] <= st["latency_ms"]["max"]

        # hot reload: same architecture, fresh weights
        wpath = str(tmp_path / "gen_b.npz")
        save_params_npz(wpath, state_b.gen_params)
        rl = request(sock, {"cmd": "reload", "weights": wpath})
        assert rl["ok"] and rl["reloaded"] == wpath, rl
        for cur, new in zip(jax.tree_util.tree_leaves(server.generator.params),
                            jax.tree_util.tree_leaves(state_b.gen_params)):
            np.testing.assert_array_equal(np.asarray(cur), np.asarray(new))
        # the key chain is untouched: a replay generator with B's weights
        # that burns one request reproduces the post-reload response exactly
        after = request(sock, {"cond": cond.tolist(), "n_scenarios": 2,
                               "encoding": "b64"})
        ref = PretrainedGenerator(state_b.gen_params, TINY, seed=7)
        ref.generate_scenarios(cond, 3)  # burn key 1 (the pre-reload request)
        want = ref.generate_scenarios(cond, 2).astype(np.float32)
        np.testing.assert_array_equal(scenarios_array(after), want)

        # mismatched architecture is refused; old weights keep serving
        tiny2 = ModelConfig(ndomain=16, latent_dim=4, gen_channels=(8, 8, 8),
                            base_channels=8, critic_channels=(8, 8, 8, 8))
        state_c, _, _ = create_train_state(tiny2, TrainConfig(seed=2))
        bad_path = str(tmp_path / "gen_c.npz")
        save_params_npz(bad_path, state_c.gen_params)
        refused = request(sock, {"cmd": "reload", "weights": bad_path})
        assert not refused["ok"] and "refused" in refused["error"]
        assert not request(sock, {"cmd": "reload"})["ok"]  # no path
        assert not request(
            sock, {"cmd": "reload", "weights": "/no/such.npz"})["ok"]
        still = request(sock, {"cond": cond.tolist(), "n_scenarios": 1,
                               "encoding": "b64"})
        assert still["ok"]  # still serving, on B's weights
        st2 = request(sock, {"cmd": "stats"})
        assert st2["reloads"] == 1 and st2["last_reload"] == wpath
        assert st2["scenario_requests"] == 4 and st2["errors"] == 1
        assert st2["scenarios"] == 6 and st2["latency_ms"]["count"] == 3
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_server_watch_dir_hot_reloads_new_exports(tmp_path):
    """Weight watching (--watch): a newer gen_* export appearing in the
    watched directory is hot-swapped automatically; a broken file is
    refused without killing the watcher, and a later good export still
    reloads."""
    import time

    import jax

    from prdisagg_tpu.models.io import save_params_npz

    state_a, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    state_b, _, _ = create_train_state(TINY, TrainConfig(seed=1))
    wdir = tmp_path / "exports"
    wdir.mkdir()
    save_params_npz(str(wdir / "gen_x_0001.npz"), state_a.gen_params)
    sock = str(tmp_path / "w.sock")
    server = ScenarioServer(
        PretrainedGenerator(state_a.gen_params, TINY, seed=9), sock,
        watch_path=str(wdir), watch_interval_s=0.05)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def wait_for(pred, what, timeout=60):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred():
                return
            time.sleep(0.1)
        raise AssertionError(f"timed out waiting for {what}")

    try:
        # the startup signature covers gen_x_0001: no spurious reload
        assert server._watch_sig[1].endswith("gen_x_0001.npz")
        # a broken newest file is refused; the old weights keep serving
        (wdir / "gen_x_0002.npz").write_bytes(b"not an npz at all")
        wait_for(lambda: server._watch_sig[1].endswith("gen_x_0002.npz"),
                 "watcher to see the broken file")
        st = request(sock, {"cmd": "stats"})
        assert st["reloads"] == 0 and st["watch_path"] == str(wdir)
        assert request(sock, {"cond": np.full((16, 16), 2.0).tolist(),
                              "n_scenarios": 1, "encoding": "b64"})["ok"]
        # a good newer export is picked up automatically
        save_params_npz(str(wdir / "gen_x_0003.npz"), state_b.gen_params)
        wait_for(lambda: request(sock, {"cmd": "stats"})["reloads"] == 1,
                 "watcher to reload the new export")
        assert request(sock, {"cmd": "stats"})["last_reload"].endswith(
            "gen_x_0003.npz")
        for cur, new in zip(jax.tree_util.tree_leaves(server.generator.params),
                            jax.tree_util.tree_leaves(state_b.gen_params)):
            np.testing.assert_array_equal(np.asarray(cur), np.asarray(new))
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)
    assert not thread.is_alive()
    assert not server._watcher.is_alive()  # joined via the shutdown flag


def test_reload_params_validates_before_swapping():
    """reload_params refuses structure or shape mismatches atomically —
    the serving params are untouched on failure."""
    import jax

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, TINY)
    before = jax.tree_util.tree_leaves(pg.params)
    with pytest.raises(ValueError, match="structure mismatch"):
        pg.reload_params({"params": {}})
    bad = jax.tree_util.tree_map(
        lambda a: np.zeros(np.shape(a) + (2,), np.asarray(a).dtype),
        state.gen_params)
    with pytest.raises(ValueError, match="leaf mismatch"):
        pg.reload_params(bad)
    for cur, orig in zip(jax.tree_util.tree_leaves(pg.params), before):
        np.testing.assert_array_equal(np.asarray(cur), np.asarray(orig))


def test_server_shutdown_last(served):
    sock, _ = served
    assert request(sock, {"cmd": "shutdown"})["ok"]


def test_request_lines_share_one_connection(tmp_path):
    """Multiple newline-delimited requests on one connection each get a
    response, and max_requests bounds the loop for smoke runs."""
    import socket as socketlib

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock_path = str(tmp_path / "s.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY), sock_path)
    thread = threading.Thread(
        target=server.serve_forever, kwargs={"max_requests": 3}, daemon=True)
    thread.start()
    with socketlib.socket(socketlib.AF_UNIX, socketlib.SOCK_STREAM) as s:
        s.settimeout(120)
        s.connect(sock_path)
        s.sendall(b'{"cmd": "ping"}\n{"cmd": "info"}\n{"cmd": "ping"}\n')
        buf = b""
        while buf.count(b"\n") < 3:
            chunk = s.recv(1 << 16)
            if not chunk:
                break
            buf += chunk
    lines = [json.loads(l) for l in buf.splitlines()]
    assert len(lines) == 3 and all(r["ok"] for r in lines)
    thread.join(timeout=30)
    assert not thread.is_alive()


def test_reload_params_under_mesh_stays_replicated():
    """Hot reload on a DP-serving generator re-replicates the new weights
    over the mesh; sharded output equals a fresh single-device generator
    with the same weights and key chain."""
    from prdisagg_tpu.parallel import make_mesh

    state_a, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    state_b, _, _ = create_train_state(TINY, TrainConfig(seed=1))
    mesh = make_mesh(4)
    pg = PretrainedGenerator(state_a.gen_params, TINY, seed=13, mesh=mesh)
    pg.reload_params(state_b.gen_params)
    cond = np.full((16, 16), 6.0, np.float32)
    got = pg.generate_scenarios(cond, 3)
    ref = PretrainedGenerator(state_b.gen_params, TINY, seed=13)
    np.testing.assert_allclose(got, ref.generate_scenarios(cond, 3),
                               rtol=1e-5, atol=1e-6)


def test_variant_generator_serves_multichannel_conds(tmp_path):
    """doy-variant weights (3 conditioning channels) serve through the
    whole stack: channel 0 stays the conserved mm daily sum, extra
    channels pass through un-normalized (the sampler's semantics), and
    the daemon accepts (nd, nd, 3) maps / (K, nd, nd, 3) stacks while
    rejecting channel-less conds with the channel count in the error."""
    tiny3 = ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                        gen_channels=(8, 8, 8), base_channels=8,
                        critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny3, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, tiny3, seed=5)
    rng = np.random.RandomState(3)
    daily = rng.gamma(2.0, 5.0, (16, 16)).astype(np.float32)
    angle = 2 * np.pi * 120 / 365.0
    cond = np.stack([daily,
                     np.full((16, 16), np.sin(angle), np.float32),
                     np.full((16, 16), np.cos(angle), np.float32)], axis=-1)
    scen = pg.generate_scenarios(cond, 3)
    assert scen.shape == (3, 24, 16, 16)
    np.testing.assert_allclose(
        scen.sum(axis=1), np.broadcast_to(daily, (3, 16, 16)), rtol=1e-3)
    with pytest.raises(ValueError, match="channels"):
        pg.generate_scenarios(daily, 2)  # missing the variant channels

    sock = str(tmp_path / "v.sock")
    server = ScenarioServer(pg, sock)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        r = request(sock, {"cond": cond.tolist(), "n_scenarios": 2,
                           "encoding": "b64"})
        assert r["ok"] and r["shape"] == [2, 24, 16, 16]
        np.testing.assert_allclose(
            scenarios_array(r).sum(axis=1),
            np.broadcast_to(daily, (2, 16, 16)), rtol=1e-3)
        stack = np.stack([cond, cond])
        r2 = request(sock, {"cond": stack.tolist(), "n_scenarios": 2,
                            "encoding": "b64"})
        assert r2["ok"] and r2["shape"] == [2, 2, 24, 16, 16]
        bad = request(sock, {"cond": daily.tolist(), "n_scenarios": 1})
        assert not bad["ok"] and ", 3) map" in bad["error"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_non_dict_json_gets_error_response_and_connection_survives():
    """Valid JSON that is not an object ([1,2], "x", 42) must produce an
    {"ok": false} response on the SAME connection, not an AttributeError
    that kills the handler thread (regression: moving req.get("cmd") out
    of the try block closed the connection with 0 bytes sent)."""
    import socket as socketlib
    import tempfile

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock_path = tempfile.mktemp(suffix=".sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY), sock_path)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with socketlib.socket(socketlib.AF_UNIX,
                              socketlib.SOCK_STREAM) as s:
            s.settimeout(60)
            s.connect(sock_path)
            s.sendall(b'[1, 2, 3]\n"just a string"\n{"cmd": "ping"}\n')
            buf = b""
            while buf.count(b"\n") < 3:
                chunk = s.recv(1 << 16)
                assert chunk, "server closed the connection mid-sequence"
                buf += chunk
        lines = [json.loads(l) for l in buf.splitlines()]
        assert not lines[0]["ok"] and "JSON object" in lines[0]["error"]
        assert not lines[1]["ok"] and "JSON object" in lines[1]["error"]
        assert lines[2] == {"ok": True, "pong": True}
    finally:
        request(sock_path, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_variant_generator_warm_uses_its_channel_count():
    """warm() must build its throwaway cond with the generator's
    n_cond_channels — a hardcoded 1-channel cond crashed `cli serve
    --n-cond-channels 3` at startup (ScopeParamShapeError) before any
    request arrived."""
    tiny3 = ModelConfig(ndomain=16, latent_dim=8, n_cond_channels=3,
                        gen_channels=(8, 8, 8), base_channels=8,
                        critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny3, TrainConfig(seed=0))
    pg = PretrainedGenerator(state.gen_params, tiny3, seed=5, max_batch=8)
    secs = pg.warm(("max", 2))
    assert secs >= 0.0
    # the key chain was not consumed by warming
    rng = np.random.RandomState(0)
    daily = rng.gamma(2.0, 5.0, (16, 16)).astype(np.float32)
    cond = np.concatenate(
        [daily[..., None], np.zeros((16, 16, 2), np.float32)], axis=-1)
    warmed = pg.generate_scenarios(cond, 2)
    fresh = PretrainedGenerator(
        state.gen_params, tiny3, seed=5, max_batch=8).generate_scenarios(
            cond, 2)
    np.testing.assert_array_equal(warmed, fresh)


def test_watch_baseline_covers_the_load_window(tmp_path):
    """An export landing between weight load and server construction (the
    cli serve warm window: 30 s-10 min of compiles) must still trigger the
    first watcher reload — the baseline is captured at load time and
    passed in, not re-captured at construction."""
    import time

    from prdisagg_tpu.api.server import watch_signature
    from prdisagg_tpu.models.io import save_params_npz

    state_a, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    state_b, _, _ = create_train_state(TINY, TrainConfig(seed=1))
    wdir = tmp_path / "exports"
    wdir.mkdir()
    save_params_npz(str(wdir / "gen_x_0001.npz"), state_a.gen_params)
    baseline = watch_signature(str(wdir))  # cli serve: before load/warm
    # an export lands while the daemon would be warming compiles
    save_params_npz(str(wdir / "gen_x_0002.npz"), state_b.gen_params)
    sock = str(tmp_path / "b.sock")
    server = ScenarioServer(
        PretrainedGenerator(state_a.gen_params, TINY, seed=9), sock,
        watch_path=str(wdir), watch_interval_s=0.05,
        watch_baseline=baseline)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if request(sock, {"cmd": "stats"})["reloads"] == 1:
                break
            time.sleep(0.1)
        st = request(sock, {"cmd": "stats"})
        assert st["reloads"] == 1
        assert st["last_reload"].endswith("gen_x_0002.npz")
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_stats_answers_while_compute_is_busy(tmp_path):
    """{"cmd": "stats"} is the SLA probe: it must answer even while a
    scenario request holds the compute lock (a 1000-scenario forward or a
    cold compile can hold it for minutes)."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path / "q.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY), sock)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with server._compute_lock:  # simulate a long in-flight forward
            st = request(sock, {"cmd": "stats"}, timeout=30)
            assert st["ok"]
            assert request(sock, {"cmd": "info"}, timeout=30)["ok"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_connect_burst_survives_a_tiny_backlog(tmp_path):
    """A burst of concurrent one-shot clients larger than the listen
    backlog must all get answers: connect EAGAIN (non-blocking socket +
    full backlog — seen on-chip with 32 simultaneous clients) is retried
    inside request() until the daemon accepts."""
    import concurrent.futures

    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path / "burst.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY), sock, backlog=1)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with concurrent.futures.ThreadPoolExecutor(12) as ex:
            out = list(ex.map(
                lambda _: request(sock, {"cmd": "ping"}, timeout=60),
                range(24)))
        assert all(r == {"ok": True, "pong": True} for r in out)
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)


def test_wire_f16_generator_serves_through_the_socket(tmp_path):
    """A wire_dtype='float16' generator serves through the daemon with f32
    responses: b64 decode dtype is float32 and conservation holds to the
    f16 quantization bound (~5e-4 relative)."""
    state, _, _ = create_train_state(TINY, TrainConfig(seed=0))
    sock = str(tmp_path / "w16.sock")
    server = ScenarioServer(
        PretrainedGenerator(state.gen_params, TINY, seed=11,
                            wire_dtype="float16"), sock)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        cond = np.full((16, 16), 12.0, np.float32)
        r = request(sock, {"cond": cond.tolist(), "n_scenarios": 2,
                           "encoding": "b64"})
        assert r["ok"] and r["dtype"] == "float32"
        scen = scenarios_array(r)
        assert scen.dtype == np.float32
        np.testing.assert_allclose(
            scen.sum(axis=1), np.broadcast_to(cond, (2, 16, 16)), rtol=5e-3)
        info = request(sock, {"cmd": "info"})
        assert info["wire_dtype"] == "float16"
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        thread.join(timeout=30)
