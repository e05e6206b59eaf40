import glob
import os
import pickle

import numpy as np
import pytest

from prdisagg_tpu.cli import main


def test_cli_train_synthetic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--schedule", "1:4",
        "--n-disc", "1", "--steps-per-epoch", "2", "--f32-parity",
        "--workdir", str(tmp_path), "--name", "clismoke",
    ])
    # default export is the reference's .h5-only cadence (round 3)
    assert glob.glob(str(tmp_path / "trained_models" / "clismoke" / "gen_*.h5"))
    assert not glob.glob(
        str(tmp_path / "trained_models" / "clismoke" / "gen_*.npz"))
    assert (tmp_path / "hist.csv").exists()


def test_cli_train_production_preset(tmp_path, monkeypatch):
    """--production applies the measured preset (EMA on) while an explicit
    --schedule still wins over the preset's 20:32,30:128."""
    monkeypatch.chdir(tmp_path)
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--production", "--schedule", "1:4",
        "--n-disc", "1", "--steps-per-epoch", "2", "--f32-parity",
        "--workdir", str(tmp_path), "--name", "prodsmoke",
    ])
    # EMA exports prove ema_decay=0.999 was active
    assert glob.glob(
        str(tmp_path / "trained_models" / "prodsmoke" / "gen_ema_*.h5"))


def test_production_train_config_preset():
    from prdisagg_tpu.core.config import (
        TrainConfig, production_train_config,
    )

    prod = production_train_config()
    assert prod.schedule == ((20, 32), (30, 128))
    assert prod.ema_decay == 0.999
    assert production_train_config(seed=7, ema_decay=0.5).ema_decay == 0.5
    # the plain config stays strict reference parity
    ref = TrainConfig()
    assert ref.schedule == ((50, 32),) and ref.ema_decay == 0.0


def test_cli_compute_indices(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.gamma(0.8, 4.0, size=(3, 24, 32, 32)).astype(np.float32)
    dpath = str(tmp_path / "d.npy")
    np.save(dpath, data)
    out = str(tmp_path / "idx.pkl")
    main(["compute-indices", "--data", dpath, "--out", out])
    with open(out, "rb") as f:
        idx = pickle.load(f)
    assert isinstance(idx, list)
    from prdisagg_tpu.core.config import DataConfig
    from prdisagg_tpu.data.indices import compute_valid_indices_bruteforce

    want = compute_valid_indices_bruteforce(data, DataConfig())
    assert len(idx) == len(want)


def test_cli_example(tmp_path):
    out = str(tmp_path / "scen.png")
    main(["example", "--n-scenarios", "2", "--out", out])
    assert os.path.exists(out)


def test_cli_rainfarm_generate(tmp_path):
    rng = np.random.RandomState(5)
    reals = rng.gamma(2.0, 1.0, size=(2, 24, 16, 16)).astype(np.float32)
    rpath = str(tmp_path / "real_samples.npy")
    np.save(rpath, reals)
    spath = str(tmp_path / "spectral_slopes_0.pkl")
    with open(spath, "wb") as f:
        pickle.dump((1.5, 0.9), f)
    plotdir = str(tmp_path / "plots_generated_rainfarm")
    main([
        "rainfarm-generate", "--slopes", spath, "--real", rpath,
        "--n-map-conditions", "1", "--n-fake-per-real", "2",
        "--out", str(tmp_path / "data"), "--plotdir", plotdir,
    ])
    assert os.path.exists(os.path.join(plotdir, "ecdf_rainfarm.png"))
    assert os.path.exists(
        os.path.join(plotdir, "generated_precip_rainfarm_0001_allhours.png"))
    assert os.path.exists(
        str(tmp_path / "data" / "generated_samples_rainfarm.npy"))


def test_cli_train_warm_start_continue(tmp_path, monkeypatch):
    """Reference continue-training workflow: reload exported weights with
    fresh optimizers and an epoch-label offset
    (gan_train_cwgangp_pixelnorm.py:520-529 + start_epoch)."""
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--epochs", "1", "--batch-size", "4",
        "--n-disc", "1", "--steps-per-epoch", "2",
        "--workdir", str(tmp_path), "--name", "warmsmoke",
    ])
    h5s = sorted(glob.glob(str(
        tmp_path / "trained_models" / "warmsmoke" / "gen_*_0001.h5")))
    assert h5s
    disc = sorted(glob.glob(str(
        tmp_path / "trained_models" / "warmsmoke" / "disc_*_0001.h5")))
    wd2 = tmp_path / "cont"
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--epochs", "1", "--batch-size", "4",
        "--n-disc", "1", "--steps-per-epoch", "2",
        "--workdir", str(wd2), "--name", "warmsmoke",
        "--warm-start-gen", h5s[0], "--warm-start-critic", disc[0],
        "--start-epoch", "1",
    ])
    assert glob.glob(str(
        wd2 / "trained_models" / "warmsmoke" / "gen_*_0002.h5"))
    # --infer-arch: same continue run with the architecture reconstructed
    # from the weight files instead of CLI flags (round 3)
    wd3 = tmp_path / "cont_inferred"
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--epochs", "1", "--batch-size", "4",
        "--n-disc", "1", "--steps-per-epoch", "2",
        "--workdir", str(wd3), "--name", "warmsmoke",
        "--warm-start-gen", h5s[0], "--warm-start-critic", disc[0],
        "--start-epoch", "1", "--infer-arch",
    ])
    assert glob.glob(str(
        wd3 / "trained_models" / "warmsmoke" / "gen_*_0002.h5"))


def test_cli_crps_and_analyze(tmp_path):
    """cli crps end-to-end on tiny inputs + standalone crps-analyze."""
    import json

    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train import create_train_state

    # the CLI resolves weights against the default flagship ModelConfig
    state, _, _ = create_train_state(ModelConfig(), TrainConfig(seed=21))
    wpath = str(tmp_path / "gen.npz")
    save_params_npz(wpath, state.gen_params)

    rng = np.random.RandomState(6)
    reals = rng.gamma(2.0, 1.0, size=(3, 24, 16, 16)).astype(np.float32)
    baseline = rng.gamma(2.0, 1.0, size=(8, 24, 16, 16)).astype(np.float32)
    rpath = str(tmp_path / "real.npy")
    bpath = str(tmp_path / "base.npy")
    np.save(rpath, reals)
    np.save(bpath, baseline)

    out = str(tmp_path / "data")
    main(["crps", "--weights", wpath, "--real", rpath, "--baseline", bpath,
          "--n-members", "8", "--n-samples", "3", "--out", out])
    assert os.path.exists(os.path.join(out, "crps_results_n_sample3.pkl"))
    with open(os.path.join(out, "crps_results.json")) as f:
        js = json.load(f)
    assert "gan" in js and "random" in js

    main(["crps-analyze", "--results",
          os.path.join(out, "crps_results_n_sample3.pkl"), "--out", out])
    assert os.path.exists(os.path.join(out, "crps_results.json"))


def test_cli_generate_single_and_batch(tmp_path):
    """cli generate serves one condition with reference semantics and a
    condition stack as one fused batch; conservation holds either way."""
    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train import create_train_state

    tiny = ModelConfig(ndomain=16, latent_dim=8, gen_channels=(8, 8, 8),
                       base_channels=8, critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny, TrainConfig(seed=9))
    # npz round-trips the architecture (infer_generator_config)
    wpath = str(tmp_path / "gen.npz")
    save_params_npz(wpath, state.gen_params)

    single = 10.0 * np.ones((16, 16), dtype=np.float32)
    spath = str(tmp_path / "cond.npy")
    np.save(spath, single)
    sout = str(tmp_path / "scen_single.npy")
    main(["generate", "--weights", wpath, "--conds", spath,
          "--n-scenarios", "3", "--out", sout,
          "--plot", str(tmp_path / "plots")])
    scen = np.load(sout)
    assert scen.shape == (3, 24, 16, 16)
    np.testing.assert_allclose(scen.sum(axis=1), 10.0, rtol=1e-3)
    assert os.path.exists(str(tmp_path / "plots" / "scenarios_grid.png"))

    batch = np.random.RandomState(4).gamma(
        2.0, 5.0, size=(3, 16, 16)).astype(np.float32)
    bpath = str(tmp_path / "conds.npy")
    np.save(bpath, batch)
    bout = str(tmp_path / "scen_batch.npy")
    main(["generate", "--weights", wpath, "--conds", bpath,
          "--n-scenarios", "2", "--out", bout])
    bscen = np.load(bout)
    assert bscen.shape == (3, 2, 24, 16, 16)
    np.testing.assert_allclose(
        bscen.sum(axis=2),
        np.broadcast_to(batch[:, None], (3, 2, 16, 16)), rtol=1e-3,
        atol=1e-4)


def test_cli_serve_warms_then_serves(tmp_path):
    """cli serve pre-compiles the requested shapes (--warm) before binding
    the socket, then answers requests; warming does not perturb the served
    scenarios (same seed => same key chain as an unwarmed generator)."""
    import threading
    import time

    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.api.server import request
    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train import create_train_state

    tiny = ModelConfig(ndomain=16, latent_dim=8, gen_channels=(8, 8, 8),
                       base_channels=8, critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny, TrainConfig(seed=9))
    wpath = str(tmp_path / "gen.npz")
    save_params_npz(wpath, state.gen_params)
    sock = str(tmp_path / "s.sock")

    thread = threading.Thread(
        target=main,
        args=(["serve", "--weights", wpath, "--socket", sock,
               "--seed", "21", "--max-batch", "8", "--warm", "max,2",
               "--max-requests", "2"],),
        daemon=True)
    thread.start()
    deadline = time.time() + 120
    while time.time() < deadline and not os.path.exists(sock):
        time.sleep(0.1)
    cond = 10.0 * np.ones((16, 16), dtype=np.float32)
    resp = request(sock, {"cond": cond.tolist(), "n_scenarios": 2},
                   timeout=120)
    assert resp["ok"] and resp["shape"] == [2, 24, 16, 16]
    got = np.asarray(resp["scenarios"], dtype=np.float32)
    # same loader as the CLI (f32 inference config inferred from the npz)
    want = PretrainedGenerator.from_npz(
        wpath, seed=21, max_batch=8).generate_scenarios(cond, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    request(sock, {"cmd": "shutdown"}, timeout=30)
    thread.join(timeout=60)
    assert not thread.is_alive()


def test_cli_lsd(tmp_path):
    rng = np.random.RandomState(7)
    real = rng.gamma(2.0, 1.0, size=(6, 24, 16, 16)).astype(np.float32)
    gen = rng.gamma(2.0, 1.0, size=(6, 24, 16, 16)).astype(np.float32)
    rpath = str(tmp_path / "real.npy")
    gpath = str(tmp_path / "gen.npy")
    np.save(rpath, real)
    np.save(gpath, gen)
    out = str(tmp_path / "out")
    plotdir = str(tmp_path / "plots")
    os.makedirs(out, exist_ok=True)
    main(["lsd", "--real", rpath, "--generated", gpath,
          "--n-samples", "6", "--out", out, "--plotdir", plotdir])
    import glob as _g
    assert _g.glob(os.path.join(out, "*.npy")) or _g.glob(
        os.path.join(out, "*.pkl")) or os.listdir(out)


def test_cli_schedule_parse_error(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="bad --schedule"):
        main(["train", "--synthetic", "--schedule", "20x32",
              "--workdir", str(tmp_path)])


def test_cli_contradictory_precision_flags(tmp_path, monkeypatch):
    """--f32-parity silently overriding an explicit --compute-dtype
    bfloat16 would hide a contradictory request (ADVICE round 3): error."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="contradicts"):
        main(["train", "--synthetic", "--f32-parity",
              "--compute-dtype", "bfloat16", "--workdir", str(tmp_path)])


def test_cli_inspect_describes_weights(tmp_path, capsys):
    """`cli inspect` makes any checkpoint self-describing: network kind,
    inferred architecture, and parameter count from the shapes alone
    (the reference's .h5 blobs are readable only next to the training
    script's constants)."""
    import json

    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.models.io import save_keras_critic_h5, save_params_npz
    from prdisagg_tpu.train import create_train_state

    tiny = ModelConfig(ndomain=16, latent_dim=8, gen_channels=(8, 8, 8),
                       base_channels=8, critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny, TrainConfig(seed=0))
    gpath = str(tmp_path / "gen.npz")
    save_params_npz(gpath, state.gen_params)
    main(["inspect", "--weights", gpath, "--layers"])
    r = json.loads(capsys.readouterr().out)
    assert r["network"] == "generator" and r["format"] == "npz"
    assert r["inferred_config"]["ndomain"] == 16
    assert r["inferred_config"]["latent_dim"] == 8
    assert r["n_params"] > 0 and "latent_proj" in r["layers"]

    cpath = str(tmp_path / "disc.h5")
    save_keras_critic_h5(cpath, state.critic_params, tiny)
    main(["inspect", "--weights", cpath])
    r = json.loads(capsys.readouterr().out)
    assert r["network"] == "critic" and r["format"] == "keras-h5"
    assert tuple(r["inferred_config"]["critic_channels"]) == (8, 8, 8, 8)


def test_cli_inspect_unreadable_h5_reports_both_errors(tmp_path):
    """A file that is neither a generator nor a critic exits with BOTH
    load errors instead of a bare critic traceback (the generator error —
    usually the informative one — was previously swallowed)."""
    bad = tmp_path / "bad.h5"
    bad.write_bytes(b"not an hdf5 file")
    with pytest.raises(SystemExit, match="as a generator"):
        main(["inspect", "--weights", str(bad)])


def test_cli_serve_sigterm_clean_shutdown(tmp_path):
    """SIGTERM stops the daemon cleanly: in-flight work drains, the socket
    file is unlinked, the process exits 0 with the served-count farewell
    (a supervisor stop must not leave a stale socket or kill mid-response)."""
    import signal
    import subprocess
    import sys
    import time

    from prdisagg_tpu.api.server import request
    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train import create_train_state

    tiny = ModelConfig(ndomain=16, latent_dim=8, gen_channels=(8, 8, 8),
                       base_channels=8, critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(tiny, TrainConfig(seed=9))
    wpath = str(tmp_path / "gen.npz")
    save_params_npz(wpath, state.gen_params)
    sock = str(tmp_path / "s.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "prdisagg_tpu.cli", "serve",
         "--weights", wpath, "--socket", sock, "--warm", "none"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 300
        while time.time() < deadline and not os.path.exists(sock):
            time.sleep(0.2)
        assert request(sock, {"cmd": "ping"}, timeout=60)["ok"]
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "shutting down" in out and "bye" in out
    assert not os.path.exists(sock)  # no stale socket file


def test_cli_train_hoisted_chunks(tmp_path, monkeypatch):
    """--hoisted-chunks / --hoisted-chunk-samples reach the TrainConfig
    (the 64x64 memory lever is CLI-drivable)."""
    monkeypatch.chdir(tmp_path)
    main([
        "train", "--synthetic", "--synthetic-days", "4",
        "--synthetic-size", "32", "--schedule", "1:4",
        "--n-disc", "2", "--steps-per-epoch", "2", "--f32-parity",
        "--model-preset", "tiny", "--hoisted-chunks", "2",
        "--workdir", str(tmp_path), "--name", "chunksmoke",
    ])
    assert glob.glob(str(tmp_path / "trained_models" / "chunksmoke"
                         / "gen_*.h5"))
    import json
    with open(tmp_path / "run_config.json") as f:
        rc = json.load(f)
    assert rc["experiment"]["train"]["hoisted_chunks"] == 2
