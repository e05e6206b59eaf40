"""Backend watchdog: probe, heartbeat, and hang-surviving supervision.

The failure mode under test is the one the reference cannot even express:
the accelerator backend wedges mid-training (every dispatch blocks forever)
and the only recovery is kill + resume.  Children here are plain-python
stand-ins (no jax import) so the stall/restart machinery is tested in
seconds; the real probe subprocess is exercised once on CPU.
"""

import os
import pytest
import stat
import sys
import textwrap
import time

from prdisagg_tpu.utils.watchdog import (
    Heartbeat,
    beat_if_enabled,
    probe_backend,
    supervise,
)


def test_heartbeat_beat_and_age(tmp_path):
    hb = Heartbeat(str(tmp_path / "hb"))
    assert hb.age_s() is None  # no beat yet
    hb.beat()
    age = hb.age_s()
    assert age is not None and age < 5.0
    # beats move the mtime forward monotonically
    m0 = os.stat(hb.path).st_mtime
    time.sleep(0.05)
    hb.beat()
    assert os.stat(hb.path).st_mtime >= m0


def test_heartbeat_from_env(tmp_path, monkeypatch):
    monkeypatch.delenv("PRDISAGG_HEARTBEAT", raising=False)
    assert Heartbeat.from_env() is None
    p = str(tmp_path / "hb")
    monkeypatch.setenv("PRDISAGG_HEARTBEAT", p)
    hb = Heartbeat.from_env()
    assert hb is not None and hb.path == p


def test_beat_if_enabled(tmp_path, monkeypatch):
    monkeypatch.delenv("PRDISAGG_HEARTBEAT", raising=False)
    beat_if_enabled()  # no-op without the env var
    p = str(tmp_path / "hb")
    monkeypatch.setenv("PRDISAGG_HEARTBEAT", p)
    beat_if_enabled()
    assert os.path.exists(p)
    # retargets when the env var changes (cached Heartbeat is per-path)
    p2 = str(tmp_path / "hb2")
    monkeypatch.setenv("PRDISAGG_HEARTBEAT", p2)
    beat_if_enabled()
    assert os.path.exists(p2)


def test_eval_battery_stages_beat(tmp_path, monkeypatch):
    # the eval battery runs 20-50 min between Trainer beats at full scale;
    # its chunk loops must beat on their own or a supervisor misreads a
    # healthy battery as a wedge
    import numpy as np

    from prdisagg_tpu.eval.lsd import spectra_of_fields
    from prdisagg_tpu.ops.stats import pairwise_lsd_offdiag

    p = str(tmp_path / "hb")
    monkeypatch.setenv("PRDISAGG_HEARTBEAT", p)
    fields = np.random.RandomState(0).gamma(1.0, 1.0, (2, 24, 16, 16))
    sp = spectra_of_fields(fields.astype(np.float32))
    assert os.path.exists(p)
    os.remove(p)
    pairwise_lsd_offdiag(sp[:8], sp[:8], block=4)
    assert os.path.exists(p)


def test_probe_backend_cpu_ok():
    res = probe_backend("cpu", timeout_s=120)
    assert res["ok"], res
    assert res["latency_s"] is not None


def test_probe_backend_timeout_signature():
    # a wedged backend == the probe subprocess never returns; fake it with
    # a platform-independent hang by pointing the probe at a python that
    # sleeps (we shrink the timeout instead: import jax alone exceeds 0.5s)
    res = probe_backend("cpu", timeout_s=0.5)
    assert not res["ok"]
    assert res["detail"] == "timeout"


def _child_script(tmp_path, body):
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR)
    return [sys.executable, str(p)]


def test_supervise_clean_exit(tmp_path):
    argv = _child_script(tmp_path, """
        import os
        open(os.environ["PRDISAGG_HEARTBEAT"], "a").close()
    """)
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=5,
                    poll_s=0.2, probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == 0 and res.restarts == 0 and res.stalls == 0


def test_supervise_kills_stall_and_resumes(tmp_path):
    # first run: beats once, then hangs forever (the wedge signature);
    # second run: finds the marker and exits cleanly (Orbax-resume analogue)
    marker = tmp_path / "attempted_once"
    argv = _child_script(tmp_path, f"""
        import os, sys, time
        hb = os.environ["PRDISAGG_HEARTBEAT"]
        open(hb, "a").close()
        os.utime(hb, None)  # beat, without the package-import tax
        marker = {str(marker)!r}
        if os.path.exists(marker):
            sys.exit(0)
        open(marker, "w").close()
        time.sleep(600)  # wedged: no further beats
    """)
    t0 = time.time()
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=1.5,
                    startup_timeout_s=30, poll_s=0.2, max_restarts=2,
                    probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == 0
    assert res.restarts == 1 and res.stalls == 1
    assert time.time() - t0 < 60  # the 600s sleep was killed, not awaited


def test_supervise_startup_stall(tmp_path):
    # never beats at all: the startup grace (not the step timeout) applies
    marker = tmp_path / "attempted_once"
    argv = _child_script(tmp_path, f"""
        import os, sys, time
        marker = {str(marker)!r}
        if os.path.exists(marker):
            sys.exit(0)
        open(marker, "w").close()
        time.sleep(600)
    """)
    # startup timeout must outlast the interpreter boot (~2.3s with the
    # image's sitecustomize jax pre-import) or the marker write races it
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=0.5,
                    startup_timeout_s=10.0, poll_s=0.2, max_restarts=1,
                    probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == 0 and res.restarts == 1


def test_supervise_gives_up_after_max_restarts(tmp_path):
    argv = _child_script(tmp_path, """
        import time
        time.sleep(600)
    """)
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=1,
                    startup_timeout_s=1, poll_s=0.2, max_restarts=1,
                    probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == -1
    assert res.restarts == 1 and res.stalls == 2


def test_supervise_spares_busy_child(tmp_path):
    # a silent-but-computing child (compile / long device chunk burns ~100%
    # host CPU) must NOT be killed — the wedge signature is idle-blocked.
    # The child never beats yet busy-loops past the startup timeout.
    argv = _child_script(tmp_path, """
        import time
        t0 = time.time()
        while time.time() - t0 < 6:
            sum(i * i for i in range(10000))
    """)
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=0.5,
                    startup_timeout_s=3.0, poll_s=0.2, max_restarts=0,
                    probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == 0 and res.stalls == 0


def test_supervise_forwards_sigterm_to_child_group(tmp_path):
    # an outer `timeout`/TERM on the supervisor must not orphan the child
    # (it lives in its own process group for stall kills)
    import signal
    import subprocess

    pidfile = tmp_path / "child_pid"
    hb = str(tmp_path / "hb")
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import os, time
        open({str(pidfile)!r}, "w").write(str(os.getpid()))
        hb = {hb!r}
        while True:
            open(hb, "a").close(); os.utime(hb, None)
            time.sleep(0.2)
    """))
    sup = tmp_path / "sup.py"
    sup.write_text(textwrap.dedent(f"""
        import sys
        from prdisagg_tpu.utils.watchdog import supervise
        supervise([sys.executable, {str(child)!r}], {hb!r},
                  stall_timeout_s=60, poll_s=0.2, probe_on_stall=False,
                  log=lambda *a, **k: None)
    """))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen([sys.executable, str(sup)], cwd=repo, env=env)
    t0 = time.time()
    while not pidfile.exists() and time.time() - t0 < 60:
        time.sleep(0.2)
    assert pidfile.exists(), "child never started"
    proc.send_signal(signal.SIGTERM)
    assert proc.wait(timeout=30) == 143  # 128 + SIGTERM: our handler ran
    # the killed grandchild may linger as a zombie until init reaps it;
    # "dead" here means it stopped beating (the functional requirement)
    m0 = os.stat(hb).st_mtime
    time.sleep(1.5)
    assert os.stat(hb).st_mtime == m0, \
        "grandchild kept beating after the supervisor's termination"


def test_supervise_propagates_crash_without_restart(tmp_path):
    # crashes are the caller's bug; only hangs trigger restarts
    argv = _child_script(tmp_path, """
        import sys
        sys.exit(3)
    """)
    res = supervise(argv, str(tmp_path / "hb"), stall_timeout_s=5,
                    poll_s=0.2, probe_on_stall=False, log=lambda *a, **k: None)
    assert res.returncode == 3 and res.restarts == 0


def test_trainer_beats_heartbeat(tmp_path, monkeypatch, synthetic_dataset):
    # one tiny CPU training epoch under PRDISAGG_HEARTBEAT -> the file beats
    from prdisagg_tpu.core.config import (
        ExperimentConfig, ModelConfig, TrainConfig,
    )
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.train.loop import Trainer

    hb_path = str(tmp_path / "hb")
    monkeypatch.setenv("PRDISAGG_HEARTBEAT", hb_path)
    data, indices, dcfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=((1, 4),), checkpoint_every_epochs=0),
        model_override=ModelConfig(ndomain=16, latent_dim=8,
                                   gen_channels=(8, 8, 8), base_channels=8,
                                   critic_channels=(8, 8, 8, 8)),
        name="hbtest",
    )
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=2, plot_every_epochs=0,
                 export_weights_every_epochs=0, async_artifacts=False)
    assert tr.heartbeat is not None
    tr.fit(progress=False)
    assert os.path.exists(hb_path)
    assert Heartbeat(hb_path).age_s() < 120


def test_cli_doctor_cpu(capsys):
    import pytest

    from prdisagg_tpu import cli

    with pytest.raises(SystemExit) as e:
        cli.main(["doctor", "--platform", "cpu", "--timeout", "120"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert '"ok": true' in out


def test_cli_doctor_wait_until_recovery(capsys, monkeypatch):
    # unhealthy twice, then healthy: --wait keeps polling and exits 0
    import pytest

    import prdisagg_tpu.cli as cli
    import prdisagg_tpu.utils.watchdog as wd

    seq = iter([{"ok": False, "latency_s": None, "detail": "timeout"},
                {"ok": False, "latency_s": None, "detail": "timeout"},
                {"ok": True, "latency_s": 0.1, "detail": "ok"}])
    monkeypatch.setattr(wd, "probe_backend",
                        lambda p, timeout_s=60: next(seq))
    with pytest.raises(SystemExit) as e:
        cli.main(["doctor", "--wait", "999", "--wait-interval", "0.01"])
    assert e.value.code == 0
    assert '"ok": true' in capsys.readouterr().out


def test_cli_doctor_wait_budget_exhausted(capsys, monkeypatch):
    import pytest

    import prdisagg_tpu.cli as cli
    import prdisagg_tpu.utils.watchdog as wd

    monkeypatch.setattr(
        wd, "probe_backend",
        lambda p, timeout_s=60: {"ok": False, "latency_s": None,
                                 "detail": "timeout"})
    with pytest.raises(SystemExit) as e:
        cli.main(["doctor", "--wait", "0.05", "--wait-interval", "0.02"])
    assert e.value.code == 1
    assert "waited_s" in capsys.readouterr().out


def test_workdir_lock_excludes_second_instance(tmp_path):
    """A second acquire on a locked workdir raises (naming the holder pid);
    releasing the fd frees the lock — flock is auto-released on process
    death, so a SIGKILLed run never wedges the workdir."""
    from prdisagg_tpu.utils.watchdog import acquire_workdir_lock

    wd = str(tmp_path / "run")
    fd = acquire_workdir_lock(wd)
    with pytest.raises(RuntimeError, match="locked by another"):
        acquire_workdir_lock(wd)
    os.close(fd)
    fd2 = acquire_workdir_lock(wd)  # released lock is reacquirable
    os.close(fd2)
