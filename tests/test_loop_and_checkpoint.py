import dataclasses
import glob
import os

import jax
import numpy as np
import pytest

from prdisagg_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset
from prdisagg_tpu.train import create_train_state
from prdisagg_tpu.train.checkpoint import CheckpointManager
from prdisagg_tpu.train.loop import Trainer


SMALL_MODEL = ModelConfig(
    ndomain=16, latent_dim=8,
    gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
)


def _tiny_exp():
    return ExperimentConfig(
        data=DataConfig(),
        # checkpoint_every_epochs=1: these tests exercise exact resume, not
        # the production cadence (default 10, pinned in
        # test_default_cadence_matches_reference)
        train=TrainConfig(n_disc=1, schedule=((2, 4),), seed=3,
                          log_every_steps=1, checkpoint_every_epochs=1),
        name="smoke",
        model_override=SMALL_MODEL,
    )


@pytest.fixture(scope="module")
def tiny_trainer_run(tmp_path_factory):
    """One end-to-end 2-epoch smoke train, shared across assertions."""
    workdir = str(tmp_path_factory.mktemp("run"))
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=4)
    exp = _tiny_exp()
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    tr = Trainer(exp, ds, workdir=workdir, use_mesh=False, steps_per_epoch=2,
                 plot_every_epochs=2, export_format="both")
    hist = tr.fit(progress=False)
    return tr, hist, workdir, exp, ds


def test_loop_trains_and_writes_artifacts(tiny_trainer_run):
    tr, hist, workdir, exp, _ = tiny_trainer_run
    assert tr.epoch == 2
    assert len(hist["d_loss"]) == 4  # 2 epochs x 2 logged steps
    assert all(np.isfinite(hist["d_loss"]))
    assert os.path.exists(os.path.join(workdir, "hist.csv"))
    gens = glob.glob(os.path.join(workdir, "trained_models", "smoke", "gen_*_0002.npz"))
    assert gens, "per-epoch generator export missing"
    plots = glob.glob(os.path.join(workdir, f"plots_smoke", "fake_samples_*.png"))
    assert plots, "per-epoch sample grid missing"


def test_default_cadence_matches_reference():
    """Round-3 defaults (VERDICT item 3): per-epoch exports are .h5 only —
    exactly the reference's cadence and format
    (gan_train_cwgangp_pixelnorm.py:520-521) — and Orbax full-state
    checkpoints run every 10 epochs (every-epoch Orbax + dual-format
    exports measurably starved the loop, docs/PERF.md round 2)."""
    import inspect

    assert TrainConfig().checkpoint_every_epochs == 10
    sig = inspect.signature(Trainer.__init__)
    assert sig.parameters["export_format"].default == "h5"


def test_loop_exports_reference_h5_weights(tiny_trainer_run):
    """export_format='both' also writes the reference-contract
    .h5 weights each epoch (gan_train_cwgangp_pixelnorm.py:520-521); the
    exports must reload into the live param structure."""
    tr, _, workdir, _, _ = tiny_trainer_run
    from prdisagg_tpu.models.io import load_keras_generator_h5

    h5s = glob.glob(os.path.join(
        workdir, "trained_models", "smoke", "gen_*_0002.h5"))
    assert h5s, "per-epoch generator .h5 export missing"
    assert glob.glob(os.path.join(
        workdir, "trained_models", "smoke", "disc_*_0002.h5"))
    loaded = load_keras_generator_h5(h5s[0], SMALL_MODEL)
    # final exported weights == live end-of-training weights
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.gen_params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_artifact_writer_propagates_worker_errors():
    from prdisagg_tpu.train.artifacts import ArtifactWriter

    w = ArtifactWriter()
    w.submit(lambda: (_ for _ in ()).throw(ValueError("boom")))
    with pytest.raises(RuntimeError, match="artifact writer job"):
        w.flush()
    # writer stays usable after reporting the error
    done = []
    w.submit(lambda: done.append(1))
    w.flush()
    assert done == [1]
    w.close()


def test_artifact_writer_reports_every_failed_job():
    """Two queued jobs can both fail before the next flush; the first error
    must not be masked by the second (ADVICE round-2: e.g. a failed Orbax
    save hidden behind a later matplotlib error)."""
    from prdisagg_tpu.train.artifacts import ArtifactWriter

    w = ArtifactWriter()
    w.submit(lambda: (_ for _ in ()).throw(ValueError("first failure")))
    w.submit(lambda: (_ for _ in ()).throw(OSError("second failure")))
    with pytest.raises(RuntimeError) as exc_info:
        w.flush()
    msg = str(exc_info.value)
    assert "2 artifact writer job(s) failed" in msg
    assert "first failure" in msg and "second failure" in msg
    # the chained cause is the FIRST error
    assert isinstance(exc_info.value.__cause__, ValueError)
    w.close()


def test_checkpoint_resume_exact(tiny_trainer_run):
    tr, _, workdir, exp, ds = tiny_trainer_run
    # fresh trainer over the same workdir must resume at epoch 2 with
    # identical params
    exp2 = _tiny_exp()
    tr2 = Trainer(exp2, ds, workdir=workdir, use_mesh=False, steps_per_epoch=2)
    assert tr2.maybe_resume()
    assert tr2.epoch == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.gen_params),
        jax.tree_util.tree_leaves(tr2.state.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state too (true resume, unlike the reference)
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.state.gen_opt),
        jax.tree_util.tree_leaves(tr2.state.gen_opt),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_roundtrip(tmp_path):
    model_cfg = ModelConfig(
        ndomain=16, latent_dim=8,
        gen_channels=(8, 8, 8), base_channels=8, critic_channels=(8, 8, 8, 8),
    )
    state, _, _ = create_train_state(model_cfg, TrainConfig(seed=11))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(5, state)
    assert mgr.latest_epoch() == 5
    restored = mgr.restore(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_multi_stage_batch_schedule(tmp_path):
    """Increasing-batch-size schedule (reference
    gan_train_cwgangp_pixelnorm.py:73-74,524-529): one stage per tuple,
    recompiled per batch size, epochs accumulate."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=12)
    exp = ExperimentConfig(
        data=DataConfig(),
        train=TrainConfig(n_disc=1, schedule=((1, 4), (1, 8)), seed=13,
                          log_every_steps=1),
        name="sched",
        model_override=SMALL_MODEL,
    )
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=1, plot_every_epochs=0)
    hist = tr.fit(progress=False)
    assert tr.epoch == 2
    assert len(hist["d_loss"]) == 2
    assert np.isfinite(hist["d_loss"]).all()


def test_warm_start_from_saved_weights(tmp_path):
    """Continue-training workflow: warm-start a new state from exported
    weights (.npz here; .h5 path shares the same loaders tested in
    test_api_and_io)."""
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train.state import warm_start

    tcfg = TrainConfig(n_disc=1, seed=21)
    state, gen, critic = create_train_state(SMALL_MODEL, tcfg)
    gp = str(tmp_path / "gen.npz")
    cp = str(tmp_path / "disc.npz")
    save_params_npz(gp, state.gen_params)
    save_params_npz(cp, state.critic_params)

    ws, gen2, critic2 = warm_start(SMALL_MODEL, tcfg, gp, cp)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.gen_params),
        jax.tree_util.tree_leaves(ws.gen_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # warm-started state trains
    from prdisagg_tpu.train import make_train_step

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=22)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    step = make_train_step(gen2, critic2, SMALL_MODEL, tcfg, batch_size=4,
                           donate=False)
    _, m = step(ws, ds)
    assert not bool(m["nonfinite"])


def test_nan_abort_raises(tmp_path):
    """Injected NaN data must trip the on-device finite check and raise
    NaNLossError (reference abort: gan_train_cwgangp_pixelnorm.py:487-488)."""
    import pytest

    from prdisagg_tpu.train.loop import NaNLossError

    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32, seed=30)
    data = data.copy()
    data[:] = np.nan  # poison everything; valid indices now point at NaN
    exp = _tiny_exp()
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=1, plot_every_epochs=0)
    with pytest.raises(NaNLossError):
        tr.fit(progress=False)


def test_fit_stage_boundaries_resume_and_warm_start(tmp_path):
    """Schedule stages are cumulative: a resumed run finishes the remainder
    of the right stage (batch size!), and warm-started runs train the full
    schedule from their start_epoch offset."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=16)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    def run(schedule, epoch=None, start_epoch=0):
        exp = dataclasses.replace(
            _tiny_exp(),
            train=TrainConfig(n_disc=1, schedule=schedule, seed=3,
                              log_every_steps=1))
        tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                     steps_per_epoch=1, plot_every_epochs=0,
                     start_epoch=start_epoch)
        if epoch is not None:
            tr.epoch = epoch
        calls = []

        def fake_stage(until, batch, progress):
            calls.append((until, batch))
            tr.epoch = until

        tr._fit_stage = fake_stage
        tr.fit(progress=False)
        return calls

    assert run(((2, 4), (2, 8))) == [(2, 4), (4, 8)]
    # resumed mid-stage-2: only the remainder of stage 2 at ITS batch size
    assert run(((2, 4), (2, 8)), epoch=3) == [(4, 8)]
    # resumed exactly at the end: nothing to do
    assert run(((2, 4), (2, 8)), epoch=4) == []
    # warm start: full schedule, offset labels
    assert run(((2, 4),), start_epoch=5) == [(7, 4)]


def test_resume_truncates_hist_to_restored_epoch(tiny_trainer_run):
    """hist.csv is written every epoch but Orbax only every
    checkpoint_every_epochs; resume must drop rows newer than the restored
    checkpoint or re-trained epochs duplicate them (round-3 review)."""
    import pandas as pd

    tr, hist, workdir, exp, ds = tiny_trainer_run
    hist_path = os.path.join(workdir, "hist.csv")
    df = pd.read_csv(hist_path, index_col=0)
    assert "epoch" in df and df["epoch"].max() == 2
    # simulate a crash after epoch-3 rows were written but before its
    # checkpoint existed: append fake epoch-3 rows
    fake = df.tail(2).copy()
    fake["epoch"] = 3
    pd.concat([df, fake], ignore_index=True).to_csv(hist_path)

    tr2 = Trainer(_tiny_exp(), ds, workdir=workdir, use_mesh=False,
                  steps_per_epoch=2)
    assert tr2.maybe_resume() and tr2.epoch == 2
    assert max(tr2.hist["epoch"]) == 2          # stale epoch-3 rows dropped
    assert len(tr2.hist["d_loss"]) == len(df)   # original row count


def test_parse_schedule():
    from prdisagg_tpu.core.config import parse_schedule

    assert parse_schedule("50:32") == ((50, 32),)
    assert parse_schedule("20:32,30:128") == ((20, 32), (30, 128))
    for bad in ("20x32", "20:32,", "0:32", "a:b", ""):
        with pytest.raises(ValueError):
            parse_schedule(bad)


def test_resume_with_legacy_hist_csv_backfills_epoch(tiny_trainer_run):
    """Pre-round-3 hist.csv files have no 'epoch' column; resume must keep
    the hist dict rectangular or the next _write_hist crashes."""
    import pandas as pd

    tr, hist, workdir, exp, ds = tiny_trainer_run
    hist_path = os.path.join(workdir, "hist.csv")
    df = pd.read_csv(hist_path, index_col=0)
    legacy = df.drop(columns=["epoch"])
    legacy_path = os.path.join(workdir, "..", "legacy")
    os.makedirs(legacy_path, exist_ok=True)
    # stage a legacy workdir: old-format hist + the same checkpoints
    import shutil

    shutil.copytree(os.path.join(workdir, "trained_models"),
                    os.path.join(legacy_path, "trained_models"),
                    dirs_exist_ok=True)
    legacy.to_csv(os.path.join(legacy_path, "hist.csv"))
    tr2 = Trainer(_tiny_exp(), ds, workdir=legacy_path, use_mesh=False,
                  steps_per_epoch=2)
    assert tr2.maybe_resume()
    lengths = {k: len(v) for k, v in tr2.hist.items()}
    assert len(set(lengths.values())) == 1, lengths  # rectangular
    # and a subsequent hist write succeeds
    tr2._write_hist({k: list(v) for k, v in tr2.hist.items()})


def test_epoch_runs_exact_step_count_when_log_interval_misaligns(tmp_path):
    """steps_per_epoch must be honored EXACTLY (reference bat_per_epo,
    gan_train_cwgangp_pixelnorm.py:433): the dispatch chunk K becomes the
    largest divisor of spe <= log_every_steps instead of truncating the
    epoch to a multiple of the log interval."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=15)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = ExperimentConfig(
        data=DataConfig(),
        train=TrainConfig(n_disc=1, schedule=((1, 4),), seed=16,
                          log_every_steps=5, checkpoint_every_epochs=0),
        name="chunksmoke", model_override=SMALL_MODEL,
    )
    # spe=7 is prime: K must fall back to 1 and run all 7 steps
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=7, plot_every_epochs=0,
                 export_weights_every_epochs=0)
    hist = tr.fit(progress=False)
    assert len(hist["d_loss"]) == 7
    assert int(tr.state.step) == 7


def test_zero_cadence_disables_artifact_classes(tmp_path):
    """A cadence of 0 disables checkpoints/exports/plots alike instead of
    raising ZeroDivisionError at the first epoch end."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=17)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = ExperimentConfig(
        data=DataConfig(),
        train=TrainConfig(n_disc=1, schedule=((1, 4),), seed=18,
                          log_every_steps=1, checkpoint_every_epochs=0),
        name="nocad", model_override=SMALL_MODEL,
    )
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=1, plot_every_epochs=0,
                 export_weights_every_epochs=0)
    tr.fit(progress=False)
    assert tr.epoch == 1
    assert not glob.glob(os.path.join(str(tmp_path), "trained_models",
                                      "nocad", "gen_*"))
    assert tr.ckpt.latest_epoch() is None


def test_resume_with_reference_two_column_hist(tiny_trainer_run):
    """A reference-produced hist.csv has ONLY d_loss/g_loss
    (gan_train_cwgangp_pixelnorm.py:427); resume must backfill every other
    tracked column to keep the dict rectangular."""
    import shutil

    import pandas as pd

    tr, hist, workdir, exp, ds = tiny_trainer_run
    df = pd.read_csv(os.path.join(workdir, "hist.csv"), index_col=0)
    refdir = os.path.join(workdir, "..", "reflike")
    os.makedirs(refdir, exist_ok=True)
    shutil.copytree(os.path.join(workdir, "trained_models"),
                    os.path.join(refdir, "trained_models"),
                    dirs_exist_ok=True)
    df[["d_loss", "g_loss"]].to_csv(os.path.join(refdir, "hist.csv"))
    tr2 = Trainer(_tiny_exp(), ds, workdir=refdir, use_mesh=False,
                  steps_per_epoch=2)
    assert tr2.maybe_resume()
    lengths = {len(v) for v in tr2.hist.values()}
    assert lengths == {len(df)}
    # absent metrics backfill as NaN, NOT 0.0 — a resumed legacy history
    # must stay distinguishable from measured zeros (round-3 weak #4)
    assert np.isnan(tr2.hist["gp"]).all()
    assert np.isnan(tr2.hist["w_distance"]).all()
    tr2._write_hist({k: list(v) for k, v in tr2.hist.items()})


def test_final_checkpoint_forced_beyond_cadence(tmp_path):
    """A run whose epoch count is not a multiple of the checkpoint cadence
    must still end with its FINAL epoch checkpointed (round-3 weak #3: a
    13-epoch run with cadence 10 silently resumed at 10 and retrained 3
    epochs).  3 epochs with cadence 2 reproduces the shape cheaply."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=19)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = dataclasses.replace(
        _tiny_exp(),
        train=TrainConfig(n_disc=1, schedule=((3, 4),), seed=20,
                          log_every_steps=1, checkpoint_every_epochs=2))
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=1, plot_every_epochs=0,
                 export_weights_every_epochs=0)
    tr.fit(progress=False)
    assert tr.ckpt.latest_epoch() == 3
    tr2 = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                  steps_per_epoch=1)
    assert tr2.maybe_resume() and tr2.epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.gen_params),
                    jax.tree_util.tree_leaves(tr2.state.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_abort_checkpoints_last_completed_epoch(tmp_path):
    """An abort mid-run (NaN loss, crash, Ctrl-C) must leave the last
    COMPLETED epoch checkpointed even when the cadence never fired — the
    abort path uses the epoch-end snapshot, never the (possibly poisoned)
    live state."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=23)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = dataclasses.replace(
        _tiny_exp(),
        train=TrainConfig(n_disc=1, schedule=((5, 4),), seed=24,
                          log_every_steps=1, checkpoint_every_epochs=10))

    def abort_after_epoch_2(trainer):
        if trainer.epoch == 2:
            raise RuntimeError("simulated crash")

    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=1, plot_every_epochs=0,
                 export_weights_every_epochs=0,
                 on_epoch_end=abort_after_epoch_2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        tr.fit(progress=False)
    assert tr.ckpt.latest_epoch() == 2


def test_warm_start_npz_shape_mismatch_raises(tmp_path):
    """.npz warm starts validate weight shapes against the config up front
    (the .h5 path already did) instead of failing deep inside the jitted
    step."""
    from prdisagg_tpu.models.io import save_params_npz
    from prdisagg_tpu.train.state import warm_start

    big = ModelConfig(ndomain=32, latent_dim=8, gen_channels=(8, 8, 8),
                      base_channels=8, critic_channels=(8, 8, 8, 8))
    state, _, _ = create_train_state(big, TrainConfig(seed=50))
    gp = str(tmp_path / "gen32.npz")
    save_params_npz(gp, state.gen_params)
    with pytest.raises(ValueError, match="does not match config"):
        warm_start(SMALL_MODEL, TrainConfig(seed=0), gp)


def test_ema_trainer_exports_and_resume(tmp_path):
    """With TrainConfig.ema_decay on, the Trainer exports gen_ema_* weights
    per epoch, the Orbax checkpoint round-trips the EMA params exactly, and
    the EMA weights load back through the standard .h5 generator loader."""
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=31)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = dataclasses.replace(
        _tiny_exp(),
        train=TrainConfig(n_disc=1, schedule=((2, 4),), seed=32,
                          log_every_steps=1, checkpoint_every_epochs=1,
                          ema_decay=0.5))
    tr = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                 steps_per_epoch=2, plot_every_epochs=0)
    tr.fit(progress=False)
    emas = sorted(glob.glob(os.path.join(
        tr.outdir, "gen_ema_*.h5")))
    assert len(emas) == 2, emas
    # EMA params differ from live (decay 0.5 over 4 steps) but load fine
    from prdisagg_tpu.models.io import load_keras_generator_h5

    ema_params = load_keras_generator_h5(emas[-1], exp.model())
    live = jax.device_get(tr.state.gen_params)
    diffs = [
        float(np.max(np.abs(np.asarray(a, np.float32)
                            - np.asarray(b, np.float32))))
        for a, b in zip(jax.tree_util.tree_leaves(ema_params),
                        jax.tree_util.tree_leaves(live))
    ]
    assert max(diffs) > 0

    tr2 = Trainer(exp, ds, workdir=str(tmp_path), use_mesh=False,
                  steps_per_epoch=2)
    assert tr2.maybe_resume() and tr2.epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.ema_gen_params),
                    jax.tree_util.tree_leaves(tr2.state.ema_gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tensorboard_sink_streams_metrics(tmp_path):
    """Opt-in TensorBoard logging (SURVEY.md §5: "CSV + optional
    TensorBoard"): a tiny fit writes an event file whose scalar tags carry
    one point per hist row, while hist.csv stays the always-on record."""
    tb = pytest.importorskip("tensorboard")  # noqa: F841 — env-gated
    workdir = str(tmp_path / "run")
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=4)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    tbdir = str(tmp_path / "tb")
    tr = Trainer(_tiny_exp(), ds, workdir=workdir, use_mesh=False,
                 steps_per_epoch=2, plot_every_epochs=0,
                 export_weights_every_epochs=0, tensorboard_dir=tbdir)
    hist = tr.fit(progress=False)
    tr.tb.close()
    assert os.path.exists(os.path.join(workdir, "hist.csv"))

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tbdir)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/d_loss", "train/g_loss", "train/gp",
            "perf/steps_per_sec"} <= tags
    pts = acc.Scalars("train/d_loss")
    assert len(pts) == len(hist["d_loss"]) == 4
    np.testing.assert_allclose([p.value for p in pts], hist["d_loss"],
                               rtol=1e-6)
    assert [p.step for p in pts] == [1, 2, 3, 4]
    assert len(acc.Scalars("perf/steps_per_sec")) == 2  # one per epoch


def test_run_manifest_written_and_drift_warned(tmp_path, capsys):
    """Every Trainer workdir carries run_config.json — the full
    ExperimentConfig + environment (the reference's config is module
    constants readable only in the script that ran) — and relaunching
    into the same workdir with a DIFFERENT config warns, naming the
    changed fields."""
    import json

    workdir = str(tmp_path)
    data, indices, dcfg = make_synthetic_dataset(n_days=4, ny=32, nx=32,
                                                 seed=4)
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    exp = _tiny_exp()
    Trainer(exp, ds, workdir=workdir, use_mesh=False)
    with open(os.path.join(workdir, "run_config.json")) as fh:
        man = json.load(fh)
    assert man["experiment"]["train"]["schedule"] == [[2, 4]]
    assert man["experiment"]["name"] == "smoke"
    assert man["n_devices"] >= 1 and "jax_version" in man
    capsys.readouterr()

    # same config relaunch: silent
    Trainer(exp, ds, workdir=workdir, use_mesh=False)
    assert "different config" not in capsys.readouterr().out

    exp2 = dataclasses.replace(
        exp, train=dataclasses.replace(exp.train, n_disc=2, seed=4))
    Trainer(exp2, ds, workdir=workdir, use_mesh=False)
    out = capsys.readouterr().out
    assert "different config" in out
    assert "train.n_disc" in out and "train.seed" in out
    with open(os.path.join(workdir, "run_config.json")) as fh:
        man2 = json.load(fh)
    assert man2["experiment"]["train"]["n_disc"] == 2  # current run wins
