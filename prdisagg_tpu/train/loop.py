"""Training driver: epoch loop, batch-size schedule, metrics, checkpoints.

Orchestrates the fused train step the way the reference's `train()` does its
host loop (gan_train_cwgangp_pixelnorm.py:431-529), with the TPU-native
differences:

* one jitted fused step per iteration instead of 6 `train_on_batch` calls,
* metrics come back as a device dict; history -> hist.csv like the reference,
* per-epoch generator/critic .h5 weight exports with the params-string
  filenames (exactly the reference's cadence and format,
  gan_train_cwgangp_pixelnorm.py:520-521; .npz native exports opt-in via
  export_format), plus Orbax checkpoints of the FULL state (exact resume)
  every `checkpoint_every_epochs` (default 10 — every-epoch Orbax measurably
  starved the loop on 1-core hosts, docs/PERF.md round 2),
* the increasing-batch-size schedule recompiles the step per stage (the
  schedule list is tiny, gan_train_cwgangp_pixelnorm.py:73-74,524-529).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from prdisagg_tpu.core.config import ExperimentConfig
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.models.io import (
    save_keras_critic_h5,
    save_keras_generator_h5,
    save_params_npz,
)
from prdisagg_tpu.parallel import make_mesh, replicate
from prdisagg_tpu.train.artifacts import ArtifactWriter, SyncWriter, snapshot
from prdisagg_tpu.train.checkpoint import CheckpointManager
from prdisagg_tpu.train.state import GANTrainState, create_train_state
from prdisagg_tpu.train.wgan_gp import make_train_step, unpack_metrics


def _dict_diff(a: dict, b: dict, prefix: str = "") -> list:
    """Dotted paths of leaves that differ between two nested dicts."""
    out = []
    for k in sorted(set(a) | set(b)):
        va, vb = a.get(k), b.get(k)
        if isinstance(va, dict) and isinstance(vb, dict):
            out += _dict_diff(va, vb, f"{prefix}{k}.")
        elif va != vb:
            out.append(f"{prefix}{k}")
    return out


class NaNLossError(RuntimeError):
    """Raised when the fused step reports non-finite losses
    (reference abort: gan_train_cwgangp_pixelnorm.py:487-488)."""


class Trainer:
    def __init__(
        self,
        exp: ExperimentConfig,
        ds: DeviceDataset,
        workdir: str = ".",
        use_mesh: bool = True,
        steps_per_epoch: Optional[int] = None,
        plot_every_epochs: int = 1,
        export_weights_every_epochs: int = 1,
        on_epoch_end: Optional[Callable] = None,
        async_artifacts: bool = True,
        export_format: str = "h5",
        warm_start_weights: Optional[tuple] = None,
        start_epoch: int = 0,
        tensorboard_dir: Optional[str] = None,
    ):
        """`warm_start_weights=(gen_path, critic_path_or_None)` reloads saved
        weights (.npz or reference .h5) with FRESH optimizers, and
        `start_epoch` offsets the epoch labels — the reference's
        continue-training workflow (gan_train_cwgangp_pixelnorm.py:520-529 +
        start_epoch).  For exact resume (optimizer state included) use
        `maybe_resume()` instead.

        `tensorboard_dir` opts into live TensorBoard scalars alongside
        hist.csv (SURVEY.md §5 metrics plan: "CSV + optional TensorBoard");
        the step axis counts hist rows (fused-step chunks), so it stays
        monotonic across exact resumes."""
        self.exp = exp
        self.model_cfg = exp.model()
        self.workdir = workdir
        self.params_str = exp.data.params_string()
        self.plotdir = os.path.join(workdir, f"plots_{exp.name}")
        self.outdir = os.path.join(workdir, "trained_models", exp.name)
        os.makedirs(self.plotdir, exist_ok=True)
        os.makedirs(self.outdir, exist_ok=True)
        self.steps_per_epoch = steps_per_epoch
        self.plot_every_epochs = plot_every_epochs
        self.export_weights_every_epochs = export_weights_every_epochs
        self.on_epoch_end = on_epoch_end
        if export_format not in ("npz", "h5", "both"):
            raise ValueError(f"unknown export_format {export_format!r}")
        self.export_format = export_format
        # All per-epoch artifact I/O (Orbax save, weight exports, hist.csv,
        # matplotlib) runs on a background worker: the loop only takes a
        # jitted on-device snapshot and keeps training (train/artifacts.py)
        self.writer = ArtifactWriter() if async_artifacts else SyncWriter()

        n_dev = exp.train.n_data_devices
        if use_mesh and (n_dev is None or n_dev > 1) and len(jax.devices()) > 1:
            self.mesh = make_mesh(n_dev)
        else:
            self.mesh = None

        if warm_start_weights is not None:
            from prdisagg_tpu.train.state import warm_start

            gen_w, critic_w = warm_start_weights
            state, self.gen, self.critic = warm_start(
                self.model_cfg, exp.train, gen_w, critic_w)
        else:
            state, self.gen, self.critic = create_train_state(
                self.model_cfg, exp.train)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
            ds = replicate(ds, self.mesh)
        self.state: GANTrainState = state
        self.ds = ds

        self.ckpt = CheckpointManager(os.path.join(self.outdir, "ckpt"))
        # d_loss/g_loss mirror the reference hist.csv columns
        # (gan_train_cwgangp_pixelnorm.py:427); the rest are extra
        # observability (SURVEY.md §5 metrics row).  "epoch" tags each row
        # so resume can drop rows newer than the restored checkpoint
        # (hist.csv is written every epoch, Orbax only every
        # checkpoint_every_epochs — without the tag, re-trained epochs
        # would duplicate their stale rows).
        self.hist: dict[str, list] = {
            "d_loss": [], "g_loss": [], "gp": [], "w_distance": [],
            "d_grad_norm": [], "g_grad_norm": [], "epoch": [],
        }
        self.epoch = start_epoch
        self._epoch0 = start_epoch  # schedule progress is counted from here
        # liveness channel for utils.watchdog.supervise: beat once per
        # fused-step chunk AFTER the metrics host-fetch returns, i.e. only
        # on confirmed device progress (a wedged backend blocks the fetch,
        # so the beat goes stale and the supervisor kills + resumes us).
        # Enabled via the PRDISAGG_HEARTBEAT env var; no-op otherwise.
        from prdisagg_tpu.utils.watchdog import Heartbeat

        self.heartbeat = Heartbeat.from_env()
        self.tb = None
        if tensorboard_dir:
            from prdisagg_tpu.utils.tb import MetricsTB

            self.tb = MetricsTB(tensorboard_dir)
        # (epoch, snapshot) of the last COMPLETED epoch — the final/abort
        # checkpoint source (the live state after a NaN abort is poisoned)
        self._last_snap: Optional[tuple] = None
        self._last_ckpt_epoch = -1
        self._write_run_manifest()

    # ------------------------------------------------------------------
    def _write_run_manifest(self):
        """Persist the run's full configuration to workdir/run_config.json.

        The reference's 'config' is module-level constants readable only in
        the script that ran (gan_train_cwgangp_pixelnorm.py:51-114) — a
        finished run directory cannot say what produced it.  Here every
        workdir carries the complete ExperimentConfig plus the environment
        (jax version/backend/device count), and a relaunch into the same
        workdir with a DIFFERENT config gets a loud warning naming the
        changed fields (a silent config drift across resume is how quality
        regressions escape notice).  The current run's config always wins
        and is written atomically."""
        import dataclasses

        path = os.path.join(self.workdir, "run_config.json")
        # json round-trip normalizes tuples->lists so comparisons are fair
        exp_dict = json.loads(json.dumps(dataclasses.asdict(self.exp)))
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    prev = json.load(fh).get("experiment")
            except Exception:
                prev = None
            if prev is not None and prev != exp_dict:
                changed = _dict_diff(prev, exp_dict)
                print(
                    f"[trainer] WARNING: this workdir was written by a run "
                    f"with a different config (changed: {', '.join(changed)});"
                    f" run_config.json now records the current one",
                    flush=True,
                )
        manifest = {
            "experiment": exp_dict,
            "prdisagg_tpu_version": __import__("prdisagg_tpu").__version__,
            "jax_version": jax.__version__,
            "backend": jax.default_backend(),
            "n_devices": len(jax.devices()),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, path)

    # ------------------------------------------------------------------
    def maybe_resume(self) -> bool:
        latest = self.ckpt.latest_epoch()
        if latest is None:
            return False
        self.state = self.ckpt.restore(self.state, latest)
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        self.epoch = latest
        self._last_ckpt_epoch = latest
        hist_path = os.path.join(self.workdir, "hist.csv")
        if os.path.exists(hist_path):
            import pandas as pd

            df = pd.read_csv(hist_path, index_col=0)
            if "epoch" in df:
                # hist.csv is written EVERY epoch but the restored Orbax
                # checkpoint may be older (checkpoint_every_epochs=10):
                # drop rows from epochs that will be re-trained, or they
                # would be duplicated
                df = df[df["epoch"] <= latest]
            # backfill ANY missing column (a reference-style hist.csv has
            # only d_loss/g_loss; pre-round-3 files lack 'epoch') so the
            # dict stays rectangular for _write_hist.  Absent metrics are
            # NaN, not 0.0 — a resumed legacy history must stay
            # distinguishable from measured zeros in plots and analyses.
            for k in self.hist:
                self.hist[k] = df[k].tolist() if k in df else \
                    [float("nan")] * len(df)
        return True

    # ------------------------------------------------------------------
    def fit(self, progress: bool = True) -> dict:
        """Run the full schedule; returns the metrics history.

        Stage boundaries are CUMULATIVE from the run's first epoch, so a
        resumed run finishes the remainder of the correct stage instead of
        re-running whole stages (e.g. schedule ((20,32),(30,64)) resumed at
        epoch 35 trains epochs 36..50 at batch 64).  All queued artifact
        writes are flushed even when a stage aborts (NaNLossError etc.) so
        the last completed epoch's checkpoint/exports are on disk.

        A FINAL Orbax checkpoint of the last completed epoch is forced on
        completion and on abort regardless of the checkpoint cadence (a
        13-epoch run with cadence 10 must resume at 13, not 10 — exact
        resume is strictly better than the reference's per-epoch .h5-only
        saves, never lossy).  Cadence 0 keeps Orbax disabled entirely."""
        try:
            cum = self._epoch0
            for n_epochs, batch_size in self.exp.train.schedule:
                cum += n_epochs
                if self.epoch >= cum:
                    continue
                self._fit_stage(cum, batch_size, progress)
        except BaseException:
            # drain what was already queued, but never mask the train error;
            # the abort checkpoint uses the last COMPLETED epoch's snapshot
            # (the live state after a NaN abort is poisoned)
            try:
                self._final_checkpoint()
                self.writer.flush()
                if self.tb is not None:
                    self.tb.flush()
            except Exception:
                import traceback

                traceback.print_exc()
            raise
        self._final_checkpoint()
        self.writer.flush()
        if self.tb is not None:
            self.tb.flush()
        return self.hist

    def _final_checkpoint(self):
        """Force an Orbax save of the last completed epoch unless that epoch
        is already checkpointed (or checkpointing is disabled)."""
        if not self.exp.train.checkpoint_every_epochs:
            return
        if self._last_snap is None:
            return
        e, snap = self._last_snap
        if e <= self._last_ckpt_epoch:
            return
        self._last_ckpt_epoch = e
        self.writer.submit(lambda: self.ckpt.save(e, snap))

    def _fit_stage(self, until_epoch: int, batch_size: int, progress: bool):
        spe = self.steps_per_epoch
        if spe is None:
            spe = max(1, self.ds.n_samples // batch_size)
        # one device dispatch per log interval: K fused steps scanned inside
        # the jitted call (each host dispatch costs ~4 ms on the tunneled
        # TPU).  K must DIVIDE steps_per_epoch so the epoch runs exactly the
        # configured step count (the reference's bat_per_epo =
        # n_sample/batch_size, gan_train_cwgangp_pixelnorm.py:433) — pick
        # the largest divisor of spe not exceeding log_every_steps rather
        # than silently truncating the epoch to a multiple of the log
        # interval (worst case, prime spe, K=1 = the reference's own
        # per-step dispatch).
        k_max = max(1, min(self.exp.train.log_every_steps, spe))
        k_steps = next(k for k in range(k_max, 0, -1) if spe % k == 0)
        n_chunks = spe // k_steps
        if k_steps * 10 <= k_max:
            # e.g. prime spe: 1200 synthetic days gave spe=937 (prime), so
            # K=1 and the tunneled TPU's ~40 ms dispatch+fetch floor capped
            # training at 25 steps/s vs ~96 amortized (round-4 anchor run).
            # K>=15 is measurably fine (spe=2265 -> K=15 sustains ~89
            # steps/s at reference scale — async dispatch overlaps the
            # fetch), so only warn an order of magnitude below the target.
            # Pick a sample count whose spe has a divisor near
            # log_every_steps when the step rate matters.
            print(
                f"[trainer] WARNING: steps_per_epoch={spe} has no divisor "
                f"near log_every_steps={self.exp.train.log_every_steps} "
                f"(chunk={k_steps}); throughput will be dispatch-bound",
                flush=True,
            )
        steps_per_epoch = spe

        step_fn = make_train_step(
            self.gen, self.critic, self.model_cfg, self.exp.train,
            batch_size=batch_size, mesh=self.mesh, steps_per_call=k_steps,
        )

        while self.epoch < until_epoch:
            t0 = time.perf_counter()
            for j in range(n_chunks):
                self.state, metrics = step_fn(self.state, self.ds)
                m = unpack_metrics(metrics["packed"])
                if m["nonfinite"]:
                    raise NaNLossError(
                        f"non-finite loss at epoch {self.epoch + 1} "
                        f"chunk {j}: {m}"
                    )
                if self.heartbeat is not None:
                    self.heartbeat.beat()
                for k in self.hist:
                    self.hist[k].append(
                        self.epoch + 1 if k == "epoch" else m[k])
                if self.tb is not None:
                    self.tb.log(
                        {k: m[k] for k in self.hist if k != "epoch"},
                        step=len(self.hist["d_loss"]))
                if progress:
                    print(
                        f"epoch {self.epoch + 1} {(j + 1) * k_steps}/"
                        f"{steps_per_epoch} "
                        f"d_loss {m['d_loss']:.4f} g:{m['g_loss']:.4f} "
                        f"gp:{m['gp']:.4f}",
                        flush=True,
                    )
            self.epoch += 1
            dt = time.perf_counter() - t0
            if progress:
                print(f"epoch {self.epoch} done in {dt:.1f}s "
                      f"({steps_per_epoch / dt:.2f} fused steps/s)", flush=True)
            if self.tb is not None:
                self.tb.log({"steps_per_sec": steps_per_epoch / dt},
                            step=self.epoch, prefix="perf")
            self._end_of_epoch()

    # ------------------------------------------------------------------
    def _end_of_epoch(self):
        e = self.epoch
        # a cadence of 0 disables that artifact class (all three knobs
        # behave alike)
        ck = self.exp.train.checkpoint_every_epochs
        we = self.export_weights_every_epochs
        need_ckpt = ck and e % ck == 0
        need_weights = we and e % we == 0
        need_plot = self.plot_every_epochs and e % self.plot_every_epochs == 0

        # on-device copy: the live buffers are donated into the next fused
        # step, so the background writer reads only this snapshot.  Taken
        # every epoch (one tiny dispatch) so the final/abort checkpoint
        # always has the last COMPLETED epoch's state available.
        snap: GANTrainState = snapshot(self.state)
        self._last_snap = (e, snap)
        if need_ckpt:
            self._last_ckpt_epoch = e
            self.writer.submit(lambda: self.ckpt.save(e, snap))
        if need_weights:
            self.writer.submit(
                lambda: self._export_weights(e, snap.gen_params,
                                             snap.critic_params,
                                             snap.ema_gen_params))
        hist_copy = {k: list(v) for k, v in self.hist.items()}
        self.writer.submit(lambda: self._write_hist(hist_copy))
        if need_plot:
            # device compute stays in the loop thread (one tiny dispatch);
            # the worker only fetches + runs matplotlib
            fake, cond = self._fake_plot_batch(e, snap.gen_params, 30)
            self.writer.submit(
                lambda: self._plot_epoch(e, fake, cond, hist_copy))
        if self.on_epoch_end is not None:
            self.on_epoch_end(self)

    def flush_artifacts(self):
        """Block until all queued artifact writes finished (re-raising any
        background error)."""
        self.writer.flush()

    def _export_weights(self, e: int, gen_params, critic_params,
                        ema_gen_params=None):
        """Reference-style per-epoch weight exports with params-string
        filenames (gan_train_cwgangp_pixelnorm.py:520-521); .h5 is the
        reference ecosystem contract, .npz the native format.  When EMA is
        on (TrainConfig.ema_decay), the smoothed generator is exported too
        (gen_ema_*) in the same formats."""
        gen_params = jax.device_get(gen_params)
        critic_params = jax.device_get(critic_params)
        base_gen = os.path.join(self.outdir, f"gen_{self.params_str}_{e:04d}")
        base_disc = os.path.join(self.outdir, f"disc_{self.params_str}_{e:04d}")
        if self.export_format in ("npz", "both"):
            save_params_npz(base_gen + ".npz", gen_params)
            save_params_npz(base_disc + ".npz", critic_params)
        if self.export_format in ("h5", "both"):
            save_keras_generator_h5(base_gen + ".h5", gen_params,
                                    self.model_cfg)
            save_keras_critic_h5(base_disc + ".h5", critic_params,
                                 self.model_cfg)
        if ema_gen_params is not None:
            ema = jax.device_get(ema_gen_params)
            base_ema = os.path.join(self.outdir,
                                    f"gen_ema_{self.params_str}_{e:04d}")
            if self.export_format in ("npz", "both"):
                save_params_npz(base_ema + ".npz", ema)
            if self.export_format in ("h5", "both"):
                save_keras_generator_h5(base_ema + ".h5", ema,
                                        self.model_cfg)

    def _write_hist(self, hist):
        import pandas as pd

        pd.DataFrame(hist).to_csv(os.path.join(self.workdir, "hist.csv"))

    def _fake_plot_batch(self, epoch: int, gen_params, n_plot: int):
        if not hasattr(self, "_plot_fn"):
            def plot_batch(params, ds, key, n):
                k_lat, k_cond = jax.random.split(key)
                latent = jax.random.normal(k_lat, (n, self.model_cfg.latent_dim))
                cond = ds.sample_cond(k_cond, n)
                return self.gen.apply(params, latent, cond), cond

            self._plot_fn = jax.jit(plot_batch, static_argnames=("n",))
        return self._plot_fn(
            gen_params, self.ds, jax.random.PRNGKey(1000 + epoch), n_plot,
        )

    def _plot_epoch(self, epoch: int, fake, cond, hist):
        from prdisagg_tpu.utils import plotting

        # single-imsave mosaic: the 30x25 subplot figure costs ~12.5 s of
        # GIL-holding matplotlib per epoch on a 1-core host and starves the
        # training dispatch thread (docs/PERF.md round 2)
        plotting.sample_grid_mosaic(
            np.asarray(fake), np.asarray(cond),
            os.path.join(
                self.plotdir,
                f"fake_samples_{self.params_str}_{epoch:04d}.png",
            ),
        )
        fig = plotting.loss_curves(hist)
        fig.savefig(
            os.path.join(self.plotdir, f"training_loss_{self.params_str}.png")
        )
        plotting.close_all()

    def plot_real_samples(self, n_plot: int = 30):
        """Pre-training real-sample grid (reference :411-425)."""
        from prdisagg_tpu.data.sampler import sample_real_jit
        from prdisagg_tpu.utils import plotting

        frac, cond = sample_real_jit(self.ds, jax.random.PRNGKey(7), n_plot)
        plotting.sample_grid_mosaic(
            np.asarray(frac), np.asarray(cond),
            os.path.join(self.plotdir, "real_samples.png"),
        )
