"""doy/lon conditioning variants at flagship width, end-to-end ON CHIP.

The reference trains these as full experiments
(revision1/additional_inputs/gan_train_cwgangp_pixelnorm_doy.py:135,173-184
and ..._lon.py:136) — until round 4 this repo had them only as CPU unit
tests.  For each variant this script, on the real TPU:

  * trains the FLAGSHIP architecture for a few epochs at reference-scale
    per-epoch step counts (step-rate anchor vs the base protocol's 96 steps/s),
  * evaluates held-out daily-cycle correlation + mass conservation,
  * round-trips the per-epoch Keras .h5 export (save -> load ->
    forward-equivalence on chip).

Usage: python scripts/variants_tpu.py [n_days=400] [epochs=5]
Writes artifacts/variants_tpu.txt (summary lines) per variant.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.core.config import (
        Conditioning, TrainConfig, doy_experiment, lon_experiment,
    )
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.eval import Evaluator, daily_cycle_correlation
    from prdisagg_tpu.train.loop import Trainer
    from scripts.full_protocol_scale_run import make_scale_dataset

    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    outpath = os.path.join(REPO, "artifacts", "variants_tpu.txt")
    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    for factory in (doy_experiment, lon_experiment):
        exp = factory()
        import dataclasses

        exp = dataclasses.replace(
            exp, train=TrainConfig(schedule=((epochs, 32),), seed=0,
                                   log_every_steps=100))
        variant = exp.data.conditioning
        dcfg = exp.data
        data, indices = make_scale_dataset(n_days, 88, 88, 11, dcfg)
        doy = (np.arange(n_days, dtype=np.float32) % 365.0) + 1.0 \
            if variant == Conditioning.DOY else None
        ds = DeviceDataset.from_numpy(data, indices, dcfg, doy=doy)
        del data
        eval_data, eval_idx = make_scale_dataset(120, 88, 88, 13, dcfg)
        doy_ev = (np.arange(120, dtype=np.float32) % 365.0) + 1.0 \
            if variant == Conditioning.DOY else None
        ds_eval = DeviceDataset.from_numpy(eval_data, eval_idx, dcfg,
                                           doy=doy_ev)
        del eval_data

        workdir = os.path.join(REPO, "artifacts", f"variant_{variant}")
        os.makedirs(workdir, exist_ok=True)
        marks = {}

        def on_epoch_end(tr):
            if tr.epoch == 1 and "t1" not in marks:
                marks["t1"] = time.perf_counter()

        tr = Trainer(exp, ds, workdir=workdir, on_epoch_end=on_epoch_end,
                     plot_every_epochs=0)
        resumed = tr.maybe_resume()
        if resumed:
            # a supervise/wedge relaunch continues instead of retraining;
            # the steady-rate anchor is then void (partial run), marked nan
            print(f"[{variant}] resumed at epoch {tr.epoch}", flush=True)
            marks["t1"] = time.perf_counter()
        t0 = time.perf_counter()
        tr.fit(progress=True)
        t_end = time.perf_counter()
        spe = max(1, len(indices) // 32)
        steady = (epochs - 1) * spe / (t_end - marks["t1"]) \
            if epochs > 1 and not resumed else float("nan")
        emit(f"[{variant}] {epochs} epochs x {spe} steps "
             f"({len(indices)} patches): total {t_end - t0:.1f}s, "
             f"steady {steady:.1f} steps/s (excl. compile epoch)")

        # held-out evaluation with the variant conditioning
        pg = PretrainedGenerator(jax.device_get(tr.state.gen_params),
                                 exp.model(), seed=354)
        ev = Evaluator(exp, ds_eval, pg, workdir=workdir, epoch=tr.epoch)
        res = ev.sample_statistics(n_samples=1000, save_fields=True,
                                   make_plots=False)
        corr = daily_cycle_correlation(res)
        # mass conservation: each generated field's daily sum must equal the
        # conditioning daily sum EXACTLY (f32 hour-softmax guarantee)
        gen = res["generated_samples"]
        real = res["real_samples"]
        dsum_err = np.max(np.abs(gen.sum(axis=1) - real.sum(axis=1)) /
                          (real.sum(axis=1) + 1e-6))
        emit(f"[{variant}] held-out daily-cycle corr {corr:.4f}, "
             f"max rel conservation err {dsum_err:.2e}")

        # variant .h5 export/import round-trip exercised on chip
        model_dir = os.path.join(workdir, "trained_models", exp.name)
        h5s = sorted(glob.glob(os.path.join(model_dir, "gen_*.h5")))
        assert h5s, f"no generator exports in {model_dir}"
        pg2 = PretrainedGenerator.from_keras_h5(
            h5s[-1], n_cond_channels=dcfg.n_cond_channels, seed=354)
        assert pg2.cfg.n_cond_channels == dcfg.n_cond_channels
        key = jax.random.PRNGKey(5)
        lat = jax.random.normal(key, (8, pg.cfg.latent_dim))
        _, cond = ds_eval.sample_real(jax.random.PRNGKey(6), 8)
        # compare at matching (f32 inference) precision: params are stored
        # f32 either way; pg2's loaded cfg defaults to float32 compute
        cfg_f32 = dataclasses.replace(exp.model(), compute_dtype="float32")
        pg_f32 = PretrainedGenerator(
            jax.device_get(tr.state.gen_params), cfg_f32, seed=354)
        a = np.asarray(pg_f32._gen.apply(pg_f32.params, lat, cond))
        b = np.asarray(pg2._gen.apply(pg2.params, lat, cond))
        emit(f"[{variant}] .h5 round-trip on chip: "
             f"max|a-b| {np.max(np.abs(a - b)):.2e} "
             f"(export {os.path.basename(h5s[-1])})")

    with open(outpath, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", outpath, flush=True)


if __name__ == "__main__":
    main()
