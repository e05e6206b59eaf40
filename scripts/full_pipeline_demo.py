"""Full-pipeline demonstration: every stage of the framework chained on the
synthetic fixture dataset — the end-to-end equivalent of running all ~20
reference scripts in sequence.

stages: data -> valid indices (native C++ engine) -> cWGAN-GP training ->
eval suite (map grids, statistics, daily cycle, noise lines, KS check) ->
RainFARM calibration + generation -> GAN/random/RainFARM CRPS + analysis ->
log-spectral-distance comparison of all three populations.

Usage: python scripts/full_pipeline_demo.py [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/prdisagg_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.baselines.rainfarm.pipeline import (
        calibrate, crps_rainfarm, generate_for_daily_sums,
    )
    from prdisagg_tpu.core.config import (
        ExperimentConfig, RainFarmConfig, TrainConfig,
    )
    from prdisagg_tpu.data.native import (
        compute_valid_indices_native, native_available,
    )
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset
    from prdisagg_tpu.eval import Evaluator
    from prdisagg_tpu.eval.crps import analyze, run_crps_evaluation
    from prdisagg_tpu.eval.lsd import run_lsd_evaluation
    from prdisagg_tpu.train.loop import Trainer

    workdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "pipeline_demo")
    datadir = os.path.join(workdir, "data")
    os.makedirs(datadir, exist_ok=True)

    # ---- stage 1: data + valid indices (native engine) ---------------------
    data, _, dcfg = make_synthetic_dataset(n_days=16, ny=96, nx=96, seed=0)
    print(f"[1] native engine available: {native_available()}")
    indices = compute_valid_indices_native(data, dcfg)
    print(f"[1] data {data.shape}, {len(indices)} valid patches")
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    # ---- stage 2: training --------------------------------------------------
    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=((8, 32),), seed=0, log_every_steps=100),
        name="pipeline_demo",
    )
    tr = Trainer(exp, ds, workdir=workdir, steps_per_epoch=200)
    tr.plot_real_samples()
    hist = tr.fit(progress=False)
    print(f"[2] trained {tr.epoch} epochs; final d_loss={hist['d_loss'][-1]:.3f}")

    # ---- stage 3: evaluation suite ------------------------------------------
    pg = PretrainedGenerator(jax.device_get(tr.state.gen_params),
                             exp.model(), seed=354)
    ev = Evaluator(exp, ds, pg, workdir=workdir, epoch=tr.epoch)
    res, pvals = ev.run_all(
        n_map_conditions=2, n_fake_per_real=3, n_stat_samples=200,
        n_line_conditions=1, n_line_free_noise=10, n_line_shared_noise=3,
        n_ks_conditions=2, n_ks_members=100,
    )
    print(f"[3] eval artifacts in {ev.plotdir}")

    # ---- stage 4: RainFARM baseline -----------------------------------------
    rf_cfg = RainFarmConfig(n_calib=200, n_repeat=2)
    slopes = calibrate(ds, rf_cfg, outdir=datadir)
    alpha, beta = slopes[0]
    print(f"[4] rainfarm slopes: alpha={alpha:.3f} beta={beta:.3f}")

    reals = res["real_samples"][:64]           # (n, 24, nd, nd) mm
    gens = res["generated_samples"][:64]
    rf_fields = generate_for_daily_sums(reals.sum(axis=1), alpha, beta, rf_cfg)
    np.save(os.path.join(datadir, "generated_samples_rainfarm.npy"), rf_fields)

    # ---- stage 5: CRPS: GAN vs random vs RainFARM ---------------------------
    baseline = np.load(os.path.join(datadir, "rainfarm_calibration_data.npy"))
    crps_res = run_crps_evaluation(pg, reals, baseline[:100], n_members=100,
                                   outdir=datadir)
    rf_crps = crps_rainfarm(reals, alpha, beta, rf_cfg, n_members=100,
                            outfile=os.path.join(datadir,
                                                 "crps_results_rainfarm.pkl"))
    summary = analyze(crps_res["gan"], crps_res["random"], rf_crps,
                      outdir=datadir, n_bootstrap=1000)
    print(f"[5] CRPS gan={summary['gan']:.4f} random={summary['random']:.4f} "
          f"rainfarm={summary['rainfarm']:.4f} "
          f"(t-test p={summary['ttest_p_gan_vs_random']:.2e})")

    # ---- stage 6: log-spectral distances ------------------------------------
    dists = run_lsd_evaluation(reals, gens, rf_fields, n_samples=32,
                               outdir=datadir,
                               plotdir=os.path.join(workdir, "plots"))
    for k, v in dists.items():
        finite = v[np.isfinite(v)]
        print(f"[6] LSD {k}: median={np.median(finite):.3f} (n={len(finite)})")

    print("pipeline complete; artifacts in", os.path.abspath(workdir))


if __name__ == "__main__":
    main()
