"""End-to-end quality smoke on real TPU hardware: train the full flagship
model on the synthetic fixture dataset, then run the evaluation suite at
smoke scale.  Validates training stability (no NaN, losses evolve, GP pulls
||grad|| toward 1) and the full train->checkpoint->eval chain on device.

Usage: python scripts/train_synthetic_tpu.py [epochs] [steps_per_epoch] [dtype]
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
    from prdisagg_tpu.core.config import (
        DataConfig, EvalConfig, ExperimentConfig, TrainConfig,
    )
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.data.synthetic import make_synthetic_dataset
    from prdisagg_tpu.eval import Evaluator, daily_cycle_correlation
    from prdisagg_tpu.train.loop import Trainer

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spe = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"

    workdir = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                           "synthetic_run")
    os.makedirs(workdir, exist_ok=True)

    data, indices, dcfg = make_synthetic_dataset(n_days=16, ny=96, nx=96, seed=0)
    print(f"synthetic dataset: {data.shape}, {len(indices)} valid patches")
    ds = DeviceDataset.from_numpy(data, indices, dcfg)

    from prdisagg_tpu.core.config import ModelConfig

    exp = ExperimentConfig(
        data=dcfg,
        train=TrainConfig(schedule=((epochs, 32),), seed=0, log_every_steps=50),
        name="synthetic_smoke",
        model_override=None if dtype == "float32" else ModelConfig(
            ndomain=dcfg.ndomain, nhours=dcfg.nhours,
            n_cond_channels=dcfg.n_cond_channels, compute_dtype=dtype),
    )
    tr = Trainer(exp, ds, workdir=workdir, steps_per_epoch=spe)
    tr.plot_real_samples()
    hist = tr.fit()
    print(f"training done: {tr.epoch} epochs, "
          f"final d_loss={hist['d_loss'][-1]:.4f} g_loss={hist['g_loss'][-1]:.4f}")

    # evaluation smoke with the trained generator
    pg = PretrainedGenerator(jax.device_get(tr.state.gen_params),
                             exp.model(), seed=354)
    ev = Evaluator(exp, ds, pg, workdir=workdir, epoch=tr.epoch)
    res, pvals = ev.run_all(
        n_map_conditions=3, n_fake_per_real=4, n_stat_samples=300,
        n_line_conditions=2, n_line_free_noise=20, n_line_shared_noise=5,
        n_ks_conditions=3, n_ks_members=200,
    )
    # quality signals
    frac_cycle_gen = res["amean_fraction_gen"].mean(axis=0)
    frac_cycle_real = res["amean_fraction_real"].mean(axis=0)
    corr = daily_cycle_correlation(res)
    print("mean generated hourly fraction cycle:",
          np.round(frac_cycle_gen, 4).tolist())
    print("mean real hourly fraction cycle:    ",
          np.round(frac_cycle_real, 4).tolist())
    print(f"daily-cycle correlation gen vs real: {corr:.3f}")
    ks_signif = np.mean([np.mean(p < 0.05) for p in pvals])
    print(f"KS conditional-dist: fraction of hours with p<0.05: {ks_signif:.2f} "
          "(high = conditions genuinely change the distribution)")
    print("artifacts in", os.path.abspath(workdir))


if __name__ == "__main__":
    main()
