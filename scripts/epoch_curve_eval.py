"""Held-out quality curve over per-epoch generator exports.

The reference selects its evaluation epoch by visual inspection of
per-epoch outputs (epoch 20 of 50, generate_and_evaluate.py:49-52).  This
script makes that workflow quantitative: evaluate the daily-cycle
correlation of each exported `gen_*_{epoch:04d}.h5` on FRESH held-out
synthetic days and print the curve.

Usage:
  python scripts/epoch_curve_eval.py <trained_models_dir> [epochs...]
e.g.
  python scripts/epoch_curve_eval.py \
      artifacts/full_protocol_scale/trained_models/full_protocol_scale \
      5 10 20 30 40 50
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    # sitecustomize pre-imports jax with the axon platform latched; honor an
    # explicit env request (e.g. JAX_PLATFORMS=cpu) after import
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/prdisagg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from prdisagg_tpu.api import PretrainedGenerator
    from prdisagg_tpu.core.config import DataConfig, ExperimentConfig
    from prdisagg_tpu.data.sampler import DeviceDataset
    from prdisagg_tpu.eval import Evaluator, daily_cycle_correlation
    from scripts.full_protocol_scale_run import make_scale_dataset

    outdir = sys.argv[1]
    epochs = [int(e) for e in sys.argv[2:]] or [5, 10, 20, 30, 40, 50]

    dcfg = DataConfig()
    data, idx = make_scale_dataset(300, 88, 88, 7, dcfg)  # held-out days
    ds = DeviceDataset.from_numpy(data, idx, dcfg)
    exp = ExperimentConfig(data=dcfg, name="epoch_curve")
    best = (None, -2.0)
    for e in epochs:
        paths = glob.glob(os.path.join(outdir, f"gen_*_{e:04d}.h5"))
        if not paths:
            print(f"epoch {e:2d}: no export found", flush=True)
            continue
        for path in sorted(paths):
            # EMA exports (gen_ema_*) are scored as their own labeled
            # candidates, never silently in place of the raw export
            label = ("ema:" if os.path.basename(path).startswith("gen_ema_")
                     else "") + str(e)
            pg = PretrainedGenerator.from_keras_h5(path, seed=354)
            ev = Evaluator(exp, ds, pg, workdir="/tmp/epoch_curve_art",
                           epoch=e)
            # only the large-sample statistics feed the curve — skip the map
            # grids / noise lines / KS phases (and their GIL-holding
            # matplotlib)
            res = ev.sample_statistics(n_samples=300, save_fields=False,
                                       make_plots=False)
            corr = daily_cycle_correlation(res)
            print(f"epoch {label:>7s}: daily-cycle corr {corr:.4f}",
                  flush=True)
            if corr > best[1]:
                best = (label, corr)
    print(f"best: epoch {best[0]} (corr {best[1]:.4f})", flush=True)


if __name__ == "__main__":
    main()
