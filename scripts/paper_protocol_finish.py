"""Finish a paper_protocol run from its saved artifacts.

Used when the battery completed through CRPS and the LSD populations are on
disk but the final KDE plot/verdict did not run (e.g. the pre-round-4-fix
seaborn KDE over the full 576M-point populations).  Loads the saved
log_spectral_distances_*.npy (full-fetch mode) or the *_subsample.npy +
exact-median summary json (the default device-reduction mode), draws the
KDE plot, recovers the medians, and writes paper_protocol_summary.json with
the verdict block assembled from the values passed on the command line /
found in data/.

Usage: python scripts/paper_protocol_finish.py <workdir> <peak_epoch> <corr> <ks_frac> [n_lsd]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    workdir = sys.argv[1]
    peak_epoch = int(sys.argv[2])
    held_corr = float(sys.argv[3])
    ks_frac = float(sys.argv[4])
    n_lsd = int(sys.argv[5]) if len(sys.argv) > 5 else 1000
    datadir = os.path.join(workdir, "data")

    # one n everywhere: populations, subsamples, AND the exact-median
    # summary json (a glob here once matched a stale smoke run's
    # summary_n100.json and silently fed wrong medians to the verdict)
    names = {
        k: f"log_spectral_distances_{k}_n{n_lsd}.npy"
        for k in ("real", "gen", "gen_rainfarm", "between_gen_real",
                  "between_gen_rainfarm_real")
    }
    labels = {
        "real": "obs", "gen": "generated",
        "gen_rainfarm": "generated rainfarm",
        "between_gen_real": "between obs and generated",
        "between_gen_rainfarm_real": "between obs and generated rainfarm",
    }
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import seaborn as sns

    sns.set_palette("colorblind")
    plt.figure()
    medians = {}
    # device-reduction runs (the default) save exact medians in a summary
    # json and *_subsample.npy arrays instead of the full populations
    summary_fn = os.path.join(
        datadir, f"log_spectral_distances_summary_n{n_lsd}.json")
    summary = {}
    if os.path.exists(summary_fn):
        with open(summary_fn) as f:
            summary = json.load(f)
    kde_cap = 2_000_000
    for k, fn in names.items():
        path = os.path.join(datadir, fn)
        if not os.path.exists(path):
            path = os.path.join(datadir, fn.replace(".npy", "_subsample.npy"))
        v = np.load(path, mmap_mode="r")
        sub = np.asarray(v[:: max(1, len(v) // kde_cap + 1)])
        finite_sub = sub[np.isfinite(sub)]
        if k in summary:
            # exact central order statistics from the device reducer
            medians[k] = round(float(summary[k]["median"]), 4)
        else:
            # median over the subsample (the full 576M median costs ~min;
            # the stride subsample is unbiased and stable to 4 decimals)
            medians[k] = round(float(np.median(finite_sub)), 4)
        if len(finite_sub):
            sns.kdeplot(finite_sub, label=labels[k])
    plt.xlabel("log spectral distance")
    plt.legend()
    sns.despine()
    plotdir = os.path.join(workdir, "plots")
    os.makedirs(plotdir, exist_ok=True)
    plt.savefig(os.path.join(
        plotdir, f"log_spectral_distances_n{n_lsd}.svg"))
    plt.close("all")

    with open(os.path.join(datadir, "crps_results.json")) as f:
        crps = json.load(f)

    verdict = {
        "peak_epoch": peak_epoch,
        "heldout_daily_cycle_corr": held_corr,
        "crps": {k: round(float(crps[k]), 5)
                 for k in ("gan", "random", "rainfarm")},
        "gan_beats_random": crps["gan"] < crps["random"],
        "gan_beats_rainfarm": crps["gan"] < crps["rainfarm"],
        "ttest_p_gan_vs_random": crps["ttest_p_gan_vs_random"],
        "bootstrap_diff_ci98": crps["bootstrap_diff"],
        "lsd_medians": medians,
        "lsd_gan_closer_to_obs_than_rainfarm":
            medians["between_gen_real"]
            < medians["between_gen_rainfarm_real"],
        "ks_frac_distinct_p05": ks_frac,
    }
    out = {"verdict": verdict}
    with open(os.path.join(workdir, "paper_protocol_summary.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(verdict, indent=2))


if __name__ == "__main__":
    main()
