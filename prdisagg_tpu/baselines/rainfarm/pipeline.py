"""RainFARM drivers: calibration, generation, CRPS scoring.

Mirrors the reference chain rainfarm_calibrate.py -> rainfarm_generate.py ->
rainfarm_generate_crps.py with device-batched generation.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import RainFarmConfig
from prdisagg_tpu.baselines.rainfarm.core import (
    downscale_ensemble,
    downscale_spatiotemporal,
    estimate_alpha,
    estimate_beta,
)
from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.ops.stats import crps_ensemble
from prdisagg_tpu.utils.watchdog import beat_if_enabled


def calibrate(
    ds: DeviceDataset,
    cfg: RainFarmConfig,
    outdir: str = "data",
    save_calibration_batch: bool = True,
):
    """Estimate (alpha, beta) over cfg.n_repeat independent 5000-patch draws
    (rainfarm_calibrate.py:66-98).  Saves spectral_slopes_{i}.pkl per repeat
    and the repeat-0 batch as rainfarm_calibration_data.npy (the "random"
    CRPS baseline of generate_and_evaluate_crps.py:164).

    Returns list of (alpha, beta).
    """
    os.makedirs(outdir, exist_ok=True)
    key = jax.random.PRNGKey(cfg.seed)
    slopes = []
    for i in range(cfg.n_repeat):
        key, sub = jax.random.split(key)
        batch = np.asarray(ds.sample_patches_raw(sub, cfg.n_calib))
        assert not np.any(np.isnan(batch))
        alpha = estimate_alpha(batch)
        beta = estimate_beta(batch)
        slopes.append((alpha, beta))
        with open(os.path.join(outdir, f"spectral_slopes_{i}.pkl"), "wb") as f:
            pickle.dump((alpha, beta), f)
        if i == 0 and save_calibration_batch:
            np.save(os.path.join(outdir, "rainfarm_calibration_data.npy"), batch)
    return slopes


def generate_for_daily_sums(
    daily_sums: np.ndarray,
    alpha: float,
    beta: float,
    cfg: RainFarmConfig,
    seed: int = 0,
) -> np.ndarray:
    """One realization per daily-sum field (rainfarm_generate.py:23)."""
    dsums = jnp.asarray(daily_sums)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(dsums))
    out = jax.vmap(
        lambda d, k: downscale_spatiotemporal(d, alpha, beta, cfg.ds_t_factor, k)
    )(dsums, keys)
    return np.asarray(out)


def generate_and_plot(
    reals: np.ndarray,
    alpha: float,
    beta: float,
    cfg: RainFarmConfig,
    plotdir: str = "plots_generated_rainfarm",
    datadir: str = "data",
    n_map_conditions: int = 20,
    n_fake_per_real: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """RainFARM generation evaluation artifacts (rainfarm_generate.py:30-156).

    Produces, under `plotdir` (artifact-name parity with the reference's
    plots_generated_rainfarm/):
      * ecdf_allx_rainfarm.png / ecdf_rainfarm.png — two-panel ECDFs of the
        hourly area means and the flattened fields, full-range and zoomed;
      * generated_precip_rainfarm_{i:04d}_allhours.png and
        generated_precip_rainfarm_{i:04d}.png (every 3rd hour) — map grids of
        one real day vs `n_fake_per_real` RainFARM realizations;
    and saves one realization per real day as
    `datadir`/generated_samples_rainfarm.npy (rainfarm_generate.py:25).

    reals: (n, nhours, ny, nx) mm/h hourly fields. Returns the generated
    (n, nhours, ny, nx) array.
    """
    import matplotlib.pyplot as plt
    import seaborn as sns

    from prdisagg_tpu.ops.stats import ecdf_plot
    from prdisagg_tpu.utils.plotting import close_all, map_comparison_grid

    os.makedirs(plotdir, exist_ok=True)
    os.makedirs(datadir, exist_ok=True)
    reals = np.asarray(reals)
    dsums = reals.sum(axis=1)

    generated = generate_for_daily_sums(dsums, alpha, beta, cfg, seed=seed)
    np.save(os.path.join(datadir, "generated_samples_rainfarm.npy"), generated)

    # two-panel ECDFs, full-range then zoomed (rainfarm_generate.py:38-65)
    sns.set_palette("colorblind")
    plt.figure()
    ax1 = plt.subplot(211)
    plt.plot(*ecdf_plot(generated.mean(axis=(2, 3))), label="gen")
    plt.plot(*ecdf_plot(reals.mean(axis=(2, 3))), label="real")
    plt.legend(loc="upper left")
    sns.despine()
    plt.xlabel("mm/h")
    plt.ylabel("ecdf areamean")
    plt.semilogx()
    ax2 = plt.subplot(212)
    plt.plot(*ecdf_plot(generated), label="gen")
    plt.plot(*ecdf_plot(reals), label="real")
    plt.legend(loc="upper left")
    sns.despine()
    plt.ylabel("ecdf")
    plt.xlabel("mm/h")
    plt.semilogx()
    plt.tight_layout()
    plt.savefig(os.path.join(plotdir, "ecdf_allx_rainfarm.png"), dpi=200)
    ax1.set_xlim(xmin=0.5)
    ax1.set_ylim(ymin=0.8, ymax=1.01)
    ax2.set_xlim(xmin=0.1)
    ax2.set_ylim(ymin=0.6, ymax=1.01)
    plt.savefig(os.path.join(plotdir, "ecdf_rainfarm.png"), dpi=200)
    close_all()

    # per-condition map grids: real hours vs n_fake_per_real realizations
    # (rainfarm_generate.py:71-156; gist_earth_r + LogNorm(0.01, 50))
    n_map = min(n_map_conditions, len(reals))
    key = jax.random.PRNGKey(seed + 1)
    for i in range(n_map):
        beat_if_enabled()  # liveness for `cli supervise`
        key, sub = jax.random.split(key)
        ens = np.asarray(jax.vmap(
            lambda k: downscale_spatiotemporal(
                jnp.asarray(dsums[i]), alpha, beta, cfg.ds_t_factor, k)
        )(jax.random.split(sub, n_fake_per_real)))
        for every, suffix in ((1, "_allhours"), (3, "")):
            fig = map_comparison_grid(
                reals[i], ens, dsums[i], fractions=False, every=every,
            )
            fig.savefig(os.path.join(
                plotdir,
                f"generated_precip_rainfarm_{i + 1:04d}{suffix}.png",
            ))
            close_all()
    return generated


def crps_rainfarm(
    reals: np.ndarray,
    alpha: float,
    beta: float,
    cfg: RainFarmConfig,
    n_members: int = 1000,
    seed: int = 0,
    outfile: str | None = None,
) -> np.ndarray:
    """Area-mean per-hour CRPS of n_members RainFARM ensembles against each
    real hourly field (rainfarm_generate_crps.py:23-36).

    reals: (n, nhours, ny, nx) mm/h. Returns (n, nhours).

    Round 2: samples are scanned ON DEVICE (`lax.scan` over `chunk` samples
    per jitted call) instead of vmapped — a vmap stages `chunk` full
    ensembles in HBM at once (~196 MB at 8x1000 members) while the scan
    keeps exactly ONE live, and results are fetched once per chunk.  Same
    per-sample keys as the round-1 form => identical values.
    """
    reals_j = jnp.asarray(reals)
    dsums = jnp.sum(reals_j, axis=1)

    def one(real, dsum, key):
        ens = downscale_ensemble(dsum, alpha, beta, cfg.ds_t_factor, key, n_members)
        crps = crps_ensemble(real, ens)
        return jnp.mean(crps, axis=(1, 2))

    def score_chunk(r, d, k):
        def body(_, x):
            return None, one(*x)

        _, rows = jax.lax.scan(body, None, (r, d, k))
        return rows

    score = jax.jit(score_chunk)
    chunk = 50
    n = len(reals)
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    outs = []
    for i0 in range(0, n, chunk):
        c = min(chunk, n - i0)
        r, d, k = reals_j[i0 : i0 + c], dsums[i0 : i0 + c], keys[i0 : i0 + c]
        if c < chunk:  # pad tail to reuse the compiled chunk shape
            r = jnp.concatenate([r, jnp.ones((chunk - c, *r.shape[1:]))])
            d = jnp.concatenate([d, jnp.ones((chunk - c, *d.shape[1:]))])
            k = jnp.concatenate([k, k[-1:].repeat(chunk - c, axis=0)])
        outs.append(score(r, d, k)[:c])  # device arrays: no per-chunk sync
        beat_if_enabled()
    out = np.concatenate([np.asarray(o) for o in outs])
    if outfile:
        os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
        with open(outfile, "wb") as f:
            pickle.dump(out, f)
    return out
