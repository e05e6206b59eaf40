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
    """
    reals_j = jnp.asarray(reals)
    dsums = jnp.sum(reals_j, axis=1)

    def one(real, dsum, key):
        ens = downscale_ensemble(dsum, alpha, beta, cfg.ds_t_factor, key, n_members)
        crps = crps_ensemble(real, ens)
        return jnp.mean(crps, axis=(1, 2))

    score_chunk = jax.jit(jax.vmap(one))
    chunk = 8
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
        outs.append(np.asarray(score_chunk(r, d, k)[:c]))
    out = np.concatenate(outs)
    if outfile:
        os.makedirs(os.path.dirname(outfile) or ".", exist_ok=True)
        with open(outfile, "wb") as f:
            pickle.dump(out, f)
    return out
