"""RainFARM spatiotemporal stochastic downscaling — the non-ML baseline.

Re-implementation of the reference's adapted RainFARM
(rainfarm/rainfarm_temporal_downscaling.py): calibrate spatial (alpha) and
temporal (beta) spectral slopes from training patches, then synthesize hourly
fields from a daily sum via random-phase Fourier noise shaped by the power law
sqrt(om^-beta * k^2^(-alpha/2)), exponentiated and rescaled so the
per-gridpoint time-sum exactly equals the daily field — the same conservation
property as the GAN's hour-softmax.

The generation hot path (one 3-D FFT per realization,
rainfarm_temporal_downscaling.py:103-125) is jitted and vmapped over
realizations: the reference's 10,000 x 1,000-member CRPS protocol becomes
batched device FFTs instead of a Python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _log_slope(log_k: np.ndarray, log_ps: np.ndarray) -> float:
    """Slope of the middle-2/3 log-log fit, sign-flipped
    (rainfarm_temporal_downscaling.py:6-19)."""
    lk_min, lk_max = log_k.min(), log_k.max()
    lk_range = lk_max - lk_min
    lo = lk_min + lk_range / 6.0
    hi = lk_max - lk_range / 6.0
    sel = (log_k >= lo) & (log_k <= hi)
    slope = np.polyfit(log_k[sel], log_ps[sel], 1)[0]
    return float(-slope)


def estimate_beta(p_samples: np.ndarray) -> float:
    """Temporal spectral slope from samples (n, n_t, ny, nx)
    (rainfarm_temporal_downscaling.py:22-51)."""
    p = np.asarray(p_samples)
    n_t = p.shape[1]
    fp = np.fft.fft(p, axis=1)
    log_ps = np.log(np.abs(fp) ** 2)
    om = np.abs(2 * np.pi * np.fft.fftfreq(n_t))
    om_full = np.broadcast_to(om[None, :, None, None], p.shape)
    valid = (om_full != 0) & np.isfinite(log_ps)
    return _log_slope(np.log(om_full[valid]), log_ps[valid])


def estimate_alpha(p_samples: np.ndarray) -> float:
    """Spatial spectral slope from samples (n, n_t, ny, nx)
    (rainfarm_temporal_downscaling.py:54-81)."""
    p = np.asarray(p_samples)
    ni, nj = p.shape[2], p.shape[3]
    fp = np.fft.fftn(p, axes=(2, 3))
    log_ps = np.log(np.abs(fp) ** 2)
    ki = np.fft.fftfreq(ni)
    kj = np.fft.fftfreq(nj)
    k = np.sqrt(ki[:, None] ** 2 + kj[None, :] ** 2)
    k_full = np.broadcast_to(k[None, None], p.shape)
    valid = (k_full != 0) & np.isfinite(log_ps)
    return _log_slope(np.log(k_full[valid]), log_ps[valid])


@jax.jit
def _downscale_from_phase(
    precip: jax.Array,
    alpha: float,
    beta: float,
    phase: jax.Array,
) -> jax.Array:
    """Deterministic core given uniform phases (n_t, ny, nx) in [0, 1)."""
    ny, nx = precip.shape
    n_t = phase.shape[0]

    ki = jnp.fft.fftfreq(ny)
    kj = jnp.fft.fftfreq(nx)
    k_sqr = ki[:, None] ** 2 + kj[None, :] ** 2
    om = (2 * jnp.pi * jnp.fft.fftfreq(n_t)).astype(jnp.complex64)

    phi = jnp.exp(1j * 2 * jnp.pi * phase)

    # power-law amplitude with the zero-wavenumber positions masked BEFORE the
    # multiply (the reference computes inf/nan there and overwrites after,
    # :104-115; under XLA we mask to keep everything finite)
    om_safe = jnp.where(jnp.arange(n_t)[:, None, None] == 0, 1.0 + 0j, om[:, None, None])
    k_safe = jnp.where(k_sqr == 0.0, 1.0, k_sqr)[None]
    amp = jnp.sqrt(om_safe ** (-beta) * k_safe ** (-alpha / 2.0))
    mask_t = (jnp.arange(n_t) != 0)[:, None, None]
    mask_k = (k_sqr != 0.0)[None]
    fg = phi * amp * mask_t * mask_k

    g = jnp.fft.ifftn(fg, axes=(0, 1, 2)).real
    g = g / jnp.std(g)
    r = jnp.exp(g)
    r_tsum = jnp.sum(r, axis=0)
    return r * precip[None] / r_tsum[None]


@partial(jax.jit, static_argnames=("ds_t_factor",))
def downscale_spatiotemporal(
    precip: jax.Array,
    alpha: float,
    beta: float,
    ds_t_factor: int,
    key: jax.Array,
) -> jax.Array:
    """One stochastic hourly realization from a daily-sum field.

    precip: (ny, nx) daily sums. Returns (ds_t_factor, ny, nx) with
    per-gridpoint time-sum == precip (rainfarm_temporal_downscaling.py:84-127).
    """
    phase = jax.random.uniform(key, (ds_t_factor, *precip.shape))
    return _downscale_from_phase(precip, alpha, beta, phase)


def estimate_alpha_single(precip: np.ndarray) -> float:
    """Spatial slope from one 2-D field (rainfarm_pysteps.py:86-91)."""
    p = np.asarray(precip)
    ki = np.fft.fftfreq(p.shape[0])
    kj = np.fft.fftfreq(p.shape[1])
    k = np.sqrt(ki[:, None] ** 2 + kj[None, :] ** 2)
    log_ps = np.log(np.abs(np.fft.fft2(p)) ** 2)
    valid = (k != 0) & np.isfinite(log_ps)
    return _log_slope(np.log(k[valid]), log_ps[valid])


def _balanced_spatial_average(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """convolve(x, k) / convolve(ones, k) with ndimage 'reflect' boundaries
    (rainfarm_pysteps.py:34-36)."""
    rad = kernel.shape[0] // 2
    xp = jnp.pad(x, rad, mode="symmetric")  # == scipy.ndimage mode='reflect'
    k4 = kernel[None, None, ::-1, ::-1]     # ndimage convolve flips the kernel

    def conv(a):
        return jax.lax.conv_general_dilated(
            a[None, None], k4, (1, 1), "VALID"
        )[0, 0]

    return conv(xp) / conv(jnp.ones_like(xp))


@partial(jax.jit, static_argnames=("ds_factor",))
def downscale_spatial(
    precip: jax.Array,
    alpha: float,
    ds_factor: int,
    key: jax.Array,
) -> jax.Array:
    """Pure spatial RainFARM downscaling (Rebora 2006; pysteps port at
    rainfarm_pysteps.py:39-125): (m, n) rain-rate field ->
    (m*ds_factor, n*ds_factor), conserving tophat-window local averages.

    Estimate alpha beforehand with `estimate_alpha_single` when unknown.
    """
    m, n = precip.shape
    md, nd_ = m * ds_factor, n * ds_factor
    ki = jnp.fft.fftfreq(md, d=1.0 / ds_factor)
    kj = jnp.fft.fftfreq(nd_, d=1.0 / ds_factor)
    k_sqr = ki[:, None] ** 2 + kj[None, :] ** 2

    phase = jax.random.uniform(key, (md, nd_))
    phi = jnp.exp(1j * 2 * jnp.pi * phase)
    k_safe = jnp.where(k_sqr == 0.0, 1.0, k_sqr)
    fg = phi * jnp.sqrt(k_safe ** (-alpha / 2.0)) * (k_sqr != 0.0)

    g = jnp.fft.ifft2(fg).real
    g = g / jnp.std(g)
    r = jnp.exp(g)

    p_u = jnp.repeat(jnp.repeat(precip, ds_factor, axis=0), ds_factor, axis=1)
    rad = int(round(ds_factor / np.sqrt(np.pi)))
    mx, my = np.mgrid[-rad : rad + 0.01, -rad : rad + 0.01]
    tophat = ((mx**2 + my**2) <= rad**2).astype(np.float32)
    tophat = jnp.asarray(tophat / tophat.sum())

    p_agg = _balanced_spatial_average(p_u, tophat)
    r_agg = _balanced_spatial_average(r, tophat)
    return r * p_agg / r_agg


def downscale_ensemble(
    precip: jax.Array,
    alpha: float,
    beta: float,
    ds_t_factor: int,
    key: jax.Array,
    n_members: int,
) -> jax.Array:
    """(n_members, ds_t_factor, ny, nx) vmapped realizations."""
    keys = jax.random.split(key, n_members)
    return jax.vmap(
        lambda k: downscale_spatiotemporal(precip, alpha, beta, ds_t_factor, k)
    )(keys)
