"""Statistical metrics: ECDF, ensemble CRPS, radial power spectra, LSD.

TPU-native replacements for the reference's metric stack:

* `crps_ensemble` replaces `properscoring.crps_ensemble`
  (generate_and_evaluate_crps.py:189) with an O(M log M) sort-based estimator,
  vmappable over fields — the reference's 10,000 x 1,000-member protocol is a
  single batched device computation instead of a Python loop.
* `radial_spectrum` / `log_spectral_distance` replace the numba kernels
  (log_spectral_distance.py:19-76); the azimuthal binning is precomputed per
  field shape so per-field spectra are segment-sums and all-pairs distances
  are one broadcasted matrix op.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.utils.watchdog import beat_if_enabled


def ecdf(data: np.ndarray):
    """Empirical CDF, reference semantics (generate_and_evaluate.py:431-435)."""
    x = np.sort(np.asarray(data).ravel())
    y = np.arange(1, x.size + 1) / x.size
    return x, y


def ecdf_plot(data: np.ndarray, cap: int = 200_000):
    """ecdf() decimated to <= ~cap quantile-spaced vertices for PLOTTING.

    The reference plots the full-resolution ECDF of every flattened field
    (generate_and_evaluate.py:449-465) — at the 10k-sample protocol that is
    a 61M-vertex matplotlib path per curve, minutes of GIL-held host work
    on one core (which also starves the JAX dispatch thread; docs/PERF.md).
    A sorted stride is the same curve at any plottable resolution; the
    first and last points are kept so the curve still spans
    [min, max] x (~0, 1.0].  Numeric consumers keep using ecdf()."""
    x, y = ecdf(data)
    if len(x) > cap:
        step = len(x) // cap + 1
        x = np.concatenate([x[::step], x[-1:]])
        y = np.concatenate([y[::step], y[-1:]])
    return x, y


# ---------------------------------------------------------------------------
# CRPS
# ---------------------------------------------------------------------------

def crps_ensemble(observation: jax.Array, forecasts: jax.Array) -> jax.Array:
    """CRPS of an M-member ensemble against scalar observations.

    forecasts: (M, ...) ensemble along axis 0; observation: (...).
    Returns CRPS with the empirical (fair=False) estimator used by
    properscoring:  E|X - y| - 0.5 * E|X - X'|  with 1/M^2 weighting,
    computed via the sort identity
      sum_{i,j} |x_i - x_j| = 2 * sum_k (2k - M + 1) * x_(k).
    """
    m = forecasts.shape[0]
    term1 = jnp.mean(jnp.abs(forecasts - observation[None]), axis=0)
    # sort along the trailing (lane) axis — far faster on TPU than a
    # leading-axis sort of the same data
    xs = jnp.sort(jnp.moveaxis(forecasts, 0, -1), axis=-1)
    k = jnp.arange(m, dtype=jnp.float32)
    w = (2.0 * k - m + 1.0)
    # HIGHEST: the default TPU matmul precision multiplies in bfloat16,
    # which rounds the +-(M-1)-ranged weights and biases the spread term
    # (sorted forecasts correlate with the weights, so errors don't cancel)
    spread = jnp.tensordot(xs, w, axes=(-1, 0),
                           precision=jax.lax.Precision.HIGHEST) / (m * m)
    return term1 - spread


def crps_ensemble_fixed(observations: jax.Array,
                        forecasts: jax.Array) -> jax.Array:
    """CRPS of a FIXED ensemble against a batch of observations.

    Identical to vmapping :func:`crps_ensemble` over observations, but the
    spread term  0.5 * E|X - X'|  depends only on the forecasts, so the
    O(M log M) sort happens ONCE for the whole batch instead of per
    observation — the right shape for the reference's "random" baseline
    protocol, where one 5000-patch ensemble scores every test sample
    (generate_and_evaluate_crps.py:164-195).

    observations: (B, ...); forecasts: (M, ...).  Returns (B, ...).
    """
    m = forecasts.shape[0]
    xs = jnp.sort(jnp.moveaxis(forecasts, 0, -1), axis=-1)
    k = jnp.arange(m, dtype=jnp.float32)
    w = (2.0 * k - m + 1.0)
    # f32 contraction: see the precision note in crps_ensemble
    spread = jnp.tensordot(xs, w, axes=(-1, 0),
                           precision=jax.lax.Precision.HIGHEST) / (m * m)
    term1 = jnp.mean(
        jnp.abs(forecasts[None] - observations[:, None]), axis=1
    )  # (B, ...)
    return term1 - spread[None]


# ---------------------------------------------------------------------------
# Radial power spectrum + log-spectral distance
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _radial_bins(ny: int, nx: int):
    """Reproduces the reference azimuthal binning exactly
    (log_spectral_distance.py:19-56): integer-truncated radii around the
    center ((nx-1)/2, (nx-1)/2), group means via cumulative sums over the
    radius-sorted pixels, first group dropped.

    Returns (sort_order flat indices, group segment ids (n_groups,), counts).
    """
    y, x = np.indices((ny, nx))
    center = np.array([(x.max() - x.min()) / 2.0, (x.max() - x.min()) / 2.0])
    r = np.hypot(x - center[0], y - center[1])
    ind = np.argsort(r.flat)
    r_int = r.flat[ind].astype(int)

    deltar = r_int[1:] - r_int[:-1]
    rind = np.where(deltar)[0]              # last index of each radius group
    nr = rind[1:] - rind[:-1]               # sizes of groups 1..G-1

    # pixels contributing to output bin b are sorted positions rind[b]+1..rind[b+1]
    seg = np.full(ny * nx, -1, dtype=np.int64)
    for b in range(len(rind) - 1):
        seg[rind[b] + 1 : rind[b + 1] + 1] = b
    return ind.astype(np.int64), seg, nr.astype(np.float64)


def radial_spectrum(field: jax.Array) -> jax.Array:
    """Radially averaged 2-D power spectrum of one (ny, nx) field —
    parity with compute_radial_spectrum (log_spectral_distance.py:59-65)."""
    ny, nx = field.shape
    ind, seg, nr = _radial_bins(ny, nx)
    n_bins = len(nr)

    f = jnp.fft.fftshift(jnp.fft.fft2(field))
    psd = jnp.abs(f) ** 2
    psd_sorted = psd.reshape(-1)[jnp.asarray(ind)]
    seg_j = jnp.asarray(seg)
    valid = seg_j >= 0
    sums = jax.ops.segment_sum(
        jnp.where(valid, psd_sorted, 0.0),
        jnp.where(valid, seg_j, 0),
        num_segments=n_bins,
    )
    return sums / jnp.asarray(nr)


radial_spectra = jax.jit(jax.vmap(radial_spectrum))


def log_spectral_distance(ps1: jax.Array, ps2: jax.Array) -> jax.Array:
    """LSD between two power spectra (log_spectral_distance.py:68-76):
    sqrt(sum((10*log10(ps1/ps2))^2)) / n."""
    n = ps1.shape[-1]
    d = 10.0 * jnp.log10(ps1 / ps2)
    return jnp.sqrt(jnp.sum(d * d, axis=-1)) / n


@jax.jit
def pairwise_lsd(spectra_a: jax.Array, spectra_b: jax.Array) -> jax.Array:
    """All-pairs LSD matrix (Na, Nb) — replaces the numba O(n^2) loop
    (log_spectral_distance.py:104-115).

    d(i,j) = sqrt(sum_k (L_i[k] - L_j[k])^2) / n with L = 10*log10(ps), so
    the log-spectra are computed ONCE per spectrum (the per-pair form
    evaluates Na*Nb*nbins transcendentals — at the reference's 24k x 24k
    populations that is 5G log10 calls) and the pair matrix becomes one MXU
    GEMM via the Euclidean expansion |a|^2 + |b|^2 - 2ab, contracted at
    HIGHEST precision.  Both inputs are centered by a SHARED vector first —
    differences are invariant, but the norms shrink to O(spread), which
    keeps the f32 expansion's cancellation error far below the distances
    of interest.  Self-pairs land at ~0 (not exactly 0.0); population
    builders exclude them (pairwise_lsd_offdiag), and the exact-zero
    identity stays with the scalar `log_spectral_distance`."""
    la = 10.0 * jnp.log10(spectra_a)
    lb = 10.0 * jnp.log10(spectra_b)
    # the shared center must stay FINITE: one zero-bin spectrum (log10 ->
    # -inf) would otherwise poison the mean and with it every centered
    # spectrum — the direct form only loses that spectrum's own pairs
    center = jnp.mean(la, axis=0)
    center = jnp.where(jnp.isfinite(center), center, 0.0)
    la = la - center
    lb = lb - center
    sq_a = jnp.sum(la * la, axis=-1)
    sq_b = jnp.sum(lb * lb, axis=-1)
    cross = jax.lax.dot_general(
        la, lb, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq_a[:, None] + sq_b[None, :] - 2.0 * cross, 0.0)
    return jnp.sqrt(d2) / spectra_a.shape[-1]


def pairwise_lsd_offdiag(spectra_a: np.ndarray, spectra_b: np.ndarray,
                         block: int = 2048) -> np.ndarray:
    """Flattened all-pairs LSD values excluding same-index pairs, blocked
    to bound memory.

    DELIBERATE cleanup of the reference's exclusion logic (documented in
    docs/DESIGN.md §8): the reference skips i == j pairs in the distance
    loop (log_spectral_distance.py:104-110, leaving 0.0 placeholders) but
    its "diagonal" removal then deletes flat indices 0, n, 2n, ... — the
    first COLUMN, not the diagonal (:123-126) — so its saved arrays keep
    ~n-1 spurious zeros and drop n legitimate column-0 values.  Here the
    same-index pairs themselves are removed (for same-set inputs these are
    the self-distances the reference meant to drop; for between-set inputs
    they are exactly the pairs the reference's loop skipped), and no
    legitimate values are lost.
    """
    a = np.asarray(spectra_a)
    b = np.asarray(spectra_b)
    na, nb = len(a), len(b)
    out = []
    for i0 in range(0, na, block):
        hi = min(i0 + block, na)
        blk = np.asarray(pairwise_lsd(jnp.asarray(a[i0:hi]), jnp.asarray(b)))
        # drop the same-index entry of each row in one vectorized mask
        # (row-major flatten preserves the reference's row-then-column
        # ordering) instead of 24k np.delete copies per population
        rows = np.arange(i0, hi)
        keep = np.ones(blk.shape, dtype=bool)
        in_range = rows < nb
        keep[np.nonzero(in_range)[0], rows[in_range]] = False
        out.append(blk[keep])
        # each block is a confirmed device->host fetch: a natural liveness
        # beat for `cli supervise` (full populations run ~28 min on-chip)
        beat_if_enabled()
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Device-reduced pairwise-LSD population summary
# ---------------------------------------------------------------------------
#
# pairwise_lsd_offdiag fetches every block of the (Na, Nb) distance matrix to
# the host — at the reference's 24k x 24k populations that is ~2.3 GB of f32
# per population, and through the tunneled TPU link (~10 MB/s effective) the
# fetch, not the GEMM, dominates the battery's LSD stage (~27 min measured).
# The battery only consumes (a) the population median and (b) a bounded
# subsample for the KDE plot, so this path reduces ON DEVICE and fetches
# ~8 MB per population instead: the median is the EXACT pair of central
# order statistics, found by integer bisection on the float32 bit patterns
# (for non-negative floats the bit order IS the value order, so ~31
# count-passes over recomputed distance blocks converge to the exact data
# value — no 576M-element device sort, no O(Na*Nb) buffer).

def _lsd_log_center(la: jax.Array, n_real: int) -> jax.Array:
    """Shared finite-masked centering vector over the real (unpadded) rows —
    same role as the center in :func:`pairwise_lsd`."""
    rows = jnp.arange(la.shape[0]) < n_real
    center = jnp.sum(jnp.where(rows[:, None], la, 0.0), axis=0) / n_real
    return jnp.where(jnp.isfinite(center), center, 0.0)


@partial(jax.jit, static_argnames=("n_real", "block", "exclude_same"))
def _lsd_summary_device(a_pad: jax.Array, b: jax.Array, sub_rows: jax.Array,
                        sub_cols: jax.Array, *, n_real: int, block: int,
                        exclude_same: bool):
    nbins = a_pad.shape[-1]
    nb = b.shape[0]
    n_blocks = a_pad.shape[0] // block

    la = 10.0 * jnp.log10(a_pad)
    lb = 10.0 * jnp.log10(b)
    center = _lsd_log_center(la, n_real)
    la = la - center
    lb = lb - center
    sq_a = jnp.sum(la * la, axis=-1)
    sq_b = jnp.sum(lb * lb, axis=-1)
    col_ids = jnp.arange(nb)

    def block_dists(i):
        """(block, nb) distances + validity for row-block i — the same
        centered GEMM expansion as pairwise_lsd."""
        la_blk = jax.lax.dynamic_slice_in_dim(la, i * block, block)
        sqa_blk = jax.lax.dynamic_slice_in_dim(sq_a, i * block, block)
        cross = jax.lax.dot_general(
            la_blk, lb, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(sqa_blk[:, None] + sq_b[None, :] - 2.0 * cross, 0.0)
        d = jnp.sqrt(d2) / nbins
        rows = i * block + jnp.arange(block)
        valid = (rows[:, None] < n_real) & jnp.isfinite(d)
        if exclude_same:
            valid &= rows[:, None] != col_ids[None, :]
        return d, valid

    # counts accumulate in uint32: int64 is unavailable without x64, int32
    # overflows at 2^31 pairs (~1930 samples x 24 h); uint32 covers the full
    # 2^32 range the host-side guard in pairwise_lsd_summary enforces
    def stats_pass(i, carry):
        n_valid, total = carry
        d, valid = block_dists(i)
        return (n_valid + jnp.sum(valid, dtype=jnp.uint32),
                total + jnp.sum(jnp.where(valid, d, 0.0)))

    n_valid, total = jax.lax.fori_loop(
        0, n_blocks, stats_pass, (jnp.uint32(0), jnp.float32(0.0)))
    mean = total / jnp.maximum(n_valid, jnp.uint32(1))

    # the two central order statistics (0-based ranks), np.median semantics
    ks = jnp.stack([(n_valid - 1) // 2, n_valid // 2])

    def count_leq(t):
        """How many valid distances are <= each of the two thresholds."""
        def body(i, acc):
            d, valid = block_dists(i)
            return acc + jnp.sum(
                valid[:, :, None] & (d[:, :, None] <= t[None, None, :]),
                axis=(0, 1), dtype=jnp.uint32)
        return jax.lax.fori_loop(0, n_blocks, body, jnp.zeros(2, jnp.uint32))

    # bisect on int32 bit patterns: smallest bits v with
    # count_leq(float(v)) >= k+1 is exactly the k-th smallest data value
    inf_bits = jnp.int32(0x7F800000)  # bit pattern of float32 +inf

    def bisect_cond(state):
        lo, hi = state
        return jnp.any(lo < hi)

    def bisect_body(state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        counts = count_leq(jax.lax.bitcast_convert_type(mid, jnp.float32))
        found = counts >= ks + 1
        return (jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi))

    lo, _ = jax.lax.while_loop(
        bisect_cond, bisect_body,
        (jnp.zeros(2, jnp.int32), jnp.full((2,), inf_bits, jnp.int32)))
    med_pair = jax.lax.bitcast_convert_type(lo, jnp.float32)
    med_pair = jnp.where(n_valid > 0, med_pair, jnp.nan)

    # natural-order subsample of the kept population (per-pair expansion on
    # the same centered log-spectra; the KDE consumer filters nonfinite)
    la_s = la[sub_rows]
    lb_s = lb[sub_cols]
    cross_s = jnp.sum(la_s * lb_s, axis=-1)
    d2_s = jnp.maximum(sq_a[sub_rows] + sq_b[sub_cols] - 2.0 * cross_s, 0.0)
    sub = jnp.sqrt(d2_s) / nbins

    return med_pair, mean, n_valid, sub


def _check_pair_count_capacity(na: int, nb: int) -> None:
    """The device reducer accumulates pair counts in uint32 (int64 needs
    jax x64); na*nb == 2^32 - 1 is the largest representable population."""
    if na * nb >= 2**32:
        raise ValueError(
            f"population of {na}x{nb} pairs exceeds the device reducer's "
            "uint32 count capacity (2^32); split the populations or use the "
            "full-fetch path (reduction='full')")


def pairwise_lsd_summary(spectra_a: np.ndarray, spectra_b: np.ndarray,
                         subsample: int = 2_000_000, block: int = 2048,
                         exclude_same_index: bool = True) -> Dict[str, object]:
    """Device-reduced summary of the pairwise-LSD population of
    :func:`pairwise_lsd_offdiag` — median/mean/count over the FINITE kept
    values plus a natural-order subsample — without ever fetching (or
    materializing) the O(Na*Nb) matrix.

    The median matches ``np.median(v[np.isfinite(v)])`` of the full path's
    population: both central order statistics are recovered exactly by
    bit-pattern bisection (the distances themselves agree with the blocked
    full path to GEMM-reassociation rounding, ~1e-6 relative).

    Returns dict(median, mean, n_valid, subsample).
    """
    a = np.asarray(spectra_a, np.float32)
    b = np.asarray(spectra_b, np.float32)
    na, nb = len(a), len(b)
    n_excl = min(na, nb) if exclude_same_index else 0
    n_kept = na * nb - n_excl
    _check_pair_count_capacity(na, nb)
    m_sub = int(min(subsample, n_kept))

    # host-computed flat positions of an even stride over the kept values
    # (row-major, same ordering as pairwise_lsd_offdiag's concatenation)
    idx = np.floor(np.linspace(0, n_kept - 1, m_sub)).astype(np.int64)
    if exclude_same_index:
        boundary = n_excl * (nb - 1)
        in_excl = idx < boundary
        r = np.where(in_excl, idx // max(nb - 1, 1), 0)
        j = np.where(in_excl, idx % max(nb - 1, 1), 0)
        c = j + (j >= r)
        rem = idx - boundary
        r2 = n_excl + rem // nb
        c2 = rem % nb
        rows = np.where(in_excl, r, r2).astype(np.int32)
        cols = np.where(in_excl, c, c2).astype(np.int32)
    else:
        rows = (idx // nb).astype(np.int32)
        cols = (idx % nb).astype(np.int32)

    na_pad = int(-(-na // block)) * block
    a_pad = np.pad(a, ((0, na_pad - na), (0, 0)), constant_values=1.0)
    med_pair, mean, n_valid, sub = _lsd_summary_device(
        jnp.asarray(a_pad), jnp.asarray(b),
        jnp.asarray(rows), jnp.asarray(cols),
        n_real=na, block=block, exclude_same=exclude_same_index)
    med_pair = np.asarray(med_pair)
    beat_if_enabled()
    return {
        "median": float(np.mean(med_pair)),  # np.median's central average
        "mean": float(mean),
        "n_valid": int(n_valid),
        "subsample": np.asarray(sub),
    }
