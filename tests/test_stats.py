import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import fftpack

from prdisagg_tpu.ops.stats import (
    crps_ensemble,
    ecdf,
    log_spectral_distance,
    pairwise_lsd,
    pairwise_lsd_offdiag,
    pairwise_lsd_summary,
    radial_spectra,
    radial_spectrum,
)


def _crps_bruteforce(obs, ens):
    # direct double-loop estimator: E|X-y| - 0.5/M^2 sum_ij |x_i - x_j|
    m = len(ens)
    t1 = np.mean(np.abs(ens - obs))
    t2 = 0.0
    for i in range(m):
        for j in range(m):
            t2 += abs(ens[i] - ens[j])
    return t1 - 0.5 * t2 / m**2

# whole module is part of the quick smoke tier (VERDICT r4 item 8)
pytestmark = pytest.mark.quick

def test_crps_matches_bruteforce_scalar():
    rng = np.random.RandomState(0)
    for _ in range(5):
        ens = rng.gamma(2.0, 1.5, size=17)
        obs = rng.gamma(2.0, 1.5)
        got = float(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens)))
        want = _crps_bruteforce(obs, ens)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_crps_vectorized_over_fields():
    rng = np.random.RandomState(1)
    obs = rng.rand(24, 8, 8).astype(np.float32)
    ens = rng.rand(50, 24, 8, 8).astype(np.float32)
    got = np.asarray(crps_ensemble(jnp.asarray(obs), jnp.asarray(ens)))
    assert got.shape == (24, 8, 8)
    # spot-check a few cells against brute force
    for idx in [(0, 0, 0), (12, 3, 4), (23, 7, 7)]:
        want = _crps_bruteforce(obs[idx], ens[(slice(None), *idx)])
        np.testing.assert_allclose(got[idx], want, rtol=1e-4)


def test_crps_perfect_ensemble_better_than_bad():
    rng = np.random.RandomState(2)
    obs = np.float32(1.0)
    good = rng.normal(1.0, 0.1, 1000).astype(np.float32)
    bad = rng.normal(5.0, 0.1, 1000).astype(np.float32)
    assert float(crps_ensemble(jnp.asarray(obs), jnp.asarray(good))) < float(
        crps_ensemble(jnp.asarray(obs), jnp.asarray(bad))
    )


def _reference_azimuthal_average(image):
    """Literal re-statement of the reference binning
    (log_spectral_distance.py:19-56) as the test oracle."""
    y, x = np.indices(image.shape)
    center = np.array([(x.max() - x.min()) / 2.0, (x.max() - x.min()) / 2.0])
    r = np.hypot(x - center[0], y - center[1])
    ind = np.argsort(r.flat)
    r_sorted = r.flat[ind]
    i_sorted = image.flat[ind]
    r_int = r_sorted.astype(int)
    deltar = r_int[1:] - r_int[:-1]
    rind = np.where(deltar)[0]
    nr = rind[1:] - rind[:-1]
    csim = np.cumsum(i_sorted, dtype=float)
    tbin = csim[rind[1:]] - csim[rind[:-1]]
    return tbin / nr


def _reference_radial_spectrum(x):
    f1 = fftpack.fft2(x)
    f2 = fftpack.fftshift(f1)
    psd2d = np.abs(f2) ** 2
    return _reference_azimuthal_average(psd2d)


def test_radial_spectrum_matches_reference():
    rng = np.random.RandomState(3)
    for shape in [(16, 16), (8, 8), (64, 64)]:
        x = rng.rand(*shape).astype(np.float32)
        got = np.asarray(radial_spectrum(jnp.asarray(x)))
        want = _reference_radial_spectrum(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3)


def test_radial_spectra_vmapped():
    rng = np.random.RandomState(4)
    xs = rng.rand(10, 16, 16).astype(np.float32)
    got = np.asarray(radial_spectra(jnp.asarray(xs)))
    for i in range(10):
        np.testing.assert_allclose(
            got[i], _reference_radial_spectrum(xs[i]), rtol=1e-3
        )


def test_lsd_matches_reference_formula():
    rng = np.random.RandomState(5)
    ps1 = rng.rand(11).astype(np.float64) + 0.1
    ps2 = rng.rand(11).astype(np.float64) + 0.1
    got = float(log_spectral_distance(jnp.asarray(ps1), jnp.asarray(ps2)))
    want = np.sqrt(np.sum((10 * np.log10(ps1 / ps2)) ** 2)) / len(ps1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical spectra -> zero
    assert float(log_spectral_distance(jnp.asarray(ps1), jnp.asarray(ps1))) == 0.0


def test_pairwise_lsd_and_offdiag():
    rng = np.random.RandomState(6)
    a = rng.rand(7, 11) + 0.1
    b = rng.rand(7, 11) + 0.1
    mat = np.asarray(pairwise_lsd(jnp.asarray(a), jnp.asarray(b)))
    assert mat.shape == (7, 7)
    flat = pairwise_lsd_offdiag(a, b, block=3)
    assert flat.shape == (7 * 7 - 7,)
    want = np.concatenate([np.delete(mat[i], i) for i in range(7)])
    np.testing.assert_allclose(flat, want, rtol=1e-6)


def test_pairwise_lsd_matches_direct_formula():
    """The GEMM-expansion pairwise matrix must match the direct per-pair
    LSD evaluation (the round-4 restructure changes only the computation:
    shared log-spectra + MXU contraction instead of Na*Nb*nbins
    transcendentals)."""
    rng = np.random.RandomState(12)
    a = (rng.rand(9, 11) + 0.05).astype(np.float32)
    b = (rng.rand(6, 11) + 0.05).astype(np.float32)
    got = np.asarray(pairwise_lsd(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(
        jax.vmap(lambda x: jax.vmap(
            lambda y: log_spectral_distance(x, y))(jnp.asarray(b)))(
            jnp.asarray(a)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
    # same-set: the near-zero diagonal never reaches populations (offdiag
    # excludes same-index pairs), but it must at least be tiny and finite
    mat = np.asarray(pairwise_lsd(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(np.diag(mat) < 1e-3)


def test_pairwise_lsd_summary_matches_full_path():
    """The device reduction must reproduce the full-fetch path: exact
    n_valid, median/mean over finite kept values (bit-bisection order
    statistics vs np.median), and — at an uncapped subsample — the whole
    population, including the odd-block-size and na!=nb shapes."""
    rng = np.random.RandomState(7)
    for na, nb, block in [(7, 7, 3), (9, 6, 4), (6, 9, 3), (8, 8, 8)]:
        a = (rng.rand(na, 11) + 0.1).astype(np.float32)
        b = a if na == nb else (rng.rand(nb, 11) + 0.1).astype(np.float32)
        full = pairwise_lsd_offdiag(a, b, block=block)
        s = pairwise_lsd_summary(a, b, subsample=10**9, block=block)
        finite = full[np.isfinite(full)]
        assert s["n_valid"] == len(finite)
        np.testing.assert_allclose(s["median"], np.median(finite), rtol=2e-5)
        np.testing.assert_allclose(s["mean"], finite.mean(), rtol=1e-4)
        np.testing.assert_allclose(np.sort(s["subsample"]), np.sort(full),
                                   rtol=2e-5, atol=1e-6)


def test_pairwise_lsd_summary_nonfinite_and_cap():
    """Nonfinite distances (zero-bin spectra) are excluded from the median
    exactly as the battery's np.median(v[np.isfinite(v)]) excludes them,
    and the subsample cap bounds the fetched size."""
    rng = np.random.RandomState(8)
    a = (np.full((5, 6), 2.0) + rng.rand(5, 6) * 0.5).astype(np.float32)
    a[1, 2] = 0.0  # log10 -> -inf poisons every pair of spectrum 1
    full = pairwise_lsd_offdiag(a, a, block=2)
    finite = full[np.isfinite(full)]
    s = pairwise_lsd_summary(a, a, subsample=10**9, block=2)
    assert s["n_valid"] == len(finite) < len(full)
    np.testing.assert_allclose(s["median"], np.median(finite), rtol=2e-5)
    capped = pairwise_lsd_summary(a, a, subsample=7, block=2)
    assert capped["subsample"].shape == (7,)
    assert capped["n_valid"] == s["n_valid"]


def test_pairwise_lsd_summary_capacity_guard():
    """Populations beyond the uint32 count capacity (2^32 pairs) must raise
    loudly before any device work — silent int wraparound here would return
    plausible-looking garbage medians (the counters accumulate in uint32
    because int64 is unavailable without jax x64)."""
    from prdisagg_tpu.ops.stats import _check_pair_count_capacity

    n = 65_536  # n*n == 2^32 exactly
    a = np.ones((n, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="uint32 count capacity"):
        pairwise_lsd_summary(a, a, subsample=8)
    # boundary, on the extracted check (running a just-under-capacity
    # reduction would cost ~4e9 pairs — the guard itself is host-side):
    with pytest.raises(ValueError, match="uint32 count capacity"):
        _check_pair_count_capacity(2**16, 2**16)          # == 2^32
    _check_pair_count_capacity(2**16 - 1, 2**16 + 1)      # == 2^32 - 1
    _check_pair_count_capacity(2**16, 2**16 - 1)
    # and an in-capacity end-to-end call still passes the guard
    pairwise_lsd_summary(a[:64], a[:64], subsample=8)


def test_pairwise_lsd_zero_bin_nonfinite():
    """A spectrum with a zero bin must yield nonfinite distances for all of
    its pairs (run_lsd_evaluation filters nonfinite values before stats) —
    in both the direct and the GEMM form, log10(0) poisons that spectrum."""
    a = np.full((3, 5), 2.0, dtype=np.float32)
    a[1, 2] = 0.0
    mat = np.asarray(pairwise_lsd(jnp.asarray(a), jnp.asarray(a)))
    assert not np.any(np.isfinite(mat[1, [0, 2]]))
    assert not np.any(np.isfinite(mat[[0, 2], 1]))
    # pairs not involving the poisoned spectrum stay finite
    assert np.isfinite(mat[0, 2]) and np.isfinite(mat[2, 0])


def test_ecdf():
    x, y = ecdf(np.array([3.0, 1.0, 2.0]))
    np.testing.assert_array_equal(x, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(y, [1 / 3, 2 / 3, 1.0])


def test_ecdf_plot_decimation():
    from prdisagg_tpu.ops.stats import ecdf_plot

    rng = np.random.RandomState(3)
    data = rng.rand(1000)
    # under the cap: identical to ecdf()
    x, y = ecdf_plot(data, cap=2000)
    xf, yf = ecdf(data)
    np.testing.assert_array_equal(x, xf)
    np.testing.assert_array_equal(y, yf)
    # over the cap: a sorted stride that keeps the [min, max] x (.., 1.0]
    # span, every point an actual ECDF vertex
    x, y = ecdf_plot(data, cap=100)
    assert len(x) <= 102 and len(x) == len(y)
    assert x[0] == xf[0] and x[-1] == xf[-1] and y[-1] == 1.0
    assert np.all(np.diff(x) >= 0)
    assert np.all(np.isin(x, xf))


def test_crps_ensemble_fixed_matches_per_sample():
    """The fixed-ensemble batched form (spread computed once) must equal
    vmapping the per-sample estimator over observations."""
    from prdisagg_tpu.ops.stats import crps_ensemble, crps_ensemble_fixed

    rng = np.random.RandomState(19)
    obs = jnp.asarray(rng.gamma(2.0, 1.0, size=(5, 6, 4, 4)).astype("f4"))
    ens = jnp.asarray(rng.gamma(2.0, 1.0, size=(32, 6, 4, 4)).astype("f4"))
    fixed = crps_ensemble_fixed(obs, ens)
    per = jnp.stack([crps_ensemble(obs[i], ens) for i in range(5)])
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(per),
                               rtol=1e-5, atol=1e-6)


def test_crps_hand_derived_golden_values():
    """Independent-provenance golden values (VERDICT round-4 item 6).

    properscoring isn't installable here (no egress), so these constants
    are derived BY HAND from the definition CRPS = integral (F_ens(x) -
    1{x >= y})^2 dx, each verifiable with pencil and paper (exact
    fractions); properscoring.crps_ensemble
    (generate_and_evaluate_crps.py:189) computes this same integral.

      1. ens=[0,1], y=0.5: (0.5)^2 on [0,0.5) + (0.5)^2 on [0.5,1) = 1/4
      2. ens=[0,1], y=2:   (0.5)^2 on [0,1) + 1 on [1,2)          = 5/4
      3. ens=[1],   y=3:   deterministic forecast -> |1-3|         = 2
      4. ens=[0,0,0], y=0: perfect forecast                        = 0
      5. ens=[1,2,3,4], y=2.5: E|X-y|=1, spread=20/32              = 3/8
      6. ens=[0.1,0.5,0.9], y=0.3: 1/3 - 8/45                      = 7/45
    """
    cases = [
        ([0.0, 1.0], 0.5, 0.25),
        ([0.0, 1.0], 2.0, 1.25),
        ([1.0], 3.0, 2.0),
        ([0.0, 0.0, 0.0], 0.0, 0.0),
        ([1.0, 2.0, 3.0, 4.0], 2.5, 0.375),
        ([0.1, 0.5, 0.9], 0.3, 7.0 / 45.0),
    ]
    from prdisagg_tpu.ops.stats import crps_ensemble_fixed

    for ens, y, want in cases:
        got = float(crps_ensemble(jnp.asarray(y),
                                  jnp.asarray(np.asarray(ens, np.float32))))
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"ens={ens} y={y}")
        # the fixed-ensemble variant must agree on the same constants
        gotf = float(crps_ensemble_fixed(
            jnp.asarray(np.asarray([y], np.float32)),
            jnp.asarray(np.asarray(ens, np.float32)))[0])
        np.testing.assert_allclose(gotf, want, atol=1e-6)
