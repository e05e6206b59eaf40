"""Tests of the statistical-parity harness against the reference's published
artifacts (read-only under /root/reference)."""

import glob
import os

import numpy as np
import pytest

from prdisagg_tpu.eval.parity import (
    compare_ks_pvalue_populations,
    daily_cycle_band_check,
    fraction_cycle_from_csvs,
    ks_pvalue_population_summary,
    load_reference_conditional_fractions,
    load_reference_ks_pvalues,
)

REF_DIR = "/root/reference/plots_generated_wgancp_pixelnorm"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference artifacts not mounted"
)


@needs_ref
def test_load_reference_ks_pvalues():
    pvals = load_reference_ks_pvalues(REF_DIR)
    assert pvals.shape[1] == 24
    assert pvals.shape[0] >= 10
    assert np.all((pvals >= 0) & (pvals <= 1))
    summ = ks_pvalue_population_summary(pvals)
    assert 0 <= summ["frac_below_0.05"] <= 1
    # published model: conditions DO change the distribution for a sizable
    # share of hours
    assert summ["frac_below_0.05"] > 0.1


@needs_ref
def test_load_reference_conditional_fractions():
    csvs = sorted(glob.glob(os.path.join(
        REF_DIR, "check_conditional_dist_samenoise_2*.csv")))
    assert csvs
    fr = load_reference_conditional_fractions(csvs[0])
    assert set(fr) == {1, 2}
    assert fr[1].shape == (1000, 24)
    # generated fractions average 1/24 per hour over the day
    np.testing.assert_allclose(fr[1].sum(axis=1).mean(), 1.0, rtol=0.05)


@needs_ref
def test_reference_self_comparison_passes():
    """The harness must declare the reference indistinguishable from itself
    when split in half."""
    pvals = load_reference_ks_pvalues(REF_DIR)
    half = len(pvals) // 2
    res = compare_ks_pvalue_populations(pvals[:half], pvals[half:])
    assert res["p_match"] > 0.001

    csvs = sorted(glob.glob(os.path.join(
        REF_DIR, "check_conditional_dist_samenoise_2*.csv")))
    c1 = fraction_cycle_from_csvs(csvs[: len(csvs) // 2])
    c2 = fraction_cycle_from_csvs(csvs[len(csvs) // 2 :])
    band = daily_cycle_band_check(c1, c2, rtol=0.5)
    assert band["correlation"] > 0.9


def test_band_check_rejects_flat_cycle():
    ref = 1 / 24 + 0.02 * np.sin(2 * np.pi * np.arange(24) / 24)
    flat = np.full(24, 1 / 24)
    band = daily_cycle_band_check(flat, ref)
    assert not band["passes"] or band["correlation"] < 0.9
