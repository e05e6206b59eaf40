import numpy as np
import pytest

from prdisagg_tpu.core.config import DataConfig
from prdisagg_tpu.data.indices import compute_valid_indices_bruteforce
from prdisagg_tpu.data.native import (
    compute_valid_indices_native,
    extract_patch_store,
    gather_patches_native,
    native_available,
)


@pytest.fixture(scope="module")
def noisy_data():
    rng = np.random.RandomState(7)
    data = rng.gamma(0.5, 3.0, size=(5, 24, 48, 40)).astype(np.float32)
    data[1, :, 5:12, 8:15] = np.nan
    data[3, 10, 30:, :10] = np.nan
    return data


def test_native_library_builds():
    assert native_available(), "C++ native library failed to build"


def test_native_scan_matches_oracle(noisy_data):
    for stride in (16, 8):
        for include_last in (False, True):
            cfg = DataConfig(ndomain=16, stride=stride)
            got = compute_valid_indices_native(
                noisy_data, cfg, include_last_box=include_last
            )
            want = compute_valid_indices_bruteforce(
                noisy_data, cfg, include_last_box=include_last
            )
            np.testing.assert_array_equal(got, want)


def test_native_gather_matches_slicing(noisy_data):
    cfg = DataConfig(ndomain=16, stride=16)
    idx = compute_valid_indices_native(noisy_data, cfg)
    assert len(idx) > 0
    got = gather_patches_native(noisy_data, idx, 16)
    for s, (t, y, x) in enumerate(idx[: min(len(idx), 10)]):
        np.testing.assert_array_equal(
            got[s], noisy_data[t, :, y : y + 16, x : x + 16]
        )


def test_streaming_patch_store_matches_gather(noisy_data):
    cfg = DataConfig(ndomain=16, stride=16)
    idx = compute_valid_indices_native(noisy_data, cfg)
    # shuffle indices so the day-grouping restore path is exercised
    rng = np.random.RandomState(0)
    idx = idx[rng.permutation(len(idx))]
    a = gather_patches_native(noisy_data, idx, 16)
    b = extract_patch_store(noisy_data, idx, 16)
    np.testing.assert_array_equal(a, b)


def test_streaming_patch_store_on_memmap(tmp_path, noisy_data):
    path = str(tmp_path / "d.npy")
    np.save(path, noisy_data)
    mm = np.load(path, mmap_mode="r")
    cfg = DataConfig(ndomain=16, stride=16)
    idx = compute_valid_indices_native(mm, cfg)
    store = extract_patch_store(mm, idx, 16)
    want = gather_patches_native(noisy_data, idx, 16)
    np.testing.assert_array_equal(store, want)
