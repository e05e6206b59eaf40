import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.core.config import Conditioning, DataConfig
from prdisagg_tpu.data.indices import (
    compute_valid_indices,
    compute_valid_indices_bruteforce,
)
from prdisagg_tpu.data.sampler import DeviceDataset, sample_real_jit

# whole module is part of the quick smoke tier (VERDICT r4 item 8)
import pytest

pytestmark = pytest.mark.quick

def test_params_string_matches_reference_codec():
    cfg = DataConfig()
    assert cfg.params_string() == (
        "20090101-20161231-tp_thresh_daily5_n_thresh20_ndomain16_stride16"
    )
    assert cfg.data_filename() == "20090101-20161231_tres1.npy"
    assert cfg.indices_filename() == (
        "valid_indices_smhi_radar_20090101-20161231-"
        "tp_thresh_daily5_n_thresh20_ndomain16_stride16.pkl"
    )


def test_valid_indices_match_bruteforce_oracle():
    rng = np.random.RandomState(3)
    data = rng.gamma(0.5, 3.0, size=(6, 24, 48, 40)).astype(np.float32)
    # inject NaN holes
    data[1, :, 5:12, 8:15] = np.nan
    data[4, 7, 30:, :10] = np.nan
    for stride in (16, 8, 5):
        cfg = DataConfig(ndomain=16, stride=stride, tp_thresh_daily=5, n_thresh=20)
        for include_last in (False, True):
            got = compute_valid_indices(data, cfg, include_last_box=include_last)
            want = compute_valid_indices_bruteforce(
                data, cfg, include_last_box=include_last
            )
            np.testing.assert_array_equal(got, want)


def test_valid_indices_reference_boundary_excludes_last_box():
    # a domain exactly 2 boxes wide: reference semantics only sweeps box 0
    data = np.full((1, 24, 32, 32), 10.0, dtype=np.float32)
    cfg = DataConfig(ndomain=16, stride=16, tp_thresh_daily=5, n_thresh=20)
    ref = compute_valid_indices(data, cfg, include_last_box=False)
    fixed = compute_valid_indices(data, cfg, include_last_box=True)
    assert len(ref) == 1 and tuple(ref[0]) == (0, 0, 0)
    assert len(fixed) == 4


def test_sampler_shapes_and_invariants(synthetic_dataset):
    data, indices, cfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, cfg)
    frac, cond = sample_real_jit(ds, jax.random.PRNGKey(0), 8)
    assert frac.shape == (8, 24, 16, 16, 1)
    assert cond.shape == (8, 16, 16, 1)
    f = np.asarray(frac)
    c = np.asarray(cond)
    assert not np.any(np.isnan(f)) and not np.any(np.isnan(c))
    assert f.min() >= 0 and f.max() <= 1 + 1e-5
    np.testing.assert_allclose(f.sum(axis=1), 1.0, rtol=1e-4)


def test_sampler_gathers_true_windows(synthetic_dataset):
    data, indices, cfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, cfg)
    # deterministic check: gather with a known index row
    t, y, x = (int(v) for v in indices[0])
    patches = np.asarray(ds._gather_patches(jnp.asarray([[t, y, x]])))
    want = data[t, :, y : y + cfg.ndomain, x : x + cfg.ndomain][..., None]
    np.testing.assert_allclose(patches[0], want, rtol=1e-6)


def test_sampler_doy_and_lon_channels(synthetic_dataset):
    data, indices, _ = synthetic_dataset
    doy = np.arange(1, data.shape[0] + 1, dtype=np.float32)

    cfg_doy = DataConfig(conditioning=Conditioning.DOY)
    ds = DeviceDataset.from_numpy(data, indices, cfg_doy, doy=doy)
    frac, cond = ds.sample_real(jax.random.PRNGKey(1), 4)
    assert cond.shape == (4, 16, 16, 3)
    sincos = np.asarray(cond[..., 1:])
    np.testing.assert_allclose(
        sincos[..., 0] ** 2 + sincos[..., 1] ** 2, 1.0, atol=1e-5
    )

    cfg_lon = DataConfig(conditioning=Conditioning.LON)
    ds = DeviceDataset.from_numpy(data, indices, cfg_lon)
    frac, cond = ds.sample_real(jax.random.PRNGKey(2), 4)
    assert cond.shape == (4, 16, 16, 2)
    lon = np.asarray(cond[..., 1])
    assert lon.min() >= 0.0 and lon.max() <= 1.0


def test_sample_cond_daily_sum_gather_matches_full_path(synthetic_dataset):
    """The cond-only draw gathers from the precomputed daily-sum tensor
    (24x fewer HBM bytes) but must match the full-patch path draw-for-draw:
    same key => same indices => same condition values (VERDICT round-3
    item 9; reference semantics gan_train_cwgangp_pixelnorm.py:177-193)."""
    import dataclasses as _dc

    import jax

    from prdisagg_tpu.data.sampler import DeviceDataset

    data, indices, dcfg = synthetic_dataset
    ds = DeviceDataset.from_numpy(data, indices, dcfg)
    assert ds.dsum is not None and ds.dsum.shape == ds.data.shape[:1] + \
        ds.data.shape[2:]
    key = jax.random.PRNGKey(77)
    cond_fast = np.asarray(ds.sample_cond(key, 16))
    _, cond_full = ds.sample_real(key, 16)
    np.testing.assert_allclose(cond_fast, np.asarray(cond_full),
                               rtol=1e-6, atol=1e-6)

    # doy-conditioned variant keeps its extra channels on the fast path
    doy = np.linspace(1, 300, data.shape[0]).astype(np.float32)
    dcfg_doy = _dc.replace(dcfg, conditioning="doy")
    ds_doy = DeviceDataset.from_numpy(data, indices, dcfg_doy, doy=doy)
    c = np.asarray(ds_doy.sample_cond(key, 8))
    assert c.shape[-1] == 3
    _, c_full = ds_doy.sample_real(key, 8)
    np.testing.assert_allclose(c, np.asarray(c_full), rtol=1e-6, atol=1e-6)

    # legacy pytrees restored without dsum fall back to the full gather
    ds_legacy = DeviceDataset(data=ds.data, indices=ds.indices, doy=None,
                              dsum=None, cfg=dcfg)
    c_legacy = np.asarray(ds_legacy.sample_cond(key, 16))
    np.testing.assert_allclose(c_legacy, cond_fast, rtol=1e-6, atol=1e-6)
