"""netCDF intermediate-file interop (VERDICT round-3 item 6).

The reference's convert->reformat stage boundary is one netCDF file per day
(convert_smhi_radardata.py:45 writes, reformat_data.py:69 reads).  These
tests prove both directions work with only baked-in deps: scipy writes/reads
classic netCDF3, h5py reads the HDF5-based netCDF4 files the reference's own
``to_netcdf`` produces.
"""

import os

import h5py
import numpy as np
import pytest

from prdisagg_tpu.data import netcdf_io
from prdisagg_tpu.data.ingest import aggregate_to_tres


def _synthetic_day(seed, ny=12, nx=10, n_t=288):
    rng = np.random.RandomState(seed)
    mm5 = rng.gamma(0.3, 0.4, size=(n_t, ny, nx)).astype(np.float32)
    return mm5


def test_write_read_roundtrip_netcdf3(tmp_path):
    mm5 = _synthetic_day(0)
    mm5[7, 3, 4] = np.nan  # missing radar step survives the round trip
    path = str(tmp_path / netcdf_io.day_nc_filename("20090101"))
    netcdf_io.write_day_nc(path, mm5, "20090101")
    with open(path, "rb") as f:
        assert f.read(3) == b"CDF"  # classic netCDF the reference env reads
    back = netcdf_io.read_day_nc(path)
    np.testing.assert_array_equal(
        np.isnan(back), np.isnan(mm5))
    np.testing.assert_allclose(back[~np.isnan(mm5)], mm5[~np.isnan(mm5)])


def test_read_reference_style_hdf5_netcdf(tmp_path):
    """Reference-produced intermediates are netCDF4 == HDF5 with the unnamed
    DataArray stored as __xarray_dataarray_variable__; h5py reads them."""
    mm5 = _synthetic_day(1)
    path = str(tmp_path / "smhi_radar_20100202.nc")
    with h5py.File(path, "w") as f:  # emulate xarray's netCDF4 layout
        f.create_dataset("time", data=np.arange(288, dtype="f8"))
        f.create_dataset(netcdf_io.VAR_NAME, data=mm5)
    back = netcdf_io.read_day_nc(path)
    np.testing.assert_allclose(back, mm5)


def test_read_fill_value_becomes_nan(tmp_path):
    mm5 = _synthetic_day(2)
    mm5[0, 0, 0] = 9.969209968386869e36  # netCDF default float fill
    path = str(tmp_path / "smhi_radar_20100203.nc")
    with h5py.File(path, "w") as f:
        f.create_dataset(netcdf_io.VAR_NAME, data=mm5)
    back = netcdf_io.read_day_nc(path)
    assert np.isnan(back[0, 0, 0])
    assert np.isfinite(back[1:]).all()


def test_reformat_from_netcdf_matches_direct_math(tmp_path):
    """Multi-day .nc stream -> training tensor equals the in-memory
    reformat math, including skipna=False NaN propagation
    (reformat_data.py:75-86)."""
    days = [_synthetic_day(10 + i) for i in range(3)]
    days[1][13, 2, 2] = np.nan  # poisons exactly hour 1 of day 1
    dates = ["20090101", "20090102", "20090103"]
    for d, mm5 in zip(dates, days):
        netcdf_io.write_day_nc(
            str(tmp_path / netcdf_io.day_nc_filename(d)), mm5, d)

    paths = netcdf_io.find_day_files(str(tmp_path), "20090101", "20091231")
    assert len(paths) == 3
    tensor = netcdf_io.reformat_from_netcdf(paths, tres=1)
    assert tensor.shape == (3, 24, 12, 10)
    expect = np.stack([aggregate_to_tres(d, 1) for d in days])
    np.testing.assert_array_equal(np.isnan(tensor), np.isnan(expect))
    np.testing.assert_allclose(tensor[~np.isnan(expect)],
                               expect[~np.isnan(expect)], rtol=1e-6)
    assert np.isnan(tensor[1, 1]).any() and not np.isnan(tensor[1, 2]).any()


def test_find_day_files_filters_range_and_skips_missing(tmp_path):
    for d in ("20090101", "20090103", "20120101", "junk"):
        (tmp_path / f"smhi_radar_{d}.nc").write_bytes(b"CDF")
    got = netcdf_io.find_day_files(str(tmp_path), "20090101", "20091231")
    assert [os.path.basename(p) for p in got] == [
        "smhi_radar_20090101.nc", "smhi_radar_20090103.nc"]


def test_convert_and_write_days_collects_failed_dates(tmp_path):
    raw_ok = np.full((288, 4, 4), 100, dtype=np.uint8)
    raw_bad = np.zeros((100, 4, 4), dtype=np.uint8)  # wrong step count is
    # written anyway (shape checks live downstream); a raising day is skipped
    failed = netcdf_io.convert_and_write_days(
        [("20090101", raw_ok), ("20090102", None)], str(tmp_path))
    assert failed == ["20090102"]
    back = netcdf_io.read_day_nc(
        str(tmp_path / netcdf_io.day_nc_filename("20090101")))
    assert back.shape == (288, 4, 4)
    # exact converter math on the good day (convert_smhi_radardata.py:41-43)
    dbz = 100 * 0.4 - 30.0
    mm5_expect = ((10.0 ** (dbz / 10.0)) / 200.0) ** (1 / 1.5) * 5 / 60
    np.testing.assert_allclose(back, mm5_expect, rtol=1e-6)


def test_reformat_from_netcdf_empty_raises():
    with pytest.raises(ValueError, match="no input files"):
        netcdf_io.reformat_from_netcdf([])
