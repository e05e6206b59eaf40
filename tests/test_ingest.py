import numpy as np
import pytest

from prdisagg_tpu.data.download import SMHI_URL, day_urls
from prdisagg_tpu.data.ingest import (
    aggregate_to_tres,
    convert_day,
    day_of_year,
    reflectivity_to_mm_per_5min,
    reformat_stream,
    reshape_to_days,
    save_training_tensor,
)


def test_reflectivity_conversion_golden_values():
    """Golden parity with the reference formula
    (convert_smhi_radardata.py:39-43)."""
    raw = np.array([0, 75, 100, 255], dtype=np.uint8)
    got = reflectivity_to_mm_per_5min(raw)
    # manual reference computation
    x = raw.astype(float)
    dbz = x * 0.4 - 30
    mmh = ((10 ** (dbz / 10)) / 200) ** (1 / 1.5)
    want = mmh * 5 / 60
    for i in range(3):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-5)
    assert np.isnan(got[3])  # 255 = missing


def test_aggregate_nan_propagates_like_skipna_false():
    mm5 = np.ones((24, 2, 2), dtype=np.float32)  # 2 hours of 5-min steps
    mm5[3, 0, 0] = np.nan
    hourly = aggregate_to_tres(mm5, tres=1)
    assert hourly.shape == (2, 2, 2)
    assert np.isnan(hourly[0, 0, 0])          # NaN in any 5-min step -> NaN hour
    np.testing.assert_allclose(hourly[0, 1, 1], 12.0)
    np.testing.assert_allclose(hourly[1], 12.0)


def test_convert_day_and_reshape():
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 200, size=(288, 4, 4)).astype(np.uint8)
    day = convert_day(raw, tres=1)
    assert day.shape == (24, 4, 4)
    # daily sum equals the sum of all 5-min steps
    np.testing.assert_allclose(
        day.sum(axis=0), reflectivity_to_mm_per_5min(raw).sum(axis=0), rtol=1e-4
    )
    with pytest.raises(ValueError):
        convert_day(raw[:100])

    hourly = np.concatenate([day, day])
    days = reshape_to_days(hourly, tres=1)
    assert days.shape == (2, 24, 4, 4)
    np.testing.assert_array_equal(days[0], day)


def test_reformat_stream(tmp_path):
    days = [np.full((24, 3, 3), float(i), dtype=np.float32) for i in range(5)]
    out = reformat_stream(iter(days), n_days=5, shape_yx=(3, 3))
    assert out.shape == (5, 24, 3, 3)
    np.testing.assert_array_equal(out[4], 4.0)
    with pytest.raises(ValueError):
        reformat_stream(iter(days[:3]), n_days=5, shape_yx=(3, 3))

    save_training_tensor(str(tmp_path / "t"), out)
    back = np.load(tmp_path / "t.npy")
    np.testing.assert_array_equal(back, out)
    with np.load(tmp_path / "t.npz") as z:
        np.testing.assert_array_equal(z["data"], out)


def test_day_of_year():
    doy = day_of_year(["2009-01-01", "2009-02-01", "2009-12-31"])
    np.testing.assert_array_equal(doy, [1.0, 32.0, 365.0])


def test_day_urls():
    urls = day_urls("20090101", "20090103")
    assert len(urls) == 3
    assert urls[0][0] == "20090101"
    assert urls[0][1] == SMHI_URL.format(year=2009, month=1, day=1)
    assert "opendata-download-radar.smhi.se" in urls[0][1]
