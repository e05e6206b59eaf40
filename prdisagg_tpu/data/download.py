"""SMHI open-data radar downloader (reference: download_smhi_radar.py).

Builds the per-day composite zip URLs and fetches them with urllib.  Network
access is gated: url construction is pure and unit-tested; `download_range`
only touches the network when actually called.
"""

from __future__ import annotations

import os
import zipfile
from typing import List

SMHI_URL = (
    "https://opendata-download-radar.smhi.se/api/version/latest/area/sweden/"
    "product/comp/{year}/{month}/{day}.zip?format=tif"
)


def day_urls(startdate: str, enddate: str) -> List[tuple]:
    """[(date_str YYYYMMDD, url), ...] for the inclusive date range
    (download_smhi_radar.py:6-9)."""
    import pandas as pd

    out = []
    for date in pd.date_range(startdate, enddate):
        url = SMHI_URL.format(year=date.year, month=date.month, day=date.day)
        out.append((date.strftime("%Y%m%d"), url))
    return out


def download_range(
    startdate: str,
    enddate: str,
    outpath: str,
    unzip: bool = True,
    timeout: float = 60.0,
) -> List[str]:
    """Fetch daily zips; returns the list of failed dates (the radar archive
    is incomplete — failures are expected and skipped, like the reference's
    failed_dates collection in convert_smhi_radardata.py:47-52)."""
    import urllib.request

    os.makedirs(outpath, exist_ok=True)
    failed = []
    for date_str, url in day_urls(startdate, enddate):
        zip_path = os.path.join(outpath, f"smhi_radar_{date_str}.zip")
        try:
            urllib.request.urlretrieve(url, zip_path)
            if unzip:
                with zipfile.ZipFile(zip_path) as z:
                    z.extractall(outpath)
                os.remove(zip_path)
        except Exception:
            failed.append(date_str)
            if os.path.exists(zip_path):
                os.remove(zip_path)
    return failed
