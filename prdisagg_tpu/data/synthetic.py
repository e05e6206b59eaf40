"""Synthetic radar-like dataset fixture.

Generates strictly positive, spatially and temporally correlated "rain blob"
fields shaped like the reference's reformatted tensor (days, 24, ny, nx), plus
the matching valid-index list.  Used for smoke training (BASELINE config 2)
and unit tests — no real SMHI data needed.
"""

from __future__ import annotations

import numpy as np

from prdisagg_tpu.core.config import DataConfig
from prdisagg_tpu.data.indices import compute_valid_indices


def make_synthetic_dataset(
    n_days: int = 8,
    ny: int = 64,
    nx: int = 64,
    seed: int = 0,
    cfg: DataConfig | None = None,
):
    """Returns (data (n_days,24,ny,nx) float32, indices (S,3) int32, cfg)."""
    cfg = cfg or DataConfig()
    rng = np.random.RandomState(seed)
    nh = cfg.nhours

    # smooth random fields: white noise blurred by separable moving averages
    x = rng.gamma(shape=0.6, scale=4.0, size=(n_days, nh, ny, nx))
    for axis, width in ((1, 5), (2, 7), (3, 7)):
        k = np.ones(width) / width
        x = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), axis, x
        )
    # daily-cycle modulation so hours differ systematically
    cycle = 1.0 + 0.5 * np.sin(2 * np.pi * np.arange(nh) / nh)
    x = x * cycle[None, :, None, None]
    # strictly positive (reference radar data is never exactly dry inside
    # valid patches); keep a tiny floor
    data = (x + 1e-3).astype(np.float32)

    indices = compute_valid_indices(data, cfg)
    if len(indices) == 0:
        raise RuntimeError("synthetic dataset produced no valid patches; "
                           "loosen thresholds or enlarge the domain")
    return data, indices, cfg
