"""Valid-patch index computation.

A patch (tidx, ii, jj) of size ndomain x ndomain is valid iff its daily-sum
box is NaN-free and at least `n_thresh` gridpoints exceed `tp_thresh_daily`
(reference: compute_valid_indices.py:74-93, a numba-jitted triple loop).

Here the whole sweep is vectorized with 2-D summed-area tables (integral
images) over boolean masks — O(days * ny * nx), no per-box loops — so the full
8-year dataset scans in seconds on one CPU core and trivially on TPU.

Boundary semantics: the reference iterates `range(0, ny - ndomain, stride)`
which EXCLUDES the last fitting box row/column (off-by-one noted in SURVEY.md
C4).  We reproduce that by default for artifact parity; pass
`include_last_box=True` for the corrected sweep.
"""

from __future__ import annotations

import numpy as np

from prdisagg_tpu.core.config import DataConfig


def _box_sums(m: np.ndarray, nd: int) -> np.ndarray:
    """Sums of all nd x nd boxes of per-day 2-D fields.

    m: (D, ny, nx) float64. Returns (D, ny-nd+1, nx-nd+1).
    """
    # summed-area table with a zero border
    sat = np.zeros((m.shape[0], m.shape[1] + 1, m.shape[2] + 1), dtype=np.float64)
    sat[:, 1:, 1:] = m.cumsum(axis=1).cumsum(axis=2)
    a = sat[:, nd:, nd:]
    b = sat[:, :-nd, nd:]
    c = sat[:, nd:, :-nd]
    d = sat[:, :-nd, :-nd]
    return a - b - c + d


def sweep_starts(n: int, ndomain: int, stride: int, include_last_box: bool) -> np.ndarray:
    stop = n - ndomain + (1 if include_last_box else 0)
    return np.arange(0, max(stop, 0), stride)


def compute_valid_indices(
    data: np.ndarray,
    cfg: DataConfig,
    include_last_box: bool = False,
) -> np.ndarray:
    """data: (days, nhours, ny, nx) float32 (NaN = missing).

    Returns int32 array (S, 3) of (tidx, ii, jj) rows, ordered exactly like
    the reference triple loop (t-major, then row, then column).
    """
    if data.ndim != 4:
        raise ValueError(f"data must be 4-D (days,hours,ny,nx), got {data.shape}")
    n_days, nh, ny, nx = data.shape
    nd, stride = cfg.ndomain, cfg.stride

    daily = data.sum(axis=1, dtype=np.float64)  # NaN propagates, as in reference
    nan_counts = _box_sums(np.isnan(daily).astype(np.float64), nd)
    exceed_counts = _box_sums(
        (np.nan_to_num(daily, nan=0.0) > cfg.tp_thresh_daily).astype(np.float64), nd
    )

    ys = sweep_starts(ny, nd, stride, include_last_box)
    xs = sweep_starts(nx, nd, stride, include_last_box)
    if len(ys) == 0 or len(xs) == 0:
        return np.zeros((0, 3), dtype=np.int32)

    nanfree = nan_counts[:, ys][:, :, xs] == 0
    enough = exceed_counts[:, ys][:, :, xs] >= cfg.n_thresh
    ok = nanfree & enough  # (D, len(ys), len(xs))

    t_idx, y_pos, x_pos = np.nonzero(ok)
    out = np.stack([t_idx, ys[y_pos], xs[x_pos]], axis=1).astype(np.int32)
    return out


def compute_valid_indices_bruteforce(
    data: np.ndarray,
    cfg: DataConfig,
    include_last_box: bool = False,
) -> np.ndarray:
    """Direct re-statement of the reference triple loop — the test oracle."""
    n_days, nh, ny, nx = data.shape
    nd, stride = cfg.ndomain, cfg.stride
    out = []
    for t in range(n_days):
        daily = data[t].sum(axis=0)
        for ii in sweep_starts(ny, nd, stride, include_last_box):
            for jj in sweep_starts(nx, nd, stride, include_last_box):
                box = daily[ii : ii + nd, jj : jj + nd]
                if not np.any(np.isnan(box)):
                    if np.sum(box > cfg.tp_thresh_daily) >= cfg.n_thresh:
                        out.append((t, ii, jj))
    return np.asarray(out, dtype=np.int32).reshape(-1, 3)
