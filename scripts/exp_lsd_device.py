"""On-chip measurement of the device-reduced pairwise-LSD summary.

The battery's LSD stage (log_spectral_distance.py:104-130 protocol: five
all-pairs populations over 24k spectra) measured ~27 min on the chip with
the full-fetch path — fetch-bound through the tunneled link, not
compute-bound.  This experiment validates pairwise_lsd_summary against the
full path on-chip at a mid scale, then times both at reference scale
(full path extrapolated from a two-block prefix so the experiment doesn't
itself burn half an hour).

Usage: python scripts/exp_lsd_device.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/prdisagg_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from prdisagg_tpu.ops.stats import (
    pairwise_lsd, pairwise_lsd_offdiag, pairwise_lsd_summary, radial_spectra,
)


def spectra_like_battery(n_fields: int, seed: int) -> np.ndarray:
    """Radial spectra of gamma-noise 16x16 fields — same shapes and value
    magnitudes as the battery's populations."""
    rng = np.random.RandomState(seed)
    fields = rng.gamma(2.0, 1.0, size=(n_fields, 16, 16)).astype(np.float32)
    out = []
    for i0 in range(0, n_fields, 4096):
        out.append(np.asarray(radial_spectra(jnp.asarray(fields[i0:i0 + 4096]))))
    return np.concatenate(out)


def main():
    res = {}

    # ---- validation at mid scale (2400 x 2400 = 5.76M pairs) ---------------
    a = spectra_like_battery(2400, seed=1)
    b = spectra_like_battery(2400, seed=2)

    t0 = time.perf_counter()
    full = pairwise_lsd_offdiag(a, b)
    t_full_mid = time.perf_counter() - t0
    finite = full[np.isfinite(full)]

    t0 = time.perf_counter()
    s = pairwise_lsd_summary(a, b)
    t_sum_mid = time.perf_counter() - t0

    med_err = abs(s["median"] - float(np.median(finite)))
    assert s["n_valid"] == len(finite), (s["n_valid"], len(finite))
    assert med_err < 1e-4 * max(1.0, abs(s["median"])), (
        s["median"], float(np.median(finite)))
    res["mid_scale"] = {
        "pairs": int(a.shape[0]) * int(b.shape[0]),
        "full_fetch_s": round(t_full_mid, 2),
        "device_summary_s": round(t_sum_mid, 2),
        "median_abs_err": float(med_err),
        "median": s["median"],
    }
    print("mid-scale validation:", json.dumps(res["mid_scale"]))

    # ---- reference scale (24000 x 24000 = 576M pairs per population) -------
    A = spectra_like_battery(24000, seed=3)
    B = spectra_like_battery(24000, seed=4)

    # summary: first call compiles; time the second
    t0 = time.perf_counter()
    s1 = pairwise_lsd_summary(A, B)
    t_sum_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2 = pairwise_lsd_summary(A, B)
    t_sum_warm = time.perf_counter() - t0
    assert s1["median"] == s2["median"]

    # full path: fetch two 2048-row blocks and extrapolate the stage
    n_blocks = -(-24000 // 2048)
    _ = np.asarray(pairwise_lsd(jnp.asarray(A[:2048]), jnp.asarray(B)))  # warm
    t0 = time.perf_counter()
    for i in range(2):
        _ = np.asarray(pairwise_lsd(
            jnp.asarray(A[i * 2048:(i + 1) * 2048]), jnp.asarray(B)))
    t_two_blocks = time.perf_counter() - t0
    t_full_est = t_two_blocks / 2 * n_blocks

    res["reference_scale"] = {
        "pairs": 24000 * 24000,
        "device_summary_cold_s": round(t_sum_cold, 2),
        "device_summary_warm_s": round(t_sum_warm, 2),
        "full_fetch_estimated_s": round(t_full_est, 1),
        "full_fetch_two_blocks_s": round(t_two_blocks, 2),
        "speedup_vs_full": round(t_full_est / t_sum_warm, 1),
        "battery_5pops_summary_min": round(5 * t_sum_warm / 60, 2),
        "battery_5pops_full_est_min": round(5 * t_full_est / 60, 1),
        "median": s2["median"],
        "n_valid": s2["n_valid"],
    }
    print(json.dumps(res, indent=1))
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "exp_lsd_device.txt")
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    main()
