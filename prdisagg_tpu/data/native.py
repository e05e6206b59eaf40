"""ctypes bindings to the native C++ data engine (native/validscan.cpp).

Provides compiled-code paths for the two host-side hot spots of the offline
pipeline — the valid-patch scan and the packed patch extraction — with
automatic build (make) on first use and transparent numpy fallback when no
compiler is available.  Both operate day-by-day so memmapped multi-hundred-GB
tensors never materialize (reference needed 363 GB RAM, reformat_data.py:5).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from prdisagg_tpu.core.config import DataConfig

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libprdisagg_native.so"))

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib(build: bool = True) -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.prdisagg_valid_scan_day.restype = ctypes.c_int
    lib.prdisagg_valid_scan_day.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.prdisagg_gather_patches.restype = None
    lib.prdisagg_gather_patches.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.prdisagg_gather_patches_day.restype = None
    lib.prdisagg_gather_patches_day.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def compute_valid_indices_native(
    data: np.ndarray, cfg: DataConfig, include_last_box: bool = False
) -> np.ndarray:
    """Day-streaming native valid-patch scan; accepts memmapped data.

    Falls back to the vectorized numpy implementation when the native library
    cannot be built.
    """
    lib = _load_lib()
    if lib is None:
        from prdisagg_tpu.data.indices import compute_valid_indices

        return compute_valid_indices(np.asarray(data), cfg, include_last_box)

    n_days, nh, ny, nx = data.shape
    nd, stride = cfg.ndomain, cfg.stride
    max_boxes = ((ny // stride) + 1) * ((nx // stride) + 1)
    buf = np.empty((max_boxes, 2), dtype=np.int32)
    rows = []
    for t in range(n_days):
        day = np.ascontiguousarray(data[t], dtype=np.float32)
        n = lib.prdisagg_valid_scan_day(
            _fptr(day), nh, ny, nx, nd, stride,
            ctypes.c_float(cfg.tp_thresh_daily), cfg.n_thresh,
            1 if include_last_box else 0, _iptr(buf), max_boxes,
        )
        if n > max_boxes:
            raise RuntimeError("native scan buffer overflow")
        if n:
            out = np.empty((n, 3), dtype=np.int32)
            out[:, 0] = t
            out[:, 1:] = buf[:n]
            rows.append(out)
    if not rows:
        return np.zeros((0, 3), dtype=np.int32)
    return np.concatenate(rows)


def gather_patches_native(
    data: np.ndarray, indices: np.ndarray, ndomain: int
) -> np.ndarray:
    """Packed (S, nh, nd, nd) patch store from a contiguous in-RAM tensor."""
    lib = _load_lib()
    n_days, nh, ny, nx = data.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    out = np.empty((len(idx), nh, ndomain, ndomain), dtype=np.float32)
    if lib is None:
        for s, (t, y, x) in enumerate(idx):
            out[s] = data[t, :, y : y + ndomain, x : x + ndomain]
        return out
    data_c = np.ascontiguousarray(data, dtype=np.float32)
    lib.prdisagg_gather_patches(
        _fptr(data_c), n_days, nh, ny, nx, _iptr(idx), len(idx), ndomain,
        _fptr(out),
    )
    return out


def extract_patch_store(
    data: np.ndarray, indices: np.ndarray, ndomain: int
) -> np.ndarray:
    """Day-streaming patch extraction for memmapped tensors: the offline pass
    that builds the compact (S, nh, nd, nd) HBM store (SURVEY.md hard part 5)
    while keeping one day resident at a time."""
    lib = _load_lib()
    n_days, nh, ny, nx = data.shape
    idx = np.ascontiguousarray(indices, dtype=np.int32)
    order = np.argsort(idx[:, 0], kind="stable")
    out = np.empty((len(idx), nh, ndomain, ndomain), dtype=np.float32)
    pos = 0
    while pos < len(order):
        t = int(idx[order[pos], 0])
        end = pos
        while end < len(order) and idx[order[end], 0] == t:
            end += 1
        sel = order[pos:end]
        day = np.ascontiguousarray(data[t], dtype=np.float32)
        yx = np.ascontiguousarray(idx[sel, 1:], dtype=np.int32)
        chunk = np.empty((len(sel), nh, ndomain, ndomain), dtype=np.float32)
        if lib is None:
            for i, (y, x) in enumerate(yx):
                chunk[i] = day[:, y : y + ndomain, x : x + ndomain]
        else:
            lib.prdisagg_gather_patches_day(
                _fptr(day), nh, ny, nx, _iptr(yx), len(sel), ndomain,
                _fptr(chunk),
            )
        out[sel] = chunk
        pos = end
    return out
