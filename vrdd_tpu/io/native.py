"""ctypes bindings for the native C++ data loaders.

Builds ``vrdd_tpu/native/libvrdd_io.so`` on first use (make + g++) and exposes
reader functions with the same signatures/semantics as
:mod:`vrdd_tpu.io.formats` (the specification). If the toolchain is
unavailable the callers should fall back to the Python readers — use
:func:`available` to check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from vrdd_tpu.io.formats import FormatError

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvrdd_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.vrdd_read_raw.argtypes = [ctypes.c_char_p, ctypes.c_long, _f32p]
        lib.vrdd_codebook_count.argtypes = [ctypes.c_char_p]
        lib.vrdd_read_codebook.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, _i32p, _i32p, _f32p, _i32p,
        ]
        lib.vrdd_templates_count.argtypes = [ctypes.c_char_p]
        lib.vrdd_read_templates.argtypes = [ctypes.c_char_p, ctypes.c_int, _f32p]
        lib.vrdd_span_count.argtypes = [ctypes.c_char_p]
        lib.vrdd_read_span_list.argtypes = [ctypes.c_char_p, _i32p, _i32p]
        lib.vrdd_simple_count.argtypes = [ctypes.c_char_p]
        lib.vrdd_read_simple.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            _i32p, _i32p, _i32p, _f32p, _i32p,
        ]
        lib.vrdd_write_ppm.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, _u8p,
        ]
        lib.vrdd_ppm_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vrdd_read_ppm.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, _u8p,
        ]
        lib.vrdd_compare_ppm.argtypes = [
            _u8p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.vrdd_compare_ppm.restype = ctypes.c_long
        _sig_bins_major(lib)
        _lib = lib
        return _lib


def _sig_bins_major(lib):
    lib.vrdd_read_histograms_bins_major.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.vrdd_read_histograms_bins_major.restype = ctypes.c_int


def available() -> bool:
    return _load() is not None


def _check(rc: int, what: str) -> int:
    if rc < 0:
        raise FormatError(f"native reader failed ({what}): code {rc}")
    return rc


def read_raw_histograms(path: str, n_blocks: int, n_bins: int) -> np.ndarray:
    lib = _load()
    out = np.empty(n_blocks * n_bins, dtype=np.float32)
    _check(lib.vrdd_read_raw(path.encode(), out.size, out), "raw")
    return out.reshape(n_blocks, n_bins)


def read_histograms_bins_major(
    path: str, dims, n_bins: int, dtype="bfloat16"
) -> np.ndarray:
    """Native bins-major histogram load (see io/formats.py counterpart —
    the C++ loader transposes to (nz, n_bins, ny, nx) DURING the
    sequential read and can emit bf16 directly, so neither a second
    full-size f32 array nor a Python transpose ever materializes)."""
    import ml_dtypes

    lib = _load()
    nz, ny, nx = (int(d) for d in dims)
    bf16 = str(dtype) in ("bfloat16", "bf16")
    out = np.empty(
        (nz, n_bins, ny, nx),
        dtype=np.uint16 if bf16 else np.float32,
    )
    _check(
        lib.vrdd_read_histograms_bins_major(
            path.encode(), nz, ny, nx, n_bins, 1 if bf16 else 0,
            out.ctypes.data_as(ctypes.c_void_p),
        ),
        "bins-major histograms",
    )
    if bf16:
        return out.view(ml_dtypes.bfloat16)
    if str(dtype) not in ("float32", "f4", "<f4"):
        return out.astype(dtype)
    return out


def read_codebook(
    path: str, n_bins: int, max_errors: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    max_errors = max_errors or n_bins
    n = _check(lib.vrdd_codebook_count(path.encode()), "codebook header")
    codebook = np.zeros((n, 4), dtype=np.int32)
    ebins = np.zeros((n, max_errors), dtype=np.int32)
    evals = np.zeros((n, max_errors), dtype=np.float32)
    span_ids = np.zeros(n, dtype=np.int32)
    _check(
        lib.vrdd_read_codebook(
            path.encode(), n_bins, max_errors, codebook, ebins, evals, span_ids
        ),
        "codebook",
    )
    return codebook, ebins, evals, span_ids


def read_templates(path: str, n_bins: int) -> np.ndarray:
    lib = _load()
    n = _check(lib.vrdd_templates_count(path.encode()), "templates header")
    out = np.zeros((n, n_bins), dtype=np.float32)
    _check(lib.vrdd_read_templates(path.encode(), n_bins, out), "templates")
    return out


def read_span_list(path: str) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    n = _check(lib.vrdd_span_count(path.encode()), "span header")
    low = np.zeros((n, 3), dtype=np.int32)
    high = np.zeros((n, 3), dtype=np.int32)
    _check(lib.vrdd_read_span_list(path.encode(), low, high), "span list")
    return low, high


def read_simple_histograms(
    counts_path: str, bin_ids_path: str, freqs_path: str, n_bins: int
):
    lib = _load()
    n = _check(lib.vrdd_simple_count(counts_path.encode()), "simple header")
    low = np.zeros((n, 3), dtype=np.int32)
    high = np.zeros((n, 3), dtype=np.int32)
    bin_ids = np.zeros((n, n_bins), dtype=np.int32)
    freqs = np.zeros((n, n_bins), dtype=np.float32)
    counts = np.zeros(n, dtype=np.int32)
    _check(
        lib.vrdd_read_simple(
            counts_path.encode(), bin_ids_path.encode(), freqs_path.encode(),
            n_bins, low, high, bin_ids, freqs, counts,
        ),
        "simple",
    )
    return low, high, bin_ids, freqs, counts


def write_ppm(path: str, rgba_u8: np.ndarray) -> None:
    """Native P6 writer (sdkSavePPM4ub semantics: alpha dropped)."""
    lib = _load()
    arr = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    h, w = arr.shape[:2]
    _check(lib.vrdd_write_ppm(path.encode(), w, h, arr.reshape(-1)), "ppm write")


def read_ppm(path: str) -> np.ndarray:
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    _check(lib.vrdd_ppm_size(path.encode(), ctypes.byref(w), ctypes.byref(h)),
           "ppm header")
    out = np.zeros(h.value * w.value * 3, dtype=np.uint8)
    _check(lib.vrdd_read_ppm(path.encode(), w.value, h.value, out), "ppm read")
    return out.reshape(h.value, w.value, 3)


def compare_ppm(
    img_rgb_u8: np.ndarray,
    ref_path: str,
    epsilon: float = 5.0,
    threshold: float = 0.30,
):
    """Native golden compare against a stored reference PPM.

    Same tolerance model as io/formats.py compare_ppm (the spec) and the
    reference's sdkComparePPM (MAX_EPSILON_ERROR/THRESHOLD,
    volumeRender.cpp:57-58, 1077). Returns ``(passed, outlier_fraction)``.
    """
    lib = _load()
    arr = np.ascontiguousarray(img_rgb_u8[..., :3], dtype=np.uint8)
    h, w = arr.shape[:2]
    outliers = _check(
        int(lib.vrdd_compare_ppm(arr.reshape(-1), ref_path.encode(), w, h,
                                 float(epsilon))),
        "ppm compare",
    )
    frac = outliers / float(w * h)
    return frac <= threshold, frac
