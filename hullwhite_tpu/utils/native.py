"""ctypes loader for the C++ host-runtime library (native/hw_native.cpp).

The compute path is XLA/Pallas; this library is the native equivalent of
the reference's C++ host layer: L1 table precompute, Cholesky factors for
the exact sampler, binary/CSV persistence, and run statistics.  Everything
has a NumPy fallback — the library is an accelerator/parity component, not
a hard dependency.  ``tests/test_native.py`` cross-checks both paths.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libhwnative.so",
    Path(os.environ.get("HW_NATIVE_LIB", "")),
]

_d = ctypes.POINTER(ctypes.c_double)
_f = ctypes.POINTER(ctypes.c_float)


@lru_cache(maxsize=1)
def _lib():
    for p in _LIB_PATHS:
        if p and p.is_file():
            lib = ctypes.CDLL(str(p))
            try:
                _register(lib)
            except AttributeError:
                # stale .so predating a newly added symbol: try the next
                # candidate (e.g. HW_NATIVE_LIB) and otherwise degrade to
                # the NumPy fallbacks instead of crashing available()
                continue
            return lib
    return None


def _register(lib):
    lib.hw_drift_tables.argtypes = [ctypes.c_double] * 2 + [ctypes.c_int] + [ctypes.c_double] * 5 + [_d, _d]
    lib.hw_shock_shapes.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_int, _d, _d]
    lib.hw_curve_shape.argtypes = [ctypes.c_double, ctypes.c_double] + [ctypes.c_int] * 3 + [_d]
    lib.hw_curve_chol.argtypes = [ctypes.c_double, ctypes.c_double] + [ctypes.c_int] * 3 + [_d]
    lib.hw_curve_chol.restype = ctypes.c_int
    lib.hw_zbc_chol.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_int, _d]
    lib.hw_save_bin.argtypes = [ctypes.c_char_p, _f, ctypes.c_long]
    lib.hw_save_bin.restype = ctypes.c_int
    lib.hw_csv_timeseries.argtypes = [ctypes.c_char_p, ctypes.c_char_p, _f, ctypes.c_long, ctypes.c_float]
    lib.hw_csv_timeseries.restype = ctypes.c_int
    lib.hw_summarize.argtypes = [_d, ctypes.c_int, _d]
    lib.hw_dp_continuation.argtypes = (
        [_d, ctypes.c_int, _d, _d, ctypes.c_int]
        + [ctypes.c_double] * 8 + [_d])
    # cubic-Hermite variant (round 4); absent from pre-round-4 builds —
    # callers fall back to the numpy kernel when it is missing
    if hasattr(lib, "hw_dp_continuation3"):
        lib.hw_dp_continuation3.argtypes = lib.hw_dp_continuation.argtypes


def available() -> bool:
    return _lib() is not None


def _dp(a):
    return a.ctypes.data_as(_d)


def drift_tables(a, dt, n_steps, spec):
    base = np.empty(n_steps, np.float64)
    psi = np.empty(n_steps, np.float64)
    _lib().hw_drift_tables(a, dt, n_steps, spec.alpha0, spec.beta0,
                           spec.alpha1, spec.beta1, spec.t_break,
                           _dp(base), _dp(psi))
    return base, psi


def shock_shapes(a, dt, n):
    u = np.empty(n, np.float64)
    w = np.empty(n, np.float64)
    _lib().hw_shock_shapes(a, dt, n, _dp(u), _dp(w))
    return u, w


def curve_shape(a, dt, n_steps, n_mat, stride):
    W = np.empty((n_steps, n_mat), np.float64)
    _lib().hw_curve_shape(a, dt, n_steps, n_mat, stride, _dp(W))
    return W


def curve_chol(a, dt, n_steps, n_mat, stride):
    k = n_mat - 1
    LT = np.empty((k, k), np.float64)
    rc = _lib().hw_curve_chol(a, dt, n_steps, n_mat, stride, _dp(LT))
    if rc != 0:
        raise ValueError("checkpoint covariance not positive definite")
    return LT


def zbc_chol(a, dt, n1):
    out = np.empty(3, np.float64)
    _lib().hw_zbc_chol(a, dt, n1, _dp(out))
    return tuple(out)


def save_bin(path: str, arr: np.ndarray):
    rc = _lib().hw_save_bin(path.encode(), arr.ctypes.data_as(_f), arr.size)
    if rc != 0:
        raise IOError(f"hw_save_bin failed for {path}")


def csv_timeseries(path: str, header: str, arr: np.ndarray, spacing: float):
    rc = _lib().hw_csv_timeseries(path.encode(), header.encode(),
                                  arr.ctypes.data_as(_f), arr.size, spacing)
    if rc != 0:
        raise IOError(f"hw_csv_timeseries failed for {path}")


def summarize(samples) -> np.ndarray:
    x = np.ascontiguousarray(samples, np.float64)
    out = np.empty(8, np.float64)
    _lib().hw_summarize(_dp(x), len(x), _dp(out))
    return out


def dp_continuation(grid_s, grid_t, V, rdet_s, rdet_t, didet, bt, bI,
                    vt, vI, ctI, order="linear"):
    """One Bermudan DP conditional-expectation sweep (float64, exact
    Gaussian integration of the piecewise-linear — or, order="cubic",
    cubic-Hermite — interpolant) — the O(n^2) hot loop of
    bermudan.dp_oracle in native C++."""
    grid_s = np.ascontiguousarray(grid_s, np.float64)
    grid_t = np.ascontiguousarray(grid_t, np.float64)
    V = np.ascontiguousarray(V, np.float64)
    out = np.empty(len(grid_s), np.float64)
    lib = _lib()
    fn = (lib.hw_dp_continuation3 if order == "cubic"
          else lib.hw_dp_continuation)
    fn(_dp(grid_s), len(grid_s), _dp(grid_t),
       _dp(V), len(grid_t), rdet_s, rdet_t, didet,
       bt, bI, vt, vI, ctI, _dp(out))
    return out


def has_dp_cubic() -> bool:
    """True when the loaded library exports the round-4 cubic sweep."""
    lib = _lib()
    return lib is not None and hasattr(lib, "hw_dp_continuation3")
