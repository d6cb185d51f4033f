"""ctypes loader/builder for the C++ preprocessing kernels.

Compiles native/plagnn_native.cpp on first use (g++, cached as a shared
library next to this file); every entry point has a pure scipy/numpy
fallback, so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "plagnn_native.cpp",
)
_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_libplagnn_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_OUT) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_OUT)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                     "-fPIC", _SRC, "-o", _OUT],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_OUT)
            lib.common_neighbors.restype = None
            lib.common_neighbors.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ]
            lib.diff_threshold_scan.restype = ctypes.c_int64
            lib.diff_threshold_scan.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def common_neighbors(csr, rows: np.ndarray, cols: np.ndarray) -> Optional[np.ndarray]:
    """Per-query-edge common-neighbor counts; None if the library is
    unavailable (caller falls back to scipy)."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(csr.indptr, np.int64)
    indices = np.ascontiguousarray(csr.indices, np.int32)
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    out = np.empty(len(rows), np.float64)
    lib.common_neighbors(
        _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(rows, ctypes.c_int32), _ptr(cols, ctypes.c_int32),
        len(rows), _ptr(out, ctypes.c_double),
    )
    return out


def diff_threshold_scan(
    z_inter: np.ndarray, z_nor: np.ndarray, row0: int, row1: int,
    lo: float, hi: float, max_out: int,
):
    """Threshold-exceeding (i, j, kind) triples for a row block; None if the
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    z_inter = np.ascontiguousarray(z_inter, np.float64)
    z_nor = np.ascontiguousarray(z_nor, np.float64)
    n, k = z_inter.shape
    oi = np.empty(max_out, np.int32)
    oj = np.empty(max_out, np.int32)
    ok = np.empty(max_out, np.int8)
    cnt = lib.diff_threshold_scan(
        _ptr(z_inter, ctypes.c_double), _ptr(z_nor, ctypes.c_double),
        n, k, row0, row1, lo, hi,
        _ptr(oi, ctypes.c_int32), _ptr(oj, ctypes.c_int32),
        _ptr(ok, ctypes.c_int8), max_out,
    )
    return oi[:cnt].copy(), oj[:cnt].copy(), ok[:cnt].copy()


def available() -> bool:
    return _load() is not None
