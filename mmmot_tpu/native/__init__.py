"""Native (C++) components and their ctypes bindings.

Built on demand with g++ (no pybind11 in this image; plain C ABI + ctypes).
``liblap.so`` is compiled next to the sources on first use and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile liblap.so if missing; returns its path."""
    so = os.path.join(_DIR, "liblap.so")
    src = os.path.join(_DIR, "lap.cpp")
    if force or not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so, src],
            check=True, capture_output=True)
    return so


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(build())
            lib.lap_solve.restype = ctypes.c_double
            lib.lap_solve.argtypes = [
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            lib.lap_solve_batch.restype = ctypes.c_int32
            lib.lap_solve_batch.argtypes = [
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                ctypes.c_int32, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def lap_solve(cost: np.ndarray, maximize: bool = False):
    """Exact assignment on a square cost matrix [n, n] (or batch [b, n, n]).

    Returns (row_to_col int32, objective) for single instances, or
    (row_to_col [b, n], None) for batches.
    """
    cost = np.ascontiguousarray(cost, np.float64)
    if maximize:
        cost = -cost
    lib = _lib()
    if cost.ndim == 2:
        n = cost.shape[0]
        out = np.empty(n, np.int32)
        obj = lib.lap_solve(cost, n, out)
        return out, (-obj if maximize else obj)
    if cost.ndim == 3:
        b, n, _ = cost.shape
        out = np.empty((b, n), np.int32)
        lib.lap_solve_batch(cost, b, n, out)
        return out, None
    raise ValueError(f"cost must be [n,n] or [b,n,n], got {cost.shape}")
