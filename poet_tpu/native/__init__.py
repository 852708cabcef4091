"""Native (C++) host-side components, built on demand with g++.

Currently: the LAPJV assignment solver (see lapjv.cpp for why it exists next
to the on-device solver). No pip/pybind dependency: a plain shared object
loaded through ctypes, compiled once into the package directory (or
$POET_TPU_NATIVE_DIR when the tree is read-only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None


def _build_dir() -> str:
    d = os.environ.get("POET_TPU_NATIVE_DIR", _HERE)
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_HERE, "lapjv.cpp")
    lib_path = os.path.join(_build_dir(), "liblapjv.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path]
        )
    lib = ctypes.CDLL(lib_path)
    lib.lapjv.restype = ctypes.c_double
    lib.lapjv.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lapjv_batch.restype = None
    lib.lapjv_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def lapjv(cost: np.ndarray) -> np.ndarray:
    """Solve min-cost assignment on a square (n, n) or batched (b, n, n)
    cost matrix. Returns col_of_row int32 of shape (n,) / (b, n)."""
    lib = _load()
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    if cost.ndim == 2:
        n = cost.shape[0]
        assert cost.shape == (n, n)
        out = np.zeros(n, dtype=np.int32)
        lib.lapjv(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    b, n, n2 = cost.shape
    assert n == n2
    out = np.zeros((b, n), dtype=np.int32)
    lib.lapjv_batch(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
