"""Native (C++) host-side components, built on demand with g++.

Components:
  * lapjv.cpp      — LAPJV assignment solver (host-side twin of the on-device
                     JV solver in ops/hungarian.py),
  * imagepipe.cpp  — libpng/libjpeg batch image decode + float conversion for
                     the input pipeline (the TPU analogue of torch
                     DataLoader's C++ workers; see imagepipe.cpp header).

No pip/pybind dependency: plain shared objects loaded through ctypes,
compiled once into the package directory (or $POET_TPU_NATIVE_DIR when the
tree is read-only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIBS: Dict[str, ctypes.CDLL] = {}


def _build_dir() -> str:
    d = os.environ.get("POET_TPU_NATIVE_DIR", _HERE)
    os.makedirs(d, exist_ok=True)
    return d


def _load_lib(name: str, ldflags: Sequence[str] = ()) -> ctypes.CDLL:
    """Build (if stale) and dlopen lib<name>.so from <name>.cpp."""
    if name in _LIBS:
        return _LIBS[name]
    src = os.path.join(_HERE, f"{name}.cpp")
    lib_path = os.path.join(_build_dir(), f"lib{name}.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path, *ldflags]
        )
    lib = ctypes.CDLL(lib_path)
    _LIBS[name] = lib
    return lib


# ---------------------------------------------------------------------------
# LAPJV assignment solver
# ---------------------------------------------------------------------------

def _load() -> ctypes.CDLL:
    lib = _load_lib("lapjv")
    if not getattr(lib, "_typed", False):
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
        lib._typed = True
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


# ---------------------------------------------------------------------------
# Image pipeline (libpng / libjpeg)
# ---------------------------------------------------------------------------

_IMAGEPIPE_FAILED = False


def _load_imagepipe() -> Optional[ctypes.CDLL]:
    """Build+load the decode library; None (once, cached) if the toolchain or
    image libraries are unavailable — callers fall back to PIL."""
    global _IMAGEPIPE_FAILED
    if _IMAGEPIPE_FAILED:
        return None
    try:
        lib = _load_lib("imagepipe", ldflags=("-lpng", "-ljpeg", "-lz"))
    except (OSError, subprocess.CalledProcessError):
        _IMAGEPIPE_FAILED = True
        return None
    if not getattr(lib, "_typed", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ip_probe.restype = ctypes.c_int
        lib.ip_probe.argtypes = [
            u8p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ip_decode_u8.restype = ctypes.c_int
        lib.ip_decode_u8.argtypes = [
            u8p, ctypes.c_size_t, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ip_decode_batch_f32.restype = ctypes.c_int
        lib.ip_decode_batch_f32.argtypes = [
            ctypes.POINTER(u8p), ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.ip_u8_to_f32.restype = None
        lib.ip_u8_to_f32.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib._typed = True
    return lib


def imagepipe_available() -> bool:
    return _load_imagepipe() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def probe_image(blob: bytes) -> Tuple[int, int, int]:
    """(height, width, channels) from the encoded header."""
    lib = _load_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.ip_probe(_as_u8p(blob), len(blob), ctypes.byref(h),
                      ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError(f"cannot probe image header (rc={rc})")
    return h.value, w.value, c.value


def decode_image(blob: bytes, channels: int = 3) -> np.ndarray:
    """Decode one PNG/JPEG into (H, W, channels) uint8.

    channels=3 -> RGB (alpha dropped — PIL convert('RGB') semantics),
    channels=4 -> RGBA (missing alpha filled with 255).
    """
    lib = _load_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable")
    h, w, _ = probe_image(blob)
    out = np.empty((h, w, channels), dtype=np.uint8)
    rc = lib.ip_decode_u8(
        _as_u8p(blob), len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, channels,
    )
    if rc != 0:
        raise ValueError(f"image decode failed (rc={rc})")
    return out


def decode_batch_f32(
    blobs: List[bytes], height: int, width: int,
    out: Optional[np.ndarray] = None, n_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode same-sized images into a (N, H, W, 3) float32 [0,1] batch in one
    GIL-free native call (decode + /255 conversion fused, threaded)."""
    lib = _load_imagepipe()
    if lib is None:
        raise RuntimeError("native imagepipe unavailable")
    n = len(blobs)
    if out is None:
        out = np.empty((n, height, width, 3), dtype=np.float32)
    else:
        assert out.shape == (n, height, width, 3) and out.dtype == np.float32
        assert out.flags.c_contiguous
    if n == 0:
        return out
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_as_u8p(b) for b in blobs])
    sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    rc = lib.ip_decode_batch_f32(
        ptrs, sizes, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if rc != 0:
        idx, err = rc // 10 - 1, rc % 10
        raise ValueError(f"batch decode failed at image {idx} (err={err})")
    return out


def u8_to_f32(arr: np.ndarray, n_threads: int = 1) -> np.ndarray:
    """uint8 -> float32 [0,1] (exactly x/255) through the native LUT pass."""
    lib = _load_imagepipe()
    if lib is None:
        return arr.astype(np.float32) / 255.0
    arr = np.ascontiguousarray(arr)
    out = np.empty(arr.shape, dtype=np.float32)
    lib.ip_u8_to_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.size, n_threads,
    )
    return out
