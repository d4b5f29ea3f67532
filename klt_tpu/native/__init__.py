"""ctypes bindings for the native host runtime (sort + suppression).

The shared library is compiled on first use (and cached next to the
source); rebuilt automatically when the C source is newer than the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kltnative.c")
_LIB = os.path.join(_HERE, "libkltnative.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB) or
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.klt_sort_points_desc.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.klt_sort_points_desc.restype = None
        lib.klt_min_dist_suppress.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        lib.klt_min_dist_suppress.restype = None
        lib.klt_load_pgm_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64]
        lib.klt_load_pgm_batch.restype = ctypes.c_int64
        _lib = lib
        return lib


def sort_points_desc(pts: np.ndarray) -> np.ndarray:
    """In-place descending sort of int32 [n, 3] (x, y, val) triples by val,
    with the reference's exact tie ordering."""
    pts = np.ascontiguousarray(pts, dtype=np.int32)
    lib = _load()
    lib.klt_sort_points_desc(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(pts.shape[0]))
    return pts


def min_dist_suppress(pts: np.ndarray, fx: np.ndarray, fy: np.ndarray,
                      fval: np.ndarray, ncols: int, nrows: int,
                      mindist: int, min_eigenvalue: int,
                      overwrite_all: bool) -> None:
    """Greedy minimum-distance acceptance into (fx, fy, fval), in place."""
    pts = np.ascontiguousarray(pts, dtype=np.int32)
    assert fx.dtype == np.float32 and fy.dtype == np.float32
    assert fval.dtype == np.int32
    assert fx.flags.c_contiguous and fy.flags.c_contiguous
    assert fval.flags.c_contiguous
    lib = _load()
    lib.klt_min_dist_suppress(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(pts.shape[0]),
        fx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fval.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(fx.shape[0]),
        ctypes.c_int32(ncols), ctypes.c_int32(nrows),
        ctypes.c_int32(max(mindist, 0)), ctypes.c_int32(min_eigenvalue),
        ctypes.c_int32(1 if overwrite_all else 0))


def load_pgm_batch(paths, height: int, width: int,
                   n_threads: int = 8) -> np.ndarray:
    """Threaded batch load of binary PGM frames -> uint8 [n, h, w].

    The native analogue of looping pgmReadFile (src/V1/pnmio.c:206-230),
    parallelized across files for long sequences."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, height, width), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.klt_load_pgm_batch(
        arr, ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(height), ctypes.c_int64(width),
        ctypes.c_int64(n_threads))
    if rc != 0:
        raise IOError(f"failed to load PGM file: {paths[rc - 1]}")
    return out
