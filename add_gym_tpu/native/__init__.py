"""ctypes bindings for the native C++ data loader (loader.cpp).

Auto-builds ``libagtnative.so`` with g++ on first import if missing (build
output lands next to this file).  Every entry point has a pure-numpy
fallback, so the package works without a toolchain — the native path is a
host-side performance optimization, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libagtnative.so")

_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.agt_parse_motion_csv.restype = ctypes.c_int
    lib.agt_parse_motion_csv.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.agt_free.restype = None
    lib.agt_free.argtypes = [ctypes.c_void_p]
    lib.agt_stl_aabb.restype = ctypes.c_int
    lib.agt_stl_aabb.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_motion_csv(path: str) -> np.ndarray:
    """Parse a ``.motion`` CSV into a [T, C] float64 array (native if possible)."""
    lib = _load()
    if lib is None:
        return np.atleast_2d(np.loadtxt(path, delimiter=",", dtype=np.float64))
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.agt_parse_motion_csv(
        path.encode(), ctypes.byref(out), ctypes.byref(rows), ctypes.byref(cols)
    )
    if rc != 0:
        raise IOError(f"agt_parse_motion_csv({path!r}) failed with code {rc}")
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.agt_free(out)
    return arr.reshape(rows.value, cols.value)


def stl_aabb(path: str):
    """AABB (lo, hi) of a binary STL (native if possible)."""
    lib = _load()
    if lib is None:
        from add_gym_tpu.physics.stl import stl_aabb as py_stl_aabb

        return py_stl_aabb(path)
    lo = (ctypes.c_float * 3)()
    hi = (ctypes.c_float * 3)()
    rc = lib.agt_stl_aabb(path.encode(), lo, hi)
    if rc != 0:
        raise IOError(f"agt_stl_aabb({path!r}) failed with code {rc}")
    return np.array(lo, np.float32), np.array(hi, np.float32)
