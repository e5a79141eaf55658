"""Native host runtime (C++ via ctypes): BVH builder + OBJ parser.

Compiled on first use with g++ (cached next to the source); every entry
point has a pure-Python fallback, so the framework works without a
toolchain — the native path is the fast default for large scenes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "bpt_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libbpt_native.so")
_HASH = _LIB + ".srchash"  # source-content hash the .so was built from
_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _compile(h: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=300,
        )
        os.replace(_LIB + ".tmp", _LIB)
        with open(_HASH, "w") as f:
            f.write(h)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None.

    Reuse is gated on a content hash of the source (not mtimes): the .so is
    built with -march=native, so a stale binary from another host would
    SIGILL; a fresh checkout has no hash sidecar and always recompiles.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        h = _src_hash()
        built = ""
        if os.path.exists(_HASH):
            try:
                with open(_HASH) as f:
                    built = f.read().strip()
            except OSError:
                built = ""
        if not os.path.exists(_LIB) or built != h:
            if not _compile(h):
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bpt_build_bvh.restype = ctypes.c_int64
        lib.bpt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bpt_parse_obj.restype = ctypes.c_int64
        lib.bpt_parse_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ]
        lib.bpt_free.restype = None
        lib.bpt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ip64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray):
    """Same contract as scene.bvh.build_bvh; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    T = tri_min.shape[0]
    if T == 0:
        return None
    tri_min = np.ascontiguousarray(tri_min, np.float64)
    tri_max = np.ascontiguousarray(tri_max, np.float64)
    cap = 2 * T + 1
    nmin = np.empty((cap, 3), np.float64)
    nmax = np.empty((cap, 3), np.float64)
    skip = np.empty((cap,), np.int32)
    first = np.empty((cap,), np.int32)
    count = np.empty((cap,), np.int32)
    order = np.empty((T,), np.int64)
    n = lib.bpt_build_bvh(
        _dp(tri_min), _dp(tri_max), T,
        _dp(nmin), _dp(nmax), _ip32(skip), _ip32(first), _ip32(count),
        _ip64(order),
    )
    return dict(
        bvh_min=nmin[:n].copy(),
        bvh_max=nmax[:n].copy(),
        bvh_skip=skip[:n].copy(),
        bvh_first=first[:n].copy(),
        bvh_count=count[:n].copy(),
        order=order,
    )


def parse_obj_native(path: str):
    """Same contract as scene.obj.parse_obj; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_double)()
    n = lib.bpt_parse_obj(os.fsencode(path), ctypes.byref(out))
    if n < 0:
        raise FileNotFoundError(path)
    if n == 0:
        lib.bpt_free(out)
        return []
    arr = np.ctypeslib.as_array(out, shape=(int(n), 3, 3)).copy()
    lib.bpt_free(out)
    return [tuple(map(tuple, tri)) for tri in arr]
