"""Compile-and-load for the native csparse library (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csparse.cpp")
_LIB = os.path.join(_HERE, "libcsparse.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _compile():
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_csparse():
    """Return the ctypes library handle, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _compile()
            lib = ctypes.CDLL(_LIB)
        except Exception:
            _load_failed = True
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        i8p = ctypes.POINTER(ctypes.c_int8)

        lib.csparse_spgemm.restype = ctypes.c_int
        lib.csparse_spgemm.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, f64p,
            i64p, i32p, f64p,
            ctypes.POINTER(i64p), ctypes.POINTER(i32p), ctypes.POINTER(f64p),
            i64p,
        ]
        lib.csparse_transpose.restype = ctypes.c_int
        lib.csparse_transpose.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, f64p,
            i64p, i32p, f64p,
        ]
        lib.csparse_pmis.restype = ctypes.c_int64
        lib.csparse_pmis.argtypes = [
            ctypes.c_int64, i64p, i32p, i64p, i32p, f64p, i8p,
        ]
        lib.csparse_free_i64.argtypes = [i64p]
        lib.csparse_free_i32.argtypes = [i32p]
        lib.csparse_free_f64.argtypes = [f64p]
        _lib = lib
        return _lib
