"""ctypes bindings for the native graph-IO library (native/graphio.cpp).

Auto-builds `libgraphio.so` with g++ on first import if missing; any
failure falls back to the NumPy parser in market.py (import of this
module raises, and callers catch).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libgraphio.so")


def _ensure_built() -> str:
    src = os.path.join(_NATIVE_DIR, "graphio.cpp")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, src],
            check=True, capture_output=True)
    return _SO


class _MtxResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("m", ctypes.c_int64),
        ("symmetric", ctypes.c_int),
        ("has_values", ctypes.c_int),
        ("first", ctypes.POINTER(ctypes.c_int64)),
        ("second", ctypes.POINTER(ctypes.c_int64)),
        ("values", ctypes.POINTER(ctypes.c_float)),
        ("error", ctypes.c_char * 256),
    ]


_lib = ctypes.CDLL(_ensure_built())
_lib.gr_parse_mtx.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MtxResult)]
_lib.gr_parse_mtx.restype = ctypes.c_int
_lib.gr_free.argtypes = [ctypes.c_void_p]


def parse_mtx(path: str):
    """Returns (n, rows, cols, values|None, symmetric) with the
    reference's direction convention: a line "a b" is edge b-1 -> a-1
    (market.cuh:150)."""
    res = _MtxResult()
    rc = _lib.gr_parse_mtx(path.encode(), ctypes.byref(res))
    if rc != 0:
        err = res.error.decode(errors="replace")
        if "cannot open" in err:
            raise FileNotFoundError(err)
        raise ValueError(f"mtx parse failed: {err}")
    m = res.m
    try:
        first = np.ctypeslib.as_array(res.first, shape=(m,)).copy()
        second = np.ctypeslib.as_array(res.second, shape=(m,)).copy()
        values = None
        if res.values:
            values = np.ctypeslib.as_array(res.values, shape=(m,)).copy()
    finally:
        _lib.gr_free(res.first)
        _lib.gr_free(res.second)
        if res.values:
            _lib.gr_free(res.values)
    # reference convention: col token first, row token second
    rows = second - 1
    cols = first - 1
    if not res.has_values:
        values = None
    return int(res.n), rows, cols, values, bool(res.symmetric)
