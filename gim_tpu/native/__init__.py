"""Native (C++) host-runtime components with pure-numpy fallbacks.

Currently: the pseudo-label chain-intersection `link` (the data factory's
hot loop, see link.cpp). Built lazily with g++ on first use; falls back to
numpy if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libgimlink.so")
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_HERE, "link.cpp"))):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH,
                 os.path.join(_HERE, "link.cpp")],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gim_link.restype = ctypes.c_longlong
        lib.gim_link.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


def _link_numpy(label0: np.ndarray, label1: np.ndarray,
                width: int) -> np.ndarray:
    """Fallback: same semantics as walk.create_table/link."""
    k0 = np.round(label0[:, 2]) + np.round(label0[:, 3]) * width
    k1 = np.round(label1[:, 0]) + np.round(label1[:, 1]) * width
    t0 = dict(zip(k0.tolist(), range(len(k0))))
    t1 = dict(zip(k1.tolist(), range(len(k1))))
    keys = t0.keys() & t1.keys()
    if not keys:
        return np.zeros((0, 4), np.float32)
    i = np.array([t0[k] for k in keys])
    j = np.array([t1[k] for k in keys])
    ij = np.unique(np.stack([i, j]), axis=1)
    return np.concatenate([label0[ij[0], :2], label1[ij[1], 2:]],
                          axis=1).astype(np.float32)


def link_fast(label0: np.ndarray, label1: np.ndarray,
              width: int) -> np.ndarray:
    """Chain (N,4)+(M,4) label sets through exact middle-pixel matches."""
    label0 = np.ascontiguousarray(label0, np.float32)
    label1 = np.ascontiguousarray(label1, np.float32)
    lib = _get_lib()
    if lib is None:
        return _link_numpy(label0, label1, width)
    max_out = min(len(label0), len(label1))
    out = np.empty((max(max_out, 1), 4), np.float32)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = lib.gim_link(fptr(label0), len(label0), fptr(label1), len(label1),
                     int(width), fptr(out), max_out)
    if n < 0:  # shouldn't happen (intersection <= min sizes), but be safe
        return _link_numpy(label0, label1, width)
    return out[:n].copy()
