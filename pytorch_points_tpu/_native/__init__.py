"""ctypes binding for the native host-side library (csrc/ppt_native.cpp).

Gracefully degrades: every entry point returns None when the shared
library isn't built, and the pure-NumPy fallbacks in utils/pc_utils.py
take over.  Build with ``make -C csrc`` or
``python -m pytorch_points_tpu._native.build``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libppt_native.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return False
    lib.ply_vertex_count.restype = ctypes.c_long
    lib.ply_vertex_count.argtypes = [ctypes.c_char_p]
    lib.ply_read_xyz.restype = ctypes.c_int
    lib.ply_read_xyz.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.fps.restype = None
    lib.fps.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                        ctypes.c_void_p]
    lib.grid_subsample.restype = ctypes.c_long
    lib.grid_subsample.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.c_float, ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def read_ply_xyz(path: str):
    """Fast binary-PLY xyz reader; None if unsupported layout/unbuilt."""
    lib = _load()
    if not lib:
        return None
    n = lib.ply_vertex_count(path.encode())
    if n < 0:
        return None
    out = np.empty((n, 3), np.float32)
    if lib.ply_read_xyz(path.encode(), out.ctypes.data) != 0:
        return None
    return out


def fps(xyz: np.ndarray, k: int):
    """Host FPS, identical semantics to the device kernel; None if unbuilt."""
    lib = _load()
    if not lib:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    out = np.empty(k, np.int32)
    lib.fps(xyz.ctypes.data, xyz.shape[0], k, out.ctypes.data)
    return out


def grid_subsample(xyz: np.ndarray, cell: float):
    """Voxel-grid downsample to per-cell centroids; None if unbuilt."""
    lib = _load()
    if not lib:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    m = lib.grid_subsample(xyz.ctypes.data, xyz.shape[0], cell, None)
    out = np.empty((m, 3), np.float32)
    lib.grid_subsample(xyz.ctypes.data, xyz.shape[0], cell, out.ctypes.data)
    return out
