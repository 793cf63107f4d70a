"""ctypes bindings for the native host-side kernels (C++), with NumPy fallbacks.

Build happens lazily on first use (g++ is in the image; pybind11 is not, hence the plain
C ABI + ctypes). If compilation fails, callers transparently fall back to the NumPy
implementations in ``palettenerf_tpu.extraction``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "palette_native.cpp")
_LIB = os.path.join(_HERE, "libpalette_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmds = [
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _LIB],
        ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],  # no-openmp fallback
    ]
    for cmd in cmds:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.rgb_histogram.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        lib.rgb_histogram_centers.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.point_triangle_min_dist.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def rgb_histogram_native(colors: np.ndarray, weights: np.ndarray, bpc: int):
    """Native path of extraction.histogram.compute_rgb_histogram; returns None if
    the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    colors = np.ascontiguousarray(colors, np.float32)
    weights = np.ascontiguousarray(weights, np.float32)
    num_bins = 1 << (3 * bpc)
    bw = np.zeros(num_bins, np.float64)
    lib.rgb_histogram(_ptr(colors, ctypes.c_float), _ptr(weights, ctypes.c_float),
                      len(weights), bpc, _ptr(bw, ctypes.c_double))
    centers = np.zeros((num_bins, 3), np.float32)
    lib.rgb_histogram_centers(bpc, _ptr(centers, ctypes.c_float))
    return bw, centers


def point_triangle_min_dist_native(points: np.ndarray, tris: np.ndarray):
    """Native path of extraction.geometry.closest_point_on_hull's inner loop."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    tris = np.ascontiguousarray(tris, np.float64)
    n, t = len(points), len(tris)
    dist = np.zeros(n, np.float64)
    closest = np.zeros((n, 3), np.float64)
    lib.point_triangle_min_dist(_ptr(points, ctypes.c_double), n,
                                _ptr(tris, ctypes.c_double), t,
                                _ptr(dist, ctypes.c_double), _ptr(closest, ctypes.c_double))
    return dist, closest
