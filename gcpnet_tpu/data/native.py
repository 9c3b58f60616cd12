"""ctypes bindings for the C++ host graph-construction kernels
(cpp/graph_kernels.cpp).  Auto-builds the shared library with make on first
use; callers fall back to the numpy/scipy paths when the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CPP_DIR = os.path.join(_REPO_ROOT, "cpp")
_SO_PATH = os.path.join(_CPP_DIR, "libgraphkernels.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        subprocess.run(
            ["make", "-C", _CPP_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_SO_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.radius_graph.restype = ctypes.c_int64
    lib.radius_graph.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        i32p, i32p, ctypes.c_int64,
    ]
    lib.knn_graph.restype = ctypes.c_int64
    lib.knn_graph.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        i32p, i32p, ctypes.c_int64,
    ]
    lib.hybrid_knn_graph.restype = ctypes.c_int64
    lib.hybrid_knn_graph.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, ctypes.c_int64,
    ]
    lib._u8p = u8p
    _LIB = lib
    return lib


def radius_graph_native(
    coords: np.ndarray, r: float, max_neighbors: int = 32
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    cap = n * max_neighbors
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    count = lib.radius_graph(
        coords, n, float(r), int(max_neighbors), senders, receivers, cap
    )
    return senders[:count].copy(), receivers[:count].copy()


def knn_graph_native(
    coords: np.ndarray, k: int, valid: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    cap = n * k
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    vptr = None
    if valid is not None:
        varr = np.ascontiguousarray(valid.astype(np.uint8))
        vptr = varr.ctypes.data_as(ctypes.c_void_p)
    count = lib.knn_graph(coords, n, int(k), vptr, senders, receivers, cap)
    return senders[:count].copy(), receivers[:count].copy()


def hybrid_knn_graph_native(
    coords: np.ndarray, k_min: int, k_max: int
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    coords = np.ascontiguousarray(coords, dtype=np.float32)
    n = coords.shape[0]
    cap = n * (k_max + 2 * k_min)
    senders = np.empty(cap, np.int32)
    receivers = np.empty(cap, np.int32)
    count = lib.hybrid_knn_graph(
        coords, n, int(k_min), int(k_max), senders, receivers, cap
    )
    return senders[:count].copy(), receivers[:count].copy()
