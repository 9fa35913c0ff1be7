"""ctypes bindings for the native rank-order clustering core.

Builds ``librankorder.so`` on first use with g++ (cached next to the source);
falls back cleanly when no compiler is available — callers check
``available()`` and use the pure-Python implementation otherwise."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rankorder.cc")
_LIB = os.path.join(_HERE, "librankorder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.rank_order_cluster.restype = ctypes.c_int
        lib.rank_order_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rank_order_cluster_native(dist_matrix: np.ndarray, n_neighbours: int = 20,
                              k_norm: int = 12, t: float = 14.0,
                              norm_threshold: float = 0.9) -> List[List[int]]:
    """Native rank-order clustering; same result contract as the Python
    implementation (clusters with >1 member, unsorted)."""
    lib = _load()
    assert lib is not None, "native rankorder library unavailable"
    d = np.ascontiguousarray(dist_matrix, dtype=np.float32)
    n = d.shape[0]
    labels = np.zeros(n, dtype=np.int32)
    lib.rank_order_cluster(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, n_neighbours,
        k_norm, t, norm_threshold,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    clusters: dict = {}
    for i, l in enumerate(labels):
        clusters.setdefault(int(l), []).append(i)
    return [c for c in clusters.values() if len(c) > 1]
