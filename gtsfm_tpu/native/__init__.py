"""Native (C++) host-side ops: union-find track formation, graph components.

Compiled on demand with g++ into a shared library loaded via ctypes; numpy
fallbacks keep everything working where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_and_load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_HERE, "dsf.cpp")
        out = os.path.join(_HERE, "_libdsf.so")
        try:
            if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", out],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(out)
            lib.dsf_components.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ]
            lib.dsf_largest_component.argtypes = [
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _components_numpy(n_nodes: int, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(u, v):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    return np.asarray([find(i) for i in range(n_nodes)], np.int64)


def union_find_components(n_nodes: int, edges_u: np.ndarray, edges_v: np.ndarray) -> np.ndarray:
    """Canonical root per node for the union of the given edges."""
    u = np.ascontiguousarray(edges_u, np.int64)
    v = np.ascontiguousarray(edges_v, np.int64)
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(n_nodes, np.int64)
        lib.dsf_components(n_nodes, u.shape[0], u, v, out)
        return out
    return _components_numpy(n_nodes, u, v)


def largest_connected_component(n_nodes: int, edges_u: np.ndarray, edges_v: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of nodes in the largest CC (nodes with no edges excluded).

    Mirrors reference gtsfm/utils/graph.py:20-60.
    """
    u = np.ascontiguousarray(edges_u, np.int64)
    v = np.ascontiguousarray(edges_v, np.int64)
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(n_nodes, np.uint8)
        lib.dsf_largest_component(n_nodes, u.shape[0], u, v, out)
        return out.astype(bool)
    roots = _components_numpy(n_nodes, u, v)
    present = np.zeros(n_nodes, bool)
    present[u] = True
    present[v] = True
    if not present.any():
        return present
    counts = np.bincount(roots[present], minlength=n_nodes)
    best = np.argmax(counts)
    return present & (roots == best)
