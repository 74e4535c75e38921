"""Native (C++) structure-analysis library with lazy build + numpy fallback.

The compute path is JAX/XLA/Pallas; this module is the host-side runtime
piece the reference delegates to native libraries (SuiteSparse/MA97 symbolic
analysis, clever_symmetric.jl's parallel-row machinery).  Built on first use
with g++ into `_structure.so`; a pure-numpy fallback keeps everything
working where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "structure.cpp")
_SO = os.path.join(_HERE, "_structure.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.detect_parallel_rows.restype = ctypes.c_int64
        lib.detect_parallel_rows.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, ctypes.c_double, i64p, f64p]
        lib.rcm_order.restype = None
        lib.rcm_order.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _as_csr(dense: np.ndarray, tol: float = 0.0):
    m, n = dense.shape
    indptr = np.zeros(m + 1, dtype=np.int64)
    indices = []
    data = []
    for i in range(m):
        nz = np.nonzero(np.abs(dense[i]) > tol)[0]
        indptr[i + 1] = indptr[i] + len(nz)
        indices.append(nz)
        data.append(dense[i, nz])
    indices = (np.concatenate(indices) if indices else
               np.zeros(0)).astype(np.int64)
    data = (np.concatenate(data) if data else np.zeros(0)).astype(np.float64)
    return indptr, indices, data


def detect_parallel_rows(J: np.ndarray, tol: float = 1e-12
                         ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Group rows of J that are scalar multiples of each other.

    Returns (group_id[m] — root row index, ratio[m] — row = ratio * root,
    n_groups — count of nontrivial groups).  Native implementation of the
    reference's compare_columns/compute_indicies (clever_symmetric.jl).
    """
    J = np.ascontiguousarray(np.asarray(J, dtype=np.float64))
    m = J.shape[0]
    group = np.arange(m, dtype=np.int64)
    ratio = np.ones(m)
    if m == 0:
        return group, ratio, 0
    lib = get_lib()
    indptr, indices, data = _as_csr(J)
    if lib is not None:
        ng = lib.detect_parallel_rows(
            m,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            tol,
            group.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ratio.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return group, ratio, int(ng)
    # numpy fallback: normalize rows by leading nonzero, hash patterns
    ng = 0
    seen = {}
    for i in range(m):
        s, e = indptr[i], indptr[i + 1]
        if e == s:
            continue
        lead = data[s]
        key = (tuple(indices[s:e].tolist()),
               tuple(np.round(data[s:e] / lead, 9).tolist()))
        if key in seen:
            root = seen[key]
            group[i] = root
            rs = indptr[root]
            ratio[i] = data[s] / data[rs]
            if (group == root).sum() == 2:
                ng += 1
        else:
            seen[key] = i
    return group, ratio, ng


def rcm_order(pattern: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric sparsity pattern."""
    A = np.asarray(pattern)
    A = (np.abs(A) > 0) | (np.abs(A.T) > 0)
    n = A.shape[0]
    lib = get_lib()
    indptr, indices, _ = _as_csr(A.astype(np.float64))
    perm = np.zeros(n, dtype=np.int64)
    if lib is not None:
        lib.rcm_order(
            n,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return perm
    # numpy fallback BFS
    import collections
    deg = A.sum(1)
    visited = np.zeros(n, bool)
    out = []
    while not visited.all():
        seed = int(np.argmin(np.where(visited, np.iinfo(np.int32).max, deg)))
        q = collections.deque([seed])
        visited[seed] = True
        while q:
            u = q.popleft()
            out.append(u)
            nbrs = [v for v in np.nonzero(A[u])[0] if not visited[v]]
            nbrs.sort(key=lambda v: deg[v])
            for v in nbrs:
                visited[v] = True
                q.append(v)
    return np.asarray(out[::-1], dtype=np.int64)
