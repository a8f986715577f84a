"""Native sampling runtime: C++/OpenMP library loaded via ctypes.

Build-on-first-import like the reference's torch cpp_extension JIT
(cogdl/operators/spmm.py:12-22), but with plain g++ + ctypes (no torch).
Falls back cleanly: callers check ``available()`` and use the numpy samplers
in cogdl_tpu.data.sampling otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_sampler.cpp")
_LIB_PATH = os.path.join(_HERE, "libgraph_sampler.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        sys.stderr.write(f"[cogdl_tpu.native] build failed: {e}\n")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:  # pragma: no cover
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.sample_neighbors.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_uint64, i64p, u8p]
    lib.random_walk.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_double,
                                ctypes.c_uint64, i64p]
    lib.node2vec_walk.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_uint64, i64p]
    lib.induced_subgraph.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.induced_subgraph.restype = ctypes.c_int64
    lib.coo2csr.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                            i64p, i64p, i64p]
    lib.omp_max_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def sample_neighbors(indptr, indices, seeds, fanout: int, seed: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    out = np.empty(n * fanout, np.int64)
    mask = np.empty(n * fanout, np.uint8)
    lib.sample_neighbors(np.ascontiguousarray(indptr, np.int64),
                         np.ascontiguousarray(indices, np.int64),
                         seeds, n, fanout, seed, out, mask)
    return out, mask.astype(bool)


def random_walk(indptr, indices, starts, walk_length: int,
                restart_prob: float = 0.0, seed: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((starts.shape[0], walk_length), np.int64)
    lib.random_walk(np.ascontiguousarray(indptr, np.int64),
                    np.ascontiguousarray(indices, np.int64),
                    starts, starts.shape[0], walk_length, restart_prob, seed,
                    out.reshape(-1))
    return out


def node2vec_walk(indptr, indices, starts, walk_length: int, p: float = 1.0,
                  q: float = 1.0, seed: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None
    starts = np.ascontiguousarray(starts, np.int64)
    out = np.empty((starts.shape[0], walk_length), np.int64)
    lib.node2vec_walk(np.ascontiguousarray(indptr, np.int64),
                      np.ascontiguousarray(indices, np.int64),
                      starts, starts.shape[0], walk_length, p, q, seed,
                      out.reshape(-1))
    return out


def induced_subgraph(indptr, indices, nodes, num_nodes: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    nodes = np.ascontiguousarray(np.sort(np.asarray(nodes, np.int64)))
    max_edges = int(np.sum(np.asarray(indptr)[nodes + 1]
                           - np.asarray(indptr)[nodes]))
    row = np.empty(max(max_edges, 1), np.int64)
    col = np.empty(max(max_edges, 1), np.int64)
    e = lib.induced_subgraph(np.ascontiguousarray(indptr, np.int64),
                             np.ascontiguousarray(indices, np.int64),
                             nodes, nodes.shape[0], num_nodes,
                             max(max_edges, 1), row, col)
    return row[:e], col[:e]


def coo2csr(row, col, num_nodes: int
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    E = row.shape[0]
    indptr = np.empty(num_nodes + 1, np.int64)
    indices = np.empty(max(E, 1), np.int64)
    perm = np.empty(max(E, 1), np.int64)
    lib.coo2csr(row, col, E, num_nodes, indptr, indices, perm)
    return indptr, indices[:E], perm[:E]
