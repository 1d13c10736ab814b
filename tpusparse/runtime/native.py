"""ctypes binding to the native C++/OpenMP inspector (csrc/inspector.cpp).

The reference binds its native code through a pybind11 torch extension
(src/custom_mm.cpp, src/setup.py); here the host-side runtime is a plain
shared library loaded via ctypes — no torch, no pybind, and the compute
path stays JAX/XLA. Auto-builds with g++ on first use (cached); falls
back to the pure-numpy inspector when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libtsinspector.so")
_SRC = os.path.join(_HERE, os.pardir, os.pardir, "csrc", "inspector.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-march=native",
        "-fPIC",
        "-fopenmp",
        "-std=c++17",
        "-shared",
        _SRC,
        "-o",
        _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (
            os.path.exists(_SO_PATH)
            and os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO_PATH)
        )
        if (not os.path.exists(_SO_PATH) or stale) and not _build():
            if not os.path.exists(_SO_PATH):
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.ts_inspect_count.restype = ctypes.c_int64
        lib.ts_inspect_count.argtypes = [
            i32p,
            ctypes.c_int64,
            i32p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            i32p,
        ]
        lib.ts_inspect_fill.restype = None
        lib.ts_inspect_fill.argtypes = [
            i32p,
            ctypes.c_int64,
            i32p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            i32p,
            i64p,
        ]
        lib.ts_coo_to_csr.restype = None
        lib.ts_coo_to_csr.argtypes = [
            i32p,
            ctypes.c_int64,
            ctypes.c_int64,
            i32p,
            i64p,
        ]
        lib.ts_spgemm_count.restype = ctypes.c_int64
        lib.ts_spgemm_count.argtypes = [
            i32p,
            ctypes.c_int64,
            i32p,
            i32p,
            i32p,
            ctypes.c_int64,
            i32p,
        ]
        lib.ts_spgemm_fill.restype = None
        lib.ts_spgemm_fill.argtypes = [
            i32p,
            ctypes.c_int64,
            i32p,
            i32p,
            i32p,
            ctypes.c_int64,
            i32p,
            i32p,
            i32p,
            i32p,
            i32p,
        ]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        for fac in ("ts_ilu0", "ts_ic0"):
            fn = getattr(lib, fac)
            fn.restype = ctypes.c_int64
            fn.argtypes = [i32p, i32p, ctypes.c_int64, f64p]
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.ts_aggregate.restype = ctypes.c_int64
        lib.ts_aggregate.argtypes = [i32p, i32p, u8p, ctypes.c_int64, i64p]
        lib.ts_num_threads.restype = ctypes.c_int
        lib.ts_num_threads.argtypes = []
        _lib = lib
        return _lib


def available() -> bool:
    if os.environ.get("TPUSPARSE_NO_NATIVE"):
        return False
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.ts_num_threads() if lib else 0


def inspect(
    indptr: np.ndarray,
    indices: np.ndarray,
    shape: Tuple[int, int],
    blocksize: Tuple[int, int],
):
    """Drop-in replacement for plan._inspect_numpy (same return contract)."""
    lib = _load()
    assert lib is not None
    m, k = shape
    bm, bk = blocksize
    nbr = -(-m // bm)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    nnz = int(indices.shape[0])

    nslots = np.zeros((nbr,), dtype=np.int32)
    ell_width = int(lib.ts_inspect_count(indptr, m, indices, k, bm, bk, nslots))
    block_cols = np.zeros((nbr, ell_width), dtype=np.int32)
    scatter_idx = np.zeros((nnz,), dtype=np.int64)
    lib.ts_inspect_fill(
        indptr, m, indices, k, bm, bk, ell_width, block_cols, scatter_idx
    )
    if scatter_idx.size and scatter_idx.max(initial=0) < np.iinfo(np.int32).max:
        scatter_idx = scatter_idx.astype(np.int32)
    nblocks = int(nslots.sum())
    return block_cols, nslots, scatter_idx, ell_width, nblocks


def spgemm_symbolic(
    a_indptr: np.ndarray,
    a_indices: np.ndarray,
    b_indptr: np.ndarray,
    b_indices: np.ndarray,
    m: int,
    n: int,
):
    """Native SpGEMM symbolic pass: C's CSR pattern + the multiplication
    schedule (a_pos, b_pos, c_pos) sorted by c_pos.

    Returns (c_indptr, c_indices, a_pos, b_pos, c_pos), all int32, or
    None if the schedule would overflow int32 indexing (caller raises).
    """
    lib = _load()
    assert lib is not None
    a_indptr = np.ascontiguousarray(a_indptr, dtype=np.int32)
    a_indices = np.ascontiguousarray(a_indices, dtype=np.int32)
    b_indptr = np.ascontiguousarray(b_indptr, dtype=np.int32)
    b_indices = np.ascontiguousarray(b_indices, dtype=np.int32)
    c_indptr = np.zeros((m + 1,), dtype=np.int32)
    c_nnz = int(
        lib.ts_spgemm_count(
            a_indptr, m, a_indices, b_indptr, b_indices, n, c_indptr
        )
    )
    if c_nnz < 0:
        return None
    b_deg = np.diff(b_indptr.astype(np.int64))
    nmul = int(b_deg[a_indices].sum())
    c_indices = np.zeros((c_nnz,), dtype=np.int32)
    a_pos = np.zeros((nmul,), dtype=np.int32)
    b_pos = np.zeros((nmul,), dtype=np.int32)
    c_pos = np.zeros((nmul,), dtype=np.int32)
    lib.ts_spgemm_fill(
        a_indptr,
        m,
        a_indices,
        b_indptr,
        b_indices,
        n,
        c_indptr,
        c_indices,
        a_pos,
        b_pos,
        c_pos,
    )
    return c_indptr, c_indices, a_pos, b_pos, c_pos


def factorize_inplace(
    kind: str, indptr: np.ndarray, indices: np.ndarray, vals64: np.ndarray
) -> int:
    """Native ILU(0)/IC(0) value pass on fp64 values IN PLACE.

    kind: 'ilu0' (full square pattern, sorted, diagonal present) or 'ic0'
    (lower-triangular pattern, diagonal last per row). Returns 0 on
    success, -(i+1) for a structural/pivot failure at row i.
    """
    lib = _load()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    assert vals64.dtype == np.float64 and vals64.flags.c_contiguous
    fn = lib.ts_ilu0 if kind == "ilu0" else lib.ts_ic0
    return int(fn(indptr, indices, indptr.shape[0] - 1, vals64))


def coo_to_csr(rows: np.ndarray, m: int):
    """Native counting sort: (indptr (m+1,) int32, order (nnz,) int64)
    with csr_entry[i] = coo_entry[order[i]] (stable within rows)."""
    lib = _load()
    assert lib is not None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    nnz = int(rows.shape[0])
    indptr = np.zeros((m + 1,), dtype=np.int32)
    order = np.zeros((nnz,), dtype=np.int64)
    lib.ts_coo_to_csr(rows, nnz, m, indptr, order)
    return indptr, order


def aggregate(
    indptr: np.ndarray, indices: np.ndarray, strong: np.ndarray
) -> Tuple[np.ndarray, int]:
    """Native greedy strength-graph aggregation (csrc ts_aggregate).

    Returns (agg (n,) int64, n_agg) — bitwise-identical to the Python
    pass in tpusparse/amg.py.
    """
    lib = _load()
    assert lib is not None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    strong = np.ascontiguousarray(strong, dtype=np.uint8)
    n = indptr.shape[0] - 1
    agg = np.empty(n, np.int64)
    n_agg = int(lib.ts_aggregate(indptr, indices, strong, n, agg))
    return agg, n_agg
