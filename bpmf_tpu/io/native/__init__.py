"""ctypes loader for the native matrix-I/O library.

Builds ``libbpmf_io.so`` from matrix_io.cpp on first use (g++ + zlib, both
in the base image) and caches it next to the source.  Every entry point
degrades gracefully: if the toolchain or zlib is missing, ``LIB`` is None
and bpmf_tpu.io falls back to the pure-Python readers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "matrix_io.cpp")
_SO = os.path.join(_DIR, "libbpmf_io.so")
_lock = threading.Lock()

LIB = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-lz", "-o", _SO + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32))
    f64pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_double))
    lib.bpmf_last_error.restype = ctypes.c_char_p
    lib.bpmf_free.argtypes = [ctypes.c_void_p]
    lib.bpmf_read_sparse_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_int, u64p, u64p, u64p, u32pp, u32pp, f64pp,
    ]
    lib.bpmf_write_sparse_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.bpmf_read_dense_bin.argtypes = [ctypes.c_char_p, u64p, u64p, f64pp]
    lib.bpmf_write_dense_bin.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.bpmf_read_mtx.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), u64p, u64p, u64p,
        u32pp, u32pp, f64pp, f64pp,
    ]
    lib.bpmf_fill_bucket.restype = ctypes.c_int64
    lib.bpmf_fill_bucket.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    return lib


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global LIB, _tried
    if LIB is not None or _tried:
        return LIB
    with _lock:
        if LIB is not None or _tried:
            return LIB
        _tried = True
        if os.environ.get("BPMF_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            LIB = _bind(ctypes.CDLL(_SO))
        except OSError:
            LIB = None
    return LIB


def _take_u32(ptr, n, lib) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.bpmf_free(ptr)
    return arr


def _take_f64(ptr, n, lib) -> np.ndarray:
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.bpmf_free(ptr)
    return arr


def read_sparse_bin(path: str, pattern: bool):
    """-> (nrow, ncol, rows, cols, vals) with 0-based int arrays."""
    lib = get_lib()
    assert lib is not None
    nrow = ctypes.c_uint64()
    ncol = ctypes.c_uint64()
    nnz = ctypes.c_uint64()
    rows = ctypes.POINTER(ctypes.c_uint32)()
    cols = ctypes.POINTER(ctypes.c_uint32)()
    vals = ctypes.POINTER(ctypes.c_double)()
    rc = lib.bpmf_read_sparse_bin(
        path.encode(), int(pattern), ctypes.byref(nrow), ctypes.byref(ncol),
        ctypes.byref(nnz), ctypes.byref(rows), ctypes.byref(cols),
        ctypes.byref(vals),
    )
    if rc != 0:
        raise IOError(lib.bpmf_last_error().decode())
    n = nnz.value
    r = _take_u32(rows, n, lib)
    c = _take_u32(cols, n, lib)
    v = np.ones(n) if pattern else _take_f64(vals, n, lib)
    return nrow.value, ncol.value, r, c, v


def write_sparse_bin(path, pattern, gz, nrow, ncol, rows, cols, vals):
    lib = get_lib()
    assert lib is not None
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    rc = lib.bpmf_write_sparse_bin(
        path.encode(), int(pattern), int(gz), nrow, ncol, len(rows),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(lib.bpmf_last_error().decode())


def read_dense_bin(path: str):
    lib = get_lib()
    assert lib is not None
    nrow = ctypes.c_uint64()
    ncol = ctypes.c_uint64()
    data = ctypes.POINTER(ctypes.c_double)()
    rc = lib.bpmf_read_dense_bin(
        path.encode(), ctypes.byref(nrow), ctypes.byref(ncol), ctypes.byref(data)
    )
    if rc != 0:
        raise IOError(lib.bpmf_last_error().decode())
    n = nrow.value * ncol.value
    flat = _take_f64(data, n, lib)
    return flat.reshape((nrow.value, ncol.value), order="F").copy()


def write_dense_bin(path: str, gz: bool, x: np.ndarray):
    lib = get_lib()
    assert lib is not None
    xf = np.asfortranarray(x, dtype=np.float64)
    rc = lib.bpmf_write_dense_bin(
        path.encode(), int(gz), x.shape[0], x.shape[1],
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(lib.bpmf_last_error().decode())


def fill_bucket(indptr, indices, data, ids, width, nbr, val, mask, row_slot):
    """Fill one degree bucket's padded arrays in native code; returns the
    number of rows written (see bpmf_fill_bucket in matrix_io.cpp)."""
    lib = get_lib()
    assert lib is not None

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    rows = lib.bpmf_fill_bucket(
        ptr(indptr, ctypes.c_int64), ptr(indices, ctypes.c_int32),
        ptr(data, ctypes.c_double), ptr(ids, ctypes.c_int32),
        len(ids), width, ptr(nbr, ctypes.c_int32),
        ptr(val, ctypes.c_double), ptr(mask, ctypes.c_float),
        ptr(row_slot, ctypes.c_int32), nbr.shape[0],
    )
    if rows < 0:
        raise ValueError("bucket row capacity overflow")
    return rows


def read_mtx(path: str):
    """-> ('sparse', nrow, ncol, rows, cols, vals) or ('dense', array)."""
    lib = get_lib()
    assert lib is not None
    kind = ctypes.c_int()
    nrow = ctypes.c_uint64()
    ncol = ctypes.c_uint64()
    nnz = ctypes.c_uint64()
    rows = ctypes.POINTER(ctypes.c_uint32)()
    cols = ctypes.POINTER(ctypes.c_uint32)()
    vals = ctypes.POINTER(ctypes.c_double)()
    dense = ctypes.POINTER(ctypes.c_double)()
    rc = lib.bpmf_read_mtx(
        path.encode(), ctypes.byref(kind), ctypes.byref(nrow),
        ctypes.byref(ncol), ctypes.byref(nnz), ctypes.byref(rows),
        ctypes.byref(cols), ctypes.byref(vals), ctypes.byref(dense),
    )
    if rc != 0:
        raise IOError(lib.bpmf_last_error().decode())
    if kind.value == 0:
        n = nnz.value
        return (
            "sparse", nrow.value, ncol.value,
            _take_u32(rows, n, lib), _take_u32(cols, n, lib),
            _take_f64(vals, n, lib),
        )
    n = nrow.value * ncol.value
    flat = _take_f64(dense, n, lib)
    return ("dense", flat.reshape((nrow.value, ncol.value), order="F").copy())
