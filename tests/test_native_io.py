"""Native C++ I/O cross-validation: the C++ reader/writer and the Python
reader/writer must agree byte-for-byte on every binary format, plain and
gzipped (the arbiter layout is documented in bpmf_tpu/io/matrix_io.py)."""

import importlib
import os

import numpy as np
import pytest
import scipy.sparse as sp

from bpmf_tpu.io import native, read_matrix, write_matrix

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _rand_sparse(rng, shape=(17, 9), nnz=31):
    rows = rng.integers(0, shape[0], nnz)
    cols = rng.integers(0, shape[1], nnz)
    vals = rng.random(nnz) * 4 + 1
    return sp.csc_matrix((vals, (rows, cols)), shape=shape)


@pytest.fixture
def no_native(monkeypatch):
    """Context where read/write fall back to pure Python."""
    monkeypatch.setenv("BPMF_NO_NATIVE", "1")
    saved_lib, saved_tried = native.LIB, native._tried
    native.LIB, native._tried = None, False
    yield
    native.LIB, native._tried = saved_lib, saved_tried


@pytest.mark.parametrize("ext", ["sdm", "sbm", "ddm", "sdm.gz", "ddm.gz"])
def test_python_writes_native_reads(tmp_path, rng, ext, no_native):
    base = ext.split(".")[0]
    x = rng.random((11, 5)) if base == "ddm" else _rand_sparse(rng)
    path = str(tmp_path / f"m.{ext}")
    write_matrix(path, x)  # python writer (native disabled)
    native.LIB, native._tried = None, False
    os.environ.pop("BPMF_NO_NATIVE", None)
    y = read_matrix(path)  # native reader
    if base == "ddm":
        np.testing.assert_allclose(y, x)
    elif base == "sbm":
        np.testing.assert_array_equal(y.toarray() != 0, x.toarray() > 0)
    else:
        np.testing.assert_allclose(y.toarray(), x.toarray())


@pytest.mark.parametrize("ext", ["sdm", "sbm", "ddm", "sdm.gz"])
def test_native_writes_python_reads(tmp_path, rng, ext):
    base = ext.split(".")[0]
    x = rng.random((7, 13)) if base == "ddm" else _rand_sparse(rng)
    path = str(tmp_path / f"m.{ext}")
    write_matrix(path, x)  # native writer
    os.environ["BPMF_NO_NATIVE"] = "1"
    saved = native.LIB, native._tried
    native.LIB, native._tried = None, False
    try:
        y = read_matrix(path)  # python reader
    finally:
        native.LIB, native._tried = saved
        os.environ.pop("BPMF_NO_NATIVE", None)
    if base == "ddm":
        np.testing.assert_allclose(y, x)
    elif base == "sbm":
        np.testing.assert_array_equal(y.toarray() != 0, x.toarray() > 0)
    else:
        np.testing.assert_allclose(y.toarray(), x.toarray())


def test_native_mtx_matches_python(tmp_path, rng):
    x = _rand_sparse(rng, shape=(23, 11), nnz=47)
    path = str(tmp_path / "m.mtx")
    write_matrix(path, x)
    y = read_matrix(path)  # native tokenizer
    np.testing.assert_allclose(y.toarray(), x.toarray(), rtol=1e-12)


def test_native_reads_reference_data():
    m = read_matrix("/root/reference/data/movielens/ml-train.mtx")
    g = read_matrix("/root/reference/data/movielens/ml-train.mtx.gz")
    assert m.shape == (943, 1682) and m.nnz == 80000
    assert (m != g).nnz == 0


def test_native_error_reporting(tmp_path):
    p = str(tmp_path / "bad.sdm")
    open(p, "wb").write(b"short")
    with pytest.raises((IOError, ValueError)):
        # native fails -> fallback python reader also fails on garbage
        read_matrix(p)
