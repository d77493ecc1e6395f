"""I/O format tests: round-trips for every format the reference supports
(c++/io.cpp:31-77) plus byte-layout checks of the binary formats against the
documented reference layout (c++/io.cpp:256-314,607-682)."""

import gzip
import struct

import numpy as np
import pytest
import scipy.sparse as sp

from bpmf_tpu.io import read_matrix, write_matrix


def _rand_sparse(rng, shape=(13, 7), nnz=23):
    rows = rng.integers(0, shape[0], nnz)
    cols = rng.integers(0, shape[1], nnz)
    vals = rng.random(nnz) * 5 + 0.5
    return sp.csc_matrix((vals, (rows, cols)), shape=shape)


@pytest.mark.parametrize("ext", ["mtx", "sdm", "mtx.gz", "sdm.gz"])
def test_sparse_roundtrip(tmp_path, rng, ext):
    x = _rand_sparse(rng)
    path = str(tmp_path / f"m.{ext}")
    write_matrix(path, x)
    y = read_matrix(path)
    assert y.shape == x.shape
    np.testing.assert_allclose(y.toarray(), x.toarray(), rtol=1e-12)


@pytest.mark.parametrize("ext", ["ddm", "csv", "mtx", "ddm.gz"])
def test_dense_roundtrip(tmp_path, rng, ext):
    x = rng.random((9, 4))
    path = str(tmp_path / f"d.{ext}")
    write_matrix(path, x)
    y = read_matrix(path)
    tol = 1e-4 if ext == "csv" else 1e-12  # csv writes %.6g like the reference
    np.testing.assert_allclose(y, x, rtol=tol)


def test_sbm_pattern_roundtrip(tmp_path, rng):
    x = _rand_sparse(rng)
    path = str(tmp_path / "m.sbm")
    write_matrix(path, x)
    y = read_matrix(path)
    np.testing.assert_array_equal(
        (y.toarray() != 0), (x.toarray() > 0)
    )
    assert set(y.tocoo().data) <= {1.0}


def test_sdm_byte_layout(tmp_path):
    """Exact on-disk layout: u64 nrow/ncol/nnz, u32 1-based rows, u32 1-based
    cols, f64 vals (c++/io.cpp:256-288)."""
    x = sp.csc_matrix(np.array([[0.0, 1.5], [2.5, 0.0], [0.0, 3.5]]))
    path = str(tmp_path / "m.sdm")
    write_matrix(path, x)
    raw = open(path, "rb").read()
    nrow, ncol, nnz = struct.unpack("<3Q", raw[:24])
    assert (nrow, ncol, nnz) == (3, 2, 3)
    rows = struct.unpack("<3I", raw[24:36])
    cols = struct.unpack("<3I", raw[36:48])
    vals = struct.unpack("<3d", raw[48:72])
    # column-major entry order, 1-based
    assert rows == (2, 1, 3)
    assert cols == (1, 2, 2)
    assert vals == (2.5, 1.5, 3.5)
    assert len(raw) == 72


def test_ddm_byte_layout(tmp_path):
    """u64 nrow, u64 ncol, f64 column-major data (c++/io.cpp:195-205)."""
    x = np.array([[1.0, 3.0], [2.0, 4.0]])
    path = str(tmp_path / "d.ddm")
    write_matrix(path, x)
    raw = open(path, "rb").read()
    assert struct.unpack("<2Q", raw[:16]) == (2, 2)
    assert struct.unpack("<4d", raw[16:]) == (1.0, 2.0, 3.0, 4.0)


def test_mtx_pattern_read(tmp_path):
    path = str(tmp_path / "p.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n3 3 2\n1 1\n3 2\n")
    y = read_matrix(path)
    assert y[0, 0] == 1.0 and y[2, 1] == 1.0 and y.nnz == 2


def test_mtx_reference_tiny_format(tmp_path):
    """Parse the tiny train matrix exactly as the reference data file is
    written (tabs + spaces mix, comment line)."""
    content = (
        "%%MatrixMarket matrix coordinate real general\n%\n4 2 6\n"
        "1\t1\t2\n2\t1\t3\n3\t1\t7\n4\t1\t4\n1\t2       5\n3\t2\t1\n"
    )
    path = str(tmp_path / "t.mtx")
    open(path, "w").write(content)
    y = read_matrix(path)
    assert y.shape == (4, 2) and y.nnz == 6
    assert y[0, 0] == 2 and y[2, 1] == 1 and y[0, 1] == 5


def test_gz_transparent(tmp_path, rng):
    x = rng.random((5, 3))
    path = str(tmp_path / "d.ddm.gz")
    write_matrix(path, x)
    assert open(path, "rb").read(2) == b"\x1f\x8b"  # really gzipped
    np.testing.assert_allclose(read_matrix(path), x)


def test_unknown_extension(tmp_path):
    with pytest.raises(ValueError):
        write_matrix(str(tmp_path / "x.foo"), np.zeros((2, 2)))
    with pytest.raises(FileNotFoundError):
        read_matrix(str(tmp_path / "missing.mtx"))
