"""I/O layer: matrix formats of the reference (c++/io.cpp) with a native
C++ fast path for the binary formats (bpmf_tpu/io/native)."""

from bpmf_tpu.io.matrix_io import (  # noqa: F401
    read_dense,
    read_matrix,
    read_sparse,
    write_matrix,
)
