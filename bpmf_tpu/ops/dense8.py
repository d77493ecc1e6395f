"""int8 dense-stream Gram/rhs kernels — the huge-sparse hot path.

The bucketed padded-CSR path is bound by XLA's pathological random row
gather (~13 GB/s effective on this TPU generation); the bf16 dense path
(partition.build_dense_layout) sidesteps the gather but stores TWO
[items, others] bf16 blocks per side — 4 blocks, 80 GB at ml-25M scale.

This path stores ONE [users_pad, movies_pad] **int8 array of quantized
rating codes** (9.6 GB at ml-25M) and derives everything else on the fly
inside a tiled Pallas matmul:

* code 0 == "no rating"; code c in 1..255 encodes the rating value
  ``value = offset + scale * c`` EXACTLY (MovieLens ratings live on a
  half-star grid; quantizability is verified at setup, see
  :func:`quantize_values`, and the path is skipped otherwise).
* indicator  ``ind = (code != 0)``                    (built in VMEM)
* centered   ``cv  = (value - mean) * alpha * ind
             = cs * code + cb * ind``                 (built in VMEM)
* the packed-lower-triangle outer-product operand
  ``p[n, t] = v[n, tri_i[t]] * v[n, tri_j[t]]`` is built per tile from
  the [NB, K] items tile via two constant 0/1 selection matmuls
  (v @ sel), so it never materializes in HBM either.

Per half-sweep the kernel streams the int8 array ONCE and computes

    gram_tri = ind @ p          # [items, T]  (MXU, f32 accumulation)
    rhs      = cv  @ v          # [items, K]

— the computeMuLambda contraction (c++/sample.cpp:248-258) as a single
MXU pass whose HBM traffic is one int8 read of the ratings.  The SAME
array serves both sides: the users sweep contracts over columns (codes
tile as matmul LHS, kernel :func:`_row_kernel`), the movies sweep over
rows (codes tile as matmul RHS, kernel :func:`_col_kernel`) — no stored
transpose, no per-iteration transposes of the big operand.

Downstream (prior combine + Cholesky + solve + sample) is the existing
packed-triangle fused kernel (ops/pallas_solve.tri_combine_solve_sample).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpmf_tpu.ops.pallas_solve import tri_index_pairs, tri_offsets

__all__ = [
    "Quantization",
    "quantize_values",
    "build_code_array",
    "tri_selectors",
    "dense8_gram_rhs_rows",
    "dense8_gram_rhs_cols",
]

BLOCK_MULTIPLE = 512  # both sides' padded_num must be a multiple of this


class Quantization(NamedTuple):
    """value = offset + scale * code, code in 1..levels (0 = absent)."""

    offset: float
    scale: float
    levels: int


def quantize_values(vals: np.ndarray, max_levels: int = 255) -> Optional[Quantization]:
    """Check that the rating values lie on a small uniform grid and return
    the exact affine coding, or None if they don't.

    MovieLens ratings are half-stars (ml-25M: 0.5..5.0 -> 10 levels;
    ml-100k/ml-1m: 1..5 -> 5 levels).  Exactness is verified in float32 so
    the coded path reproduces the uncoded dense path bit-for-bit at the
    matmul inputs."""
    if vals.size == 0:
        return None
    uniq = np.unique(vals.astype(np.float64))
    if len(uniq) > max_levels:
        return None
    if len(uniq) == 1:
        scale = 1.0
    else:
        diffs = np.diff(uniq)
        scale = float(diffs.min())
        if scale <= 0:
            return None
        steps = diffs / scale
        if not np.allclose(steps, np.round(steps), atol=1e-9):
            return None
        if np.round((uniq[-1] - uniq[0]) / scale) >= max_levels:
            return None
    offset = float(uniq[0] - scale)  # code 1 -> uniq[0]
    codes = np.round((uniq - offset) / scale)
    # exactness in f32: decoding the int code must reproduce the value
    dec = np.float32(offset) + np.float32(scale) * codes.astype(np.float32)
    if not np.array_equal(dec, uniq.astype(np.float32)):
        return None
    return Quantization(offset=offset, scale=scale, levels=int(codes[-1]))


def build_code_array(
    coo_rows: np.ndarray,
    coo_cols: np.ndarray,
    coo_vals: np.ndarray,
    q: Quantization,
    rows_pad: int,
    cols_pad: int,
) -> np.ndarray:
    """[rows_pad, cols_pad] int8 (or int16 beyond 127 levels) of rating
    codes; absent entries are 0.  Row/col indices must already be in the
    padded device order of their sides."""
    dt = np.int8 if q.levels <= 127 else np.int16
    codes = np.zeros((rows_pad, cols_pad), dt)
    c = np.round((coo_vals - q.offset) / q.scale).astype(dt)
    codes[coo_rows, coo_cols] = c
    return codes


def tri_selectors(k: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Constant 0/1 selection matrices [K, T]: (v @ sel_i) * (v @ sel_j)
    builds the packed-lower-triangle outer-product operand from a [*, K]
    items tile with two tiny MXU matmuls (compile-safe, unlike an
    in-kernel gather)."""
    tri_i, tri_j = tri_index_pairs(k)
    t = len(tri_i)
    sel_i = np.zeros((k, t), dtype)
    sel_j = np.zeros((k, t), dtype)
    sel_i[tri_i, np.arange(t)] = 1
    sel_j[tri_j, np.arange(t)] = 1
    return sel_i, sel_j


def _pick_block(n: int, prefer: tuple[int, ...] = (1024, 512)) -> int:
    for b in prefer:
        if n % b == 0:
            return b
    raise ValueError(f"dense8 dimension {n} not a multiple of {BLOCK_MULTIPLE}")


def _row_kernel(codes_ref, v_ref, sel_i_ref, sel_j_ref,
                gram_ref, rhs_ref, *, cs: float, cb: float):
    """Per grid step (i, n): gram[i] += ind(codes[i,n]) @ p(v[n]),
    rhs[i] += cv(codes[i,n]) @ v[n].  Output blocks are indexed by i only,
    so they stay VMEM-resident across the whole n sweep."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    v = v_ref[:]                                   # [NB, K] compute dtype
    md = v.dtype
    codes = codes_ref[:]                           # [IB, NB] int8
    ind = (codes != 0).astype(md)
    cv = codes.astype(md) * md.type(cs) + ind * md.type(cb)
    # packed-triangle operand from the items tile (two selection matmuls;
    # MXU accumulators must be 32-bit — multiply in f32, cast once)
    p = (
        jnp.dot(v, sel_i_ref[:], preferred_element_type=jnp.float32)
        * jnp.dot(v, sel_j_ref[:], preferred_element_type=jnp.float32)
    ).astype(md)                                   # [NB, T]
    gram_ref[:] += jnp.dot(ind, p, preferred_element_type=jnp.float32)
    rhs_ref[:] += jnp.dot(cv, v, preferred_element_type=jnp.float32)


def _col_kernel(codes_ref, v_t_ref, sel_i_ref, sel_j_ref,
                gram_ref, rhs_ref, *, cs: float, cb: float):
    """Column-side variant: grid (m, u); codes tile [UB, MB] is the matmul
    RHS (contraction over rows u — dim 0, the native MXU rhs orientation),
    outputs are batch-last [T, MB] / [K, MB] (what the fused tri solver
    wants)."""
    u = pl.program_id(1)

    @pl.when(u == 0)
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    v_t = v_t_ref[:]                               # [K, UB]
    md = v_t.dtype
    codes = codes_ref[:]                           # [UB, MB] int8
    ind = (codes != 0).astype(md)
    cv = codes.astype(md) * md.type(cs) + ind * md.type(cb)
    # p_t [T, UB] from the transposed items tile (f32 acc, cast once)
    p_t = (
        jax.lax.dot_general(
            sel_i_ref[:], v_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * jax.lax.dot_general(
            sel_j_ref[:], v_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ).astype(md)
    gram_ref[:] += jnp.dot(p_t, ind, preferred_element_type=jnp.float32)
    rhs_ref[:] += jnp.dot(v_t, cv, preferred_element_type=jnp.float32)


def dense8_gram_rhs_rows(
    codes: jax.Array,      # [R, C] int8 — this side's items are ROWS
    other_items: jax.Array,  # [C, K] compute/matmul dtype
    cs: float,
    cb: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """gram [R, T] f32 and rhs [R, K] f32 for the row side (one int8 pass)."""
    r, c = codes.shape
    _, k = other_items.shape
    md = other_items.dtype
    _, t_total = tri_offsets(k)
    ib = _pick_block(r)
    nb = _pick_block(c, prefer=(512,))
    sel_i, sel_j = tri_selectors(k, np.float32)
    sel_i = jnp.asarray(sel_i, md)
    sel_j = jnp.asarray(sel_j, md)

    gram, rhs = pl.pallas_call(
        functools.partial(_row_kernel, cs=cs, cb=cb),
        grid=(r // ib, c // nb),
        in_specs=[
            pl.BlockSpec((ib, nb), lambda i, n: (i, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, k), lambda i, n: (n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t_total), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t_total), lambda i, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ib, t_total), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ib, k), lambda i, n: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, t_total), jnp.float32),
            jax.ShapeDtypeStruct((r, k), jnp.float32),
        ),
        interpret=interpret,
    )(codes, other_items, sel_i, sel_j)
    return gram, rhs


def dense8_gram_rhs_cols(
    codes: jax.Array,        # [R, C] int8 — this side's items are COLUMNS
    other_items_t: jax.Array,  # [K, R] compute/matmul dtype (transposed)
    cs: float,
    cb: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """gram_t [T, C] f32 and rhs_t [K, C] f32 for the column side,
    batch-last (direct input to tri_combine_solve_sample)."""
    r, c = codes.shape
    k = other_items_t.shape[0]
    md = other_items_t.dtype
    _, t_total = tri_offsets(k)
    mb = _pick_block(c)
    ub = _pick_block(r, prefer=(512,))
    sel_i, sel_j = tri_selectors(k, np.float32)
    sel_i = jnp.asarray(sel_i, md)
    sel_j = jnp.asarray(sel_j, md)

    gram_t, rhs_t = pl.pallas_call(
        functools.partial(_col_kernel, cs=cs, cb=cb),
        grid=(c // mb, r // ub),
        in_specs=[
            pl.BlockSpec((ub, mb), lambda m, u: (u, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ub), lambda m, u: (0, u),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t_total), lambda m, u: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, t_total), lambda m, u: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_total, mb), lambda m, u: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, mb), lambda m, u: (0, m),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_total, c), jnp.float32),
            jax.ShapeDtypeStruct((k, c), jnp.float32),
        ),
        interpret=interpret,
    )(codes, other_items_t, sel_i, sel_j)
    return gram_t, rhs_t
