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

Per half-sweep the kernel streams the int8 array ONCE and computes

    gram_tri_t = p_t @ ind        # [T, items]  (MXU, f32 accumulation)
    rhs_t      = v_t @ cv         # [K, items]

— the computeMuLambda contraction (c++/sample.cpp:248-258) as a single
MXU pass whose HBM traffic is one int8 read of the ratings.  The SAME
array serves both sides: the users sweep contracts over the column
(movies) axis, the movies sweep over the row (users) axis — one kernel
body, two contraction orientations; no stored transpose, no
per-iteration transposes of the big operand.

``p_t [T, N]`` is the packed-lower-triangle outer-product operand of the
FROZEN side (p_t[t, n] = v[n, tri_i[t]] * v[n, tri_j[t]]), precomputed
ONCE per half-sweep at the XLA level (:func:`packed_tri_t`) — hoisting it
out of the kernel removes two [*, K] x [K, T] selection matmuls from
every grid step (~25% of step time measured at ml-25M), at the price of
streaming p_t tiles from HBM (overlapped by the pipeline; the pass stays
MXU-bound).  Outputs are batch-LAST ([T, items] / [K, items]) for both
orientations — exactly what the fused packed-triangle solver
(ops/pallas_solve.tri_combine_solve_sample) consumes, so no [items, T]
HBM transpose exists anywhere in the sweep.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bpmf_tpu.ops.pallas_solve import tri_tight_pairs

__all__ = [
    "Quantization",
    "quantize_values",
    "build_code_array",
    "packed_tri_t",
    "dense8_gram_rhs_rows",
    "dense8_gram_rhs_cols",
    "dense8_sweep_solve",
    "solve_fused_enabled",
    "pt_mode",
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


def packed_tri_t(v_t: jax.Array, aligned: bool = False) -> jax.Array:
    """[K, N] frozen items (transposed) -> [T, N] packed lower-triangle
    outer products, p_t[t, n] = v_t[ii[t], n] * v_t[jj[t], n].

    Default TIGHT layout (tri_tight_pairs — the Gram matmul contracts
    against this; the result is row-expanded into the solver's aligned
    layout afterwards).  ``aligned=True`` builds the 8-ALIGNED bottom-
    padded layout (tri_offsets) directly, for the fused sweep-solve
    kernel whose in-kernel column slices must start on sublane-group
    boundaries; its padding rows hold v[0]*v[0] garbage products that the
    solve never reads (they cost ~17.5% extra Gram MXU flops at K=32)."""
    k = v_t.shape[0]
    if aligned:
        ii, jj = _aligned_pairs(k)
    else:
        ii, jj, _ = tri_tight_pairs(k)
    return jnp.take(v_t, jnp.asarray(ii), axis=0) * jnp.take(
        v_t, jnp.asarray(jj), axis=0
    )


@functools.lru_cache(maxsize=None)
def _aligned_pairs(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(ii, jj) of the 8-aligned bottom-padded packed triangle (the
    grouped=off tri_index_pairs layout, built locally so this path never
    depends on the BPMF_TRI_GROUPED pin)."""
    from bpmf_tpu.ops.pallas_solve import tri_offsets

    offs, t_total = tri_offsets(k)
    ii = np.zeros(t_total, np.int32)
    jj = np.zeros(t_total, np.int32)
    for j in range(k):
        ii[offs[j] : offs[j] + (k - j)] = np.arange(j, k)
        jj[offs[j] : offs[j] + (k - j)] = j
    return ii, jj


@functools.lru_cache(maxsize=None)
def _sel_consts(k: int, layout: str) -> tuple[np.ndarray, np.ndarray]:
    """One-hot selection matrices (sel_a, sel_b) [T, K] f32 with
    sel_a[t, ii[t]] = sel_b[t, jj[t]] = 1 on the valid rows of the packed
    triangle ('tight' or 'aligned' layout); padding rows are all-zero.
    ``(sel_a @ v_t) * (sel_b @ v_t)`` built IN a kernel reproduces
    :func:`packed_tri_t` exactly (one-hot rows copy the bf16 v values
    bit-for-bit through the f32 accumulator; the product then rounds
    identically), without the XLA row-gather build (~69 GB/s effective on
    this TPU via the tunnel, docs/measurements/r5_chembl_kernels.log) and
    without streaming the [T, N] operand from HBM."""
    if layout == "aligned":
        ii, jj = _aligned_pairs(k)
        valid = (ii > 0) | (jj > 0)
        valid[0] = True  # row 0 is the real (0, 0) pair
    else:
        ii, jj, _ = tri_tight_pairs(k)
        t_valid = k * (k + 1) // 2
        valid = np.zeros(len(ii), bool)
        valid[:t_valid] = True
    t = len(ii)
    sel_a = np.zeros((t, k), np.float32)
    sel_b = np.zeros((t, k), np.float32)
    rows = np.arange(t)
    sel_a[rows[valid], ii[valid]] = 1.0
    sel_b[rows[valid], jj[valid]] = 1.0
    return sel_a, sel_b


def pt_mode(items: int, frozen: int, k: int, fused: bool,
            orientation: str) -> str:
    """'inkernel' or 'hoisted': where to build the packed-triangle operand.

    Hoisted (packed_tri_t + HBM operand) costs one gather-formulated build
    (measured ~69 GB/s effective, 12x below HBM BW — XLA lowers the row
    take to a slow gather) plus a [T, N] stream per ITEM BLOCK (the
    BlockSpec refetches the contraction tile for every item-grid step).
    In-kernel costs two [T, K] @ [K, nb] selection matmuls per grid step
    (K=32 contraction: ~25-35% MXU utilization).  Both estimated below
    with tunnel-measured constants (docs/measurements/
    r5_chembl_kernels.log); BPMF_D8_PT overrides.  The item block is
    resolved exactly as the kernels resolve it (incl. BPMF_D8_BLOCKS) so
    the estimate matches the real grid."""
    import os

    env = os.environ.get("BPMF_D8_PT", "auto")
    if env in ("inkernel", "hoisted"):
        return env
    if fused:
        prefer_items = (512,)
    elif orientation == "rows":
        prefer_items = (1024, 512)
    else:
        prefer_items = (512, 1024)
    item_block, _ = _blocks(items, frozen, prefer_items, (1024, 512))
    t = k * (k + 1) // 2 + k  # + fold rows in the hoisted operand
    n_blocks = max(1, items // item_block)
    inkernel_ms = 2 * t * k * frozen * n_blocks * 2 / 52e9
    hoisted_ms = (t * frozen * 2 / 69e6          # gather build
                  + t * frozen * 2 * n_blocks / 819e6)  # per-block stream
    return "inkernel" if inkernel_ms < hoisted_ms else "hoisted"


def _kernel_inpt(codes_ref, sel_a_ref, sel_b_ref, v_t_ref, gram_ref,
                 rhs_ref, *, cs: float, cb: float, contract_dim: int):
    """Grid step with the packed-triangle operand built IN KERNEL: two
    one-hot selection matmuls + a VPU product reproduce the p_t tile from
    the [K, nb] v tile, so the [T, N] operand never exists in HBM.  The
    affine rhs decomposition is exact and needs no fold rows:
    rhs = v @ (cs*code + cb*ind) = cs*(v @ code) + cb*(v @ ind)."""
    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    md = v_t_ref.dtype
    codes = codes_ref[:]
    ind = (codes != 0).astype(md)
    cvals = codes.astype(md)
    v = v_t_ref[:]
    seldn = (((1,), (0,)), ((), ()))
    pa = jax.lax.dot_general(sel_a_ref[:], v, seldn,
                             preferred_element_type=jnp.float32).astype(md)
    pb = jax.lax.dot_general(sel_b_ref[:], v, seldn,
                             preferred_element_type=jnp.float32).astype(md)
    p = pa * pb                                           # [T, nb]
    dn = (((1,), (contract_dim,)), ((), ()))
    gram_ref[:] += jax.lax.dot_general(
        p, ind, dn, preferred_element_type=jnp.float32
    )
    rv = jax.lax.dot_general(v, cvals, dn, preferred_element_type=jnp.float32)
    ri = jax.lax.dot_general(v, ind, dn, preferred_element_type=jnp.float32)
    rhs_ref[:] += jnp.float32(cs) * rv + jnp.float32(cb) * ri


def _call_inpt(codes, v_t, cs, cb, *, contract_dim, interpret):
    """pallas_call wrapper for :func:`_kernel_inpt` (tight layout)."""
    r, c = codes.shape
    k = v_t.shape[0]
    sel_a, sel_b = _sel_consts(k, "tight")
    t_total = sel_a.shape[0]
    if contract_dim == 1:          # rows: items = r, frozen = c
        ob, nb = _blocks(r, c, (1024, 512), (1024, 512))
        grid = (r // ob, c // nb)
        codes_spec = pl.BlockSpec((ob, nb), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
        items = r
    else:                          # cols: items = c, frozen = r
        ob, nb = _blocks(c, r, (512, 1024), (1024, 512))
        grid = (c // ob, r // nb)
        codes_spec = pl.BlockSpec((nb, ob), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)
        items = c
    sel_spec = pl.BlockSpec((t_total, k), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    gram_t, rhs_t = pl.pallas_call(
        functools.partial(_kernel_inpt, cs=cs, cb=cb,
                          contract_dim=contract_dim),
        grid=grid,
        in_specs=[
            codes_spec,
            sel_spec,
            sel_spec,
            pl.BlockSpec((k, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_total, ob), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_total, items), jnp.float32),
            jax.ShapeDtypeStruct((k, items), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(codes, jnp.asarray(sel_a, v_t.dtype), jnp.asarray(sel_b, v_t.dtype),
      v_t)
    return gram_t, rhs_t


def _pick_block(n: int, prefer: tuple[int, ...] = (1024, 512)) -> int:
    for b in prefer:
        if n % b == 0:
            return b
    raise ValueError(f"dense8 dimension {n} not a multiple of {BLOCK_MULTIPLE}")


def _blocks(items: int, frozen: int,
            prefer_items: tuple[int, ...],
            prefer_frozen: tuple[int, ...]) -> tuple[int, int]:
    """(item_block, contraction_block); BPMF_D8_BLOCKS=ib,nb overrides (perf
    tuning knob, read at trace time).  Defaults are the measured best per
    orientation at ml-25M scale on v5e (scripts/bench_dense8.py sweep)."""
    import os

    env = os.environ.get("BPMF_D8_BLOCKS", "")
    if env:
        ib, nb = (int(x) for x in env.split(","))
        return ib, nb
    return _pick_block(items, prefer_items), _pick_block(frozen, prefer_frozen)


def _kernel(codes_ref, p_t_ref, v_t_ref, gram_ref, rhs_ref,
            *, cs: float, cb: float, contract_dim: int, fold: bool):
    """One grid step: accumulate gram_t += p_t @ ind, rhs_t += v_t @ cv.

    ``contract_dim`` is the codes axis being contracted: 1 for the row
    orientation (items are code ROWS; codes block [IB, NB], p_t/v_t blocks
    over NB), 0 for the column orientation (items are code COLUMNS; codes
    block [UB, MB], p_t/v_t blocks over UB).  Output blocks are indexed by
    the item grid dim only, so they stay VMEM-resident across the whole
    contraction sweep.

    ``fold=True`` variant: the centered-value build ``cv = cs*code +
    cb*ind`` (two VPU passes over the whole int8 stream) is removed by
    folding the affine into the matmul operands at the XLA level: the
    caller passes ``p_t = [packed_tri; cb * v_t]`` (the cb-term rides the
    big full-utilization Gram matmul as K extra rows) and ``v_t = cs *
    v_t`` (contracted against the raw codes), and reconstructs ``rhs =
    (cs*v_t)@code + (cb*v_t)@ind`` from the outputs — exact affine, only
    float-rounding different from the cv formulation."""
    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    md = p_t_ref.dtype
    codes = codes_ref[:]
    ind = (codes != 0).astype(md)
    if fold:
        cv = codes.astype(md)
    else:
        cv = codes.astype(md) * md.type(cs) + ind * md.type(cb)
    # contract p_t/v_t dim 1 (the frozen-side axis) against the codes
    # contraction axis; outputs are batch-last [T, items] / [K, items]
    dn = (((1,), (contract_dim,)), ((), ()))
    gram_ref[:] += jax.lax.dot_general(
        p_t_ref[:], ind, dn, preferred_element_type=jnp.float32
    )
    rhs_ref[:] += jax.lax.dot_general(
        v_t_ref[:], cv, dn, preferred_element_type=jnp.float32
    )


def _fold_enabled() -> bool:
    import os

    return os.environ.get("BPMF_D8_FOLD", "1") == "1"


def _call(codes, p_t, v_t, cs, cb, *, contract_dim, interpret):
    fold = _fold_enabled()
    if fold:
        # cb-term rows ride the Gram matmul; cs folds into the code operand
        p_t = jnp.concatenate([p_t, v_t * v_t.dtype.type(cb)], axis=0)
        v_t = v_t * v_t.dtype.type(cs)
    r, c = codes.shape
    t_total, n = p_t.shape
    k = v_t.shape[0]
    if contract_dim == 1:          # rows: items = r, frozen = c
        assert n == c, (n, c)
        ob, nb = _blocks(r, c, (1024, 512), (1024, 512))
        grid = (r // ob, c // nb)
        codes_spec = pl.BlockSpec((ob, nb), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
        out_idx = lambda i, j: (0, i)
        items = r
    else:                          # cols: items = c, frozen = r
        assert n == r, (n, r)
        ob, nb = _blocks(c, r, (512, 1024), (1024, 512))
        grid = (c // ob, r // nb)
        codes_spec = pl.BlockSpec((nb, ob), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)
        out_idx = lambda i, j: (0, i)
        items = c

    gram_t, rhs_t = pl.pallas_call(
        functools.partial(_kernel, cs=cs, cb=cb, contract_dim=contract_dim,
                          fold=fold),
        grid=grid,
        in_specs=[
            codes_spec,
            pl.BlockSpec((t_total, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t_total, ob), out_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), out_idx, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_total, items), jnp.float32),
            jax.ShapeDtypeStruct((k, items), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(codes, p_t, v_t)
    if fold:
        # rhs = (cs*v)@code + (cb*v)@ind; the cb-term is the last K Gram rows
        return gram_t[:-k], rhs_t + gram_t[-k:]
    return gram_t, rhs_t


def solve_fused_mode() -> str:
    """BPMF_D8_SOLVE in {fused (default), split, fused_aligned} -> the
    dense8 half-sweep route: 'fused' = :func:`dense8_sweep_solve` with the
    TIGHT in-kernel Gram layout (Gram + rhs + prior combine +
    Cholesky-solve-sample in ONE kernel); 'split' = gram kernel -> HBM ->
    tri_combine_solve_sample pipeline; 'fused_aligned' = the megakernel
    with the 8-ALIGNED layout (measurement knob; +17.5% Gram flops at
    K=32, measured slower: ml-1m 1.32 vs ~1.14 ms/iter).  Read at trace
    time (same knob pattern as BPMF_D8_FOLD).  Returns 'tight' |
    'aligned' | 'split'.

    Default FUSED since round 5: measured chembl 4.58 (with the in-kernel
    p_t) vs 8.32 split, ml-1m 1.143 vs 1.158
    (docs/measurements/r5_*_megakernel_inpt.log).  The 200-430 s compile
    that kept it opt-in earlier in the round was diagnosed as cold-cache
    tunnel variance, not the kernel: AOT lower+compile of the megakernel
    is 1-4 s, same as the split kernels."""
    import os

    v = os.environ.get("BPMF_D8_SOLVE", "fused")
    if v == "fused":
        return "tight"
    if v == "fused_aligned":
        return "aligned"
    return "split"


def solve_fused_enabled() -> bool:
    """True when the megakernel route is selected (see solve_fused_mode)."""
    return solve_fused_mode() != "split"


def solve_fused_supported(k: int, layout: str = "aligned") -> bool:
    """VMEM budget of :func:`dense8_sweep_solve` at item block 512: the
    gram/rhs scratch, the solve's live column lists (~2 [K, K, 512] f32
    slab sets), and the double-buffered operand tiles must coexist.
    K=32 needs ~9 MB; K=64 exceeds the core's ~16 MB and keeps the split
    pipeline (whose solver drops to lane block 128 instead)."""
    if layout == "aligned":
        from bpmf_tpu.ops.pallas_solve import tri_offsets

        _, t = tri_offsets(k)
    else:
        toff = _tight_offsets(k)
        t = toff[-1] + 1  # == k(k+1)/2
    t_in = t + k          # + fold rows
    ob, nb = 512, 1024
    scratch = (t_in + k) * ob * 4
    solve_live = 2 * k * k * ob * 4
    operands = 2 * (t_in * nb * 2 + ob * nb)
    return scratch + solve_live + operands <= 13 * 1024 * 1024


def _tight_offsets(k: int) -> list[int]:
    """Row offset of column j's segment in the TIGHT packed triangle:
    toff[j] = j*k - j(j-1)/2 (segments are back to back, no alignment
    padding — tri_tight_pairs layout)."""
    toff, t = [], 0
    for j in range(k):
        toff.append(t)
        t += k - j
    return toff


def _kernel_fused_solve(codes_ref, p_t_ref, v_t_ref, lam_ref, prior_ref,
                        noise_ref, out_ref, gram_acc, rhs_acc,
                        *, k: int, alpha: float, cs: float, cb: float,
                        contract_dim: int, fold: bool, n_inner: int,
                        offsets: tuple[int, ...]):
    """dense8 Gram/rhs accumulation fused with the per-item conditional
    tail (prior combine + Cholesky + substitutions + MVN draw,
    c++/sample.cpp:248-324) for one item block.

    Inner grid steps accumulate gram/rhs into VMEM scratch exactly like
    :func:`_kernel`; at the LAST inner step the solve runs on the
    VMEM-resident packed triangle directly — the [T, items] f32 Gram never
    round-trips HBM and the tight->aligned row expansion
    (ops/pallas_solve.tri_expand_rows) disappears as a separate pass.
    ``offsets`` carries the packed layout's per-column row offsets:
    8-ALIGNED (tri_offsets, default — every column slice starts on a
    sublane-group boundary, which Mosaic compiles ~30x faster) or TIGHT
    (_tight_offsets — 17.5% fewer Gram flops at K=32, but the unaligned
    slices cost hundreds of seconds of compile).  Values are bit-identical
    to the split pipeline either way: same contractions, same f32
    accumulation, same combine/solve arithmetic on the same numbers."""
    from bpmf_tpu.ops.pallas_solve import _chol_solve_tail

    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        gram_acc[:] = jnp.zeros_like(gram_acc)
        rhs_acc[:] = jnp.zeros_like(rhs_acc)

    md = p_t_ref.dtype
    codes = codes_ref[:]
    ind = (codes != 0).astype(md)
    if fold:
        cv = codes.astype(md)
    else:
        cv = codes.astype(md) * md.type(cs) + ind * md.type(cb)
    dn = (((1,), (contract_dim,)), ((), ()))
    gram_acc[:] += jax.lax.dot_general(
        p_t_ref[:], ind, dn, preferred_element_type=jnp.float32
    )
    rhs_acc[:] += jax.lax.dot_general(
        v_t_ref[:], cv, dn, preferred_element_type=jnp.float32
    )

    @pl.when(inner == n_inner - 1)
    def _():
        g = gram_acc[:]
        rhs = rhs_acc[:]
        if fold:
            # rhs = (cs*v)@code + (cb*v)@ind; cb-term = last K Gram rows
            rhs = rhs + g[-k:]
        # prior rhs: shared Lambda @ mu, pre-broadcast to the block width
        y = rhs + prior_ref[:]

        lam = lam_ref[:].astype(jnp.float32)
        noise = noise_ref[:].astype(jnp.float32)
        b = y.shape[1]
        acols = []
        for j in range(k):
            seg = g[offsets[j] : offsets[j] + (k - j)]       # [k-j, B]
            if j:
                seg = jnp.concatenate(
                    [jnp.zeros((j, b), jnp.float32), seg], axis=0
                )
            acols.append(lam[:, j : j + 1] + alpha * seg)    # [K, B]
        out_ref[:] = _chol_solve_tail(acols, y, noise, k).astype(
            out_ref.dtype
        )


def _kernel_fused_solve_inpt(codes_ref, sel_a_ref, sel_b_ref, v_t_ref,
                             lam_ref, prior_ref, noise_ref, out_ref,
                             gram_acc, rhs_acc,
                             *, k: int, alpha: float, cs: float, cb: float,
                             contract_dim: int, n_inner: int,
                             offsets: tuple[int, ...]):
    """Megakernel variant with the packed-triangle operand built IN KERNEL
    (see :func:`_kernel_inpt`): Gram/rhs accumulation + prior combine +
    Cholesky-solve-sample, with neither the [T, N] p_t operand nor the
    [T, I] Gram ever touching HBM.  No fold rows: the affine rhs is the
    exact decomposition cs*(v @ code) + cb*(v @ ind)."""
    from bpmf_tpu.ops.pallas_solve import _chol_solve_tail

    inner = pl.program_id(1)

    @pl.when(inner == 0)
    def _():
        gram_acc[:] = jnp.zeros_like(gram_acc)
        rhs_acc[:] = jnp.zeros_like(rhs_acc)

    md = v_t_ref.dtype
    codes = codes_ref[:]
    ind = (codes != 0).astype(md)
    cvals = codes.astype(md)
    v = v_t_ref[:]
    seldn = (((1,), (0,)), ((), ()))
    pa = jax.lax.dot_general(sel_a_ref[:], v, seldn,
                             preferred_element_type=jnp.float32).astype(md)
    pb = jax.lax.dot_general(sel_b_ref[:], v, seldn,
                             preferred_element_type=jnp.float32).astype(md)
    p = pa * pb
    dn = (((1,), (contract_dim,)), ((), ()))
    gram_acc[:] += jax.lax.dot_general(
        p, ind, dn, preferred_element_type=jnp.float32
    )
    rv = jax.lax.dot_general(v, cvals, dn, preferred_element_type=jnp.float32)
    ri = jax.lax.dot_general(v, ind, dn, preferred_element_type=jnp.float32)
    rhs_acc[:] += jnp.float32(cs) * rv + jnp.float32(cb) * ri

    @pl.when(inner == n_inner - 1)
    def _():
        g = gram_acc[:]
        y = rhs_acc[:] + prior_ref[:]
        lam = lam_ref[:].astype(jnp.float32)
        noise = noise_ref[:].astype(jnp.float32)
        b = y.shape[1]
        acols = []
        for j in range(k):
            seg = g[offsets[j] : offsets[j] + (k - j)]       # [k-j, B]
            if j:
                seg = jnp.concatenate(
                    [jnp.zeros((j, b), jnp.float32), seg], axis=0
                )
            acols.append(lam[:, j : j + 1] + alpha * seg)    # [K, B]
        out_ref[:] = _chol_solve_tail(acols, y, noise, k).astype(
            out_ref.dtype
        )


def _sweep_solve_inpt(codes, v_t, lam, prior_rhs, noise_t, cs, cb, alpha,
                      orientation, interpret):
    """pallas_call wrapper for :func:`_kernel_fused_solve_inpt` (tight
    packed layout, no fold rows)."""
    r, c = codes.shape
    k = v_t.shape[0]
    sel_a, sel_b = _sel_consts(k, "tight")
    t_total = sel_a.shape[0]
    offsets = _tight_offsets(k)
    if orientation == "rows":
        ob, nb = _blocks(r, c, (512,), (1024, 512))
        grid = (r // ob, c // nb)
        codes_spec = pl.BlockSpec((ob, nb), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
        contract_dim = 1
        items = r
    else:
        ob, nb = _blocks(c, r, (512,), (1024, 512))
        grid = (c // ob, r // nb)
        codes_spec = pl.BlockSpec((nb, ob), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)
        contract_dim = 0
        items = c
    sel_spec = pl.BlockSpec((t_total, k), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    prior_tile = jnp.broadcast_to(prior_rhs.astype(jnp.float32), (k, ob))
    return pl.pallas_call(
        functools.partial(
            _kernel_fused_solve_inpt, k=k, alpha=alpha, cs=cs, cb=cb,
            contract_dim=contract_dim, n_inner=grid[1],
            offsets=tuple(offsets),
        ),
        grid=grid,
        in_specs=[
            codes_spec,
            sel_spec,
            sel_spec,
            pl.BlockSpec((k, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, ob), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, items), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_total, ob), jnp.float32),
            pltpu.VMEM((k, ob), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(codes, jnp.asarray(sel_a, v_t.dtype), jnp.asarray(sel_b, v_t.dtype),
      v_t, lam.astype(jnp.float32), prior_tile, noise_t)


def dense8_sweep_solve(
    codes: jax.Array,    # [R, C] int8 rating codes
    p_t: Optional[jax.Array],  # [T, N] packed-tri of the frozen side
                               # (layout!), or None -> built in-kernel
    v_t: jax.Array,      # [K, N] frozen items, transposed, matmul dtype
    lam: jax.Array,      # [K, K] shared prior precision (f32)
    prior_rhs: jax.Array,  # [K, 1] shared prior rhs (Lambda @ mu)
    noise_t: jax.Array,  # [K, items] N(0, I) draws, batch-last
    cs: float,
    cb: float,
    alpha: float,
    orientation: str,    # 'rows' | 'cols'
    layout: str = "aligned",  # 'aligned' | 'tight' — must match p_t's
                              # packed_tri_t(aligned=...) layout
    interpret: bool = False,
) -> jax.Array:
    """u_t [K, items]: the whole dense8 half-sweep compute (one int8 pass
    Gram/rhs + fused conditional solve) in a single kernel.  Single-chip,
    shared-prior path only (the per-item propagated prior keeps the split
    pipeline).  See :func:`_kernel_fused_solve`; with ``p_t=None`` the
    packed-triangle operand is also built in-kernel
    (:func:`_kernel_fused_solve_inpt`) and ``layout`` is ignored (tight)."""
    if p_t is None:
        return _sweep_solve_inpt(codes, v_t, lam, prior_rhs, noise_t,
                                 cs, cb, alpha, orientation, interpret)
    if layout == "aligned":
        from bpmf_tpu.ops.pallas_solve import tri_offsets

        offsets, _ = tri_offsets(k=v_t.shape[0])
    else:
        offsets = _tight_offsets(v_t.shape[0])
    fold = _fold_enabled()
    if fold:
        p_t = jnp.concatenate([p_t, v_t * v_t.dtype.type(cb)], axis=0)
        v_t = v_t * v_t.dtype.type(cs)
    r, c = codes.shape
    t_in, n = p_t.shape
    k = v_t.shape[0]
    if orientation == "rows":
        assert n == c, (n, c)
        # item block 512 (not 1024): the solve working set (~3 live
        # [K, K, B]-class slabs) must fit VMEM next to the gram scratch
        ob, nb = _blocks(r, c, (512,), (1024, 512))
        grid = (r // ob, c // nb)
        codes_spec = pl.BlockSpec((ob, nb), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)
        contract_dim = 1
        items = r
    else:
        assert n == r, (n, r)
        ob, nb = _blocks(c, r, (512,), (1024, 512))
        grid = (c // ob, r // nb)
        codes_spec = pl.BlockSpec((nb, ob), lambda i, j: (j, i),
                                  memory_space=pltpu.VMEM)
        contract_dim = 0
        items = c

    prior_tile = jnp.broadcast_to(prior_rhs.astype(jnp.float32), (k, ob))
    out = pl.pallas_call(
        functools.partial(
            _kernel_fused_solve, k=k, alpha=alpha, cs=cs, cb=cb,
            contract_dim=contract_dim, fold=fold, n_inner=grid[1],
            offsets=tuple(offsets),
        ),
        grid=grid,
        in_specs=[
            codes_spec,
            pl.BlockSpec((t_in, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, nb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ob), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, ob), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, items), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_in, ob), jnp.float32),
            pltpu.VMEM((k, ob), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(codes, p_t, v_t, lam.astype(jnp.float32), prior_tile, noise_t)
    return out


def dense8_gram_rhs_rows(
    codes: jax.Array,    # [R, C] int8 — this side's items are ROWS
    p_t: Optional[jax.Array],  # [T, C] packed-tri of the frozen side
                               # (packed_tri_t), or None -> built in-kernel
    v_t: jax.Array,      # [K, C] frozen items, transposed, matmul dtype
    cs: float,
    cb: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """gram_t [T, R] f32 and rhs_t [K, R] f32 for the row side, batch-last
    (direct input to tri_combine_solve_sample); one int8 pass."""
    if p_t is None:
        return _call_inpt(codes, v_t, cs, cb, contract_dim=1,
                          interpret=interpret)
    return _call(codes, p_t, v_t, cs, cb, contract_dim=1, interpret=interpret)


def dense8_gram_rhs_cols(
    codes: jax.Array,    # [R, C] int8 — this side's items are COLUMNS
    p_t: Optional[jax.Array],  # [T, R] packed-tri of the frozen side,
                               # or None -> built in-kernel
    v_t: jax.Array,      # [K, R] frozen items, transposed, matmul dtype
    cs: float,
    cb: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """gram_t [T, C] f32 and rhs_t [K, C] f32 for the column side,
    batch-last; one int8 pass."""
    if p_t is None:
        return _call_inpt(codes, v_t, cs, cb, contract_dim=0,
                          interpret=interpret)
    return _call(codes, p_t, v_t, cs, cb, contract_dim=0, interpret=interpret)
