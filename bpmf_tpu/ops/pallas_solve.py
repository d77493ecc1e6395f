"""Fused Pallas kernel: batched Cholesky -> forward/back substitution ->
posterior MVN sample — the per-item solve of the BPMF conditional update
(c++/sample.cpp:306-324) for a whole block of items in one VMEM-resident
pass.

Why a kernel: the pure-XLA right-looking formulation
(ops/cholsolve.chol_solve_sample_vpu) is algebraically identical but
materializes the [B, K, K] working matrix in HBM on every one of the K
rank-1 downdates — ~2 * K * B * K^2 * 4 bytes of traffic per half-sweep
(1.6 GB for ml-1m at K=32), which makes the solve HBM-bound.  Here each
grid step loads one [BLOCK, K, K] tile into VMEM once, runs all K downdate
steps and both substitutions on-chip, and writes only the [BLOCK, K]
result.

The loop body is plain jnp on values (VPU ops); K is static so everything
unrolls.  Numerically identical to the other solvers (tested to f32
tolerance, including in interpret mode on CPU).

MEASURED (v5e, dense sweep, K=32): a batch-FIRST kernel layout is ~6x
slower than pure XLA — Mosaic pads the K=32 minor dim to 128 lanes —
and was removed after losing at every scale.  The batch-LAST variant
(chol_solve_sample_pallas_blast, the Config.solver='pallas' default on
TPU) puts the batch on the lane dimension instead and wins at every
scale: ml-1m 4.2 ms/iter (vs 4.7 vpu / 39.4 xla), chembl-scale [168k]
batches 17 ms/iter (vs 134 vpu) — ~8x on large batches because the
working set stays VMEM-resident through all K downdates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "chol_solve_sample_pallas_blast",
    "tri_offsets",
    "tri_index_pairs",
    "tri_combine_solve_sample",
    "pack_prior_tri",
    "prior_rhs_from_tri",
]

def _kernel_blast(prec_ref, rhs_ref, noise_ref, out_ref, *, k: int):
    """Batch-LAST layout kernel: tiles are [K, K, B] / [K, B] so the batch
    rides the 128-lane dimension and every step is a full-width VPU op;
    column/row extraction is a sublane slice.  All K downdates and both
    substitutions happen on one VMEM-resident tile."""
    a = prec_ref[:].astype(jnp.float32)      # [K, K, B]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)

    # Cholesky (right-looking): cols[j] = L[:, j] as a [K, B] slab
    cols = []
    for j in range(k):
        d = jax.lax.rsqrt(a[j, j, :])                    # [B]
        col = a[:, j, :] * d[None, :]                    # [K, B]
        if j > 0:
            mask = (jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) >= j)
            col = jnp.where(mask, col, 0.0)
        cols.append(col)
        a = a - col[:, None, :] * col[None, :, :]        # [K, K, B]

    # forward substitution y = L \ rhs (set-row expressed as masked where:
    # .at[].set lowers to scatter, unsupported in Pallas TPU)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    for j in range(k):
        yj = y[j, :] / cols[j][j, :]                     # [B]
        y = jnp.where(rows > j, y - cols[j] * yj[None, :], y)
        y = jnp.where(rows == j, yj[None, :], y)

    y = y + noise

    # back substitution u = L' \ y; row j of L = stack of cols[m][j]
    for j in range(k - 1, -1, -1):
        xj = y[j, :] / cols[j][j, :]                     # [B]
        # subtract L[j, m] * xj for m < j: L[j, m] = cols[m][j, :]
        lrow = jnp.concatenate(
            [cols[m][j : j + 1, :] for m in range(k)], axis=0
        )                                                # [K, B]
        y = jnp.where(rows < j, y - lrow * xj[None, :], y)
        y = jnp.where(rows == j, xj[None, :], y)
    out_ref[:] = y.astype(out_ref.dtype)


def _kernel_blast_inplace(prec_ref, rhs_ref, noise_ref, out_ref, *, k: int):
    """Batch-last kernel with the factor L written IN PLACE over the
    working tile (packed Cholesky): one live [K, K, B] slab instead of two,
    so K=128 fits VMEM; the back substitution reads L's rows as sublane
    slices instead of re-stacking columns."""
    a = prec_ref[:].astype(jnp.float32)      # [K, K, B]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (k, 1, 1), 0)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    for j in range(k):
        d = jax.lax.rsqrt(a[j, j, :])
        col = a[:, j, :] * d[None, :]                    # [K, B]
        col = jnp.where(rows2 >= j, col, 0.0)
        # downdate trailing columns (> j), then store L column j in place
        upd = col[:, None, :] * col[None, :, :]          # [K, K, B]
        a = jnp.where(cols3 > j, a - upd, a)
        a = jnp.where(cols3 == j, col[:, None, :], a)

    # forward substitution y = L \ rhs
    for j in range(k):
        yj = y[j, :] / a[j, j, :]
        y = jnp.where(rows2 > j, y - a[:, j, :] * yj[None, :], y)
        y = jnp.where(rows2 == j, yj[None, :], y)

    y = y + noise

    # back substitution u = L' \ y; L's row j is the sublane slice a[j]
    for j in range(k - 1, -1, -1):
        xj = y[j, :] / a[j, j, :]
        y = jnp.where(rows2 < j, y - a[j, :, :] * xj[None, :], y)
        y = jnp.where(rows2 == j, xj[None, :], y)
    out_ref[:] = y.astype(out_ref.dtype)


def chol_solve_sample_pallas_blast(
    precision: jax.Array,  # [B, K, K]
    rhs: jax.Array,        # [B, K]
    noise: jax.Array,      # [B, K]
    interpret: bool = False,
) -> jax.Array:
    """Batch-last fused solver: transposes to [K, K, B] tiles so the VPU
    lane dimension is the batch (see _kernel_blast)."""
    b, k, _ = precision.shape
    # The in-place kernel keeps ~2 live [K, K, BLOCK] f32 slabs in VMEM
    # (input tile + working copy).  Pick the largest lane block under
    # ~11 MB of the 16 MB VMEM; K=128 fits at block=128.
    budget = 11 * 1024 * 1024
    block = 0
    for cand in (512, 256, 128):
        if 2 * k * k * cand * 4 <= budget:
            block = cand
            break
    if block == 0:
        from bpmf_tpu.ops.cholsolve import chol_solve_sample_vpu

        return chol_solve_sample_vpu(precision, rhs, noise)
    bp = ((b + block - 1) // block) * block
    if bp != b:
        # pad with identity systems (Cholesky stays valid); sliced off below
        pad = bp - b
        eye = jnp.broadcast_to(jnp.eye(k, dtype=precision.dtype), (pad, k, k))
        precision = jnp.concatenate([precision, eye])
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, k), rhs.dtype)])
        noise = jnp.concatenate([noise, jnp.zeros((pad, k), noise.dtype)])
    prec_t = jnp.transpose(precision, (1, 2, 0))  # [K, K, Bp]
    rhs_t = rhs.T                                  # [K, Bp]
    noise_t = noise.T
    out = pl.pallas_call(
        functools.partial(_kernel_blast_inplace, k=k),
        out_shape=jax.ShapeDtypeStruct((k, bp), precision.dtype),
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec((k, k, block), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(prec_t, rhs_t, noise_t)
    return out.T[:b]


def tri_offsets(k: int, align: int = 8):
    """Row offsets of the 8-aligned packed-lower-triangle layout.

    Column j of the lower triangle (elements (i, j), i >= j) occupies an
    ``align``-multiple block of rows starting at ``offs[j]``.  Two block
    layouts share these offsets (the per-column block sizes coincide when
    k % align == 0): the BOTTOM-padded layout stores the segment first and
    pads below; the TOP-ALIGNED layout (:func:`tri_grouped`) covers
    full-matrix rows [align*(j//align), k) so every 8-sublane group slice
    in the grouped kernels is an aligned static slice.
    Returns (offs list, total padded row count T)."""
    offs = []
    t = 0
    for j in range(k):
        offs.append(t)
        seg = k - j
        t += ((seg + align - 1) // align) * align
    return offs, t


_TRI_GROUPED_ENV: bool | None = None  # pinned at first consult


def tri_grouped(k: int) -> bool:
    """True when the TOP-ALIGNED packed layout + group-sliced kernels are
    in effect (BPMF_TRI_GROUPED=1; k must be a multiple of the 8-sublane
    group).  Default OFF: the round-4 hardware A/B measured the grouped
    variant SLOWER in both regimes (chembl 13.82 vs 13.42 ms/iter,
    ml-1m 1.195 vs 1.190) — the sublane-op savings inside the solver are
    outweighed elsewhere; kept as a measurement knob.

    The env var is read ONCE per process (first consult) and pinned:
    host-side packing (pack_prior_tri / tri_index_pairs at setup) and
    kernel selection (tri_combine_solve_sample at trace) each call this,
    and an env change between them would silently mismatch the packed
    layout.  Tests A/B-ing both layouts call :func:`_tri_grouped_reset`
    after setenv."""
    global _TRI_GROUPED_ENV
    if _TRI_GROUPED_ENV is None:
        import os

        _TRI_GROUPED_ENV = os.environ.get("BPMF_TRI_GROUPED", "0") == "1"
    return k % 8 == 0 and _TRI_GROUPED_ENV


def _tri_grouped_reset() -> None:
    """Unpin the layout flag so the next :func:`tri_grouped` re-reads the
    env (test hook — never call between packing and solving)."""
    global _TRI_GROUPED_ENV
    _TRI_GROUPED_ENV = None


def tri_index_pairs(k: int, align: int = 8):
    """(rows i, cols j) index arrays of length T for building the packed
    p_tri operand: p_tri[t] = v[i_t] * v[j_t]; padding rows repeat (0, 0)
    (they multiply zero adjacency columns / are masked at pivot time, so
    their value is irrelevant).  Padding sits below the segment in the
    bottom-padded layout, above the diagonal in the top-aligned one."""
    import numpy as np

    offs, t_total = tri_offsets(k, align)
    ii = np.zeros((t_total,), np.int32)
    jj = np.zeros((t_total,), np.int32)
    for j in range(k):
        seg = k - j
        pad = (j - 8 * (j // 8)) if tri_grouped(k) else 0
        ii[offs[j] + pad : offs[j] + pad + seg] = np.arange(j, k)
        jj[offs[j] + pad : offs[j] + pad + seg] = j
    return ii, jj


def tri_tight_pairs(k: int, align: int = 16):
    """TIGHTLY-packed lower triangle (no per-column alignment) for the Gram
    matmul: K=32's aligned layout is 640 rows but only 528 are real — the
    per-column 8-alignment that the solver's in-kernel slices need wastes
    17.5% of the Gram matmul's MXU flops.  The matmul therefore contracts
    against this tight layout and the result is re-expanded into the
    aligned layout by one static row-take (``row_map``) before the solver.

    Returns (ii, jj, row_map): index pairs of length
    roundup(k(k+1)/2, align) for building the tight p_tri operand
    (align=16 keeps the bf16 sublane tiling happy), and the int32 map from
    aligned-layout rows to tight rows (aligned padding rows map to row 0 —
    the solver never reads them)."""
    import numpy as np

    tri = [(i, j) for j in range(k) for i in range(j, k)]
    t_tight = ((len(tri) + align - 1) // align) * align
    ii = np.zeros((t_tight,), np.int32)
    jj = np.zeros((t_tight,), np.int32)
    for t, (i, j) in enumerate(tri):
        ii[t], jj[t] = i, j
    tight_off = np.concatenate(
        [[0], np.cumsum([k - j for j in range(k)])]
    ).astype(np.int32)
    ai, aj = tri_index_pairs(k)
    row_map = tight_off[aj] + (ai - aj)
    return ii, jj, row_map.astype(np.int32)


def tri_expand_rows(g_tight, k: int):
    """Tight [T_tight, B] -> solver-aligned [T, B] by static slices +
    one concatenate.  NOT jnp.take(row_map): a row gather over arrays with
    very long rows can lower to a pathological elementwise gather
    (measured ~9 ms on chembl's [528, 167k] vs ~1 ms for this form).
    Aligned padding rows are zeros — the solver never reads them."""
    import numpy as np

    b = g_tight.shape[1]
    tight_off = np.concatenate(
        [[0], np.cumsum([k - j for j in range(k)])]
    ).astype(int)
    grouped = tri_grouped(k)
    parts = []
    for j in range(k):
        seg = k - j
        if grouped:
            pad = j - 8 * (j // 8)  # top-aligned: zeros ABOVE the diagonal
            if pad:
                parts.append(jnp.zeros((pad, b), g_tight.dtype))
            parts.append(g_tight[tight_off[j] : tight_off[j] + seg])
        else:
            parts.append(g_tight[tight_off[j] : tight_off[j] + seg])
            pad = ((seg + 7) // 8) * 8 - seg
            if pad:
                parts.append(jnp.zeros((pad, b), g_tight.dtype))
    return jnp.concatenate(parts, axis=0)


def _kernel_tri_fused(lam_ref, gtri_ref, rhs_ref, noise_ref, out_ref,
                      *, k: int, alpha: float):
    """Fused prior-combine + Cholesky + substitutions + MVN sample on a
    PACKED-TRIANGLE batch-last Gram tile.

    gtri tile: [T, B] — column j of the Gram's lower triangle in rows
    [offs[j], offs[j] + k - j).  The full working matrix
    a = lam + alpha * gram is assembled in VMEM (registers), so the Gram
    never round-trips HBM in full [K, K] form and the combine costs no
    extra memory pass."""
    g = gtri_ref[:].astype(jnp.float32)      # [T, B]
    lam = lam_ref[:].astype(jnp.float32)     # [K, K]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)
    b = g.shape[1]
    offs, _ = tri_offsets(k)

    # assemble the LOWER triangle only — the right-looking Cholesky below
    # reads column j's rows >= j exclusively, so the upper triangle can
    # stay garbage (no mirror pass needed)
    acols = []
    for j in range(k):
        seg = g[offs[j] : offs[j] + (k - j)]             # [k-j, B]
        if j:
            seg = jnp.concatenate(
                [jnp.zeros((j, b), jnp.float32), seg], axis=0
            )
        # NB: lam[:, j, None] would lower to a (Mosaic-unsupported) gather;
        # the slice form stays a plain slice
        acols.append(lam[:, j : j + 1] + alpha * seg)    # [K, B]

    out_ref[:] = _chol_solve_tail(acols, y, noise, k).astype(out_ref.dtype)


def _chol_solve_tail(acols, y, noise, k: int):
    """Shared tail of the fused tri kernels: column-list Cholesky, the two
    triangular substitutions, and the MVN draw.

    Right-looking Cholesky over the COLUMN LIST: step j downdates only
    the k-1-j trailing columns ([K, B] each), not the full [K, K, B]
    working matrix — half the VPU traffic of the dense-update variant
    (measured 0.37 -> ~0.25 ms on the ml-1m sweep).  A pre-masked column
    keeps the update self-masking exactly as before."""
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)
    lcols = []
    for j in range(k):
        d = jax.lax.rsqrt(acols[j][j, :])
        col = acols[j] * d[None, :]                      # [K, B]
        col = jnp.where(rows2 >= j, col, 0.0)
        lcols.append(col)
        for c in range(j + 1, k):
            acols[c] = acols[c] - col * col[c : c + 1, :]
    l = jnp.stack(lcols, axis=1)                         # [K, K, B]

    for j in range(k):
        yj = y[j, :] / l[j, j, :]
        y = jnp.where(rows2 > j, y - l[:, j, :] * yj[None, :], y)
        y = jnp.where(rows2 == j, yj[None, :], y)

    y = y + noise

    for j in range(k - 1, -1, -1):
        xj = y[j, :] / l[j, j, :]
        y = jnp.where(rows2 < j, y - l[j, :, :] * xj[None, :], y)
        y = jnp.where(rows2 == j, xj[None, :], y)
    return y


def _kernel_tri_fused_peritem(lamtri_ref, gtri_ref, rhs_ref, noise_ref,
                              out_ref, *, k: int, alpha: float):
    """Fused solve with a PER-ITEM prior precision: the propagated-posterior
    path (-m/-l, c++/sample.cpp:272-283) on the fast sweeps.  The prior
    arrives as a second packed-triangle batch-last tile ([T, B], same
    aligned layout as the Gram) and the combine is
    a_b = Lambda_prior_b + alpha * Gram_b on the VMEM tile."""
    g = gtri_ref[:].astype(jnp.float32)      # [T, B]
    lt = lamtri_ref[:].astype(jnp.float32)   # [T, B]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)
    b = g.shape[1]
    offs, _ = tri_offsets(k)

    acols = []
    for j in range(k):
        seg = (lt[offs[j] : offs[j] + (k - j)]
               + alpha * g[offs[j] : offs[j] + (k - j)])  # [k-j, B]
        if j:
            seg = jnp.concatenate(
                [jnp.zeros((j, b), jnp.float32), seg], axis=0
            )
        acols.append(seg)                                 # [K, B]

    out_ref[:] = _chol_solve_tail(acols, y, noise, k).astype(out_ref.dtype)


def _chol_solve_tail_grouped(aslabs, y, noise, k: int):
    """Group-sliced right-looking Cholesky + substitutions + MVN draw.

    ``aslabs[c]`` is column c of the working matrix as a list of [8, B]
    sublane-group slabs covering full-matrix rows [8*(c//8), k) — the rows
    above that block are structurally dead (never read), so the downdate
    at pivot j touches only (k - 8*(c//8))/8 slabs of each trailing column
    instead of the full [K, B] column: 920 vs 1984 sublane-group mul+sub
    pairs at K=32, ~2.2x fewer VPU ops in the dominant loop.  The
    substitutions are group-sliced the same way.  Arithmetic on live
    elements is identical to :func:`_chol_solve_tail` (same FMA per
    element, same ordering) — trajectories are unchanged."""
    gg = k // 8
    b = y.shape[1]
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    lslabs = []   # per pivot: (gj, masked column slabs) for the fwd subst
    lcols = []    # full [K, B] columns for the stacked back-subst reads
    for j in range(k):
        gj = j // 8
        r = j - 8 * gj
        slabs = aslabs[j]
        d = jax.lax.rsqrt(slabs[0][r, :])                    # [B]
        col = [s * d[None, :] for s in slabs]
        col[0] = jnp.where(r8 >= r, col[0], 0.0)
        for c in range(j + 1, k):
            gc = c // 8
            cc = col[gc - gj][c - 8 * gc : c - 8 * gc + 1, :]    # [1, B]
            tgt = aslabs[c]
            for gi in range(gc, gg):
                tgt[gi - gc] = tgt[gi - gc] - col[gi - gj] * cc
        lslabs.append((gj, col))
        full = col if gj == 0 else [
            jnp.zeros((8 * gj, b), jnp.float32), *col
        ]
        lcols.append(
            jnp.concatenate(full, axis=0) if len(full) > 1 else full[0]
        )
    l = jnp.stack(lcols, axis=1)                             # [K, K, B]

    # forward substitution y = L \ rhs on slab-partitioned y
    yslabs = [y[8 * gi : 8 * gi + 8] for gi in range(gg)]
    for j in range(k):
        gj, col = lslabs[j]
        r = j - 8 * gj
        yj = yslabs[gj][r, :] / col[0][r, :]
        for gi in range(gj, gg):
            upd = yslabs[gi] - col[gi - gj] * yj[None, :]
            if gi == gj:
                upd = jnp.where(r8 > r, upd, yslabs[gi])
                upd = jnp.where(r8 == r, yj[None, :], upd)
            yslabs[gi] = upd

    yslabs = [
        ys + noise[8 * gi : 8 * gi + 8] for gi, ys in enumerate(yslabs)
    ]

    # back substitution u = L' \ y; L's row j is a sublane slice of l
    for j in range(k - 1, -1, -1):
        gj = j // 8
        r = j - 8 * gj
        xj = yslabs[gj][r, :] / l[j, j, :]
        for gi in range(gj + 1):
            lrow = l[j, 8 * gi : 8 * gi + 8, :]
            upd = yslabs[gi] - lrow * xj[None, :]
            if gi == gj:
                upd = jnp.where(r8 < r, upd, yslabs[gi])
                upd = jnp.where(r8 == r, xj[None, :], upd)
            yslabs[gi] = upd
    return jnp.concatenate(yslabs, axis=0)


def _kernel_tri_fused_grouped(lam_ref, gtri_ref, rhs_ref, noise_ref,
                              out_ref, *, k: int, alpha: float):
    """Grouped variant of :func:`_kernel_tri_fused`: the TOP-ALIGNED packed
    tile stores column j's slot block over full-matrix rows [8*(j//8), k),
    so every slab read below is an aligned static slice (no realign
    copies).  The padding rows above the diagonal hold garbage
    pair-products; they are masked at pivot time and never read
    elsewhere."""
    g = gtri_ref[:].astype(jnp.float32)      # [T, B]
    lam = lam_ref[:].astype(jnp.float32)     # [K, K]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)
    offs, _ = tri_offsets(k)
    gg = k // 8
    aslabs = []
    for j in range(k):
        gj = j // 8
        aslabs.append([
            lam[8 * gi : 8 * gi + 8, j : j + 1]
            + alpha
            * g[offs[j] + 8 * (gi - gj) : offs[j] + 8 * (gi - gj) + 8]
            for gi in range(gj, gg)
        ])
    out_ref[:] = _chol_solve_tail_grouped(aslabs, y, noise, k).astype(
        out_ref.dtype
    )


def _kernel_tri_fused_peritem_grouped(lamtri_ref, gtri_ref, rhs_ref,
                                      noise_ref, out_ref, *, k: int,
                                      alpha: float):
    """Grouped variant of :func:`_kernel_tri_fused_peritem` (per-item prior
    precision tile in the same top-aligned packed layout)."""
    g = gtri_ref[:].astype(jnp.float32)      # [T, B]
    lt = lamtri_ref[:].astype(jnp.float32)   # [T, B]
    y = rhs_ref[:].astype(jnp.float32)       # [K, B]
    noise = noise_ref[:].astype(jnp.float32)
    offs, _ = tri_offsets(k)
    gg = k // 8
    aslabs = []
    for j in range(k):
        gj = j // 8
        aslabs.append([
            lt[offs[j] + 8 * (gi - gj) : offs[j] + 8 * (gi - gj) + 8]
            + alpha
            * g[offs[j] + 8 * (gi - gj) : offs[j] + 8 * (gi - gj) + 8]
            for gi in range(gj, gg)
        ])
    out_ref[:] = _chol_solve_tail_grouped(aslabs, y, noise, k).astype(
        out_ref.dtype
    )


def tri_fused_supported(k: int, peritem: bool = False) -> bool:
    """VMEM budget check for the fused tri kernel at lane block 128;
    ``peritem`` accounts for the extra [T, B] prior tile of the
    propagated-posterior variant."""
    _, t_total = tri_offsets(k)
    t_eff = t_total * (2 if peritem else 1)
    return (t_eff + 3 * k * k) * 128 * 4 <= 11 * 1024 * 1024


def tri_combine_solve_sample(
    gram_tri_t: jax.Array,  # [T, B] packed-lower-triangle Gram, batch-last
    lam: jax.Array,         # [K, K] shared prior precision
    rhs_t: jax.Array,       # [K, B] data rhs + prior rhs, batch-last
    noise_t: jax.Array,     # [K, B] N(0, I) draws, batch-last
    alpha: float,
    interpret: bool = False,
    lam_tri_t: jax.Array | None = None,  # [T, B] per-item prior precision
                                         # (packed, batch-last); overrides lam
) -> jax.Array:
    """u_t [K, B] with (Lambda_prior_b + alpha * Gram_b) u_b = rhs_b +
    L_b noise_b — the whole per-item conditional tail
    (c++/sample.cpp:297-324) in one VMEM pass.  Lambda_prior is the shared
    ``lam`` [K, K], or per-item when ``lam_tri_t`` is given (the propagated
    posterior of c++/sample.cpp:272-283, packed by :func:`pack_prior_tri`)."""
    k, b = rhs_t.shape
    t_total = gram_tri_t.shape[0]
    peritem = lam_tri_t is not None
    # BPMF_TRI_BLOCK overrides the lane-block sweep (tuning knob; 1024 was
    # measured NO better than 512 on chembl — VMEM pressure eats the
    # per-block amortization)
    import os as _os

    env_block = int(_os.environ.get("BPMF_TRI_BLOCK", "0"))
    budget = 11 * 1024 * 1024
    t_eff = t_total * (2 if peritem else 1)
    block = 0
    for cand in ((env_block,) if env_block else (512, 256, 128)):
        if (t_eff + 3 * k * k) * cand * 4 <= budget * (
            2 if cand >= 1024 else 1
        ):
            block = cand
            break
    assert block, f"K={k} too large for the fused tri kernel (tri_fused_supported)"
    bp = ((b + block - 1) // block) * block
    if bp != b:
        pad = bp - b
        gram_tri_t = jnp.pad(gram_tri_t, ((0, 0), (0, pad)))
        rhs_t = jnp.pad(rhs_t, ((0, 0), (0, pad)))
        noise_t = jnp.pad(noise_t, ((0, 0), (0, pad)))
        if peritem:
            # identity prior in padding lanes keeps the Cholesky valid;
            # the diagonal row offsets are static — build the eye on the
            # host (one constant, not k chained scatters at trace time)
            import numpy as _np

            offs, _ = tri_offsets(k)
            grouped = tri_grouped(k)
            eye_np = _np.zeros((t_total, pad), _np.float32)
            for j in range(k):
                eye_np[offs[j] + ((j - 8 * (j // 8)) if grouped else 0)] = 1.0
            lam_tri_t = jnp.concatenate(
                [lam_tri_t, jnp.asarray(eye_np, lam_tri_t.dtype)], axis=1
            )
    tri_spec = pl.BlockSpec((t_total, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((k, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    grouped = tri_grouped(k)
    if peritem:
        kernel = functools.partial(
            _kernel_tri_fused_peritem_grouped if grouped
            else _kernel_tri_fused_peritem, k=k, alpha=alpha)
        first_arg, first_spec = lam_tri_t, tri_spec
    else:
        kernel = functools.partial(
            _kernel_tri_fused_grouped if grouped else _kernel_tri_fused,
            k=k, alpha=alpha)
        first_arg = lam
        first_spec = pl.BlockSpec((k, k), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, bp), rhs_t.dtype),
        grid=(bp // block,),
        in_specs=[first_spec, tri_spec, vec_spec, vec_spec],
        out_specs=vec_spec,
        interpret=interpret,
    )(first_arg, gram_tri_t, rhs_t, noise_t)
    return out[:, :b]


def pack_prior_tri(prop_lambda, k: int):
    """[num, K, K] symmetric per-item prior precision -> [T, num] aligned
    packed lower triangle, batch-last — the ``lam_tri_t`` operand of
    :func:`tri_combine_solve_sample` (host-side, done once at setup; the
    propagated posterior is constant across iterations)."""
    import numpy as np

    ii, jj = tri_index_pairs(k)
    return np.ascontiguousarray(
        np.asarray(prop_lambda)[:, ii, jj].T
    )


@functools.lru_cache(maxsize=None)
def _prior_rhs_consts(k: int, grouped: bool):
    """Static operands for :func:`prior_rhs_from_tri`: row-routing one-hots
    A, B [K, T] (padding rows zeroed) and the (ii, jj) index vectors."""
    import numpy as np

    ii, jj = tri_index_pairs(k)
    offs, t_total = tri_offsets(k)
    valid = np.zeros(t_total, bool)
    for j in range(k):
        pad = (j - 8 * (j // 8)) if grouped else 0
        valid[offs[j] + pad : offs[j] + pad + (k - j)] = True
    a = np.zeros((k, t_total), np.float32)
    a[ii, np.arange(t_total)] = valid
    bmat = np.zeros((k, t_total), np.float32)
    bmat[jj, np.arange(t_total)] = valid & (ii != jj)
    return ii, jj, a, bmat


def prior_rhs_from_tri(prior_tri_t: jax.Array, mu: jax.Array) -> jax.Array:
    """Per-item prior rhs Lambda_i @ mu, [K, B], straight from the packed
    triangle — avoids keeping the full [num, K, K] prior on device.  Used
    by the strict_reference path where mu is the SHARED sampled hyper-mean
    (the c++/sample.cpp:285 quirk), so the rhs changes every half-sweep.

    For symmetric Lambda:  (Lambda mu)[r] = sum_{t: ii==r} tri[t] mu[jj[t]]
    + sum_{t: jj==r, ii!=jj} tri[t] mu[ii[t]] — one [K, T] @ [T, B] matmul
    against a mu-weighted routing matrix."""
    k = mu.shape[0]
    ii, jj, a, bmat = _prior_rhs_consts(k, tri_grouped(k))
    a = jnp.asarray(a, prior_tri_t.dtype)
    bmat = jnp.asarray(bmat, prior_tri_t.dtype)
    m1 = (a * jnp.take(mu, jnp.asarray(jj))[None, :]
          + bmat * jnp.take(mu, jnp.asarray(ii))[None, :])   # [K, T]
    # full f32 precision: this reproduces the generic path's f32 einsum
    # (ops/update.posterior_precision_rhs); the matmul is tiny (K rows)
    return jnp.matmul(m1, prior_tri_t, precision="highest",
                      preferred_element_type=prior_tri_t.dtype)


