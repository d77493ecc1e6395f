"""Pallas gather-Gram kernel: VMEM-resident neighbor table.

The dominant sparse work of a half-sweep is computeMuLambda
(c++/sample.cpp:248-258): per item, gather the rated neighbors' latent
vectors and accumulate `Gram_i = sum_j v_j v_j'` and
`rhs_i = alpha * sum_j v_j (r_ij - mean)`.

XLA's row-gather on the current TPU runtime is pathological (~0.4 GB/s
effective — measured to be ~92% of the bucketed sweep's time at ml-1m).
The dense-adjacency mode sidesteps it while `items x others` fits ~1 GB;
this kernel covers the regime beyond that (ml-25M-scale sides), where the
OTHER side's vector table still fits VMEM — always true in reduce mode
with enough devices (local shard = N/D rows; 10 MB at ml-25M scale and
D >= 2).

Design: the whole table [NV, K] is pinned in VMEM; the grid walks row
blocks of a degree bucket; for each item row the kernel assembles the
[W, K] neighborhood in a VMEM scratch via W scalar-indexed row reads (the
only random access, VMEM-latency), then one MXU contraction produces the
K x K Gram and the rhs.  Random access never touches HBM.

MEASURED (v5e): ~8M edges/s — each scalar-indexed VMEM row copy costs
~115 cycles in Mosaic (no vector-gather primitive on this hardware
generation), so the kernel is ~2.5x XLA's pathological HBM gather but far
from the VPU's potential.  NOT wired into the sweeps by default; kept as
the starting point for the huge-sparse regime (ml-25M-scale) where the
dense-adjacency mode no longer applies.  Candidate next steps: batched
async DMA assembly, or hardware generations with a sparse gather unit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_gram_pallas", "table_fits_vmem"]

_ROWS_PER_STEP = 8  # item rows per grid step (f32 sublane count)


def table_fits_vmem(nv: int, k: int, width: int, itemsize: int = 4) -> bool:
    """Is the [NV, K] neighbor table + per-step scratch comfortably within
    VMEM?  Leave room for the [W, K] scratch, the index/value blocks, and
    double buffering."""
    table = nv * k * itemsize
    scratch = width * k * itemsize * 2
    return table + scratch < 10 * 1024 * 1024


def _kernel(nbr_ref, val_ref, mask_ref, table_ref, meanalpha_ref,
            gram_ref, rhs_ref, vg_scratch, *, k: int, width: int, rows: int):
    mean = meanalpha_ref[0, 0]
    alpha = meanalpha_ref[0, 1]

    for r in range(rows):
        # assemble the neighborhood [W, K] via scalar-indexed VMEM reads
        def body(w, _):
            idx = nbr_ref[r, w]
            vg_scratch[w, :] = table_ref[idx, :]
            return 0
        # full unroll removes ~100 cycles/edge of loop overhead (Mosaic
        # supports unroll == num_steps or 1 only)
        jax.lax.fori_loop(0, width, body, 0, unroll=width)

        vg = vg_scratch[:] * mask_ref[r, :][:, None]          # [W, K]
        wts = (val_ref[r, :] - mean) * mask_ref[r, :] * alpha  # [W]
        gram_ref[r, :, :] = jax.lax.dot_general(
            vg, vg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rhs_ref[r, :] = jnp.sum(vg * wts[:, None], axis=0)


def gather_gram_pallas(
    nbr: jax.Array,      # [R, W] int32 — indices into table rows
    val: jax.Array,      # [R, W] raw ratings
    mask: jax.Array,     # [R, W]
    table: jax.Array,    # [NV, K] neighbor vectors (must fit VMEM)
    mean_rating: jax.Array,
    alpha: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-row Gram [R, K, K] and rhs [R, K] with the table VMEM-pinned."""
    r_rows, width = nbr.shape
    nv, k = table.shape
    rows = _ROWS_PER_STEP
    assert r_rows % rows == 0, (r_rows, rows)  # bucket rows padded to 8
    meanalpha = jnp.stack(
        [mean_rating.astype(jnp.float32), jnp.asarray(alpha, jnp.float32)]
    ).reshape(1, 2)
    dtype = table.dtype

    gram, rhs = pl.pallas_call(
        functools.partial(_kernel, k=k, width=width, rows=rows),
        grid=(r_rows // rows,),
        in_specs=[
            # index block in SMEM: the kernel reads it scalar-by-scalar
            pl.BlockSpec((rows, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nv, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_rows, k, k), dtype),
            jax.ShapeDtypeStruct((r_rows, k), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((width, k), jnp.float32)],
        interpret=interpret,
    )(nbr, val.astype(dtype), mask.astype(dtype), table, meanalpha)
    return gram, rhs
