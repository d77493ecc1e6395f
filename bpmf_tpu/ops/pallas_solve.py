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

MEASURED (v5e, ml-1m dense sweep, K=32): this kernel is currently ~6x
SLOWER than the pure-XLA 'vpu' formulation (30.3 vs 4.7 ms/iter) — Mosaic
pads the K=32 minor dimension to 128 lanes and the unrolled back
substitution's column re-stacking is expensive, while XLA fuses the vpu
loop chain extremely well.  Kept as Config.solver='pallas' for future
layout tuning ([B, K*K]-flat tiles, fori_loop body), not as the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chol_solve_sample_pallas"]

_BLOCK = 256  # items per grid step: 256*32*32*4 = 1 MB tile in VMEM at K=32


def _kernel(prec_ref, rhs_ref, noise_ref, out_ref, *, k: int):
    a = prec_ref[:].astype(jnp.float32)     # [B, K, K]
    rhs = rhs_ref[:].astype(jnp.float32)    # [B, K]
    noise = noise_ref[:].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    # Cholesky, right-looking: L column j, then rank-1 downdate — all in VMEM
    l_cols = []
    for j in range(k):
        d = jax.lax.rsqrt(a[:, j, j])                    # [B]
        col = a[:, :, j] * d[:, None]                    # [B, K]
        col = jnp.where(row >= j, col, 0.0)
        l_cols.append(col)
        a = a - col[:, :, None] * col[:, None, :]

    # forward substitution y = L \ rhs
    y = rhs
    for j in range(k):
        col = l_cols[j]
        yj = y[:, j] / col[:, j]
        y = jnp.where(row == j, yj[:, None], y - col * yj[:, None] * (row > j))

    y = y + noise

    # back substitution u = L' \ y ; row j of L read from the stored columns
    x = y
    for j in range(k - 1, -1, -1):
        # L[j, m] for m <= j: element j of column m
        xj = x[:, j] / l_cols[j][:, j]
        # subtract L[j, m] * xj from positions m < j
        lrow = jnp.stack([l_cols[m][:, j] for m in range(k)], axis=1)  # [B, K]
        x = jnp.where(row == j, xj[:, None], x - lrow * xj[:, None] * (row < j))
    return out_ref, x


def _kernel_entry(prec_ref, rhs_ref, noise_ref, out_ref, *, k: int):
    out_ref_, x = _kernel(prec_ref, rhs_ref, noise_ref, out_ref, k=k)
    out_ref_[:] = x.astype(out_ref_.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_sample_pallas(
    precision: jax.Array,  # [B, K, K]
    rhs: jax.Array,        # [B, K]
    noise: jax.Array,      # [B, K]
    interpret: bool = False,
) -> jax.Array:
    """u = L'^-1(noise + L^-1 rhs) with L L' = precision, fused in VMEM."""
    b, k, _ = precision.shape
    block = min(_BLOCK, b)
    # grid requires b % block == 0; callers pad the batch (pad_count(...))
    if b % block != 0:
        # fall back to a block size that divides b (b is always a multiple
        # of 8 by construction of the padded layouts)
        block = 8
    grid = (b // block,)
    return pl.pallas_call(
        functools.partial(_kernel_entry, k=k),
        out_shape=jax.ShapeDtypeStruct((b, k), precision.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(precision, rhs, noise)
