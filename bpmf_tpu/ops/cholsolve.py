"""Batched small-matrix Cholesky + triangular solves, unrolled over K.

XLA's generic ``lax.linalg.cholesky`` / ``triangular_solve`` target large
matrices (blocked algorithms, dynamic slicing); for BPMF's [B, K, K] batches
of tiny K (16-64) they leave most of the VPU idle.  Since K is static we
unroll the K-step Cholesky-Banachiewicz recursion and the two substitutions
into pure element-wise/matvec ops over the batch dimension — every step is a
[B, j] contraction the VPU vectorizes over B, and XLA fuses the whole chain.

Used by the conditional update (the per-item solve of c++/sample.cpp:306-323)
through ``chol_solve_sample``; the ``xla`` solver remains available via
Config.solver for cross-checking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cholesky_unrolled",
    "solve_lower",
    "solve_upper",
    "chol_solve_sample_unrolled",
    "chol_solve_sample_vpu",
    "get_solver",
]


def chol_solve_sample_smart(precision, rhs, noise):
    """The production policy on TPU: the VMEM-resident batch-last Pallas
    kernel whenever K fits its tiles (K <= ~116); the pure-XLA 'vpu' chain
    beyond.  Measured on v5e: the kernel wins decisively on large batches
    (chembl-scale [168k, 32, 32]: 17 vs 134 ms/iter) and is comparable or
    better at small ones (single-digit-ms differences within the session
    noise of this runtime)."""
    b, k, _ = precision.shape
    if 2 * k * k * 128 * 4 <= 11 * 1024 * 1024:
        from bpmf_tpu.ops.pallas_solve import chol_solve_sample_pallas_blast

        return chol_solve_sample_pallas_blast(precision, rhs, noise)
    return chol_solve_sample_vpu(precision, rhs, noise)


def get_solver(name: str):
    """Resolve a Config.solver name to the solve function."""
    from bpmf_tpu.ops.update import chol_solve_sample

    if name == "pallas":
        from bpmf_tpu.ops.pallas_solve import chol_solve_sample_pallas_blast

        return chol_solve_sample_pallas_blast
    return {
        "xla": chol_solve_sample,
        "unrolled": chol_solve_sample_unrolled,
        "vpu": chol_solve_sample_vpu,
        "smart": chol_solve_sample_smart,
    }[name]


def cholesky_unrolled(a: jax.Array) -> jax.Array:
    """Lower Cholesky factor of a batch of SPD matrices, [B, K, K].

    Column-by-column Cholesky-Banachiewicz with static K, vectorized over
    the batch.  Columns are built as a list and stacked once (no scatter).
    """
    k = a.shape[-1]
    cols = []  # cols[j]: [B, K] column j of L (zeros above the diagonal)
    for j in range(k):
        if j == 0:
            s = a[..., :, 0]                       # [B, K]
        else:
            lj = [c[..., j] for c in cols]         # row j of L, entries < j
            # s_i = a_ij - sum_{m<j} L_im * L_jm
            prev = jnp.stack(lj, axis=-1)          # [B, j]
            lmat = jnp.stack(cols, axis=-1)        # [B, K, j]
            s = a[..., :, j] - jnp.einsum("bkj,bj->bk", lmat, prev)
        djj = jnp.sqrt(s[..., j])
        col = s / djj[..., None]
        # zero entries above the diagonal
        mask = (jnp.arange(k) >= j).astype(a.dtype)
        cols.append(col * mask)
    return jnp.stack(cols, axis=-1)


def solve_lower(l: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution: solve L y = b for lower-triangular L.
    l: [B, K, K], b: [B, K]."""
    k = l.shape[-1]
    ys = []
    for j in range(k):
        s = b[..., j]
        if j > 0:
            prev = jnp.stack(ys, axis=-1)          # [B, j]
            s = s - jnp.einsum("bj,bj->b", l[..., j, :j], prev)
        ys.append(s / l[..., j, j])
    return jnp.stack(ys, axis=-1)


def solve_upper(l: jax.Array, b: jax.Array) -> jax.Array:
    """Back substitution: solve L' x = b (L lower triangular).
    l: [B, K, K], b: [B, K]."""
    k = l.shape[-1]
    xs = [None] * k
    for j in range(k - 1, -1, -1):
        s = b[..., j]
        if j < k - 1:
            tail = jnp.stack(xs[j + 1 :], axis=-1)  # [B, K-1-j]
            # (L')_{j,i} = L_{i,j} for i > j
            s = s - jnp.einsum("bj,bj->b", l[..., j + 1 :, j], tail)
        xs[j] = s / l[..., j, j]
    return jnp.stack(xs, axis=-1)


def chol_solve_sample_vpu(
    precision: jax.Array,  # [B, K, K]
    rhs: jax.Array,        # [B, K]
    noise: jax.Array,      # [B, K]
) -> jax.Array:
    """Right-looking batched Cholesky + substitutions as pure element-wise
    [B, K(, K)] tensor updates — no stacking, no lax.linalg, no dynamic
    slicing.  K static steps of rank-1 downdates / masked AXPYs that XLA
    fuses into tight VPU code; measured ~20x faster than the generic
    lax.linalg path for [6k, 32, 32] batches on TPU v5e.

    Math identical to chol_solve_sample: u = L'^-1(noise + L^-1 rhs),
    L L' = precision (c++/sample.cpp:306-324).
    """
    b, k, _ = precision.shape
    dtype = precision.dtype
    row = jnp.arange(k)

    # -- Cholesky (right-looking): after step j, cols[..., j] holds L[:, :, j]
    a = precision
    l = jnp.zeros_like(a)
    for j in range(k):
        d = jax.lax.rsqrt(a[:, j, j])                    # [B]
        col = a[:, :, j] * d[:, None]                    # [B, K]
        col = jnp.where(row[None, :] >= j, col, 0.0)     # zero above diagonal
        l = l.at[:, :, j].set(col)
        # trailing-submatrix downdate: A -= col col'
        a = a - col[:, :, None] * col[:, None, :]

    # -- forward substitution y = L \ rhs (right-looking)
    y = rhs
    for j in range(k):
        yj = y[:, j] / l[:, j, j]
        upd = l[:, :, j] * yj[:, None]                   # [B, K]
        y = jnp.where(row[None, :] == j, yj[:, None], y - upd * (row[None, :] > j))

    y = y + noise

    # -- back substitution u = L' \ y
    x = y
    for j in range(k - 1, -1, -1):
        xj = x[:, j] / l[:, j, j]
        # (L')[:, :, j] as a row of L: subtract L[j, :]-weighted xj from
        # entries above j
        upd = l[:, j, :] * xj[:, None]                   # [B, K]
        x = jnp.where(row[None, :] == j, xj[:, None], x - upd * (row[None, :] < j))
    return x


def chol_solve_sample_unrolled(
    precision: jax.Array,  # [B, K, K]
    rhs: jax.Array,        # [B, K]
    noise: jax.Array,      # [B, K]
) -> jax.Array:
    """u = L'^-1 (noise + L^-1 rhs), L L' = precision — identical math to
    ops.update.chol_solve_sample but unrolled (c++/sample.cpp:306-324)."""
    l = cholesky_unrolled(precision)
    y = solve_lower(l, rhs) + noise
    return solve_upper(l, y)
