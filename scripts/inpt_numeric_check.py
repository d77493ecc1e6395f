#!/usr/bin/env python
"""Numeric check of the dense8 in-kernel packed-triangle path (p_t=None,
selection matmuls in-kernel) against the hoisted operand on the REAL
backend.

Round-5: the tiny CLI gate diverges (non-finite RMSE by iter ~6) on TPU
whenever BPMF_D8_PT=inkernel, for both the split gram kernel and the
megakernel, while CPU interpret mode matches bit-for-bit — so the two
formulations compile differently under Mosaic.  This prints the max
abs/rel error of gram_t and rhs_t for both orientations at a tiny
(512x512) and a mid (4096x1024) shape to locate the wrong output.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bpmf_tpu.ops.dense8 import (
    dense8_gram_rhs_cols,
    dense8_gram_rhs_rows,
    packed_tri_t,
)


def check(r, c, k=32, density=0.02, seed=0, md=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    codes = (rng.random((r, c)) < density) * rng.integers(
        1, 11, (r, c)
    )
    codes = jnp.asarray(codes, jnp.int8)
    cs, cb = 0.5, -0.25
    for orientation, kernel, frozen in (
        ("rows", dense8_gram_rhs_rows, c),
        ("cols", dense8_gram_rhs_cols, r),
    ):
        v = jnp.asarray(rng.standard_normal((k, frozen)), jnp.float32)
        v_t = v.astype(md)
        # match the sweep exactly (parallel/spmd.dense8_half_sweep): the
        # hoisted operand is built from the SAME bf16-rounded v the kernel
        # streams, so each p_t element is one bf16 product of the same two
        # bf16 numbers the in-kernel path multiplies — bit-identical unless
        # Mosaic compiles the two formulations differently
        p_t = packed_tri_t(v_t.astype(jnp.float32)).astype(md)
        g_h, r_h = jax.jit(
            lambda codes, p_t, v_t: kernel(codes, p_t, v_t, cs, cb)
        )(codes, p_t, v_t)
        g_i, r_i = jax.jit(
            lambda codes, v_t: kernel(codes, None, v_t, cs, cb)
        )(codes, v_t)
        g_h, r_h, g_i, r_i = map(np.asarray, (g_h, r_h, g_i, r_i))
        ge = np.abs(g_i - g_h).max()
        re_ = np.abs(r_i - r_h).max()
        gs = np.abs(g_h).max() or 1.0
        print(
            f"[{r}x{c}] {orientation}: gram max|Δ|={ge:.4e} "
            f"(rel {ge / gs:.2e})  rhs max|Δ|={re_:.4e}  "
            f"gram_i finite={np.isfinite(g_i).all()} "
            f"rhs_i finite={np.isfinite(r_i).all()}",
            flush=True,
        )


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    check(512, 512)
    check(4096, 1024)


if __name__ == "__main__":
    main()
