#!/usr/bin/env python
"""Standalone correctness + perf check of the dense8 kernels.

Correctness: tiny shapes vs numpy (interpret on CPU backend, compiled on
TPU).  Perf: ml-25M-scale int8 array, both orientations, ms per pass.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("DENSE8_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from bpmf_tpu.ops.dense8 import (
    dense8_gram_rhs_cols,
    dense8_gram_rhs_rows,
)
from bpmf_tpu.ops.pallas_solve import tri_index_pairs


def check_correct():
    rng = np.random.default_rng(0)
    r, c, k = 512, 512, 32
    codes = rng.integers(0, 6, size=(r, c)).astype(np.int8)
    v = rng.normal(size=(c, k)).astype(np.float32)
    cs, cb = 0.25, -1.5
    interp = jax.default_backend() != "tpu"

    gram, rhs = jax.jit(
        lambda a, b: dense8_gram_rhs_rows(a, b, cs, cb, interpret=interp)
    )(jnp.asarray(codes), jnp.asarray(v))
    gram = np.asarray(gram)
    rhs = np.asarray(rhs)

    ind = (codes != 0).astype(np.float32)
    cv = codes.astype(np.float32) * cs + ind * cb
    tri_i, tri_j = tri_index_pairs(k)
    p = v[:, tri_i] * v[:, tri_j]
    gram_ref = ind @ p
    rhs_ref = cv @ v
    err_g = np.abs(gram - gram_ref).max() / max(np.abs(gram_ref).max(), 1)
    err_r = np.abs(rhs - rhs_ref).max() / max(np.abs(rhs_ref).max(), 1)
    print("rows: rel err gram", err_g, "rhs", err_r)
    assert err_g < 1e-5 and err_r < 1e-5

    # cols orientation: same codes, now items are the columns
    u = rng.normal(size=(r, k)).astype(np.float32)
    gram_t, rhs_t = jax.jit(
        lambda a, b: dense8_gram_rhs_cols(a, b, cs, cb, interpret=interp)
    )(jnp.asarray(codes), jnp.asarray(u.T.copy()))
    gram_t = np.asarray(gram_t)
    rhs_t = np.asarray(rhs_t)
    p_u = u[:, tri_i] * u[:, tri_j]              # [r, T]
    gram_ref_t = (ind.T @ p_u).T                 # [T, c]
    rhs_ref_t = (cv.T @ u).T                     # [K, c]
    err_g = np.abs(gram_t - gram_ref_t).max() / max(np.abs(gram_ref_t).max(), 1)
    err_r = np.abs(rhs_t - rhs_ref_t).max() / max(np.abs(rhs_ref_t).max(), 1)
    print("cols: rel err gram", err_g, "rhs", err_r)
    assert err_g < 1e-5 and err_r < 1e-5
    print("correctness OK")


def bench():
    if jax.default_backend() != "tpu":
        print("no TPU; skipping perf")
        return
    rows, cols, k = 162816, 59392, 32
    print(f"building {rows}x{cols} int8 on host ...")
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 3, size=(rows, cols)).astype(np.int8)
    codes_d = jax.device_put(jnp.asarray(codes))
    del codes
    v = jnp.asarray(rng.normal(size=(cols, k)).astype(np.float32), jnp.bfloat16)
    u_t = jnp.asarray(rng.normal(size=(k, rows)).astype(np.float32), jnp.bfloat16)
    cs, cb = 0.25, -1.5

    frow = jax.jit(lambda a, b: dense8_gram_rhs_rows(a, b, cs, cb))
    fcol = jax.jit(lambda a, b: dense8_gram_rhs_cols(a, b, cs, cb))

    for name, f, arg in (("rows", frow, v), ("cols", fcol, u_t)):
        out = jax.block_until_ready(f(codes_d, arg))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(codes_d, arg))
            best = min(best, time.perf_counter() - t0)
        flops = rows * cols * (640 + 2 * 32) * 2
        print(
            f"{name}: {best*1e3:.2f} ms  "
            f"({flops/best/1e12:.1f} TF/s incl. padding-T, "
            f"{rows*cols/best/1e9:.1f} Gcodes/s)"
        )


if __name__ == "__main__":
    check_correct()
    bench()
