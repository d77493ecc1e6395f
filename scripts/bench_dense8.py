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
    packed_tri_t,
)
from bpmf_tpu.ops.pallas_solve import tri_tight_pairs


def check_correct(fold: str = "1"):
    os.environ["BPMF_D8_FOLD"] = fold
    rng = np.random.default_rng(0)
    r, c, k = 512, 512, 32
    codes = rng.integers(0, 6, size=(r, c)).astype(np.int8)
    cs, cb = 0.25, -1.5
    interp = jax.default_backend() != "tpu"
    tri_i, tri_j, _ = tri_tight_pairs(k)
    t = len(tri_i)

    ind = (codes != 0).astype(np.float32)
    cv = codes.astype(np.float32) * cs + ind * cb

    v = rng.normal(size=(c, k)).astype(np.float32)
    v_t = jnp.asarray(np.ascontiguousarray(v.T))
    gram_t, rhs_t = jax.jit(
        lambda a, p, b: dense8_gram_rhs_rows(a, p, b, cs, cb, interpret=interp)
    )(jnp.asarray(codes), packed_tri_t(v_t), v_t)
    gram_ref = ind @ (v[:, tri_i] * v[:, tri_j])
    rhs_ref = cv @ v
    # interpret mode (CPU) computes exactly; the real MXU multiplies f32
    # via bf16 passes at default precision -> ~1e-3 rel err is expected
    # (the production sweep feeds bf16 operands by design, docs/PERF.md)
    tol = 1e-5 if interp else 5e-3
    err_g = np.abs(np.asarray(gram_t)[:t].T - gram_ref).max() / np.abs(gram_ref).max()
    err_r = np.abs(np.asarray(rhs_t).T - rhs_ref).max() / np.abs(rhs_ref).max()
    print("rows: rel err gram", err_g, "rhs", err_r)
    assert err_g < tol and err_r < tol

    # cols orientation: same codes, now items are the columns
    u = rng.normal(size=(r, k)).astype(np.float32)
    u_t = jnp.asarray(np.ascontiguousarray(u.T))
    gram_t, rhs_t = jax.jit(
        lambda a, p, b: dense8_gram_rhs_cols(a, p, b, cs, cb, interpret=interp)
    )(jnp.asarray(codes), packed_tri_t(u_t), u_t)
    gram_ref_t = (ind.T @ (u[:, tri_i] * u[:, tri_j])).T   # [T, c]
    rhs_ref_t = (cv.T @ u).T                               # [K, c]
    err_g = np.abs(np.asarray(gram_t)[:t] - gram_ref_t).max() / np.abs(gram_ref_t).max()
    err_r = np.abs(np.asarray(rhs_t) - rhs_ref_t).max() / np.abs(rhs_ref_t).max()
    print("cols: rel err gram", err_g, "rhs", err_r)
    assert err_g < tol and err_r < tol
    print(f"correctness OK (fold={fold})")


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
    v_t = jnp.asarray(rng.normal(size=(k, cols)).astype(np.float32))
    u_t = jnp.asarray(rng.normal(size=(k, rows)).astype(np.float32))
    cs, cb = 0.25, -1.5

    def frow(a, b):
        bt = b.astype(jnp.bfloat16)
        return dense8_gram_rhs_rows(a, packed_tri_t(b).astype(jnp.bfloat16),
                                    bt, cs, cb)

    def fcol(a, b):
        bt = b.astype(jnp.bfloat16)
        return dense8_gram_rhs_cols(a, packed_tri_t(b).astype(jnp.bfloat16),
                                    bt, cs, cb)

    for fold in ("0", "1"):
        os.environ["BPMF_D8_FOLD"] = fold
        for name, f, arg in (
            ("rows", jax.jit(frow), v_t),
            ("cols", jax.jit(fcol), u_t),
        ):
            out = jax.block_until_ready(f(codes_d, arg))
            best = float("inf")
            for i in range(5):
                a2 = arg * (1.0 + 1e-6 * (i + 1))  # defeat dispatch caching
                jax.block_until_ready(a2)
                t0 = time.perf_counter()
                out = f(codes_d, a2)
                np.asarray(jax.device_get(out[0][0, :1]))  # value fetch
                best = min(best, time.perf_counter() - t0)
            flops = rows * cols * (640 + 2 * 32) * 2
            print(
                f"fold={fold} {name}: {best*1e3:.2f} ms  "
                f"({flops/best/1e12:.1f} TF/s incl. padding-T, "
                f"{rows*cols/best/1e9:.1f} Gcodes/s)"
            )


if __name__ == "__main__":
    check_correct("0")
    check_correct("1")
    bench()
