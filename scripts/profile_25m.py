#!/usr/bin/env python
"""Phase-level roofline of the dense8 ml-25M iteration on the real chip.

Each phase is timed as a 20-step lax.scan with a scalar carry dependency
(the axon tunnel appears to cache identical dispatches, so repeated
identical calls time as ~0; a data-dependent carry forces real sequential
execution).  Dataset + code array are cached to /tmp between runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CACHE = "/tmp/ml25m_cache"
N_STEPS = 20


def get_data():
    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, "codes.npy")
    if not os.path.exists(f):
        from bpmf_tpu.datasets import synth_movielens
        from bpmf_tpu.ops.dense8 import quantize_values, build_code_array
        import scipy.sparse as sp

        t0 = time.perf_counter()
        train, test = synth_movielens(
            n_users=162_541, n_movies=59_047, n_ratings=25_000_000, seed=25
        )
        print("synth", time.perf_counter() - t0, flush=True)
        q = quantize_values(train.data)
        coo = train.tocoo()
        codes = build_code_array(
            coo.row.astype(np.int64), coo.col.astype(np.int64), coo.data, q,
            162816, 59392,
        )
        np.save(f, codes)
        tc = test.tocoo()
        np.save(os.path.join(CACHE, "tuser.npy"), tc.row.astype(np.int32))
        np.save(os.path.join(CACHE, "titem.npy"), tc.col.astype(np.int32))
        np.save(os.path.join(CACHE, "tval.npy"), tc.data.astype(np.float32))
    codes = np.load(f, mmap_mode="r")
    return codes


def timed(name, fn, *args):
    """jit(scan of N_STEPS chained calls); report per-step ms.

    The timed call uses PERTURBED float arguments: the axon tunnel caches
    the result of an identical (executable, args) dispatch, so re-timing
    the warmup call measures ~0."""
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))  # compile + first run

    def perturb(a, i):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a * (1.0 + 1e-6 * (i + 1))
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.unsignedinteger):
            return a + (i + 1)  # PRNG keys: any distinct key works
        return a

    def fetch(o):
        # a real VALUE fetch: block_until_ready over the axon tunnel
        # returns before remote execution finishes, device_get does not
        leaves = jax.tree_util.tree_leaves(o)
        return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])

    best = float("inf")
    for rep in range(2):
        args2 = [perturb(a, rep) for a in args]
        for a in args2:
            jax.block_until_ready(a)
        t0 = time.perf_counter()
        fetch(f(*args2))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best / N_STEPS * 1e3:8.2f} ms/step", flush=True)


def main():
    only = set((sys.argv[1] if len(sys.argv) > 1 else "").split(",")) - {""}

    def want(name):
        return not only or name in only

    codes_np = get_data()
    rows, cols = codes_np.shape
    k, t_tri = 32, 640
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    codes = jax.device_put(np.ascontiguousarray(codes_np))
    jax.block_until_ready(codes)
    print("upload", time.perf_counter() - t0, flush=True)

    from bpmf_tpu.ops.dense8 import (
        dense8_gram_rhs_rows, dense8_gram_rhs_cols, packed_tri_t)
    from bpmf_tpu.ops.pallas_solve import tri_combine_solve_sample
    from bpmf_tpu.ops.update import noise_table

    v0 = jnp.asarray(rng.normal(0, 0.3, size=(cols, k)).astype(np.float32))
    u0 = jnp.asarray(rng.normal(0, 0.3, size=(rows, k)).astype(np.float32))
    cs, cb = 0.5, -1.5

    # 1. rows kernel (users sweep gram+rhs).  codes is an ARGUMENT, not a
    # closure capture — captured device arrays become 9.67 GB jaxpr
    # constants and lowering never finishes.
    def rows_scan(a, v):
        def body(c, _):
            ct = c.T
            g, r = dense8_gram_rhs_rows(
                a, packed_tri_t(ct).astype(jnp.bfloat16),
                ct.astype(jnp.bfloat16), cs, cb)
            return c * (1.0 + 1e-30 * g[0, 0]), None
        return lax.scan(body, v, None, length=N_STEPS)[0]
    if want("rows"):
        timed("rows kernel (gram+rhs)", rows_scan, codes, v0)

    # 2. cols kernel
    def cols_scan(a, u):
        def body(c, _):
            ct = c.T
            g, r = dense8_gram_rhs_cols(
                a, packed_tri_t(ct).astype(jnp.bfloat16),
                ct.astype(jnp.bfloat16), cs, cb)
            return c * (1.0 + 1e-30 * g[0, 0]), None
        return lax.scan(body, u, None, length=N_STEPS)[0]
    if want("cols"):
        timed("cols kernel (gram+rhs)", cols_scan, codes, u0)

    # 3. the [R, T] -> [T, R] f32 transpose of the rows-side gram
    g0 = jnp.asarray(rng.normal(size=(rows, t_tri)).astype(np.float32))
    def transpose_scan(g):
        def body(c, _):
            gt = c.T
            return c * (1.0 + 1e-30 * gt[0, 0]), None
        return lax.scan(body, g, None, length=N_STEPS)[0]
    if want("transpose"):
        timed("gram transpose [R,T]->[T,R]", transpose_scan, g0)

    # 4. tri solver on the users-side batch
    gt0 = jnp.abs(jnp.asarray(rng.normal(size=(t_tri, rows)).astype(np.float32)))
    lam = jnp.eye(k, dtype=jnp.float32)
    rhs0 = jnp.asarray(rng.normal(size=(k, rows)).astype(np.float32))
    def solve_scan(rhs):
        def body(c, _):
            # diagonal-dominant precision: lam=I, gram diag-only-ish is not
            # guaranteed PD from random tri; use zero gram scaled -> I
            u = tri_combine_solve_sample(gt0 * 1e-6, lam, c, c, 2.0)
            return c * (1.0 + 1e-30 * u[0, 0]), None
        return lax.scan(body, rhs, None, length=N_STEPS)[0]
    if want("solve"):
        timed("tri solve (users batch)", solve_scan, rhs0)

    # 5. eval / predict on the 2.5M test entries
    tu = jnp.asarray(np.load(os.path.join(CACHE, "tuser.npy")))
    ti = jnp.asarray(np.load(os.path.join(CACHE, "titem.npy")))
    tv = jnp.asarray(np.load(os.path.join(CACHE, "tval.npy")))
    from bpmf_tpu.models.bpmf import EvalData, EvalState, predict
    ev = EvalData(t_user=tu, t_item=ti, t_val=tv)
    est0 = EvalState(pavg=jnp.zeros_like(tv), pm2=jnp.zeros_like(tv))
    def pred_scan(u):
        def body(carry, i):
            est, uu = carry
            est2, rmse, _ = predict(ev, est, uu, v0, i,
                                    mean_rating=jnp.float32(3.5), burnin=2)
            return (est2, uu * (1.0 + 1e-30 * rmse)), None
        return lax.scan(body, (est0, u), jnp.arange(N_STEPS))[0][1]
    if want("predict"):
        timed("predict (2.5M test nnz)", pred_scan, u0)

    # 6. noise table (threefry for every item)
    key = jax.random.PRNGKey(0)
    def noise_scan(kk):
        def body(c, _):
            n = noise_table(c, rows, k, jnp.float32)
            return jax.random.fold_in(c, jnp.int32(n[0, 0] * 1e-30)), None
        return lax.scan(body, kk, None, length=N_STEPS)[0]
    if want("noise"):
        timed("noise table (users)", noise_scan, key)


if __name__ == "__main__":
    main()
