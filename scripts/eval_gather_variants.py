#!/usr/bin/env python
"""Probe: variants of the test-set prediction gather (the largest
remaining ml-1m phase, ~0.43 ms of ~1.14 in-context; standalone fused
single-gather form measured 0.495 ms on the tunneled TPU —
docs/measurements/r5_dense_eval_probe.log).

The test set is FIXED across iterations, so its entry order is ours to
choose at setup: Pavg/Pm2 Welford state can live permanently in any
permutation and only be unpermuted once at finalize (the reference's own
permuteCols/unpermuteCols trick, c++/assign.cpp:17-46, applied to eval).
Variants measured here:

  gather1      one [nnz*2] row gather of the stacked [n_u+n_m, K] table
               (the current fused form, models/bpmf.py)
  gather1_s    same, entries pre-sorted by flat index + lax.gather with
               indices_are_sorted=True
  gather2_s    two gathers: U side sorted by user (sorted=True), V side
               unsorted (random-by-movie), product in user order
  gather2_seg  U side as segment-broadcast (no gather at all: unique
               users + repeat via cumsum trick), V side unsorted
  bf16 / f32   table dtype for each

Reference op: c++/sample.cpp:48-96.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=300):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from bpmf_tpu.datasets import synth_movielens

    train, test = synth_movielens()
    n_u, n_m = train.shape
    k = 32
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n_u, k)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_m, k)), jnp.float32)
    tcoo = test.tocoo()
    nnz = tcoo.nnz
    print(f"ml-1m synth: U[{n_u},{k}] V[{n_m},{k}] test nnz={nnz}",
          flush=True)

    # unsorted (COO order = movie-major from CSC) — the current layout
    tu = jnp.asarray(tcoo.row, jnp.int32)
    tm = jnp.asarray(tcoo.col, jnp.int32)

    # user-major sort
    order = np.lexsort((tcoo.col, tcoo.row))
    su = jnp.asarray(tcoo.row[order], jnp.int32)
    sm = jnp.asarray(tcoo.col[order], jnp.int32)

    results = {}
    for td in (jnp.bfloat16, jnp.float32):
        tag = "bf16" if td == jnp.bfloat16 else "f32 "

        @jax.jit
        def gather1(u, v, _td=td):
            table = jnp.concatenate([u, v], axis=0).astype(_td)
            idx = jnp.concatenate([tu, tm + n_u])
            um = table[idx]
            return jnp.sum((um[:nnz] * um[nnz:]).astype(jnp.float32), -1)

        @jax.jit
        def gather1_s(u, v, _td=td):
            table = jnp.concatenate([u, v], axis=0).astype(_td)
            # flat-sorted single gather: sort the combined index vector
            # once at trace time is not possible (values change per
            # entry), but user-major entry order makes the U half sorted
            # and the V half grouped; use sorted flag anyway (XLA may
            # exploit monotonic runs)
            idx = jnp.concatenate([su, sm + n_u])
            um = jax.lax.gather(
                table, idx[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                (1, k), indices_are_sorted=False, mode="clip")
            return jnp.sum((um[:nnz] * um[nnz:]).astype(jnp.float32), -1)

        @jax.jit
        def gather2_s(u, v, _td=td):
            ug = jax.lax.gather(
                u.astype(_td), su[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                (1, k), indices_are_sorted=True, mode="clip")
            vg = v.astype(_td)[sm]
            return jnp.sum((ug * vg).astype(jnp.float32), -1)

        a = bench(gather1, u, v)
        b = bench(gather1_s, u, v)
        c = bench(gather2_s, u, v)
        print(f"[{tag}] gather1 (current)        {a:8.4f} ms", flush=True)
        print(f"[{tag}] gather1 user-major       {b:8.4f} ms", flush=True)
        print(f"[{tag}] gather2 sortedU+randomV  {c:8.4f} ms", flush=True)
        results[(tag, "g1")] = np.asarray(gather1(u, v))
        # numeric check: same values modulo order
        pa = np.asarray(gather1(u, v))[np.argsort(np.argsort(
            tcoo.col * n_u + tcoo.row, kind="stable"), kind="stable")]
        pc = np.asarray(gather2_s(u, v))
        # align: gather1 is in COO order; gather2 in user-major order
        pa2 = np.asarray(gather1(u, v))[order] if order is not None else pa
        if td == jnp.float32:
            print(f"  max|g2s - g1[order]| = "
                  f"{np.abs(pc - pa2).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
