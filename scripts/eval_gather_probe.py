#!/usr/bin/env python
"""Probe: does index locality change the predict row-gather rate?

`predict` (models/bpmf.py) gathers two [nnz_t, K] row sets per
iteration — at ml-1m scale (100k entries) this is 0.36 ms, ~30% of the
iteration, and the ledger calls it instruction-rate-bound (~2 ns/row).
If the XLA row gather is faster on monotonic indices (DMA/page
locality), sorting the test triples by row id is a free, trajectory-
preserving reordering (the Welford state is per-entry; outputs are
written back through the inverse permutation).

Prints ns/row for random vs sorted vs contiguous(iota) index vectors at
ml-1m shapes, plus the full two-sided predict analog.

Usage: python scripts/eval_gather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = 32
N_U, N_M = 6144, 4096   # ml-1m padded sides
NNZ = 100_000           # ml-1m test entries
STEPS = 50


def fetch(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench(fn, *args):
    f = jax.jit(fn)
    fetch(f(*args))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(N_U, K)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(N_M, K)).astype(np.float32))
    tu_rand = rng.integers(0, N_U, NNZ).astype(np.int32)
    tu_sort = np.sort(tu_rand)
    cases = {
        "random": jnp.asarray(tu_rand),
        "sorted": jnp.asarray(tu_sort),
        "iota%N": jnp.asarray((np.arange(NNZ) % N_U).astype(np.int32)),
    }

    def one_gather(idx):
        def body(c, _):
            g = jnp.take(u, idx + c, axis=0, fill_value=0.0)
            return c + jnp.asarray(0, jnp.int32), jnp.sum(g)

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                            length=STEPS)
        return jnp.sum(s)

    print(f"single [NNZ={NNZ}] row gather from [{N_U},{K}] f32:")
    for name, idx in cases.items():
        t = bench(one_gather, idx)
        print(f"  {name:8s} {t*1e3:8.4f} ms  ({t/NNZ*1e9:6.2f} ns/row)")

    # the real predict shape: two gathers + dot + 3 reductions
    tv = jnp.asarray(rng.normal(size=NNZ).astype(np.float32))
    ti_rand = rng.integers(0, N_M, NNZ).astype(np.int32)
    order = np.argsort(tu_rand, kind="stable")

    def predict_like(tu, ti):
        def body(c, _):
            # c == 0 always, but keeps both gathers carry-dependent so
            # neither is hoisted out of the scan
            gu = jnp.take(u, tu + c, axis=0, fill_value=0.0)
            gm = jnp.take(m, ti + c, axis=0, fill_value=0.0)
            pred = jnp.sum(gu * gm, axis=1)
            se = jnp.sum((tv - pred) ** 2)
            return c + jnp.asarray(0, jnp.int32), se

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                            length=STEPS)
        return jnp.sum(s)

    pairs = {
        "random/random": (tu_rand, ti_rand),
        "sorted-by-u  ": (tu_rand[order], ti_rand[order]),
    }
    print(f"two-sided predict analog ({NNZ} entries):")
    for name, (a, b) in pairs.items():
        t = bench(predict_like, jnp.asarray(a), jnp.asarray(b))
        print(f"  {name} {t*1e3:8.4f} ms")

    # fused variant: both tables concatenated, ONE 2*nnz gather (fewer op
    # dispatches; gather-rate is instruction-bound so this tests whether
    # dispatch count or row count dominates)
    def predict_fused(tu, ti):
        def body(c, _):
            tbl = jnp.concatenate([u, m], axis=0)
            idx = jnp.concatenate([tu, ti + N_U]) + c
            g = jnp.take(tbl, idx, axis=0, fill_value=0.0)
            pred = jnp.sum(g[:NNZ] * g[NNZ:], axis=1)
            se = jnp.sum((tv - pred) ** 2)
            return c + jnp.asarray(0, jnp.int32), se

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                            length=STEPS)
        return jnp.sum(s)

    for name, (a, b) in pairs.items():
        t = bench(predict_fused, jnp.asarray(a), jnp.asarray(b))
        print(f"  fused-1-gather {name} {t*1e3:8.4f} ms")

    # ---- round-4 hypotheses ----
    # (a) per-row rate vs total rows: the first probe round measured a
    # 200k-row gather at the SAME wall time as 100k rows (2.6 vs 5.6
    # ns/row), suggesting per-gather fixed cost dominates — if the rate
    # keeps improving with size, DEFERRING the chunk's predicts into one
    # big gather (indices are iteration-invariant; tables stacked) cuts
    # the per-iteration cost by ~the chunk length.
    print("gather rate vs rows (one take from [6144,32]):")
    for mult in (1, 2, 4, 8):
        idx = jnp.asarray(np.tile(tu_rand, mult))
        t = bench(one_gather, idx)
        print(f"  {mult*NNZ:>8d} rows {t*1e3:8.4f} ms "
              f"({t/(mult*NNZ)*1e9:6.2f} ns/row)")

    # (b) unchecked gather: fill_value forces a bounds-check + select;
    # indices are host-validated, so promise_in_bounds is safe
    def one_gather_unchecked(idx):
        def body(c, _):
            g = u.at[idx + c].get(mode="promise_in_bounds")
            return c + jnp.asarray(0, jnp.int32), jnp.sum(g)

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                            length=STEPS)
        return jnp.sum(s)

    t = bench(one_gather_unchecked, cases["random"])
    print(f"  unchecked(random) {t*1e3:8.4f} ms ({t/NNZ*1e9:6.2f} ns/row)")

    # (c) dense P = U M^T on the MXU + flat SCALAR extraction: row width
    # drops 32->1; if the gather is per-row latency-bound the scalar
    # extraction costs the same, but if byte-bound it is 32x cheaper.
    flat = jnp.asarray(tu_rand.astype(np.int64) * N_M
                       + ti_rand.astype(np.int64))

    def predict_dense(fidx):
        def body(c, _):
            p = jnp.dot(u, m.T, preferred_element_type=jnp.float32)
            pe = p.reshape(-1).at[fidx + c].get(mode="promise_in_bounds")
            se = jnp.sum((tv - pe) ** 2)
            return c + jnp.asarray(0, jnp.int64), se

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int64), None,
                            length=STEPS)
        return jnp.sum(s)

    t = bench(predict_dense, flat)
    print(f"  dense P + scalar extract {t*1e3:8.4f} ms")


if __name__ == "__main__":
    main()
