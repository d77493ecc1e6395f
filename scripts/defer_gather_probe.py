#!/usr/bin/env python
"""Probe: deferred-predict gather cost vs group size g.

The first deferral attempt (g=chunk=200) measured 3.54 ms/iter — far
WORSE than the per-iteration 0.36 ms — while the rate-vs-rows probe said
a single gather's cost is flat in row count from a FIXED 6144-row table.
Hypothesis: the XLA row-gather cost scales with the TABLE size (stacked
tables grow with g), so there is an optimal small g.

Measures the exact deferred shape per group: table [g*6144, 32] and
[g*4096, 32], gathers of g*100k rows each, dot + rmse sums, scan over
STEPS groups.  Prints per-iteration-equivalent ms (t / (STEPS*g)).

Usage: python scripts/defer_gather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = 32
N_U, N_M = 6144, 4096
NNZ = 100_000
STEPS = 10


def fetch(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench(fn, *args):
    f = jax.jit(fn)
    fetch(f(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    tu = jnp.asarray(rng.integers(0, N_U, NNZ).astype(np.int32))
    ti = jnp.asarray(rng.integers(0, N_M, NNZ).astype(np.int32))
    tv = jnp.asarray(rng.normal(size=NNZ).astype(np.float32))

    print("deferred-predict analog: per-iteration-equivalent ms vs g")
    for g in (1, 2, 4, 8, 16, 32):
        us = jnp.asarray(rng.normal(size=(g, N_U, K)).astype(np.float32))
        ms = jnp.asarray(rng.normal(size=(g, N_M, K)).astype(np.float32))
        steps = jnp.arange(g, dtype=jnp.int32)
        iu = (steps[:, None] * N_U + tu[None, :]).reshape(-1)
        im = (steps[:, None] * N_M + ti[None, :]).reshape(-1)

        def grp(u_s, m_s, c):
            gu = u_s.reshape(g * N_U, K).at[iu + c].get(
                mode="promise_in_bounds")
            gm = m_s.reshape(g * N_M, K).at[im + c].get(
                mode="promise_in_bounds")
            preds = jnp.sum(gu * gm, axis=-1).reshape(g, NNZ)
            return jnp.sum((preds - tv[None, :]) ** 2)

        def run(u_s, m_s):
            def body(c, _):
                return c + jnp.asarray(0, jnp.int32), grp(u_s, m_s, c)

            _, s = jax.lax.scan(body, jnp.asarray(0, jnp.int32), None,
                                length=STEPS)
            return jnp.sum(s)

        t = bench(run, us, ms)
        per_iter = t / (STEPS * g)
        print(f"  g={g:3d}: {per_iter*1e3:8.4f} ms/iter-equivalent "
              f"(group {t/STEPS*1e3:8.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
