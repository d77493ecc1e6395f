#!/usr/bin/env python
"""Standalone sweep of the fused tri solver at the chembl batch size.

The round-4 chembl profile attributes ~9.6 of 15.2 ms/iter to
tri_combine_solve_sample at B=167k (57 ns/item vs ml-1m's ~26) — this
sweeps lane-block size x layout (grouped/ungrouped) x expansion cost on
the real chip to find where the time goes.  Out-of-context numbers are
optimistic (no competing pipelines), so treat deltas, not absolutes.

Usage: python scripts/bench_solver.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench(f, *args, steps=20):
    jf = jax.jit(f)
    fetch(jf(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(jf(*args))
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    import bpmf_tpu.ops.pallas_solve as ps

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 167_040
    k = 32
    steps = 20
    rng = np.random.default_rng(0)

    ii, jj, _ = ps.tri_tight_pairs(k)
    t_tight = len(ii)
    # well-conditioned SPD gram batch, packed tight triangle [T_tight, B]
    m = rng.normal(size=(64, k)).astype(np.float32)
    gram1 = m.T @ m + 3 * np.eye(k, dtype=np.float32)
    g_tight = np.tile(gram1[ii, jj][:, None], (1, b)).astype(np.float32)
    g_tight *= (0.9 + 0.2 * rng.random((1, b))).astype(np.float32)
    lam = (np.eye(k) * 1.7).astype(np.float32)
    rhs = rng.normal(size=(k, b)).astype(np.float32)
    noise = rng.normal(size=(k, b)).astype(np.float32)

    g_tight, lam, rhs, noise = map(jnp.asarray, (g_tight, lam, rhs, noise))

    def run(block, grouped):
        os.environ["BPMF_TRI_BLOCK"] = str(block)
        os.environ["BPMF_TRI_GROUPED"] = grouped
        ps._tri_grouped_reset()

        def f(gt, la, rh, no):
            def body(c, _):
                g_al = ps.tri_expand_rows(gt, k)
                u = ps.tri_combine_solve_sample(g_al, la, rh + c, no, 2.0)
                return c + jnp.asarray(0, jnp.float32), jnp.sum(u)

            _, s = jax.lax.scan(body, jnp.asarray(0, jnp.float32), None,
                                length=steps)
            return jnp.sum(s)

        t = bench(f, g_tight, lam, rhs, noise, steps=steps)
        print(f"  block={block:5d} grouped={grouped}: {t*1e3:8.3f} ms "
              f"({t/b*1e9:6.2f} ns/item)", flush=True)
        return t

    print(f"fused tri solver sweep, K={k}, B={b} "
          f"(includes tight->aligned expansion):")
    for grouped in ("1", "0"):
        for block in (256, 512, 1024):
            try:
                run(block, grouped)
            except Exception as e:
                print(f"  block={block} grouped={grouped}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # expansion alone (the [T_tight,B] -> [T,B] memory pass)
    def fexp(gt):
        def body(c, _):
            g_al = ps.tri_expand_rows(gt + c, k)
            return c + jnp.asarray(0, jnp.float32), jnp.sum(g_al)

        _, s = jax.lax.scan(body, jnp.asarray(0, jnp.float32), None,
                            length=steps)
        return jnp.sum(s)

    os.environ["BPMF_TRI_BLOCK"] = "0"
    t = bench(fexp, g_tight, steps=steps)
    print(f"  tri_expand_rows alone: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
