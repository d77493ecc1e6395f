#!/usr/bin/env python
"""Probe: test-set prediction via per-entry row gathers (the current
models/bpmf.predict form) vs a DENSE U @ V.T product + one flat scalar
gather.

Motivation (round-5): predict is the largest remaining ml-1m phase
(~0.32 ms of ~1.14); the fused single-gather form only bought ~0.02 ms
(docs/measurements/r5_fused_eval_ab_ml1m.log), so the cost is the row
gather itself — nnz_t scattered HBM transactions per table.  At ml-1m
scale the full dense product is only n_u*n_m*4 B ~ 90 MB of sequential
HBM writes (~0.08 ms) plus one SCALAR gather (4 B/entry instead of
K*4 B/entry), which the transaction-granularity model says should win.
Standalone numbers are optimistic vs in-context (XLA fuses differently);
this probe only decides whether wiring it into the sampler is worth it.

Reference for the op being replaced: c++/sample.cpp:48-96.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=200):
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
    tu = jnp.asarray(tcoo.row, jnp.int32)
    tm = jnp.asarray(tcoo.col, jnp.int32)
    nnz = tu.shape[0]
    print(f"ml-1m synth: U[{n_u},{k}] V[{n_m},{k}] test nnz={nnz} "
          f"dense table {n_u * n_m * 4 / 1e6:.0f} MB", flush=True)

    @jax.jit
    def eval_gather(u, v):
        table = jnp.concatenate([u, v], axis=0).astype(jnp.bfloat16)
        idx = jnp.concatenate([tu, tm + n_u])
        um = table[idx]
        prod = (um[:nnz] * um[nnz:]).astype(jnp.float32)
        pred = jnp.sum(prod, axis=-1)
        return pred

    @jax.jit
    def eval_dense(u, v):
        pred_all = jnp.matmul(
            u.astype(jnp.bfloat16), v.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )                                       # [n_u, n_m] f32
        return pred_all.reshape(-1)[tu * n_m + tm]

    @jax.jit
    def eval_dense_pad(u, v):
        # lane-aligned minor dim (n_m rounded to 128) — cheap insurance
        # against a strided-layout relayout of the dense product
        n_m_pad = (n_m + 127) // 128 * 128
        vp = jnp.zeros((n_m_pad, k), jnp.bfloat16).at[:n_m].set(
            v.astype(jnp.bfloat16))
        pred_all = jnp.matmul(
            u.astype(jnp.bfloat16), vp.T, preferred_element_type=jnp.float32
        )
        return pred_all.reshape(-1)[tu * n_m_pad + tm]

    a = bench(eval_gather, u, v)
    b = bench(eval_dense, u, v)
    c = bench(eval_dense_pad, u, v)
    print(f"row-gather eval (fused 1-gather form): {a:8.4f} ms", flush=True)
    print(f"dense matmul + flat scalar gather:     {b:8.4f} ms", flush=True)
    print(f"dense (128-padded minor) + gather:     {c:8.4f} ms", flush=True)

    ga = np.asarray(eval_gather(u, v))
    gb = np.asarray(eval_dense(u, v))
    gc = np.asarray(eval_dense_pad(u, v))
    print(f"max |dense - gather| = {np.abs(gb - ga).max():.3e}  "
          f"(pad variant {np.abs(gc - ga).max():.3e})", flush=True)


if __name__ == "__main__":
    main()
