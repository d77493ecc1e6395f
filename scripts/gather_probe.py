#!/usr/bin/env python
"""Micro-probes for vectorized neighbor-gather strategies on the real TPU.

The huge-sparse Gram kernel needs `table[idx]` for ~25M edges/iter; the
round-1 scalar-read kernel measured 8M edges/s.  Candidates probed here:

A. jnp.take(table, idx, axis=0) inside a Pallas kernel (Mosaic dynamic
   gather, if supported for sublane-dim gathers)
B. table transposed [K, NV]: gather along LANES via jnp.take(.., axis=1)
C. per-row async DMA assembly from an HBM table (batched issue)
D. XLA-level jnp.take on device (outside Pallas) for reference

Each prints effective edges/s (1 edge = one K-vector row fetched).

Usage: python scripts/gather_probe.py [A|B|C|D ...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 32
NV = 32768          # table rows (fits VMEM as bf16/f32)
R = 512             # item rows per call
W = 512             # neighbors per item row
N_STEPS = 10


def fetch(o):
    leaves = jax.tree_util.tree_leaves(o)
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def timed(name, fn, *args):
    f = jax.jit(fn)
    try:
        jax.block_until_ready(f(*args))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        fetch(f(*args))
        best = min(best, time.perf_counter() - t0)
    edges = R * W * N_STEPS
    print(f"{name}: {best / N_STEPS * 1e3:8.3f} ms/step  "
          f"{edges / best / 1e6:10.1f} M edges/s", flush=True)


rng = np.random.default_rng(0)
table_np = rng.normal(size=(NV, K)).astype(np.float32)
idx_np = rng.integers(0, NV, size=(R, W)).astype(np.int32)


# -- A: take_along_axis on sublanes (Mosaic dynamic_gather semantics) ----
def kernel_a(idx_ref, table_ref, out_ref):
    idx = idx_ref[:]                       # [R*W] int32 (flat)
    idx2 = jnp.broadcast_to(idx[:, None], (R * W, K))
    g = jnp.take_along_axis(table_ref[:], idx2, axis=0)   # [R*W, K]
    out_ref[:] = jnp.sum(g.reshape(R, W, K), axis=1)


def probe_a(idx, table):
    def one(c, _):
        o = pl.pallas_call(
            kernel_a,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
        )(idx, c)
        return c * (1.0 + 1e-30 * o[0, 0]), None
    return lax.scan(one, table, None, length=N_STEPS)[0]


# -- B: transposed table, gather along lanes ----------------------------
def kernel_b(idx_ref, table_t_ref, out_ref):
    idx = idx_ref[:]                       # [R*W]
    g = jnp.take(table_t_ref[:], idx, axis=1)  # [K, R*W]
    out_ref[:] = jnp.sum(g.reshape(K, R, W), axis=2).T


def probe_b(idx, table_t):
    def one(c, _):
        o = pl.pallas_call(
            kernel_b,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
        )(idx, c)
        return c * (1.0 + 1e-30 * o[0, 0]), None
    return lax.scan(one, table_t, None, length=N_STEPS)[0]


# -- C: DMA assembly from HBM table --------------------------------------
def kernel_c(idx_ref, table_hbm, out_ref, scratch, sem):
    # one item row per grid step; W row-DMAs issued back-to-back on one
    # semaphore, then W waits drain them all
    def issue(w, _):
        pltpu.make_async_copy(
            table_hbm.at[idx_ref[0, w]], scratch.at[w], sem
        ).start()
        return 0
    lax.fori_loop(0, W, issue, 0, unroll=8)

    def wait(w, _):
        pltpu.make_async_copy(
            table_hbm.at[0], scratch.at[w], sem
        ).wait()
        return 0
    lax.fori_loop(0, W, wait, 0)
    out_ref[:] = jnp.sum(scratch[:], axis=0, keepdims=True)


def probe_c(idx, table):
    def one(c, _):
        o = pl.pallas_call(
            kernel_c,
            grid=(R,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, K), jnp.float32),
            scratch_shapes=[pltpu.VMEM((W, K), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(idx, c)
        return c * (1.0 + 1e-30 * o[0, 0]), None
    return lax.scan(one, table, None, length=N_STEPS)[0]


# -- D: XLA jnp.take reference -------------------------------------------
def probe_d(idx, table):
    def one(c, _):
        g = jnp.take(c, idx.reshape(-1), axis=0)
        o = jnp.sum(g.reshape(R, W, K), axis=1)
        return c * (1.0 + 1e-30 * o[0, 0]), None
    return lax.scan(one, table, None, length=N_STEPS)[0]


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C", "D"}
    idx_flat = jnp.asarray(idx_np.reshape(-1))
    idx2d = jnp.asarray(idx_np)
    table = jnp.asarray(table_np)
    table_t = jnp.asarray(np.ascontiguousarray(table_np.T))
    if "A" in which:
        timed("A pallas take axis0", probe_a, idx_flat, table)
    if "B" in which:
        timed("B pallas take lanes", probe_b, idx_flat, table_t)
    if "C" in which:
        timed("C pallas DMA rows  ", probe_c, idx2d, table)
    if "D" in which:
        timed("D xla take         ", probe_d, idx2d, table)


if __name__ == "__main__":
    main()
