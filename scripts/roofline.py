#!/usr/bin/env python
"""Per-phase timing + analytic roofline ledger for the ml-1m dense sweep.

Three measurements (all device-synced, best-of-N):

1. end-to-end iteration time (run_chunk, like bench.py);
2. ablation deltas (Config.ablate): full - nomatmul = Gram matmul pair,
   full - nosolve = Cholesky-solve-sample, full - nopredict = eval —
   approximate, since removing a phase changes what XLA can fuse;
3. op micro-benchmarks (solver, noise table, predict) jitted standalone.

The analytic ledger (printed at the end) counts MXU flops and HBM bytes per
iteration for the dense path and states the machine ceilings, answering
"which bound binds" (VERDICT r1 weak #1).  Reference metric analog:
c++/sample.cpp:101-107, c++/bpmf.cpp:193-198.

Usage: python scripts/roofline.py [--iters 50] [--k 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (1 core): MXU peak and HBM bandwidth.  bf16 MXU 197 TFLOP/s,
# f32 ~49 TFLOP/s (bf16/4), HBM 819 GB/s.
PEAK = {"bf16_tflops": 197.0, "f32_tflops": 49.0, "hbm_gbs": 819.0}


def timed_chunk(sampler, iters, repeats=3):
    import jax

    m = sampler.run_chunk(iters)
    jax.block_until_ready(m)
    m = sampler.run_chunk(iters)
    jax.block_until_ready(m)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = sampler.run_chunk(iters)
        jax.block_until_ready(m)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def build(cfg_kwargs, train, test):
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(**cfg_kwargs)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    return s


def micro(fn, args, repeats=5):
    import jax

    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--solver", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bpmf_tpu.datasets import synth_movielens

    train, test = synth_movielens()
    k = args.k
    base = dict(num_latent=k, nsims=4 * args.iters, burnin=2,
                solver=args.solver)

    results = {}
    print(f"backend={jax.default_backend()} K={k} iters={args.iters}",
          flush=True)

    s_full = build(base, train, test)
    results["full"] = timed_chunk(s_full, args.iters)
    print(f"  full iteration: {results['full'] * 1e3:8.3f} ms", flush=True)

    for ab in ("nosolve", "nomatmul", "nopredict"):
        s = build({**base, "ablate": ab}, train, test)
        results[ab] = timed_chunk(s, args.iters)
        print(
            f"  ablate={ab:<10}: {results[ab] * 1e3:8.3f} ms  "
            f"(phase ~ {(results['full'] - results[ab]) * 1e3:6.3f} ms)",
            flush=True,
        )

    # -- micro-benchmarks ---------------------------------------------------
    from bpmf_tpu.ops.cholsolve import get_solver
    from bpmf_tpu.ops.update import noise_table
    from bpmf_tpu.models.bpmf import predict as predict_fn

    nm = s_full.movies.maps.padded_num
    nu = s_full.users.maps.padded_num
    dtype = s_full.dtype
    key = jax.random.PRNGKey(0)
    solver = get_solver(s_full.solver)

    for name, b in (("movies", nm), ("users", nu)):
        prec = (
            jnp.eye(k, dtype=dtype) * 4.0
            + jax.random.normal(key, (b, k, k), dtype) * 0.01
        )
        prec = (prec + jnp.swapaxes(prec, -1, -2)) / 2
        rhs = jax.random.normal(key, (b, k), dtype)
        noise = jax.random.normal(key, (b, k), dtype)
        t = micro(solver, (prec, rhs, noise))
        results[f"solve_{name}"] = t
        print(f"  micro solve[{b},{k},{k}] ({s_full.solver}): {t * 1e3:8.3f} ms")

    t = micro(lambda kk: noise_table(kk, nu, k, dtype), (key,))
    results["noise_users"] = t
    print(f"  micro noise_table[{nu},{k}]: {t * 1e3:8.3f} ms")

    t = micro(
        lambda ui, mi: predict_fn(
            s_full.ev, s_full.est, ui, mi, jnp.asarray(5, jnp.int32),
            mean_rating=s_full._mean_rating_dev, burnin=2,
        ),
        (s_full.state_u.items, s_full.state_m.items),
    )
    results["predict"] = t
    print(f"  micro predict[{len(s_full.t_val)} nnz]: {t * 1e3:8.3f} ms")

    # -- analytic ledger (dense path) ----------------------------------------
    md_bytes = 2 if s_full.matmul_dtype == "bfloat16" else 4
    ledger_flops = 0.0
    ledger_bytes = 0.0
    for side, other in ((s_full.movies, s_full.users),
                        (s_full.users, s_full.movies)):
        i_pad, n_pad = side.maps.padded_num, other.maps.padded_num
        # gram: [I,N]@[N,K2]; rhs: [I,N]@[N,K]
        ledger_flops += 2.0 * i_pad * n_pad * (k * k + k)
        # p build: N*K2 mults (VPU, negligible) — HBM write counts
        ledger_bytes += (
            2 * i_pad * n_pad * md_bytes      # a_ind + a_val read
            + n_pad * k * k * md_bytes        # p read by matmul
            + i_pad * k * k * 4               # gram out f32
            + i_pad * k * 4                   # rhs out
        )
    t_mxu = ledger_flops / (PEAK["bf16_tflops"] * 1e12
                            if md_bytes == 2 else PEAK["f32_tflops"] * 1e12)
    t_hbm = ledger_bytes / (PEAK["hbm_gbs"] * 1e9)
    print("\nanalytic ledger (dense path, per iteration):")
    print(f"  MXU flops: {ledger_flops / 1e9:.1f} GFLOP "
          f"-> >= {t_mxu * 1e3:.3f} ms at {PEAK['bf16_tflops'] if md_bytes == 2 else PEAK['f32_tflops']:.0f} TFLOP/s")
    print(f"  HBM bytes: {ledger_bytes / 1e6:.0f} MB "
          f"-> >= {t_hbm * 1e3:.3f} ms at {PEAK['hbm_gbs']:.0f} GB/s")
    bound = "MXU" if t_mxu > t_hbm else "HBM"
    ceil = max(t_mxu, t_hbm)
    print(f"  binding constraint: {bound}; ceiling {ceil * 1e3:.3f} ms/iter "
          f"-> measured/ceiling = {results['full'] / ceil:.2f}x")

    print(json.dumps({kk: round(v * 1e3, 4) for kk, v in results.items()}))


if __name__ == "__main__":
    main()
