#!/usr/bin/env python
"""In-context A/B at ml-1m scale: fused dense bf16 sweep vs the int8
dense-stream (dense8) sweep, on the CURRENT kernels.

Motivation (round 5): the auto-selection note in sampler.py quotes
"7.8M items/s fused vs 6.9M dense8" for ml-1m — but that measurement
predates the round-4 dense8 improvements (BPMF_D8_FOLD affine fold,
BPMF_TRI_ALIGNED_MM aligned Gram) that took ml-25M from 169 to
97.9 ms/iter at ~250 TF/s effective on the int8 Gram passes.  If dense8
now wins at ml-1m too, the Gram phase bound drops from the bf16 peak
(0.27 ms) toward the int8 peak (~0.14 ms) — the single biggest itemized
lever toward the ~0.7 ms iteration ceiling (docs/PERF.md §ml-1m).

Usage: python scripts/ml1m_impl_ab.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(mets):
    import jax

    return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])


def run(train, test, impl, iters):
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=int(os.environ.get("BENCH_K", "32")),
                 nsims=10_000, burnin=2, gram_impl=impl)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    t0 = time.perf_counter()
    fetch(s.run_chunk(iters))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(s.run_chunk(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"ml-1m gram_impl={impl:<7} u={s.users.impl:<7} m={s.movies.impl:<7}"
          f" {best * 1e3:8.4f} ms/iter (compile {compile_s:.1f}s)",
          flush=True)
    return best


def main():
    from bpmf_tpu.datasets import synth_movielens

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    train, test = synth_movielens()
    t_fused = run(train, test, "auto", iters)    # auto: fused dense at ml-1m
    t_d8 = run(train, test, "dense8", iters)
    print(f"dense8/fused ratio: {t_d8 / t_fused:.3f}x "
          f"({'dense8 WINS' if t_d8 < t_fused else 'fused dense keeps'})",
          flush=True)


if __name__ == "__main__":
    main()
