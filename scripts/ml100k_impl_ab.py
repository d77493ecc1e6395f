#!/usr/bin/env python
"""Small-scale companion to ml1m_impl_ab.py: where does the dense8-vs-
fused-dense crossover sit?  Runs the in-context A/B at ml-100k scale
(943x1682, 80k ratings) and at an intermediate ~ml-1m/4 scale so the
auto-selection rule can be set from measurements instead of the stale
round-2 note.  Usage: python scripts/ml100k_impl_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(mets):
    import jax

    return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])


def run(name, train, test, impl, iters):
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
    print(f"{name} impl={impl:<7} (u={s.users.impl:<7}) "
          f"{best * 1e3:8.4f} ms/iter (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    from bpmf_tpu.datasets import synth_movielens

    scales = [
        ("ml-100k ", dict(n_users=943, n_movies=1682, n_ratings=100_000,
                          test_frac=0.2, seed=7)),
        ("ml-1m/4 ", dict(n_users=3020, n_movies=1976, n_ratings=250_000,
                          test_frac=0.1, seed=7)),
    ]
    for name, kw in scales:
        train, test = synth_movielens(**kw)
        t_f = run(name, train, test, "dense", 300)
        t_8 = run(name, train, test, "dense8", 300)
        print(f"{name} dense8/dense ratio: {t_8 / t_f:.3f}x", flush=True)


if __name__ == "__main__":
    main()
