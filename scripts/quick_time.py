#!/usr/bin/env python
"""Quick in-context ms/iter + compile-time for one regime and gram_impl.

Usage: python scripts/quick_time.py <ml1m|chembl|ml25m> [gram_impl] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(mets):
    import jax

    return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])


def main():
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF
    from bpmf_tpu import datasets

    name = sys.argv[1]
    impl = sys.argv[2] if len(sys.argv) > 2 else "auto"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    if name == "ml1m":
        train, test = datasets.synth_movielens()
    elif name == "chembl":
        train, test = datasets.synth_chembl()
    elif name == "ml25m":
        train, test = datasets.synth_movielens(
            n_users=162_541, n_movies=59_047, n_ratings=25_000_000
        )
    else:
        raise SystemExit(f"unknown regime {name}")

    cfg = Config(num_latent=int(os.environ.get("BENCH_K", "32")),
                 nsims=10_000, burnin=2, gram_impl=impl)
    t0 = time.perf_counter()
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(s.run_chunk(iters))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(s.run_chunk(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name} impl={impl} (u={s.users.impl} m={s.movies.impl}) "
          f"{best * 1e3:8.4f} ms/iter (setup {setup_s:.1f}s, "
          f"compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
