#!/usr/bin/env python
"""In-context A/B of the one-gather (stacked-table) predict vs the
two-gather split predict, on the real compiled program.

Motivation: scripts/eval_gather_probe.py measured the XLA row gather's
out-of-context cost as ~flat in row count (0.55 ms at 100k rows, 0.52 ms
at 800k) — per-op latency dominates, so one gather over the stacked
[n_users + n_movies, K] table should beat two separate ones.  The probe
also showed the fused form only ~2% faster OUT of context, where the
dispatch floor swamps everything; this script pins down the in-context
delta the same way scripts/defer_ab.py did for deferral.

Usage: python scripts/fused_eval_ab.py [ml1m|chembl] ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(mets):
    import jax

    return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])


def run(name, train, test, iters, fused):
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=int(os.environ.get("BENCH_K", "32")),
                 nsims=10_000, burnin=2, fused_eval_gather=fused)
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
    print(f"{name} fused={fused}: {best * 1e3:8.4f} ms/iter "
          f"(compile {compile_s:.1f}s)", flush=True)


def main():
    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    want = set(sys.argv[1:]) or {"ml1m", "chembl"}
    if "ml1m" in want:
        train, test = synth_movielens()
        for fused in ("off", "on"):
            run("ml-1m ", train, test, 200, fused)
    if "chembl" in want:
        train, test = synth_chembl()
        for fused in ("off", "on"):
            run("chembl", train, test, 100, fused)


if __name__ == "__main__":
    main()
