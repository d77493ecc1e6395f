#!/usr/bin/env python
"""In-context A/B of the deferred chunk-batched predict vs the
in-iteration predict, on the real program (not the out-of-context
gather probe, which measured 0.12 ms/iter-equivalent at g=32 while the
full bench leg REGRESSED — this pins down the in-context delta).

Usage: python scripts/defer_ab.py [ml1m|chembl] ...
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fetch(mets):
    import jax

    return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])


def run(name, train, test, iters, defer):
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=int(os.environ.get("BENCH_K", "32")),
                 nsims=10_000, burnin=2, defer_predict=defer)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    t0 = time.perf_counter()
    fetch(s.run_chunk(iters))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        m = fetch(s.run_chunk(iters))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name} defer={defer}: {best * 1e3:8.4f} ms/iter "
          f"(compile {compile_s:.1f}s)", flush=True)


def main():
    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    want = set(sys.argv[1:]) or {"ml1m", "chembl"}
    if "ml1m" in want:
        train, test = synth_movielens()
        for defer in ("off", "auto"):
            run("ml-1m ", train, test, 200, defer)
    if "chembl" in want:
        train, test = synth_chembl()
        for defer in ("off", "auto"):
            run("chembl", train, test, 100, defer)


if __name__ == "__main__":
    main()
