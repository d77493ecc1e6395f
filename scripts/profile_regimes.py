#!/usr/bin/env python
"""Phase attribution on the real chip for the two regimes with open perf
questions (round-4 targets): ml-1m (predict share; target <= 0.9 ms/iter)
and chembl-synth (solver anomaly; target <= 11 ms/iter).

Uses BPMF.profile_phases — ablation differencing against the real compiled
program (the honest in-context number; standalone microbenches mis-measure
because XLA picks different fusions out of context).

Usage: python scripts/profile_regimes.py [ml1m|chembl] ...
       (default: both)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(name: str, train, test, iters: int) -> None:
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=int(os.environ.get("BENCH_K", "32")),
                 nsims=10_000, burnin=2)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    t0 = time.perf_counter()
    s.setup()
    print(f"== {name}: setup {time.perf_counter() - t0:.1f}s, "
          f"impls u={s.users.impl} m={s.movies.impl}", flush=True)
    print(s.profile_phases(iters=iters), flush=True)


def main() -> None:
    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    want = set(sys.argv[1:]) or {"ml1m", "chembl"}
    if "ml1m" in want:
        train, test = synth_movielens()
        profile("ml-1m synth", train, test, iters=200)
    if "chembl" in want:
        train, test = synth_chembl()
        profile("chembl synth", train, test, iters=50)


if __name__ == "__main__":
    main()
