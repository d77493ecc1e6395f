#!/usr/bin/env python
"""Benchmark: user+item updates/sec at K=32 on the ml-1m-scale synthetic
dataset (BASELINE config 2's scale; the real ml-1m is not shipped in the
reference repo).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "items/sec", "vs_baseline": N/D}

vs_baseline denominator D = 64 x the measured single-thread reference C++
items/sec on the SAME dataset (BASELINE_MEASURED.json: 2_093_248 items/sec,
a perfect-scaling upper bound for the 64-thread OpenMP reference that the
BASELINE.json north star compares against).

Secondary configs (BASELINE configs 3 and 5's regimes — chembl-synth and
ml-25M-synth) are measured too and emitted as JSON detail lines on stderr,
so they are tracked per round.  Set BENCH_FAST=1 to skip them.

Timing protocol mirrors the reference's own yardstick (items/sec =
(num_users + num_movies) / iteration wall time, c++/bpmf.cpp:193-198):
two warmup chunks (compile + donated-layout recompile), then best-of-3
chunks of BENCH_ITERS iterations each, one device sync per chunk.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure(train, test, k, iters, repeats=3):
    import jax

    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=k, nsims=(repeats + 2) * iters, burnin=2)
    sampler = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    sampler.setup()

    import numpy as np

    def fetch(mets):
        # VALUE fetch: block_until_ready can return before remote
        # execution finishes on tunneled runtimes; reading a value that
        # depends on the whole sweep cannot
        return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])

    # warmup twice: first call compiles, second recompiles once for the
    # donated-buffer layouts XLA chose for the outputs
    fetch(sampler.run_chunk(iters))
    fetch(sampler.run_chunk(iters))

    elapsed = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        metrics = sampler.run_chunk(iters)
        fetch(metrics)
        elapsed = min(elapsed, time.perf_counter() - t0)

    num_items = sampler.users.num + sampler.movies.num
    rmse = float(jax.device_get(metrics.rmse_avg)[-1])
    return {
        "items_per_sec": round(num_items * iters / elapsed, 1),
        "ratings_per_sec": round(sampler.train.nnz * iters / elapsed, 1),
        "ms_per_iter": round(elapsed / iters * 1e3, 4),
        "iters": iters,
        "rmse_avg_check": round(rmse, 4),
        "n_devices": sampler.n_devices,
    }


def main() -> None:
    import jax

    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    iters = int(os.environ.get("BENCH_ITERS", "500"))
    k = int(os.environ.get("BENCH_K", "32"))

    train, test = synth_movielens()
    r = measure(train, test, k, iters)

    baseline = json.load(
        open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json"))
    )["derived"]["items_per_sec_64thread_upper_bound"]

    print(
        json.dumps(
            {
                "metric": f"user+item updates/sec (ml-1m synth, K={k})",
                "value": r["items_per_sec"],
                "unit": "items/sec",
                "vs_baseline": round(r["items_per_sec"] / baseline, 4),
            }
        )
    )
    r["backend"] = jax.default_backend()
    print(json.dumps({"detail_ml1m": r}), file=sys.stderr)

    if os.environ.get("BENCH_FAST", ""):
        return

    # BASELINE config 3's regime: tall-skinny, extreme degree skew
    train, test = synth_chembl()
    r = measure(train, test, k, min(iters, 100))
    print(json.dumps({"detail_chembl_synth": r}), file=sys.stderr)

    # BASELINE config 5's regime: huge sparse (dense8 path).  The 25M-nnz
    # synthetic takes ~2 min to generate; cache it on disk (deterministic
    # seed, so the cache is just a time saver).
    import pickle

    cache = "/tmp/bpmf_bench_ml25m.pkl"
    try:
        with open(cache, "rb") as f:
            train, test = pickle.load(f)
    except Exception:
        train, test = synth_movielens(
            n_users=162_541, n_movies=59_047, n_ratings=25_000_000, seed=25
        )
        try:
            with open(cache, "wb") as f:
                pickle.dump((train, test), f)
        except OSError:
            pass
    r = measure(train, test, k, 20, repeats=2)
    print(json.dumps({"detail_ml25m_synth": r}), file=sys.stderr)


if __name__ == "__main__":
    main()
