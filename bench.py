#!/usr/bin/env python
"""Benchmark: user+item updates/sec at K=32 on the ml-1m-scale synthetic
dataset (BASELINE config 2's scale; the real ml-1m is not shipped in the
reference repo).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "items/sec", "vs_baseline": N/D}

vs_baseline denominator D = 64 x the measured single-thread reference C++
items/sec on the SAME dataset (BASELINE_MEASURED.json: 2_093_248 items/sec,
a perfect-scaling upper bound for the 64-thread OpenMP reference that the
BASELINE.json north star compares against).

Timing protocol mirrors the reference's own yardstick (items/sec =
(num_users + num_movies) / iteration wall time, c++/bpmf.cpp:193-198):
2 warmup iterations (includes compile), then BENCH_ITERS (default 10) timed
iterations dispatched back-to-back with one device sync at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    from bpmf_tpu.config import Config
    from bpmf_tpu.datasets import synth_movielens
    from bpmf_tpu.sampler import BPMF

    iters = int(os.environ.get("BENCH_ITERS", "50"))
    k = int(os.environ.get("BENCH_K", "32"))

    train, test = synth_movielens()
    cfg = Config(num_latent=k, nsims=2 * iters, burnin=2)
    sampler = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    sampler.setup()

    # warmup twice: first call compiles, second recompiles once for the
    # donated-buffer layouts XLA chose for the outputs; third call on is
    # steady state
    metrics = sampler.run_chunk(iters)
    jax.block_until_ready(metrics)
    metrics = sampler.run_chunk(iters)
    jax.block_until_ready(metrics)

    # best-of-3: TPU session throughput varies run to run on this runtime
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        metrics = sampler.run_chunk(iters)
        jax.block_until_ready(metrics)
        elapsed = min(elapsed, time.perf_counter() - t0)

    num_items = sampler.users.num + sampler.movies.num
    items_per_sec = num_items * iters / elapsed
    ratings_per_sec = sampler.train.nnz * iters / elapsed

    baseline = json.load(
        open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json"))
    )["derived"]["items_per_sec_64thread_upper_bound"]

    rmse = float(jax.device_get(metrics.rmse_avg)[-1])
    result = {
        "metric": f"user+item updates/sec (ml-1m synth, K={k})",
        "value": round(items_per_sec, 1),
        "unit": "items/sec",
        "vs_baseline": round(items_per_sec / baseline, 4),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "ratings_per_sec": round(ratings_per_sec, 1),
                    "iters": iters,
                    "elapsed_sec": round(elapsed, 4),
                    "rmse_avg_check": round(rmse, 4),
                    "backend": jax.default_backend(),
                    "n_devices": sampler.n_devices,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
