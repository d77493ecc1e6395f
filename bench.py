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

Wall-clock budget: the whole run fits inside BENCH_BUDGET_S seconds
(default 720) — the driver's window is finite and a timeout loses EVERY
number (BENCH_r02 was rc=124).  The primary line prints immediately after
the ml-1m leg; before each secondary leg the remaining budget is checked
against that leg's estimated cost and the leg is skipped with
{"skipped": "budget", ...} instead of overrunning.  When the full-scale
ml-25M leg does not fit, a half-scale variant that exercises the SAME
dense8 code path is tried first.  Every leg reports its setup/compile/
measure seconds so the next timeout is diagnosable.

Timing protocol mirrors the reference's own yardstick (items/sec =
(num_users + num_movies) / iteration wall time, c++/bpmf.cpp:193-198):
one warmup chunk (compile; a persistent-cache hit makes it cheap), then
best-of-N chunks of BENCH_ITERS iterations each, one device sync per
chunk.  The donated-buffer layout recompile lands in the first timed
chunk and is discarded by the best-of-N.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "720"))


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def emit_detail(name: str, payload: dict) -> None:
    print(json.dumps({name: payload}), file=sys.stderr, flush=True)


def emit_budget() -> None:
    emit_detail(
        "bench_budget",
        {"budget_s": BUDGET_S, "used_s": round(time.time() - T0, 1)},
    )


def measure(train, test, k, iters, repeats=3):
    import jax

    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    t_leg0 = time.perf_counter()
    cfg = Config(num_latent=k, nsims=(repeats + 2) * iters, burnin=2)
    sampler = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    sampler.setup()
    setup_s = time.perf_counter() - t_leg0

    import numpy as np

    def fetch(mets):
        # VALUE fetch: block_until_ready can return before remote
        # execution finishes on tunneled runtimes; reading a value that
        # depends on the whole sweep cannot
        return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])

    # one warmup chunk: compiles the scan program (cheap on a persistent-
    # cache hit).  XLA recompiles once more for the donated-buffer layouts
    # it chose — that lands in the first TIMED chunk below and is dropped
    # by the best-of-N.
    t0 = time.perf_counter()
    fetch(sampler.run_chunk(iters))
    compile_s = time.perf_counter() - t0

    elapsed = float("inf")
    t0 = time.perf_counter()
    for _ in range(repeats):
        t1 = time.perf_counter()
        metrics = sampler.run_chunk(iters)
        fetch(metrics)
        elapsed = min(elapsed, time.perf_counter() - t1)
    measure_s = time.perf_counter() - t0

    num_items = sampler.users.num + sampler.movies.num
    rmse = float(jax.device_get(metrics.rmse_avg)[-1])
    return {
        "items_per_sec": round(num_items * iters / elapsed, 1),
        "ratings_per_sec": round(sampler.train.nnz * iters / elapsed, 1),
        "ms_per_iter": round(elapsed / iters * 1e3, 4),
        "iters": iters,
        "rmse_avg_check": round(rmse, 4),
        "n_devices": sampler.n_devices,
        "setup_s": round(setup_s, 1),
        "compile_s": round(compile_s, 1),
        "measure_s": round(measure_s, 1),
        "leg_s": round(time.perf_counter() - t_leg0, 1),
    }


def ml25m_leg(synth_movielens, iters: int, scale: str):
    """Build + measure the huge-sparse dense8 regime.  ``scale`` is 'full'
    (162k x 59k, 25M nnz — BASELINE config 5's shape) or 'half' (same code
    path at 1/4 the code-array bytes, for tight budgets)."""
    import pickle

    t0 = time.perf_counter()
    if scale == "full":
        dims = dict(n_users=162_541, n_movies=59_047, n_ratings=25_000_000)
        cache = "/tmp/bpmf_bench_ml25m.pkl"
    else:
        dims = dict(n_users=81_270, n_movies=29_523, n_ratings=6_250_000)
        cache = "/tmp/bpmf_bench_ml25m_half.pkl"
    try:
        with open(cache, "rb") as f:
            train, test = pickle.load(f)
    except Exception:
        train, test = synth_movielens(seed=25, **dims)
        try:
            with open(cache, "wb") as f:
                pickle.dump((train, test), f)
        except OSError:
            pass
    gen_s = time.perf_counter() - t0
    r = measure(train, test, int(os.environ.get("BENCH_K", "32")), iters,
                repeats=2)
    r["scale"] = scale
    r["datagen_s"] = round(gen_s, 1)
    return r


def tpu_reachable(timeout_s: float = 150.0) -> str:
    """Probe device acquisition in a SUBPROCESS with a hard timeout.

    The tunneled TPU backend retries its connection forever when the
    relay is wedged — an in-process ``import jax; jax.devices()`` then
    hangs with no output and the whole bench artifact is lost (a silent
    rc=124).  A subprocess probe bounds that risk; on failure the bench
    falls back to CPU with an explicit ``tpu_unreachable`` marker so the
    artifact is diagnosable instead of absent.

    Returns 'tpu', 'cpu_requested' (JAX_PLATFORMS=cpu in the env — an
    intentional CPU run, not a failure), or 'tpu_unreachable'."""
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return "cpu_requested"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return "tpu" if proc.returncode == 0 else "tpu_unreachable"
    except subprocess.TimeoutExpired:
        return "tpu_unreachable"


def main() -> None:
    platform = tpu_reachable()
    tpu_dead = platform != "tpu"
    if tpu_dead:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if tpu_dead:
        jax.config.update("jax_platforms", "cpu")
        if platform == "tpu_unreachable":
            emit_detail("tpu_unreachable", {"fallback": "cpu"})

    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    # CPU runs (requested or fallback) cap the chunk length: 500 iters of
    # the ml-1m leg is hours on one core
    iters = int(os.environ.get("BENCH_ITERS", "500" if not tpu_dead else "20"))
    k = int(os.environ.get("BENCH_K", "32"))

    train, test = synth_movielens()
    r = measure(train, test, k, iters)

    baseline = json.load(
        open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json"))
    )["derived"]["items_per_sec_64thread_upper_bound"]

    # the primary line prints BEFORE the secondary legs: a budget overrun
    # later must never cost the headline number
    print(
        json.dumps(
            {
                "metric": f"user+item updates/sec (ml-1m synth, K={k})",
                "value": r["items_per_sec"],
                "unit": "items/sec",
                "vs_baseline": round(r["items_per_sec"] / baseline, 4),
            }
        ),
        flush=True,
    )
    r["backend"] = jax.default_backend()
    if platform == "tpu_unreachable":
        r["tpu_unreachable"] = True
    emit_detail("detail_ml1m", r)

    if os.environ.get("BENCH_FAST", "") or tpu_dead:
        reason = "BENCH_FAST" if os.environ.get("BENCH_FAST", "") else platform
        for leg in ("detail_chembl_synth", "detail_ml25m_synth"):
            emit_detail(leg, {"skipped": reason})
        emit_budget()
        return

    # BASELINE config 3's regime: tall-skinny, extreme degree skew.
    # Leg cost: dataset gen + setup + one compile + 3x100-iter chunks —
    # ~180 s uncached on the tunneled TPU.
    if remaining() > 180:
        train, test = synth_chembl()
        r = measure(train, test, k, min(iters, 100))
        emit_detail("detail_chembl_synth", r)
    else:
        emit_detail(
            "detail_chembl_synth",
            {"skipped": "budget", "remaining_s": round(remaining(), 1)},
        )

    # BASELINE config 5's regime: huge sparse (dense8 path).  The full
    # 25M-nnz leg costs ~2 min of synth gen (disk-cached), ~1 min of code-
    # array build + 9.6 GB upload, plus compile — the dominant costs are
    # fixed, so it only runs when most of the budget remains; a half-scale
    # leg exercising the same dense8 kernels is the fallback.
    rem = remaining()
    if rem > 420:
        r = ml25m_leg(synth_movielens, 20, "full")
        emit_detail("detail_ml25m_synth", r)
    elif rem > 210:
        r = ml25m_leg(synth_movielens, 20, "half")
        emit_detail("detail_ml25m_synth", r)
    else:
        emit_detail(
            "detail_ml25m_synth",
            {"skipped": "budget", "remaining_s": round(rem, 1)},
        )
    emit_budget()


if __name__ == "__main__":
    main()
