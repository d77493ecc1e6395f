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

Robustness contract: this script ALWAYS exits rc 0 with the headline line
printed, inside BENCH_BUDGET_S seconds (default 720) — a timeout loses
EVERY number (BENCH_r02 was rc=124).  Two mechanisms:

  1. Budget checks between legs: a leg whose estimated cost exceeds the
     remaining budget is skipped with {"skipped": "budget", ...}.
  2. Every measurement leg runs in a SUBPROCESS with a hard timeout
     derived from the remaining budget (``--leg`` mode below).  The
     tunneled TPU runtime can wedge MID-RUN (observed: hangs with no
     error for hours) — an in-process leg would then hang the whole
     artifact past the driver's window; a killed subprocess instead
     yields {"skipped": "leg_timeout"} and, for the primary leg, a
     marked CPU salvage run.  Subprocess legs share the persistent XLA
     compilation cache (enabled in sampler.setup), so the extra process
     costs only the import, not a recompile.

Each leg reports its setup/compile/measure seconds so any timeout is
diagnosable.  When the full-scale ml-25M leg does not fit the budget, a
half-scale variant that exercises the SAME dense8 code path is tried.

Timing protocol mirrors the reference's own yardstick (items/sec =
(num_users + num_movies) / iteration wall time, c++/bpmf.cpp:193-198):
one warmup chunk (compile; a persistent-cache hit makes it cheap), then
best-of-N chunks of BENCH_ITERS iterations each, one device sync per
chunk.  The donated-buffer layout recompile lands in the first timed
chunk and is discarded by the best-of-N.
"""

import json
import os
import subprocess
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
        "backend": jax.default_backend(),
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


def tpu_reachable_retry(probe_timeout_s: float = 120.0) -> str:
    """Probe TPU reachability with RETRIES across the budget window.

    The axon relay wedges transiently (observed in rounds 2-3: an outage
    that clears after minutes-to-hours).  A single probe at t=0 forfeits
    the whole round to a wedge that would have cleared mid-budget, so we
    re-probe until half the budget is spent; only then fall back to CPU.
    Each probe is itself subprocess-bounded (see ``tpu_reachable``)."""
    while True:
        status = tpu_reachable(timeout_s=probe_timeout_s)
        if status != "tpu_unreachable":
            return status
        used = time.time() - T0
        if used > BUDGET_S / 2:
            return "tpu_unreachable"
        emit_detail(
            "tpu_probe_retry",
            {"used_s": round(used, 1), "retry_until_s": round(BUDGET_S / 2, 1)},
        )
        time.sleep(min(30.0, max(0.0, BUDGET_S / 2 - used)))


def run_leg(leg: str, timeout_s: float, cpu: bool, env_overrides=None) -> dict:
    """Run one measurement leg in a subprocess with a hard timeout.

    Returns the leg's detail dict, or {"skipped": "leg_timeout"/"leg_error",
    ...} — never raises, never hangs past ``timeout_s``."""
    env = dict(os.environ)
    env["BENCH_PLATFORM"] = "cpu" if cpu else "tpu"
    env.update(env_overrides or {})
    timeout_s = max(timeout_s, 1.0)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            timeout=timeout_s,
            capture_output=True,
            text=True,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return {
            "skipped": "leg_timeout",
            "leg": leg,
            "timeout_s": round(timeout_s, 1),
        }
    # stderr carries jax warnings; the result is the last stdout line
    # that parses as a JSON object
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
            if isinstance(d, dict):
                d["wall_s"] = round(time.time() - t0, 1)
                return d
        except ValueError:
            continue
    return {
        "skipped": "leg_error",
        "leg": leg,
        "rc": proc.returncode,
        "stderr_tail": proc.stderr[-800:],
    }


def leg_main(leg: str) -> None:
    """Subprocess entry: run ONE leg, print its detail dict as the final
    stdout line.  BENCH_PLATFORM=cpu forces the CPU backend in-process
    (the env var alone is not enough — a sitecustomize may re-pin
    JAX_PLATFORMS at interpreter startup)."""
    cpu = os.environ.get("BENCH_PLATFORM") == "cpu"
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bpmf_tpu.datasets import synth_chembl, synth_movielens

    # CPU runs cap the chunk length: 500 iters of the ml-1m leg is hours
    # on one core
    iters = int(os.environ.get("BENCH_ITERS", "20" if cpu else "500"))
    k = int(os.environ.get("BENCH_K", "32"))

    if leg == "ml1m":
        train, test = synth_movielens()
        r = measure(train, test, k, iters)
    elif leg == "chembl":
        train, test = synth_chembl()
        r = measure(train, test, k, min(iters, 100))
    elif leg in ("ml25m_full", "ml25m_half"):
        r = ml25m_leg(synth_movielens, min(iters, 20), leg.split("_")[1])
    else:
        raise SystemExit(f"unknown leg {leg!r}")
    print(json.dumps(r), flush=True)


def main() -> None:
    platform = tpu_reachable_retry()
    tpu_dead = platform != "tpu"
    if platform == "tpu_unreachable":
        emit_detail("tpu_unreachable", {"fallback": "cpu"})

    # ---- primary leg (the headline number) ----
    # On TPU, leave room after the leg's own timeout for a marked CPU
    # salvage run: the tunnel can wedge MID-LEG (after a successful probe).
    r = run_leg(
        "ml1m",
        timeout_s=min(remaining() - (60 if tpu_dead else 240), 480),
        cpu=tpu_dead,
    )
    if "items_per_sec" not in r and not tpu_dead:
        emit_detail("tpu_wedged_midrun", {"first_attempt": r})
        platform = "tpu_wedged_midrun"
        tpu_dead = True
        # salvage leg: FORCE a short chunk — an inherited BENCH_ITERS (e.g.
        # 200 from the measurement queue) takes hours on one CPU core and
        # would turn the salvage into a second timeout
        r = run_leg("ml1m", timeout_s=remaining() - 30, cpu=True,
                    env_overrides={"BENCH_ITERS": "10"})

    k = int(os.environ.get("BENCH_K", "32"))
    baseline = json.load(
        open(os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json"))
    )["derived"]["items_per_sec_64thread_upper_bound"]

    # the primary line prints BEFORE the secondary legs: a budget overrun
    # later must never cost the headline number
    value = r.get("items_per_sec", 0.0)
    headline = {
        "metric": f"user+item updates/sec (ml-1m synth, K={k})",
        "value": value,
        "unit": "items/sec",
        "vs_baseline": round(value / baseline, 4),
    }
    if platform not in ("tpu", "cpu_requested"):
        # a CPU salvage number must be self-explaining IN the headline —
        # the stderr details may not reach the reader
        headline["platform"] = f"cpu ({platform})"
    print(json.dumps(headline), flush=True)
    if platform not in ("tpu", "cpu_requested"):
        r[platform] = True
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
        d = run_leg("chembl", timeout_s=min(remaining() - 60, 420), cpu=False)
        emit_detail("detail_chembl_synth", d)
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
    # A measured half-scale line beats a timed-out full-scale marker, so
    # the full leg needs a comfortable margin (raise BENCH_BUDGET_S to get
    # it — scripts/tpu_measure_queue.sh does).
    rem = remaining()
    if rem > 600:
        d = run_leg("ml25m_full", timeout_s=rem - 60, cpu=False)
        emit_detail("detail_ml25m_synth", d)
    elif rem > 210:
        d = run_leg("ml25m_half", timeout_s=rem - 30, cpu=False)
        emit_detail("detail_ml25m_synth", d)
    else:
        emit_detail(
            "detail_ml25m_synth",
            {"skipped": "budget", "remaining_s": round(rem, 1)},
        )
    emit_budget()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        leg_main(sys.argv[2])
    else:
        main()
