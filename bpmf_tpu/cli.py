"""Command-line interface with the reference's flags (c++/bpmf.cpp:41-109).

Usage: bpmf -n <MTX> -p <MTX> [-o DIR/] [-i N] [-b N] [-f N] [-krv] [-t N]
            [-m MTX,MTX] [-l MTX,MTX] [-a F] [-d K]

plus TPU-native extras (--mode, --dtype, --seed, --devices, --chunk,
--solver, --gram-impl, --reduce-chunked, --halo, --checkpoint, --resume,
--ablate, --dist, --platform, --profile).
Unlike the reference, K (-d) is a runtime parameter, not a compile-time
constant (CMakeLists.txt:25 BPMF_NUMLATENT).
"""

from __future__ import annotations

import argparse
import sys

from bpmf_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bpmf",
        description="TPU-native Bayesian Probabilistic Matrix Factorization",
    )
    # reference flags (c++/bpmf.cpp:83-109)
    p.add_argument("-n", dest="train", metavar="MTX", help="training input data")
    p.add_argument("-p", dest="test", metavar="MTX", help="test input data")
    p.add_argument("-o", dest="output", metavar="DIR", default="",
                   help="output directory for model and predictions")
    p.add_argument("-i", dest="nsims", type=int, default=20,
                   help="number of total iterations (default 20)")
    p.add_argument("-b", dest="burnin", type=int, default=5,
                   help="number of burnin iterations (default 5)")
    p.add_argument("-f", dest="update_freq", type=int, default=1,
                   help="send frequency (parity flag; unused, like the reference)")
    p.add_argument("-a", dest="alpha", type=float, default=2.0,
                   help="noise precision alpha (default 2.0)")
    p.add_argument("-d", dest="num_latent", type=int, default=32,
                   help="number of latent dimensions K (default 32)")
    p.add_argument("-k", dest="no_permute", action="store_true",
                   help="do not optimize item-to-shard assignment")
    p.add_argument("-r", dest="redirect", action="store_true",
                   help="redirect stdout to bpmf_0.out")
    p.add_argument("-v", dest="verbose", action="store_true",
                   help="output all samples")
    p.add_argument("-t", dest="nthreads", type=int, default=-1,
                   help="thread count (parity flag; XLA owns intra-chip parallelism)")
    p.add_argument("-m", dest="prop_v", metavar="MTX,MTX", default="",
                   help="propagated posterior mu,Lambda for V (movies)")
    p.add_argument("-l", dest="prop_u", metavar="MTX,MTX", default="",
                   help="propagated posterior mu,Lambda for U (users)")
    # TPU-native extras
    p.add_argument("--mode", choices=["auto", "gather", "reduce"], default="auto",
                   help="SPMD exchange mode (multi-device)")
    p.add_argument("--dtype", choices=["auto", "float32", "float64"], default="auto")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--devices", type=int, default=0,
                   help="number of devices (0 = all available)")
    p.add_argument("--profile", action="store_true",
                   help="per-phase counters (ENABLE_PROFILING analog)")
    p.add_argument("--diagonal-only", action="store_true",
                   help="diagonal precision only (ONLY_VARIANCE analog)")
    p.add_argument("--chunk", type=int, default=8, metavar="N",
                   help="iterations per device dispatch (lax.scan); per-"
                        "iteration log lines are preserved (metrics come "
                        "back stacked).  Default 8 amortizes the host "
                        "dispatch latency that dominates small problems; "
                        "-v forces 1 (per-iteration model dumps need the "
                        "state each step)")
    p.add_argument("--solver", default="auto",
                   choices=["auto", "xla", "vpu", "pallas", "smart", "unrolled"],
                   help="batched Cholesky+solve backend (auto: vpu on TPU)")
    p.add_argument("--gram-impl", default="auto",
                   choices=["auto", "dense", "dense8", "bucketed"],
                   help="Gram accumulation layout (auto picks per side: "
                        "bf16 dense adjacency while it fits, int8 "
                        "dense-stream for huge grid-quantizable ratings, "
                        "degree-bucketed CSR otherwise)")
    p.add_argument("--reduce-chunked", default="auto",
                   choices=["auto", "on", "off"],
                   help="reduce-mode stat exchange granularity: 'on' = "
                        "per-destination-shard loop with O(N/D K^2) peak "
                        "memory per device")
    p.add_argument("--halo", default="auto", choices=["auto", "on", "off"],
                   help="connectivity-aware frozen-side exchange in the "
                        "bucketed gather path (opt_conn analog): exchange "
                        "only the rows each device's ratings reference "
                        "instead of all_gather-ing the whole side; 'auto' "
                        "uses it only when it at least halves the volume")
    p.add_argument("--checkpoint", default="", metavar="FILE",
                   help="save full sampler state to FILE (.npz); with "
                        "--checkpoint-freq N also every N iterations "
                        "(mid-run resume — the reference has no analog)")
    p.add_argument("--checkpoint-freq", type=int, default=0, metavar="N")
    p.add_argument("--resume", default="", metavar="FILE",
                   help="resume a run from a checkpoint file")
    p.add_argument("--ablate", default="",
                   choices=["", "nogather", "nogram", "nomatmul", "nosolve",
                            "nopredict", "nohyper", "nonoise"],
                   help="perf-debug: skip a sweep phase to isolate its cost")
    p.add_argument("--dist", default="", metavar="HOST:PORT,NPROC,PID",
                   help="join a multi-host run: coordinator address, total "
                        "process count, this process's id (the mpirun-rank "
                        "analog, c++/mpi_common.h:9-17); also settable via "
                        "BPMF_DIST")
    p.add_argument("--platform", default="", metavar="NAME",
                   help="force the jax platform (e.g. cpu); also settable "
                        "via BPMF_PLATFORM")
    return p


def config_from_args(args) -> Config:
    return Config(
        num_latent=args.num_latent,
        nsims=args.nsims,
        burnin=args.burnin,
        alpha=args.alpha,
        update_freq=args.update_freq,
        permute=not args.no_permute,
        verbose=args.verbose,
        redirect=args.redirect,
        output_dir=args.output,
        train_file=args.train or "",
        test_file=args.test or "",
        prop_u=args.prop_u,
        prop_v=args.prop_v,
        seed=args.seed,
        dtype=args.dtype,
        comm_mode=args.mode,
        n_devices=args.devices,
        diagonal_only=args.diagonal_only,
        profile=args.profile,
        chunk=args.chunk,
        solver=args.solver,
        gram_impl=args.gram_impl,
        reduce_chunked=args.reduce_chunked,
        halo=args.halo,
        checkpoint_path=args.checkpoint,
        checkpoint_freq=args.checkpoint_freq,
        resume=args.resume,
        ablate=args.ablate,
    )


def _device_probe(timeout_s: float) -> bool:
    """Bounded device-acquisition canary (the bench.tpu_reachable posture
    applied to the user-facing binary).

    The tunneled TPU runtime retries its connection FOREVER when the relay
    is wedged — the first in-process backend touch then hangs silently for
    hours.  The reference fails loudly on runtime-init problems
    (c++/mpi_common.h:16 MPI_ERRORS_ARE_FATAL); so do we: probe
    ``jax.devices()`` in a subprocess with a hard timeout and report an
    actionable error instead of hanging."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.train or not args.test:
        parser.print_help()
        return 1
    cfg = config_from_args(args)

    # multi-host init must precede the first jax backend use
    import os

    if args.dist:
        os.environ["BPMF_DIST"] = args.dist
    if args.platform:
        os.environ["BPMF_PLATFORM"] = args.platform

    # Wedge guard: when the run may touch a (possibly tunneled) accelerator
    # runtime, bound the acquisition.  An explicit CPU platform needs no
    # probe; BPMF_PROBE_TIMEOUT_S=0 disables it.
    requested = (args.platform or os.environ.get("BPMF_PLATFORM", "")
                 or os.environ.get("JAX_PLATFORMS", ""))
    probe_timeout = float(os.environ.get("BPMF_PROBE_TIMEOUT_S", "120"))
    if requested != "cpu" and probe_timeout > 0:
        if not _device_probe(probe_timeout):
            print(
                "bpmf: error: accelerator runtime unreachable (device "
                f"acquisition exceeded {probe_timeout:.0f}s — a wedged "
                "TPU tunnel hangs forever).  Pass --platform cpu to run "
                "on CPU, fix the tunnel, or raise BPMF_PROBE_TIMEOUT_S.",
                file=sys.stderr,
            )
            return 2
    from bpmf_tpu.parallel.mesh import initialize_from_env

    initialize_from_env()
    import jax

    rank = jax.process_index()

    out = sys.stdout
    if cfg.redirect:
        # per-rank log file (c++/bpmf.cpp:111-117)
        out = open(f"bpmf_{rank}.out", "w")
    elif rank != 0:
        # one SPMD program: every process computes the same metrics;
        # only rank 0 speaks (matching the reference's "0:" log prefix)
        out = open(os.devnull, "w")

    from bpmf_tpu.sampler import BPMF  # deferred: jax import is slow

    try:
        sampler = BPMF(cfg, out=out)
        sampler.run()
    except FileNotFoundError as e:
        print(f"bpmf: error: file not found: {e}", file=sys.stderr)
        return 1
    except (ValueError, AssertionError) as e:
        print(f"bpmf: error: {e}", file=sys.stderr)
        return 1
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
