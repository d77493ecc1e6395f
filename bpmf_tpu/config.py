"""Runtime configuration.

Collapses the reference's two config tiers into one runtime dataclass:

* compile-time CMake knobs (CMakeLists.txt:18-52): ``BPMF_NUMLATENT`` ->
  ``num_latent`` (a static-shape runtime parameter), ``BPMF_COMM`` ->
  ``comm_mode`` (two SPMD modes instead of nine backends), ``ENABLE_REDUCE``
  -> ``comm_mode='reduce'``, ``ONLY_VARIANCE``/``BPMF_NO_COVARIANCE`` ->
  ``diagonal_only``, ``ENABLE_PROFILING`` -> ``profile``.
* getopt runtime flags (c++/bpmf.cpp:83-109) with identical defaults:
  nsims=20, burnin=5, update_freq=1 (parsed but unused in the reference,
  kept for CLI parity), alpha=2.0 (c++/bpmf.cpp:78-80, c++/sample.cpp:29).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    # -- model / algorithm (reference: compile-time BPMF_NUMLATENT, CLI -i -b -a)
    num_latent: int = 32
    nsims: int = 20
    burnin: int = 5
    alpha: float = 2.0

    # -- reference CLI parity
    update_freq: int = 1          # -f: parsed+printed, never used (bpmf.cpp:89)
    permute: bool = True          # -k disables item->shard balancing (assign.cpp)
    verbose: bool = False         # -v: dump per-iteration samples
    redirect: bool = False        # -r: stdout to bpmf_<procid>.out
    output_dir: str = ""          # -o: enables posterior aggregation + outputs
    train_file: str = ""          # -n
    test_file: str = ""           # -p
    prop_u: str = ""              # -l "mu.ddm,Lambda.ddm" for users
    prop_v: str = ""              # -m "mu.ddm,Lambda.ddm" for movies

    # -- TPU-native knobs (no reference analog)
    seed: int = 42                # reference Philox key 42 (c++/mvnormal.cpp:23)
    dtype: str = "auto"           # compute dtype: 'auto' picks float64 when
                                  # the problem is too small for f32 (see
                                  # resolve_dtype), float32 otherwise;
                                  # explicit values are honored as-is
    comm_mode: str = "auto"       # 'gather' | 'reduce' | 'auto' (SURVEY §2 backends)
    n_devices: int = 0            # 0 = all available
    diagonal_only: bool = False   # BPMF_NO_COVARIANCE (c++/sample.cpp:300-304)
    profile: bool = False         # ENABLE_PROFILING analog
    solver: str = "auto"          # batched Cholesky+solve backend:
                                  # 'auto'|'xla'|'vpu'|'pallas'|'unrolled'
    chunk: int = 1                # Gibbs iterations per device dispatch
    checkpoint_path: str = ""     # save full sampler state here (.npz)
    checkpoint_freq: int = 0      # also save every N iterations (0 = end only)
    resume: str = ""              # resume from a checkpoint file
    max_bucket_width: int = 2048  # degree cap per bucket row (row-split above)
    bucket_growth: int = 2        # geometric bucket width growth; 2 halves
                                  # padding (gather volume + HBM) vs 4 at
                                  # ~2x the bucket count — the right trade
                                  # in the bucketed (huge-sparse) regime
    gram_impl: str = "auto"       # 'auto' | 'dense' | 'dense8' | 'bucketed'
                                  # (per-side auto)
    matmul_dtype: str = "auto"    # MXU input dtype for the Gram matmuls:
                                  # 'auto' (bf16 on TPU, f32 elsewhere) |
                                  # 'bfloat16' | 'float32'; accumulation is
                                  # always f32 (f64 under dtype=float64)
    dense_limit_bytes: int = 1 << 30  # dense-adjacency budget per side
    dense8_limit_bytes: int = 12 << 30  # int8 code-array budget (ops/dense8):
                                  # ONE [users_pad, movies_pad] int8 array
                                  # shared by both sweeps (9.6 GB at ml-25M
                                  # on a 16 GB-HBM chip)
    strict_reference: bool = True # keep reference quirks (see ops/update.py)
    reduce_chunked: str = "auto"  # reduce-mode stat exchange granularity:
                                  # 'off' = one [padded_num,K,K] buffer +
                                  # psum_scatter (fast, O(global N K^2)/dev),
                                  # 'on' = per-destination-shard psum loop
                                  # (O(N/D K^2)/dev peak, 2x comm), 'auto' =
                                  # 'on' when the full buffer exceeds
                                  # reduce_chunk_limit_bytes per device
    reduce_chunk_limit_bytes: int = 512 << 20
    halo: str = "auto"            # connectivity-aware value exchange in the
                                  # bucketed gather path (opt_conn analog,
                                  # c++/assign.cpp:215-286): 'on' forces the
                                  # ppermute halo exchange, 'auto' uses it
                                  # only when the per-pair halo is at most
                                  # half the shard (volume_ratio <= 0.5 —
                                  # dense-connectivity datasets keep the
                                  # plain all_gather collective)
    ablate: str = ""              # perf-debug: skip sweep phases to isolate
                                  # their cost; comma-separated subset of
                                  # nogather,nogram,nomatmul,nosolve,nopredict
    fuse_dense: str = "auto"      # packed-triangle fused dense sweep
                                  # (spmd.dense_half_sweep_fused): 'auto' =
                                  # on TPU when eligible; 'on' forces it
                                  # (interpret-mode Pallas off-TPU, slow —
                                  # tests only); 'off' disables
    defer_predict: str = "auto"   # chunk-batched test evaluation
                                  # (models/bpmf.predict_deferred): one
                                  # 2(g x nnz_t)-row gather per group of g
                                  # iterations instead of 2g nnz_t-row
                                  # gathers — trajectory-exact.  'auto'
                                  # resolves to OFF: the in-context A/B
                                  # measured deferral slower than the
                                  # in-iteration predict in both regimes
                                  # (scripts/defer_ab.py; sampler._chunk_fn
                                  # has the numbers).  'on' forces it
                                  # (single-device programs only)
    fused_eval_gather: str = "auto"
                                  # predict's two [nnz_t, K] row gathers as
                                  # ONE gather over the stacked user+movie
                                  # table (models/bpmf.predict): the XLA row
                                  # gather is per-op-latency-bound at these
                                  # row counts (scripts/eval_gather_probe.py)
                                  # so one op beats two.  Bit-identical
                                  # predictions.  'auto' = on (measured
                                  # faster on v5e in-context; see
                                  # docs/PERF.md §predict); 'off' restores
                                  # the split gathers
    defer_predict_limit_bytes: int = 512 << 20
                                  # deferral footprint cap for 'auto':
                                  # ~2 n nnz_t K 4B of gather output +
                                  # n (pn_u+pn_m) K 4B of stacked tables —
                                  # at ml-25M scale (6M test entries x a
                                  # 20-iter chunk) unbounded deferral OOMs
                                  # a 16 GB chip, and predict is a trivial
                                  # share of that regime anyway

    def __post_init__(self):
        if self.comm_mode not in ("auto", "gather", "reduce"):
            raise ValueError(f"bad comm_mode {self.comm_mode!r}")
        if self.dtype not in ("auto", "float32", "float64"):
            raise ValueError(f"bad dtype {self.dtype!r}")
        if self.num_latent < 1:
            raise ValueError("num_latent must be >= 1")
        if self.solver not in ("auto", "xla", "unrolled", "vpu", "pallas", "smart"):
            raise ValueError(f"bad solver {self.solver!r}")
        if self.gram_impl not in ("auto", "dense", "dense8", "bucketed"):
            raise ValueError(f"bad gram_impl {self.gram_impl!r}")
        if self.matmul_dtype not in ("auto", "bfloat16", "float32"):
            raise ValueError(f"bad matmul_dtype {self.matmul_dtype!r}")
        if self.defer_predict not in ("auto", "on", "off"):
            raise ValueError(f"bad defer_predict {self.defer_predict!r}")
        if self.fused_eval_gather not in ("auto", "on", "off"):
            raise ValueError(
                f"bad fused_eval_gather {self.fused_eval_gather!r}")
        allowed = {"nogather", "nogram", "nomatmul", "nosolve", "nopredict",
                   "nohyper", "nonoise"}
        if self.ablate and not set(self.ablate.split(",")) <= allowed:
            raise ValueError(f"bad ablate {self.ablate!r}")
        if self.fuse_dense not in ("auto", "on", "off"):
            raise ValueError(f"bad fuse_dense {self.fuse_dense!r}")
        if self.reduce_chunked not in ("auto", "on", "off"):
            raise ValueError(f"bad reduce_chunked {self.reduce_chunked!r}")
        if self.halo not in ("auto", "on", "off"):
            raise ValueError(f"bad halo {self.halo!r}")

    def resolve_dtype(self, min_side: int) -> str:
        """'auto' -> float64 when the SMALLER side has fewer than 2*K items,
        float32 otherwise.

        At N << K the Normal-Wishart scale performs a heavy-tailed random
        walk (df = K + N barely exceeds K) and the per-item precision
        Lambda* = Lambda_hp + alpha*Gram reaches condition numbers past
        f32's ~1e7 Cholesky limit within a few iterations — measured on
        data/tiny (4x2, 6 ratings, K=32): ~50% of seeds go non-finite by
        iteration 9 in f32 on EVERY backend/solver/impl combination, while
        f64 never does (docs/measurements/r5_tiny_inpt_debug.log).  The
        reference is all-double (c++/bpmf.h:56-58) and passes its tiny gate
        (data/tiny/run_test.sh) unconditionally; matching its numeric
        headroom exactly where the statistics are weakest costs nothing at
        production scale (every BASELINE config stays comfortably f32:
        ml-100k min side 943 >= 2*32)."""
        if self.dtype != "auto":
            return self.dtype
        return "float64" if min_side < 2 * self.num_latent else "float32"

    def resolve_solver(self, backend: str) -> str:
        """'smart' picks per batch size (measured on v5e, K=32): pure-XLA
        'vpu' below ~8k items (it fuses into the surrounding sweep; ml-100k
        1.8 vs 5.3 ms/iter), the batch-last Pallas VMEM kernel above
        (chembl-scale [168k]: 17 vs 134 ms/iter).  LAPACK-backed 'xla' wins
        on CPU.  float64 runs never use the Pallas kernel (Mosaic has no
        64-bit types) — 'smart' resolves to 'xla' and an explicit 'pallas'
        is rejected up front instead of failing in lowering."""
        if self.dtype == "float64":
            if self.solver == "pallas":
                raise ValueError("solver='pallas' is float32-only "
                                 "(Mosaic has no 64-bit types)")
            if self.solver in ("auto", "smart"):
                return "xla"
        if self.solver != "auto":
            return self.solver
        return "smart" if backend == "tpu" else "xla"

    def resolve_matmul_dtype(self, backend: str) -> str:
        if self.matmul_dtype != "auto":
            return self.matmul_dtype
        # bf16 inputs double-to-quadruple MXU throughput; the 0/1 indicator
        # matrix is exact in bf16 and the centered-rating/latent operands
        # round at ~0.4% — well inside MCMC tolerance (validated on ml-1m:
        # indistinguishable avg-RMSE trajectories). f64 runs stay exact.
        if self.dtype == "float64":
            return "float32"
        return "bfloat16" if backend == "tpu" else "float32"
