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
    dtype: str = "float32"        # compute dtype; float64 for CPU-parity runs
    comm_mode: str = "auto"       # 'gather' | 'reduce' | 'auto' (SURVEY §2 backends)
    n_devices: int = 0            # 0 = all available
    diagonal_only: bool = False   # BPMF_NO_COVARIANCE (c++/sample.cpp:300-304)
    profile: bool = False         # ENABLE_PROFILING analog
    use_pallas: str = "auto"      # 'auto' | 'always' | 'never' for the hot kernel
    solver: str = "auto"          # batched Cholesky+solve: 'auto'|'xla'|'unrolled'
    chunk: int = 1                # Gibbs iterations per device dispatch
    checkpoint_path: str = ""     # save full sampler state here (.npz)
    checkpoint_freq: int = 0      # also save every N iterations (0 = end only)
    resume: str = ""              # resume from a checkpoint file
    max_bucket_width: int = 2048  # degree cap per bucket row (row-split above)
    strict_reference: bool = True # keep reference quirks (see ops/update.py)

    def __post_init__(self):
        if self.comm_mode not in ("auto", "gather", "reduce"):
            raise ValueError(f"bad comm_mode {self.comm_mode!r}")
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"bad dtype {self.dtype!r}")
        if self.num_latent < 1:
            raise ValueError("num_latent must be >= 1")
        if self.solver not in ("auto", "xla", "unrolled"):
            raise ValueError(f"bad solver {self.solver!r}")

    def resolve_solver(self, backend: str) -> str:
        """Measured on both backends: XLA's batched Cholesky path wins on
        CPU (LAPACK) AND on the current TPU runtime (ml-100k K=32 sweep:
        328 ms/iter xla vs 984 ms/iter unrolled, plus ~4x the compile
        time).  'unrolled' (ops/cholsolve.py) remains available for
        experimentation."""
        if self.solver != "auto":
            return self.solver
        return "xla"
