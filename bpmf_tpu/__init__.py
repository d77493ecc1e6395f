"""bpmf_tpu — TPU-native Bayesian Probabilistic Matrix Factorization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ExaScience/bpmf C++17 MPI/OpenMP application (Gibbs-sampled BPMF,
Salakhutdinov & Mnih 2008).  The per-item conditional update — gather rated
neighbor vectors, accumulate the K x K Gram precision, Cholesky factorize,
solve, and draw a multivariate normal — runs as one batched XLA/Pallas
program over all items of a side; the nine compile-time communication
backends of the reference collapse into a single SPMD program over a
``jax.sharding.Mesh`` with two exchange modes:

* ``gather``  — value exchange (all_gather of updated item shards), the
  analog of the reference's MPI_BCAST / MPI_ISEND / MPI_PUT / GASPI / ArgoDSM
  backends.
* ``reduce``  — sufficient-statistic exchange (psum of per-item (mu, Lambda)
  partials), the analog of MPI_REDUCE / MPI_ALLREDUCE (``BPMF_REDUCE``).

Reference layout is documented in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from bpmf_tpu.io import read_matrix, write_matrix  # noqa: F401
from bpmf_tpu.config import Config  # noqa: F401


def __getattr__(name):
    # lazy: importing the sampler initializes jax
    if name == "BPMF":
        from bpmf_tpu.sampler import BPMF

        return BPMF
    if name in ("synth_movielens", "synth_chembl"):
        from bpmf_tpu import datasets

        return getattr(datasets, name)
    raise AttributeError(name)
