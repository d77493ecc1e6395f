"""Test harness: run on a virtual 8-device CPU mesh.

The analog of the reference CI's oversubscribed ``mpirun -np 4`` on one
machine (CMakeLists.txt:143,158; SURVEY.md §4): multi-chip SPMD code is
exercised with ``--xla_force_host_platform_device_count=8`` on CPU.
Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Force CPU even when the ambient environment points at a TPU: the axon
# sitecustomize pins JAX_PLATFORMS=axon before we run, so the env var alone
# is not enough — set the config knob right after import.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the TEST programs: most suite wall time
# is XLA recompiling near-identical sweep programs on every run.  The cache
# lives in the user cache dir (machine-local — CPU AOT entries are
# host-feature-specific and must never travel between machines, which is
# why sampler.py enables the shared cache only on TPU).
_cache = os.path.expanduser("~/.cache/bpmf_tpu_xla_cpu_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_ratings(n_users=40, n_movies=25, density=0.3, k_true=3, seed=0):
    """Synthetic low-rank ratings split into train/test (no reference data
    needed)."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n_users, k_true))
    v = rng.normal(size=(n_movies, k_true))
    full = u @ v.T + 3.0 + 0.1 * rng.normal(size=(n_users, n_movies))
    mask = rng.random((n_users, n_movies)) < density
    rows, cols = np.nonzero(mask)
    vals = full[rows, cols]
    n = len(vals)
    perm = rng.permutation(n)
    n_test = max(n // 5, 1)
    te, tr = perm[:n_test], perm[n_test:]
    train = sp.csc_matrix((vals[tr], (rows[tr], cols[tr])), shape=(n_users, n_movies))
    test = sp.csc_matrix((vals[te], (rows[te], cols[te])), shape=(n_users, n_movies))
    return train, test


TINY_TRAIN = [  # data/tiny/train.mtx: 4x2, 6 nnz
    (0, 0, 2.0), (1, 0, 3.0), (2, 0, 7.0), (3, 0, 4.0), (0, 1, 5.0), (2, 1, 1.0),
]
TINY_TEST = [  # data/tiny/test.mtx: 4x2, 2 nnz
    (1, 1, 5.0), (3, 1, 1.0),
]


def tiny_matrices():
    def build(entries):
        r, c, v = zip(*entries)
        return sp.csc_matrix((v, (r, c)), shape=(4, 2))

    return build(TINY_TRAIN), build(TINY_TEST)
