"""Pallas fused Cholesky-solve-sample kernel: correctness in interpret
mode on CPU (the real-TPU path is cross-validated in perf runs)."""

import jax.numpy as jnp
import numpy as np

from bpmf_tpu.ops.pallas_solve import chol_solve_sample_pallas_blast
from bpmf_tpu.ops.update import chol_solve_sample


def test_pallas_blast_matches_xla(rng):
    """The batch-last production kernel (TPU default solver), incl. the
    non-multiple-of-512 padding path."""
    b, k = 600, 16
    a = rng.normal(size=(b, k, k))
    a = a @ a.transpose(0, 2, 1) + 4 * np.eye(k)
    a = jnp.asarray(a, jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    want = np.asarray(chol_solve_sample(a, rhs, noise))
    got = np.asarray(chol_solve_sample_pallas_blast(a, rhs, noise, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_pallas_solver_matches_xla(rng):
    b, k = 64, 16
    a = rng.normal(size=(b, k, k))
    a = a @ a.transpose(0, 2, 1) + 4 * np.eye(k)
    a = jnp.asarray(a, jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)

    want = np.asarray(chol_solve_sample(a, rhs, noise))
    got = np.asarray(chol_solve_sample_pallas_blast(a, rhs, noise, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_pallas_solver_nondivisible_block(rng):
    """Batch not divisible by the preferred block falls back cleanly."""
    b, k = 24, 8
    a = rng.normal(size=(b, k, k))
    a = a @ a.transpose(0, 2, 1) + 3 * np.eye(k)
    a = jnp.asarray(a, jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    noise = jnp.zeros((b, k), jnp.float32)
    want = np.asarray(chol_solve_sample(a, rhs, noise))
    got = np.asarray(chol_solve_sample_pallas_blast(a, rhs, noise, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
