"""Moment tests for the Normal-Wishart stack (c++/mvnormal.cpp parity is
statistical, not bitwise — SURVEY.md §7 risk 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from bpmf_tpu.ops.mvnormal import (
    cond_normal_wishart,
    sample_hyper,
    wishart_chol,
    wishart_unit_chol,
)


def test_wishart_unit_chol_structure():
    key = jax.random.PRNGKey(0)
    a = wishart_unit_chol(key, df=10.0, k=6, dtype=jnp.float32)
    a = np.asarray(a)
    assert np.allclose(np.tril(a, -1), 0)  # upper triangular
    assert (np.diag(a) > 0).all()


def test_wishart_mean():
    """E[U'U] = df * sigma for U ~ wishart_chol(sigma, df)."""
    k = 4
    df = 12.0
    rng = np.random.default_rng(3)
    b = rng.normal(size=(k, k))
    sigma = b @ b.T + k * np.eye(k)
    sigma_j = jnp.asarray(sigma, jnp.float32)

    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    us = jax.vmap(lambda kk: wishart_chol(kk, sigma_j, df))(keys)
    ws = np.einsum("nij,nik->njk", np.asarray(us), np.asarray(us))
    mean = ws.mean(0)
    np.testing.assert_allclose(mean, df * sigma, rtol=0.15)


def test_cond_normal_wishart_concentrates():
    """With many observations the NW posterior concentrates on the sample
    mean, and Lambda ~ inverse of the sample covariance."""
    k = 3
    n = 100000
    um = jnp.asarray([1.0, -2.0, 0.5])
    s = jnp.asarray(np.diag([0.5, 1.0, 2.0]), jnp.float32)  # sample cov
    mu0 = jnp.zeros(3)
    eye = jnp.eye(3)

    keys = jax.random.split(jax.random.PRNGKey(2), 300)
    mus, lam_us = jax.vmap(
        lambda kk: cond_normal_wishart(kk, n, s, um, mu0, 2.0, eye, float(k))
    )(keys)
    mu_mean = np.asarray(mus).mean(0)
    np.testing.assert_allclose(mu_mean, np.asarray(um), atol=0.02)

    lam = np.einsum("nij,nik->njk", np.asarray(lam_us), np.asarray(lam_us)).mean(0)
    np.testing.assert_allclose(lam, np.linalg.inv(np.asarray(s)), rtol=0.05, atol=0.02)


def test_sample_hyper_shapes_and_consistency():
    k = 8
    key = jax.random.PRNGKey(4)
    item_sum = jnp.ones((k,)) * 10.0
    item_cov = jnp.eye(k) * 0.5
    hp = sample_hyper(key, 20, item_sum, item_cov)
    assert hp.mu.shape == (k,)
    lf = np.asarray(hp.lambda_f)
    ll = np.asarray(hp.lambda_l)
    np.testing.assert_allclose(ll @ ll.T, lf, rtol=1e-4, atol=1e-4)
    # precision must be symmetric PD
    assert np.allclose(lf, lf.T, atol=1e-5)
    assert (np.linalg.eigvalsh(lf) > 0).all()


def test_deterministic():
    """Same key -> identical draw (the schedule-independence property the
    reference gets from rng_set_pos, c++/sample.cpp:266)."""
    k = 5
    key = jax.random.PRNGKey(7)
    a = sample_hyper(key, 10, jnp.ones(k), jnp.eye(k))
    b = sample_hyper(key, 10, jnp.ones(k), jnp.eye(k))
    np.testing.assert_array_equal(np.asarray(a.mu), np.asarray(b.mu))
    np.testing.assert_array_equal(np.asarray(a.lambda_f), np.asarray(b.lambda_f))
