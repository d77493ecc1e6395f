"""Cross-validation of the batched conditional update against a plain numpy
re-implementation of the reference math (c++/sample.cpp:263-336)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from bpmf_tpu.ops.mvnormal import HyperParams
from bpmf_tpu.ops.update import BucketDev, sample_bucket
from bpmf_tpu.sparse import bucketize


def _to_dev(b, dtype=jnp.float32):
    return BucketDev(
        nbr=jnp.asarray(b.nbr),
        val=jnp.asarray(b.val, dtype),
        mask=jnp.asarray(b.mask, dtype),
        row_slot=jnp.asarray(b.row_slot),
        item_ids=jnp.asarray(b.item_ids),
        orig_ids=jnp.asarray(b.orig_ids),
        slot_valid=jnp.asarray(b.slot_valid),
    )


def _numpy_posterior_mean(m_csc, other, hp_mu, hp_lambda, mean_rating, alpha, idx):
    """Reference math with zero noise: u = A^-1 rr."""
    col = m_csc.getcol(idx).tocoo()
    g = np.zeros((other.shape[1], other.shape[1]))
    rr = hp_lambda @ hp_mu
    for r, v in zip(col.row, col.data):
        g += np.outer(other[r], other[r])
        rr += other[r] * (v - mean_rating) * alpha
    a = hp_lambda + alpha * g
    return np.linalg.solve(a, rr)


def test_posterior_mean_matches_numpy(rng):
    k = 8
    n_other, n_items = 30, 12
    m = sp.random(n_other, n_items, density=0.4,
                  random_state=np.random.RandomState(5), format="csc")
    m.data = rng.random(m.nnz) * 4 + 1
    other = rng.normal(size=(n_other, k)).astype(np.float64)
    other_pad = np.vstack([other, np.zeros((2, k))])
    mean_rating, alpha = 2.5, 2.0

    hp_lam = np.eye(k) * 1.5
    hp_mu = rng.normal(size=k) * 0.3
    hp = HyperParams(
        mu=jnp.asarray(hp_mu, jnp.float32),
        lambda_f=jnp.asarray(hp_lam, jnp.float32),
        lambda_l=jnp.asarray(np.linalg.cholesky(hp_lam), jnp.float32),
    )

    side = bucketize(m, np.arange(n_items), scratch_id=n_items)
    got = np.zeros((n_items, k))
    for bi, b in enumerate(side.buckets):
        out = sample_bucket(
            _to_dev(b),
            jnp.asarray(other_pad, jnp.float32),
            hp,
            jnp.asarray(mean_rating, jnp.float32),
            alpha,
            jax.random.PRNGKey(bi),
            split=b.split,
            noise_scale=0.0,  # deterministic: posterior mean
        )
        u = np.asarray(out.u)
        ids = np.asarray(out.item_ids)
        valid = np.asarray(out.slot_valid) > 0
        got[ids[valid]] = u[valid]

    for j in range(n_items):
        want = _numpy_posterior_mean(m, other, hp_mu, hp_lam, mean_rating, alpha, j)
        np.testing.assert_allclose(got[j], want, rtol=2e-4, atol=2e-4)


def test_split_bucket_matches_unsplit(rng):
    """Row-split Gram accumulation == unsplit accumulation."""
    k = 6
    n_other = 64
    rows = np.arange(64)
    cols = np.zeros(64, int)
    vals = rng.random(64) * 5
    m = sp.csc_matrix((vals, (rows, cols)), shape=(n_other, 1))
    other = rng.normal(size=(n_other + 2, k))
    hp = HyperParams.init(k)
    args = dict(
        other_items=jnp.asarray(other, jnp.float32),
        hp=hp,
        mean_rating=jnp.asarray(2.0, jnp.float32),
        alpha=2.0,
        side_key=jax.random.PRNGKey(0),
        noise_scale=0.0,
    )

    side_a = bucketize(m, np.arange(1), scratch_id=1, max_bucket_width=4096)
    side_b = bucketize(m, np.arange(1), scratch_id=1, max_bucket_width=16)
    assert not side_a.buckets[-1].split and side_b.buckets[-1].split

    def run(side):
        for b in side.buckets:
            if b.slot_valid.sum():
                out = sample_bucket(_to_dev(b), split=b.split, **args)
                return np.asarray(out.u[0])

    np.testing.assert_allclose(run(side_a), run(side_b), rtol=1e-4, atol=1e-5)


def test_diagonal_only_mode(rng):
    """BPMF_NO_COVARIANCE analog: off-diagonal precision dropped
    (c++/sample.cpp:300-304)."""
    k = 4
    m = sp.csc_matrix((np.array([3.0]), (np.array([0]), np.array([0]))), shape=(2, 1))
    other = rng.normal(size=(4, k))
    hp = HyperParams.init(k)
    side = bucketize(m, np.arange(1), scratch_id=1)
    b = side.buckets[0]
    kwargs = dict(
        other_items=jnp.asarray(other, jnp.float32),
        hp=hp,
        mean_rating=jnp.asarray(0.0, jnp.float32),
        alpha=2.0,
        side_key=jax.random.PRNGKey(1),
        split=b.split,
        noise_scale=0.0,
    )
    u_full = np.asarray(sample_bucket(_to_dev(b), **kwargs).u[0])
    u_diag = np.asarray(sample_bucket(_to_dev(b), diagonal_only=True, **kwargs).u[0])
    v = other[0]
    rr = v * 3.0 * 2.0
    a_full = np.eye(k) + 2.0 * np.outer(v, v)
    a_diag = np.diag(np.diag(a_full))
    np.testing.assert_allclose(u_full, np.linalg.solve(a_full, rr), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(u_diag, np.linalg.solve(a_diag, rr), rtol=1e-4, atol=1e-5)


def test_prop_posterior_strict_quirk(rng):
    """strict_reference keeps the c++/sample.cpp:285 behavior: per-item
    propagated Lambda with the SHARED hyper mean; non-strict uses the
    propagated mean."""
    k = 3
    m = sp.csc_matrix((2, 1))  # no ratings: posterior = prior term only
    other = rng.normal(size=(4, k))
    hp_mu = np.array([1.0, 2.0, 3.0])
    hp = HyperParams(
        mu=jnp.asarray(hp_mu, jnp.float32),
        lambda_f=jnp.eye(k),
        lambda_l=jnp.eye(k),
    )
    prop_mu = np.zeros((8, k))
    prop_mu[0] = [5.0, 5.0, 5.0]
    prop_lam = np.tile(np.eye(k) * 2.0, (8, 1, 1))

    side = bucketize(m, np.arange(1), scratch_id=1)
    b = side.buckets[0]
    kwargs = dict(
        other_items=jnp.asarray(other, jnp.float32),
        hp=hp,
        mean_rating=jnp.asarray(0.0, jnp.float32),
        alpha=2.0,
        side_key=jax.random.PRNGKey(2),
        split=b.split,
        prop_mu=jnp.asarray(prop_mu, jnp.float32),
        prop_lambda=jnp.asarray(prop_lam, jnp.float32),
        noise_scale=0.0,
    )
    u_strict = np.asarray(sample_bucket(_to_dev(b), strict_reference=True, **kwargs).u[0])
    u_fixed = np.asarray(sample_bucket(_to_dev(b), strict_reference=False, **kwargs).u[0])
    # A = propLambda = 2I; rr = 2I @ mu_term => u = mu_term
    np.testing.assert_allclose(u_strict, hp_mu, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(u_fixed, [5.0, 5.0, 5.0], rtol=1e-5, atol=1e-5)
