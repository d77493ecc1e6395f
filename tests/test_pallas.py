"""Pallas fused Cholesky-solve-sample kernel: correctness in interpret
mode on CPU (the real-TPU path is cross-validated in perf runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bpmf_tpu.ops import pallas_solve as ps
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


@pytest.mark.parametrize("k,b", [(32, 140), (16, 512), (8, 64)])
def test_tri_grouped_matches_ungrouped(rng, monkeypatch, k, b):
    """The group-sliced fused tri solver (top-aligned packed layout,
    BPMF_TRI_GROUPED=1, the k%8==0 default) reproduces the full-width
    kernel (bottom-padded layout) to fma-reassociation tolerance, for both
    the shared-lam and the per-item-prior variants, including the
    padding-lane path (b=140) — and both match a numpy dense solve."""
    m = rng.normal(size=(b, k, k)).astype(np.float32)
    gram = (np.einsum("bij,bkj->bik", m, m)
            + 3 * np.eye(k)).astype(np.float32)
    lam = (np.eye(k) * 1.7).astype(np.float32)
    rhs = rng.normal(size=(k, b)).astype(np.float32)
    noise = rng.normal(size=(k, b)).astype(np.float32)
    pm = rng.normal(size=(b, k, k)).astype(np.float32)
    plam = (np.einsum("bij,bkj->bik", pm, pm)
            + 2 * np.eye(k)).astype(np.float32)
    mu = rng.normal(size=(k,)).astype(np.float32)
    alpha = 2.0
    ii, jj, _ = ps.tri_tight_pairs(k)
    g_tight = np.ascontiguousarray(gram[:, ii, jj].T).astype(np.float32)

    outs, outs_p = {}, {}
    for flag in ("0", "1"):
        monkeypatch.setenv("BPMF_TRI_GROUPED", flag)
        ps._tri_grouped_reset()  # the flag is pinned at first consult
        g_al = ps.tri_expand_rows(jnp.asarray(g_tight), k)
        outs[flag] = np.asarray(ps.tri_combine_solve_sample(
            g_al, jnp.asarray(lam), jnp.asarray(rhs), jnp.asarray(noise),
            alpha, interpret=True))
        lt = jnp.asarray(ps.pack_prior_tri(plam, k))
        outs_p[flag] = np.asarray(ps.tri_combine_solve_sample(
            g_al, jnp.asarray(lam), jnp.asarray(rhs), jnp.asarray(noise),
            alpha, interpret=True, lam_tri_t=lt))
        # the prior-rhs routing matrices follow the layout too
        pr = np.asarray(ps.prior_rhs_from_tri(lt, jnp.asarray(mu)))
        pr_ref = np.einsum("bij,j->ib", plam, mu)
        np.testing.assert_allclose(pr, pr_ref, rtol=2e-4, atol=2e-4)

    np.testing.assert_allclose(outs["1"], outs["0"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs_p["1"], outs_p["0"], rtol=1e-5,
                               atol=1e-6)

    def ref_solve(a):
        out = np.zeros((b, k), np.float32)
        for i in range(b):
            low = np.linalg.cholesky(a[i].astype(np.float64))
            y = np.linalg.solve(low, rhs[:, i].astype(np.float64))
            out[i] = np.linalg.solve(low.T, y + noise[:, i])
        return out

    np.testing.assert_allclose(
        outs["1"].T, ref_solve(lam[None] + alpha * gram),
        rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        outs_p["1"].T, ref_solve(plam + alpha * gram),
        rtol=2e-3, atol=2e-4)


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
