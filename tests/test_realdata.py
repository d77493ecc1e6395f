"""Real-data parity tests against the reference checkout's own datasets
(the analog of the reference ctest, CMakeLists.txt:174-182, and the tiny
golden gate, data/tiny/run_test.sh:12-25).

Opt-in by data presence: skipped when /root/reference is not mounted, so
the suite stays self-contained elsewhere.  Run with ``pytest -m realdata``
to select only these.
"""

import os

import numpy as np
import pytest

from bpmf_tpu.config import Config
from bpmf_tpu.io import read_matrix
from bpmf_tpu.sampler import BPMF

REF = "/root/reference/data"

pytestmark = [
    pytest.mark.realdata,
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not mounted"
    ),
]


def _run(train_file, test_file, **kw):
    cfg = Config(train_file=train_file, test_file=test_file, **kw)
    s = BPMF(cfg, out=open(os.devnull, "w"))
    return s, s.run()


def test_tiny_golden_gate(tmp_path):
    """data/tiny, 9 iters, burnin 0, no permute: Final Avg RMSE < 3
    (run_test.sh:14-25 hard gate)."""
    s, rmse_avg = _run(
        f"{REF}/tiny/train.mtx", f"{REF}/tiny/test.mtx",
        nsims=9, burnin=0, permute=False, output_dir=str(tmp_path),
    )
    assert rmse_avg < 3.0
    assert (tmp_path / "Pavg.sdm").exists()


def test_ml100k_4iter_smoke():
    """ml-100k 4 iterations — the reference CI smoke (exit-0 + finite)."""
    s, rmse_avg = _run(
        f"{REF}/movielens/ml-train.mtx", f"{REF}/movielens/ml-test.mtx",
        nsims=4, burnin=1, num_latent=8,
    )
    assert np.isfinite(rmse_avg)


def test_ml100k_gzip_inputs_match():
    """.gz inputs parse to the same matrices (gzstream parity, io.cpp)."""
    a = read_matrix(f"{REF}/movielens/ml-train.mtx")
    b = read_matrix(f"{REF}/movielens/ml-train.mtx.gz")
    assert a.shape == b.shape and a.nnz == b.nnz
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_allclose(a.data, b.data)


def test_ml100k_convergence_band():
    """ml-100k K=16, 16 iters: avg RMSE lands in the band the reference
    binary reaches at equal iterations (~0.95-1.00; docs/PARITY.md measured
    0.992 at 16 iters; MCMC noise gives a few hundredths of spread)."""
    s, rmse_avg = _run(
        f"{REF}/movielens/ml-train.mtx", f"{REF}/movielens/ml-test.mtx",
        nsims=16, burnin=5, num_latent=16,
    )
    assert 0.90 < rmse_avg < 1.05, rmse_avg


def test_tiny_posterior_vs_numpy(tmp_path):
    """compute_mu_lambda.py analog: recompute the aggregated posterior from
    the -v per-iteration dumps and compare with the run's finalized
    U-mu/U-Lambda outputs (validates SURVEY component #25)."""
    s, _ = _run(
        f"{REF}/tiny/train.mtx", f"{REF}/tiny/test.mtx",
        nsims=25, burnin=4, permute=False, verbose=True,
        num_latent=4, output_dir=str(tmp_path),
    )
    k = 4
    nsamples = 25 - 4
    dumps = []
    for it in range(4, 25):
        f = tmp_path / f"U-{it}.ddm"
        if f.exists():
            dumps.append(read_matrix(str(f)))  # [K, num]
    assert len(dumps) == nsamples
    stack = np.stack(dumps)                     # [S, K, num]
    mu_ref = stack.mean(axis=0)                 # [K, num]
    mu_out = read_matrix(str(tmp_path / "U-mu.ddm"))
    np.testing.assert_allclose(mu_out, mu_ref, rtol=1e-5, atol=1e-6)

    # Lambda: inverse sample covariance per item (bpmf.cpp:286-294)
    lam_out = read_matrix(str(tmp_path / "U-Lambda.ddm"))  # [K*K, num]
    num = mu_ref.shape[1]
    for i in range(num):
        xs = stack[:, :, i]                     # [S, K]
        cov = np.cov(xs.T, ddof=1)
        lam_i = lam_out[:, i].reshape(k, k, order="F")
        np.testing.assert_allclose(
            lam_i, np.linalg.inv(cov), rtol=1e-3, atol=1e-4
        )


def test_tiny_stays_finite_across_seeds():
    """The tiny chain must survive 9 iterations for EVERY seed, like the
    all-double reference (data/tiny/run_test.sh passes unconditionally).
    In float32 this is a coin flip — seeds 1234 and 7 went non-finite by
    iteration 9 on both the r4 and r5 programs, on CPU and TPU, with every
    solver/gram-impl combination (docs/measurements/r5_tiny_inpt_debug.log)
    — which is why 'auto' dtype resolves to float64 below min_side < 2*K
    (config.resolve_dtype).  Seeds here include the measured-failing ones."""
    for seed in (1234, 42, 7):
        cfg = Config(
            train_file=f"{REF}/tiny/train.mtx",
            test_file=f"{REF}/tiny/test.mtx",
            nsims=9, burnin=0, permute=False, seed=seed,
        )
        s = BPMF(cfg, out=open(os.devnull, "w"))
        s.setup()
        assert s.cfg.dtype == "float64"  # auto resolved against min side 2
        rmse_avg = s.run()
        assert np.isfinite(rmse_avg), seed
        assert rmse_avg < 4.5, seed
