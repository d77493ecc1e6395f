"""int8 dense-stream path (ops/dense8): quantization, kernels vs numpy,
and end-to-end trajectory equality with the bf16/dense reference path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bpmf_tpu.config import Config
from bpmf_tpu.datasets import synth_movielens
from bpmf_tpu.ops.dense8 import (
    build_code_array,
    dense8_gram_rhs_cols,
    dense8_gram_rhs_rows,
    packed_tri_t,
    quantize_values,
)
from bpmf_tpu.ops.pallas_solve import tri_tight_pairs
from bpmf_tpu.sampler import BPMF

INTERP = jax.default_backend() != "tpu"


# -- quantization -----------------------------------------------------------

def test_quantize_half_stars():
    q = quantize_values(np.asarray([0.5, 1.0, 3.5, 5.0]))
    assert q is not None
    assert q.scale == pytest.approx(0.5)
    # code 1 decodes to the minimum value
    assert q.offset + q.scale == pytest.approx(0.5)
    assert q.levels == 10


def test_quantize_integers():
    q = quantize_values(np.asarray([1.0, 2.0, 5.0]))
    assert q is not None and q.scale == pytest.approx(1.0) and q.levels == 5


def test_quantize_rejects_continuous():
    rng = np.random.default_rng(0)
    assert quantize_values(rng.normal(size=300)) is None


def test_quantize_rejects_too_many_levels():
    assert quantize_values(np.arange(1, 300, dtype=np.float64)) is None


def test_code_array_roundtrip():
    vals = np.asarray([0.5, 2.0, 5.0, 3.5])
    q = quantize_values(vals)
    codes = build_code_array(
        np.asarray([0, 1, 2, 3]), np.asarray([1, 0, 2, 1]), vals, q, 8, 8
    )
    assert codes.dtype == np.int8
    dec = q.offset + q.scale * codes[np.arange(4), [1, 0, 2, 1]]
    np.testing.assert_allclose(dec, vals)
    assert codes.sum() == codes[np.arange(4), [1, 0, 2, 1]].sum()  # rest 0


# -- kernels vs numpy --------------------------------------------------------

def _ref_gram_rhs(codes, v, cs, cb, k):
    ind = (codes != 0).astype(np.float32)
    cv = codes.astype(np.float32) * cs + ind * cb
    tri_i, tri_j, _ = tri_tight_pairs(k)
    p = v[:, tri_i] * v[:, tri_j]
    return ind @ p, cv @ v


@pytest.mark.parametrize("orientation", ["rows", "cols"])
def test_kernel_matches_numpy(orientation):
    rng = np.random.default_rng(1)
    r, c, k = 512, 512, 32
    codes = rng.integers(0, 6, size=(r, c)).astype(np.int8)
    cs, cb = 0.5, -1.25
    if orientation == "rows":
        v = rng.normal(size=(c, k)).astype(np.float32)
        gram_ref, rhs_ref = _ref_gram_rhs(codes, v, cs, cb, k)
        kernel = dense8_gram_rhs_rows
    else:
        v = rng.normal(size=(r, k)).astype(np.float32)
        gram_ref, rhs_ref = _ref_gram_rhs(codes.T, v, cs, cb, k)
        kernel = dense8_gram_rhs_cols
    v_t = jnp.asarray(np.ascontiguousarray(v.T))
    p_t = packed_tri_t(v_t)
    gram_t, rhs_t = jax.jit(
        lambda a, p, b: kernel(a, p, b, cs, cb, interpret=INTERP)
    )(jnp.asarray(codes), p_t, v_t)
    t = (k * (k + 1)) // 2
    np.testing.assert_allclose(
        np.asarray(gram_t)[:t].T, gram_ref, rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(rhs_t).T, rhs_ref, rtol=2e-5, atol=1e-4)


def test_packed_tri_t_matches_index_pairs():
    k = 16
    rng = np.random.default_rng(2)
    v = rng.normal(size=(5, k)).astype(np.float32)
    tri_i, tri_j, _ = tri_tight_pairs(k)
    p_t = packed_tri_t(jnp.asarray(np.ascontiguousarray(v.T)))
    np.testing.assert_allclose(
        np.asarray(p_t)[: len(tri_i)].T, v[:, tri_i] * v[:, tri_j]
    )


# -- end-to-end -------------------------------------------------------------

def _run(train, test, impl, nsims=6, **kw):
    cfg = Config(
        num_latent=16, nsims=nsims, burnin=2, gram_impl=impl,
        n_devices=1, **kw,
    )
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    rmse_avg = s.run()
    return s, rmse_avg


def test_trajectory_matches_dense():
    """f32 CPU: the coded path decodes values exactly, so the trajectory is
    bit-identical to the uncoded dense path."""
    train, test = synth_movielens(
        n_users=300, n_movies=200, n_ratings=5000, seed=3
    )
    s_d, r_d = _run(train, test, "dense")
    s_8, r_8 = _run(train, test, "dense8")
    assert s_8.users.impl == "dense8" and s_8.movies.impl == "dense8"
    assert s_d.users.impl == "dense"
    assert r_8 == pytest.approx(r_d, abs=1e-6)
    assert s_8.rmse == pytest.approx(s_d.rmse, abs=1e-6)


def test_dense8_with_aggregation(tmp_path):
    train, test = synth_movielens(
        n_users=200, n_movies=150, n_ratings=3000, seed=4
    )
    s, rmse_avg = _run(
        train, test, "dense8", nsims=8, output_dir=str(tmp_path)
    )
    assert np.isfinite(rmse_avg)
    assert (tmp_path / "U-mu.ddm").exists()
    assert (tmp_path / "V-Lambda.ddm").exists()


def test_forced_dense8_rejects_continuous_ratings():
    train, test = synth_movielens(
        n_users=100, n_movies=80, n_ratings=1500, seed=5
    )
    train = train.copy()
    train.data = train.data + np.random.default_rng(0).normal(
        0, 0.01, train.nnz
    )
    with pytest.raises(ValueError, match="dense8"):
        _run(train, test, "dense8")


def test_dense8_with_prop_posterior(tmp_path):
    """A side with a propagated posterior STAYS on the coded path (round-2
    gap: it used to fall back to the bucketed program): the per-item prior
    rides the fused solver as a second packed-triangle VMEM tile
    (ops/pallas_solve._kernel_tri_fused_peritem).  The trajectory matches
    the uncoded dense path consuming the same posterior, in both the
    strict-reference (c++/sample.cpp:285 shared-hp.mu quirk) and the
    mathematically-intended prior-rhs modes."""
    train, test = synth_movielens(
        n_users=150, n_movies=100, n_ratings=2500, seed=6
    )
    # enough post-burnin samples (> K) that the finalized per-item
    # precision (inverse sample covariance) is well-defined
    s0, _ = _run(train, test, "auto", nsims=25, output_dir=str(tmp_path))
    prop = f"{tmp_path}/U-mu.ddm,{tmp_path}/U-Lambda.ddm"
    for strict in (True, False):
        s8, r8 = _run(train, test, "dense8", nsims=4,
                      prop_u=prop, strict_reference=strict)
        assert s8.users.impl == "dense8"      # prop side keeps the coded path
        assert s8.movies.impl == "dense8"
        assert s8._aux["users"]["prior"][0] is not None
        # static prior rhs (Lambda_i @ propMu_i) only when the quirk is off;
        # under strict_reference the rhs depends on the sampled hp.mu
        assert (s8._aux["users"]["prior"][1] is not None) == (not strict)
        # the [num_pad, K, K] form is NOT uploaded on the fast path
        assert s8.users_gdata.prop_lambda is None
        sd, rd = _run(train, test, "dense", nsims=4,
                      prop_u=prop, strict_reference=strict)
        assert sd.users.impl == "dense"
        assert np.isfinite(r8)
        assert r8 == pytest.approx(rd, abs=1e-5)
        assert s8.rmse == pytest.approx(sd.rmse, abs=1e-5)


def test_reduce_mode_rides_dense_stream():
    """Explicit --mode reduce keeps the dense-stream program instead of
    falling back to the bucketed statistic-exchange path (VERDICT r2 gap:
    c++/mpi_reduce.h:29-45 users at huge scale got the slow program).  The
    hybrid satisfies REDUCE's memory contract — the sharded side's stats go
    via psum_scatter, only the small side is all_gathered — and the
    trajectory is the gather-mode dense8 trajectory."""
    train, test = synth_movielens(
        n_users=300, n_movies=200, n_ratings=5000, seed=7
    )
    s_g, r_g = _run(train, test, "dense8", comm_mode="gather")
    import io as _io

    log = _io.StringIO()
    cfg = Config(num_latent=16, nsims=6, burnin=2, gram_impl="dense8",
                 n_devices=4, comm_mode="reduce")
    s_r = BPMF(cfg, train=train, test=test, out=log)
    r_r = s_r.run()
    assert s_r.users.impl == "dense8" and s_r.movies.impl == "dense8"
    assert "reduce mode via dense-stream hybrid" in log.getvalue()
    assert r_r == pytest.approx(r_g, abs=2e-5)
    assert s_r.rmse == pytest.approx(s_g.rmse, abs=2e-5)


def test_sharded_trajectory_matches_single_device():
    """Multi-chip dense8 (rows-sharded code array: all_gather on the users
    sweep, psum_scatter stat exchange on the movies sweep) reproduces the
    1-device dense8 trajectory on the virtual mesh."""
    train, test = synth_movielens(
        n_users=300, n_movies=200, n_ratings=5000, seed=7
    )
    s_1, r_1 = _run(train, test, "dense8")
    cfg = Config(num_latent=16, nsims=6, burnin=2, gram_impl="dense8",
                 n_devices=4)
    s_4 = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    r_4 = s_4.run()
    assert s_4.users.impl == "dense8" and s_4.movies.impl == "dense8"
    assert r_4 == pytest.approx(r_1, abs=2e-5)
    assert s_4.rmse == pytest.approx(s_1.rmse, abs=2e-5)


def test_fold_and_grouped_flags_trajectory_equality(monkeypatch):
    """Explicit A/B of the two round-3 kernel-variant knobs at trajectory
    level: BPMF_D8_FOLD (affine fold into the matmul operands,
    ops/dense8._call) and BPMF_TRI_GROUPED (top-aligned packed solver
    layout, ops/pallas_solve.tri_grouped) must not change the sampled
    trajectory — in f32 on CPU the decode paths are exact, so rmse values
    agree to float tolerance across all four flag combinations."""
    import bpmf_tpu.ops.pallas_solve as ps

    train, test = synth_movielens(
        n_users=120, n_movies=80, n_ratings=1200, seed=3
    )
    results = {}
    for fold in ("0", "1"):
        for grouped in ("0", "1"):
            monkeypatch.setenv("BPMF_D8_FOLD", fold)
            monkeypatch.setenv("BPMF_TRI_GROUPED", grouped)
            ps._tri_grouped_reset()  # the flag pins at first consult
            s, r = _run(train, test, "dense8", nsims=4)
            assert s.users.impl == "dense8"
            results[(fold, grouped)] = (r, s.rmse)
    ps._tri_grouped_reset()
    base = results[("1", "1")]
    for combo, got in results.items():
        assert got[0] == pytest.approx(base[0], abs=1e-5), combo
        assert got[1] == pytest.approx(base[1], abs=1e-5), combo


def test_fused_solve_matches_split(monkeypatch):
    """The dense8 megakernel (ops/dense8.dense8_sweep_solve: Gram + rhs +
    prior combine + Cholesky-solve-sample in ONE pallas_call, default
    BPMF_D8_SOLVE=fused) must reproduce the split pipeline (gram kernel ->
    HBM -> tri_expand_rows -> tri_combine_solve_sample) to float
    tolerance: same contractions and same f32 combine/solve arithmetic
    (the in-kernel-p_t variants differ only in the exact affine rhs
    rounding, cs*(v@c)+cb*(v@i) vs the fold form).  Covers all three
    routes x fold 0/1 x p_t in-kernel/hoisted."""
    train, test = synth_movielens(
        n_users=300, n_movies=200, n_ratings=5000, seed=3
    )
    results = {}
    for solve in ("split", "fused", "fused_aligned"):
        for fold in ("0", "1"):
            for pt in ("hoisted", "inkernel"):
                if pt == "inkernel" and solve == "fused_aligned":
                    continue  # aligned megakernel is hoisted-only
                monkeypatch.setenv("BPMF_D8_SOLVE", solve)
                monkeypatch.setenv("BPMF_D8_FOLD", fold)
                monkeypatch.setenv("BPMF_D8_PT", pt)
                s, r = _run(train, test, "dense8", nsims=4)
                assert s.users.impl == "dense8"
                results[(solve, fold, pt)] = (r, s.rmse)
    base = results[("split", "1", "hoisted")]
    for combo, got in results.items():
        assert got[0] == pytest.approx(base[0], abs=1e-5), combo
        assert got[1] == pytest.approx(base[1], abs=1e-5), combo


def test_tri_aligned_mm_flag_trajectory_equality(monkeypatch):
    """Explicit 0/1 A/B of BPMF_TRI_ALIGNED_MM on the SAME data (the
    round-4 aligned-Gram knob, parallel/spmd.dense_half_sweep_fused): the
    aligned layout emits the padded [T, I] triangle straight from the
    matmul, the tight layout emits [T_tight, I] and row-expands — same
    entries either way, so the sampled trajectory must agree to float
    tolerance across both settings and the auto default."""
    train, test = synth_movielens(
        n_users=120, n_movies=80, n_ratings=1200, seed=3
    )
    results = {}
    for amm in ("0", "1", "auto"):
        monkeypatch.setenv("BPMF_TRI_ALIGNED_MM", amm)
        s, r = _run(train, test, "dense", nsims=4,
                    fuse_dense="on", solver="pallas")
        assert s._aux["users"]["fused"] and s._aux["movs"]["fused"]
        results[amm] = (r, s.rmse)
    base = results["auto"]
    for amm, got in results.items():
        assert got[0] == pytest.approx(base[0], abs=1e-5), amm
        assert got[1] == pytest.approx(base[1], abs=1e-5), amm
