"""SPMD tests on the virtual 8-device CPU mesh (the analog of the
reference CI's oversubscribed ``mpirun -np 4``, SURVEY.md §4).

The strongest property: per-item noise is keyed by ORIGINAL item id
(ops/update.item_noise), so the sampled trajectory is independent of device
count, item-to-device assignment, AND exchange mode — mirroring the
reference's rng_set_pos((idx+1)*K*(iter+1)) schedule independence across
nprocs."""

import os

import jax
import numpy as np
import pytest

from bpmf_tpu.config import Config
from bpmf_tpu.sampler import BPMF
from tests.conftest import make_ratings


def _run(train, test, **kw):
    kw.setdefault("nsims", 8)
    cfg = Config(num_latent=6, burnin=3, **kw)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    rmse = s.run()
    u = s.items_host(s.users, s.state_u)
    v = s.items_host(s.movies, s.state_m)
    return rmse, u, v


@pytest.fixture(scope="module")
def data():
    return make_ratings(n_users=70, n_movies=45, density=0.3, seed=11)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_device_count_invariance(data):
    """1-device and 8-device gather runs produce the same trajectory."""
    train, test = data
    r1, u1, v1 = _run(train, test, n_devices=1)
    r8, u8, v8 = _run(train, test, n_devices=8)
    assert abs(r1 - r8) < 1e-4
    np.testing.assert_allclose(u1, u8, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(v1, v8, rtol=2e-3, atol=2e-3)


def test_reduce_mode_matches_gather(data):
    """Statistic exchange (ENABLE_REDUCE) == value exchange trajectories."""
    train, test = data
    rg, ug, vg = _run(train, test, n_devices=8, comm_mode="gather")
    rr, ur, vr = _run(train, test, n_devices=8, comm_mode="reduce")
    assert abs(rg - rr) < 1e-4
    np.testing.assert_allclose(ug, ur, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(vg, vr, rtol=2e-3, atol=2e-3)


def test_no_balance_assignment(data):
    """-k contiguous block assignment also runs and converges the same."""
    train, test = data
    r_bal, u_bal, _ = _run(train, test, n_devices=8, permute=True)
    r_blk, u_blk, _ = _run(train, test, n_devices=8, permute=False)
    assert abs(r_bal - r_blk) < 1e-4
    np.testing.assert_allclose(u_bal, u_blk, rtol=2e-3, atol=2e-3)


def test_dense_matches_bucketed(data):
    """The dense-adjacency Gram (two MXU matmuls) and the degree-bucketed
    gather Gram produce the same trajectory — same math, same noise keying
    (partition.build_dense_layout)."""
    train, test = data
    rd, ud, vd = _run(train, test, n_devices=8, gram_impl="dense")
    rb, ub, vb = _run(train, test, n_devices=8, gram_impl="bucketed")
    assert abs(rd - rb) < 1e-4
    np.testing.assert_allclose(ud, ub, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(vd, vb, rtol=2e-3, atol=2e-3)


def test_dense_auto_selection(data):
    """Tiny problems auto-select dense; a tiny dense budget forces bucketed."""
    train, test = data
    import os as _os
    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    s1 = BPMF(Config(num_latent=4, nsims=1), train=train, test=test,
              out=open(os.devnull, "w"))
    s1.setup()
    assert s1.movies.impl == "dense" and s1.users.impl == "dense"

    s2 = BPMF(Config(num_latent=4, nsims=1, dense_limit_bytes=16),
              train=train, test=test, out=open(os.devnull, "w"))
    s2.setup()
    assert s2.movies.impl == "bucketed" and s2.users.impl == "bucketed"


def test_reduce_mode_single_device(data):
    train, test = data
    rg, ug, _ = _run(train, test, n_devices=1, comm_mode="gather")
    rr, ur, _ = _run(train, test, n_devices=1, comm_mode="reduce")
    assert abs(rg - rr) < 1e-4
    np.testing.assert_allclose(ug, ur, rtol=2e-3, atol=2e-3)


def test_spmd_with_aggregation_outputs(tmp_path, data):
    """Aggregated posterior works sharded: finalize from an 8-device run
    equals the 1-device result."""
    train, test = data
    out1, out8 = str(tmp_path / "d1"), str(tmp_path / "d8")
    _run(train, test, n_devices=1, output_dir=out1)
    _run(train, test, n_devices=8, output_dir=out8)
    from bpmf_tpu.io import read_matrix

    mu1 = read_matrix(os.path.join(out1, "U-mu.ddm"))
    mu8 = read_matrix(os.path.join(out8, "U-mu.ddm"))
    np.testing.assert_allclose(mu1, mu8, rtol=2e-3, atol=2e-3)


def test_partition_balance():
    """Greedy LPT keeps per-device work within 20% of the mean on a skewed
    degree distribution (Sys::assign's job, c++/assign.cpp:52-209)."""
    from bpmf_tpu.parallel.partition import assign_items

    rng = np.random.default_rng(0)
    degrees = (rng.pareto(1.5, size=2000) * 20).astype(np.int64)
    ids = assign_items(degrees, 8, balance=True)
    assert sorted(np.concatenate(ids).tolist()) == list(range(2000))
    work = np.array([(10 + degrees[i]).sum() for i in ids])
    assert work.max() / work.mean() < 1.2

    ids_blk = assign_items(degrees, 8, balance=False)
    assert sorted(np.concatenate(ids_blk).tolist()) == list(range(2000))


def test_reduce_mode_with_prop_posterior(tmp_path, data):
    """ENABLE_REDUCE + propagated posterior: the per-item prior branch in
    the reduce half-sweep (prop arrays live in the padded shard layout)."""
    train, test = data
    out1 = str(tmp_path / "r1")
    # need nsims - burnin > K samples or the propagated Lambda (inverse of
    # the sample covariance) is singular — the NaN guard fires otherwise
    _run(train, test, n_devices=8, output_dir=out1, nsims=16)
    warm_kw = dict(
        prop_u=f"{out1}/U-mu.ddm,{out1}/U-Lambda.ddm",
        prop_v=f"{out1}/V-mu.ddm,{out1}/V-Lambda.ddm",
        strict_reference=False,
    )
    rg, ug, _ = _run(train, test, n_devices=8, comm_mode="gather", **warm_kw)
    rr, ur, _ = _run(train, test, n_devices=8, comm_mode="reduce", **warm_kw)
    assert abs(rg - rr) < 1e-4
    np.testing.assert_allclose(ug, ur, rtol=2e-3, atol=2e-3)


def test_fused_dense_matches_plain(data):
    """The packed-triangle fused dense sweep (dense_half_sweep_fused +
    ops/pallas_solve.tri_combine_solve_sample, interpret-mode Pallas on
    CPU) reproduces the plain dense trajectory on 1 and 8 devices."""
    train, test = data
    r0, u0, v0 = _run(train, test, n_devices=1, gram_impl="dense",
                      fuse_dense="off")
    for n_dev in (1, 8):
        rf, uf, vf = _run(train, test, n_devices=n_dev, gram_impl="dense",
                          fuse_dense="on", solver="pallas")
        assert abs(r0 - rf) < 1e-4
        np.testing.assert_allclose(u0, uf, rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(v0, vf, rtol=2e-3, atol=2e-3)


def test_fused_dense_prop_posterior_matches_generic(tmp_path, data):
    """Per-item propagated prior ON the fused dense sweep (round-2 gap #4:
    -m/-l used to exclude a side from the fast paths): the prior arrives as
    a packed-triangle [T, B] tile (pallas_solve._kernel_tri_fused_peritem)
    and the trajectory matches the generic dense path consuming the same
    posterior, on 1 and 8 devices, in both prior-rhs modes."""
    train, test = data
    out1 = str(tmp_path / "warm")
    _run(train, test, n_devices=8, output_dir=out1, nsims=16)
    for strict in (True, False):
        warm_kw = dict(
            prop_u=f"{out1}/U-mu.ddm,{out1}/U-Lambda.ddm",
            prop_v=f"{out1}/V-mu.ddm,{out1}/V-Lambda.ddm",
            strict_reference=strict, gram_impl="dense",
        )
        r0, u0, v0 = _run(train, test, n_devices=1, fuse_dense="off",
                          **warm_kw)
        for n_dev in (1, 8):
            cfg = Config(num_latent=6, burnin=3, nsims=8, n_devices=n_dev,
                         fuse_dense="on", solver="pallas", **warm_kw)
            s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
            s.setup()
            assert s._aux["users"]["fused"]
            assert s._aux["users"]["prior"][0] is not None
            assert s.users_gdata.prop_lambda is None  # no [pn, K, K] upload
            rf = s.run()
            uf = s.items_host(s.users, s.state_u)
            vf = s.items_host(s.movies, s.state_m)
            assert abs(r0 - rf) < 1e-4
            np.testing.assert_allclose(u0, uf, rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(v0, vf, rtol=2e-3, atol=2e-3)


def test_reduce_chunked_matches_unchunked(data):
    """The O(N/D * K^2)-memory chunked statistic exchange (per-destination
    psum loop, spmd.reduce_half_sweep_chunked) produces the same trajectory
    as the single-psum_scatter reduce path and as gather."""
    train, test = data
    ru, uu, vu = _run(
        train, test, n_devices=8, comm_mode="reduce", reduce_chunked="off"
    )
    rc, uc, vc = _run(
        train, test, n_devices=8, comm_mode="reduce", reduce_chunked="on"
    )
    assert abs(ru - rc) < 1e-4
    np.testing.assert_allclose(uu, uc, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(vu, vc, rtol=2e-3, atol=2e-3)


def test_reduce_chunked_never_materializes_global_buffer(data):
    """The compiled chunked program must not contain any
    [padded_num, K, K] array — the whole point is O(local_pad * K^2) peak
    (VERDICT round 1: the unchunked buffer is 667 MB/device at ml-25M)."""
    train, test = data
    cfg = Config(
        num_latent=6, nsims=2, burnin=1, n_devices=8,
        comm_mode="reduce", reduce_chunked="on",
    )
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    import jax.numpy as jnp

    jaxpr = jax.make_jaxpr(
        lambda *a: s._iter_impl(*a)
    )(
        s.state_m, s.state_u, s.est,
        s.movies_gdata, s.movies_rdata, s.users_gdata, s.users_rdata,
        s.ev, s.key, jnp.asarray(0, jnp.int32),
        s._aux["movs"]["dense"], s._aux["users"]["dense"], s._codes,
        s._maps_arg("movs"), s._maps_arg("users"),
    )
    txt = str(jaxpr)
    k = cfg.num_latent
    for side in (s.movies, s.users):
        pn, lp = side.maps.padded_num, side.maps.local_pad
        assert pn > lp  # 8 devices -> global is bigger than a shard
        assert f"f32[{pn},{k},{k}]" not in txt, (
            f"global [{pn},{k},{k}] stat buffer found in chunked program"
        )


def test_predict_sharded_matches_single_device():
    """Entry-sharded eval (parallel/spmd.predict_sharded): padded +
    masked + psum'd error sums must reproduce the single-device predict
    exactly (same Welford per-entry values, same rmse scalars) for an
    nnz_t that is NOT a device multiple."""
    import jax.numpy as jnp

    from bpmf_tpu.models.bpmf import EvalData, EvalState, predict
    from bpmf_tpu.parallel.mesh import make_mesh
    from bpmf_tpu.parallel.spmd import AXIS, predict_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    # factor tables are mesh-sharded (divisible by 8, like the sampler's
    # padded_num); nnz_t deliberately NOT a device multiple
    n_u, n_m, k, nnz = 32, 24, 6, 37
    tu = rng.integers(0, n_u, nnz).astype(np.int32)
    ti = rng.integers(0, n_m, nnz).astype(np.int32)
    tv = rng.normal(size=nnz).astype(np.float32)
    mean_rating = jnp.asarray(0.37, jnp.float32)

    ev1 = EvalData(jnp.asarray(tu), jnp.asarray(ti), jnp.asarray(tv))
    est1 = EvalState(jnp.zeros(nnz), jnp.zeros(nnz))

    mesh = make_mesh(8)
    pad = (-nnz) % 8
    valid = np.ones(nnz + pad, np.float32)
    valid[nnz:] = 0.0

    def sh(x):
        return jax.device_put(x, NamedSharding(mesh, P(AXIS)))

    ev8 = EvalData(
        sh(jnp.asarray(np.pad(tu, (0, pad)))),
        sh(jnp.asarray(np.pad(ti, (0, pad)))),
        sh(jnp.asarray(np.pad(tv, (0, pad)))),
        sh(jnp.asarray(valid)),
    )
    est8 = EvalState(sh(jnp.zeros(nnz + pad)), sh(jnp.zeros(nnz + pad)))

    for it in range(4):  # crosses the burnin reset at it == burnin
        u = jnp.asarray(rng.normal(size=(n_u, k)).astype(np.float32))
        m = jnp.asarray(rng.normal(size=(n_m, k)).astype(np.float32))
        itj = jnp.asarray(it, jnp.int32)
        est1, r1, ra1 = predict(
            ev1, est1, u, m, itj, mean_rating=mean_rating, burnin=2
        )
        est8, r8, ra8 = predict_sharded(
            mesh, ev8, est8, u, m, itj, mean_rating=mean_rating, burnin=2
        )
        np.testing.assert_allclose(float(r1), float(r8), rtol=1e-6)
        np.testing.assert_allclose(float(ra1), float(ra8), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(est1.pavg), np.asarray(est8.pavg)[:nnz], rtol=1e-6
        )


def test_fused_eval_matches_split(data):
    """The one-gather stacked-table eval (fused_eval_gather, default on via
    'auto') fetches the same rows and forms the same products as the
    two-gather split form — models/bpmf.predict claims bit-identical
    values; this asserts it end-to-end: per-run RMSE scalars and the final
    Pavg/Pm2 Welford state must be EXACTLY equal, on both the single-device
    predict and the 8-device entry-sharded predict_sharded paths
    (c++/sample.cpp:48-96)."""
    train, test = data
    for n_dev in (1, 8):
        runs = {}
        for fused in ("off", "on"):
            cfg = Config(num_latent=6, burnin=3, nsims=8, n_devices=n_dev,
                         fused_eval_gather=fused)
            s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
            r = s.run()
            nnz_t = len(s.t_val)
            runs[fused] = (
                r, s.rmse,
                np.asarray(jax.device_get(s.est.pavg))[:nnz_t],
                np.asarray(jax.device_get(s.est.pm2))[:nnz_t],
            )
        assert runs["on"][0] == runs["off"][0], n_dev      # rmse_avg
        assert runs["on"][1] == runs["off"][1], n_dev      # rmse
        np.testing.assert_array_equal(runs["on"][2], runs["off"][2])
        np.testing.assert_array_equal(runs["on"][3], runs["off"][3])


def test_halo_gather_matches_all_gather():
    """halo_gather (connectivity-aware value exchange, opt_conn analog)
    must reproduce the all_gather buffer on every referenced row."""
    import jax.numpy as jnp

    from bpmf_tpu.parallel import partition as part
    from bpmf_tpu.parallel.mesh import make_mesh
    from bpmf_tpu.parallel.spmd import AXIS, halo_gather
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scipy import sparse as sp_m

    rng = np.random.default_rng(5)
    n_this, n_other, k, d = 26, 41, 4, 8
    m = sp_m.random(n_other, n_this, density=0.12, random_state=3,
                    format="csc")
    this_maps = part.make_maps(
        part.assign_items(np.diff(m.indptr), d), n_this
    )
    other_deg = np.diff(m.tocsr().indptr)
    other_maps = part.make_maps(part.assign_items(other_deg, d), n_other)
    hl = part.build_halo_layout(m, this_maps, other_maps)

    mesh = make_mesh(d)
    lp = other_maps.local_pad
    table = rng.normal(size=(d * lp, k)).astype(np.float32)

    def body(other_l, send_l, recv_l):
        return halo_gather(other_l, tuple(x[0] for x in send_l),
                           tuple(x[0] for x in recv_l), d)

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS, None),
                  tuple(P(AXIS, None) for _ in hl.send_rows),
                  tuple(P(AXIS, None) for _ in hl.recv_pos)),
        out_specs=P(AXIS, None),  # [D * D*lp, K]: each device's full buffer
        check_vma=False,
    )(
        jnp.asarray(table),
        tuple(jnp.asarray(a) for a in hl.send_rows),
        tuple(jnp.asarray(a) for a in hl.recv_pos),
    )
    out = np.asarray(out).reshape(d, d * lp, k)
    other_map = np.asarray(other_maps.orig_to_padded)
    for t in range(d):
        ids = this_maps.ids_per_dev[t]
        needed = np.unique(other_map[np.unique(m[:, ids].tocoo().row)])
        np.testing.assert_array_equal(out[t][needed], table[needed])
        own = slice(t * lp, (t + 1) * lp)  # own shard always present
        np.testing.assert_array_equal(out[t][own], table[own])


def test_halo_mode_matches_all_gather_trajectory(data):
    """Forced halo exchange on the bucketed gather path must reproduce the
    plain all_gather trajectory (same values on every referenced row)."""
    train, test = data
    r0, u0, v0 = _run(train, test, n_devices=8, gram_impl="bucketed",
                      halo="off")
    r1, u1, v1 = _run(train, test, n_devices=8, gram_impl="bucketed",
                      halo="on")
    assert abs(r0 - r1) < 1e-6
    np.testing.assert_allclose(u0, u1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(v0, v1, rtol=1e-6, atol=1e-6)


def test_halo_layout_empty_shards():
    """build_halo_layout with fewer items than devices: empty destination
    shards contribute no halo rows and the tables stay well-formed."""
    from scipy import sparse as sp_m

    from bpmf_tpu.parallel import partition as part

    m = sp_m.random(12, 5, density=0.3, random_state=0, format="csc")
    tm = part.make_maps(part.assign_items(np.diff(m.indptr), 8), 5)
    om = part.make_maps(
        part.assign_items(np.diff(m.tocsr().indptr), 8), 12
    )
    hl = part.build_halo_layout(m, tm, om)
    d, lp = 8, om.local_pad
    # per-round tables: D-1 rounds, each [D, H_r] with 8-aligned H_r
    assert len(hl.send_rows) == d - 1 and len(hl.recv_pos) == d - 1
    for sr, rp in zip(hl.send_rows, hl.recv_pos):
        assert sr.shape[0] == d and rp.shape == sr.shape
        assert sr.shape[1] % 8 == 0 and sr.shape[1] <= hl.halo_rows
        # send rows index into the source shard; recv positions are
        # in-range padded global ids or the dump slot
        assert sr.min() >= 0 and sr.max() < lp
        assert rp.min() >= 0 and rp.max() <= om.padded_num
    assert hl.pair_counts.shape == (d, d)
    assert hl.pair_counts.diagonal().sum() == 0
    # every real recv position is consistent with its send row
    for r in range(1, d):
        sr, rp = hl.send_rows[r - 1], hl.recv_pos[r - 1]
        for s in range(d):
            t = (s + r) % d
            real = rp[t] < om.padded_num
            assert real.sum() == hl.pair_counts[s, t]
            np.testing.assert_array_equal(
                rp[t][real], s * lp + sr[s][: real.sum()]
            )
