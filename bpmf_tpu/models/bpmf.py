"""BPMF model: per-side state, half-sweep, prediction, full Gibbs iteration.

The reference couples all of this into ``struct Sys`` (c++/bpmf.h:112-239)
with virtual comm hooks.  Here the model is a pure-functional pytree program:
one call of :func:`gibbs_iter` is one full Gibbs iteration — sample movies
given users, sample users given movies, evaluate — exactly the reference
main loop body (c++/bpmf.cpp:180-210), jitted as a single XLA program.

Semantics note (SURVEY §7 risk 6): the reference's in-place OpenMP sweep
reads only the *other* side's items, which are frozen during a half-sweep
(c++/sample.cpp:254), so this whole-side functional update is semantically
identical to the sequential C++ loop; only the RNG stream differs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from bpmf_tpu.ops.cholsolve import get_solver
from bpmf_tpu.ops.mvnormal import HyperParams, sample_hyper
from bpmf_tpu.ops.update import (
    BucketDev,
    gram_rhs,
    item_noise,
    posterior_precision_rhs,
)


class SideState(NamedTuple):
    """Mutable per-side sampler state (one for movies, one for users).

    Mirrors Sys fields: items (c++/bpmf.h:193-194), sum/cov/norm
    (c++/bpmf.h:221-223), hp (c++/bpmf.h:226), aggrMu/aggrLambda
    (c++/bpmf.h:212-213; `aggr_prod` holds the running sum of u u').

    ``aggr_prod`` stores only the packed lower triangle — u_valid (x) u is
    symmetric per item (validity is a per-item scalar), so the full
    [num_pad, K, K] form wastes ~half the aggregation's HBM read+write
    every post-burn-in half-sweep (686 MB of state at chembl's 167k
    items, 910 MB at ml-25M).  Pair order is column-major over columns j,
    rows i=j..K-1 (:func:`aggr_pair_indices`); hosts expand with
    :func:`aggr_prod_full` at finalize/checkpoint time.
    """

    items: jax.Array            # [num_pad, K]
    hp: HyperParams
    sum: jax.Array              # [K]
    cov: jax.Array              # [K, K]
    norm: jax.Array             # scalar — sum of squared norms
    aggr_mu: Optional[jax.Array] = None    # [num_pad, K]
    aggr_prod: Optional[jax.Array] = None  # [num_pad, K(K+1)/2] packed


class SideData(NamedTuple):
    """Constant device data for one side (built once from BucketedSide)."""

    buckets: tuple[BucketDev, ...]
    prop_mu: Optional[jax.Array] = None      # [num_pad, K]
    prop_lambda: Optional[jax.Array] = None  # [num_pad, K, K]


class EvalData(NamedTuple):
    """Test ratings as COO triples (shared by both sides — the reference
    keeps transposed copies in each Sys; one copy suffices).

    ``valid`` marks real entries when the triples are padded (the
    entry-sharded multi-device eval pads nnz_t up to the device count);
    None means every entry is real."""

    t_user: jax.Array  # [nnz_t] int32 — row index (user)
    t_item: jax.Array  # [nnz_t] int32 — col index (movie)
    t_val: jax.Array   # [nnz_t]
    valid: Optional[jax.Array] = None  # [nnz_t] 0/1 mask, or None


class EvalState(NamedTuple):
    """Welford running mean/M2 of the prediction per test entry
    (Pavg / Pm2, c++/bpmf.h:229-230)."""

    pavg: jax.Array  # [nnz_t]
    pm2: jax.Array   # [nnz_t]


class Metrics(NamedTuple):
    rmse: jax.Array
    rmse_avg: jax.Array
    norm_users: jax.Array   # ||U||_F
    norm_movies: jax.Array  # ||V||_F


def aggr_pair_indices(k: int):
    """(ii, jj) numpy index pairs of the packed aggr_prod layout:
    column-major lower triangle, length k(k+1)/2."""
    import numpy as np

    pairs = [(i, j) for j in range(k) for i in range(j, k)]
    ii = np.asarray([p[0] for p in pairs], np.int32)
    jj = np.asarray([p[1] for p in pairs], np.int32)
    return ii, jj


def aggr_prod_update(uv: jax.Array, u: jax.Array) -> jax.Array:
    """Packed-triangle outer-product batch [S, k(k+1)/2]: entry (i, j),
    i >= j, holds uv[:, i] * u[:, j] — equal to the full product's (j, i)
    mirror because uv = u * valid with a per-item scalar valid.  Built
    from static slices (a lane-dim jnp.take over k=32 would lower to a
    gather); XLA fuses the k pieces into one elementwise kernel."""
    k = u.shape[-1]
    return jnp.concatenate(
        [uv[:, j:] * u[:, j : j + 1] for j in range(k)], axis=1
    )


def aggr_prod_full(packed, k: int):
    """Host-side expansion of the packed aggr_prod back to the full
    symmetric [..., k, k] (finalize_mu_lambda / checkpoint format)."""
    import numpy as np

    ii, jj = aggr_pair_indices(k)
    full = np.zeros(packed.shape[:-1] + (k, k), packed.dtype)
    full[..., ii, jj] = packed
    full[..., jj, ii] = packed
    return full


def aggr_prod_pack(full):
    """Host-side inverse of :func:`aggr_prod_full` (checkpoint load)."""
    k = full.shape[-1]
    ii, jj = aggr_pair_indices(k)
    return full[..., ii, jj]


def init_side_state(
    num_pad: int,
    num_latent: int,
    dtype,
    aggregate: bool,
) -> SideState:
    """Zero-init (Sys::init, c++/sample.cpp:179-201)."""
    k = num_latent
    return SideState(
        items=jnp.zeros((num_pad, k), dtype),
        hp=HyperParams.init(k, dtype),
        sum=jnp.zeros((k,), dtype),
        cov=jnp.zeros((k, k), dtype),
        norm=jnp.zeros((), dtype),
        aggr_mu=jnp.zeros((num_pad, k), dtype) if aggregate else None,
        aggr_prod=(jnp.zeros((num_pad, k * (k + 1) // 2), dtype)
                   if aggregate else None),
    )


def sweep_core(
    items: jax.Array,
    aggr_mu: Optional[jax.Array],
    aggr_prod: Optional[jax.Array],
    data: SideData,
    other_items: jax.Array,
    hp,
    side_key: jax.Array,
    it: jax.Array,
    *,
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    splits: Sequence[bool],
    diagonal_only: bool = False,
    strict_reference: bool = True,
    noise_scale: float = 1.0,
    solver: str = "unrolled",
    noise_num: Optional[int] = None,
    gather_dtype=None,
    ablate: str = "",
):
    """Resample the items covered by ``data.buckets`` and accumulate
    (sum, prod, norm) and optional post-burnin aggregates.  Shared by the
    single-device path and the shard_map SPMD body (where ``items`` and the
    buckets are the device-local shard).

    Two stages: (1) per degree bucket, the MXU Gram/rhs accumulation —
    shapes differ per bucket; (2) all buckets concatenated into ONE batched
    prior-combine + Cholesky-solve-sample + scatter + stats pass, so the
    O(num_items) part of the program appears once regardless of how many
    degree buckets exist."""
    k = other_items.shape[-1]
    dtype = other_items.dtype

    grams, rhss, ids, origs, valids = [], [], [], [], []
    for b, bucket in enumerate(data.buckets):
        n_slots = bucket.item_ids.shape[0]
        g, r = gram_rhs(
            bucket, other_items, mean_rating, alpha,
            split=splits[b], n_slots=n_slots, gather_dtype=gather_dtype,
            ablate=ablate,
        )
        grams.append(g)
        rhss.append(r)
        ids.append(bucket.item_ids)
        origs.append(bucket.orig_ids)
        valids.append(bucket.slot_valid)

    gram = jnp.concatenate(grams) if len(grams) > 1 else grams[0]
    rhs = jnp.concatenate(rhss) if len(rhss) > 1 else rhss[0]
    item_ids = jnp.concatenate(ids) if len(ids) > 1 else ids[0]
    orig_ids = jnp.concatenate(origs) if len(origs) > 1 else origs[0]
    slot_valid = jnp.concatenate(valids) if len(valids) > 1 else valids[0]

    precision, full_rhs = posterior_precision_rhs(
        gram, rhs, item_ids, hp, alpha,
        prop_mu=data.prop_mu, prop_lambda=data.prop_lambda,
        diagonal_only=diagonal_only, strict_reference=strict_reference,
    )
    if "nonoise" in ablate.split(","):   # perf-debug
        noise = jnp.zeros((orig_ids.shape[0], k), dtype)
    else:
        noise = item_noise(side_key, orig_ids, k, dtype, num=noise_num)
    if noise_scale != 1.0:  # test hook: deterministic posterior-mean checks
        noise = noise * noise_scale
    u = get_solver(solver)(precision, full_rhs, noise)

    uv = u * slot_valid[:, None]
    items = items.at[item_ids].set(u, mode="drop")
    s = uv.sum(axis=0)
    prod = jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype)
    norm = jnp.vdot(uv, u)
    aggr_on = jnp.asarray(it >= burnin, dtype)
    if aggr_mu is not None:
        # aggrMu/aggrLambda accumulation post-burnin (c++/sample.cpp:364-368)
        aggr_mu = aggr_mu.at[item_ids].add(uv * aggr_on, mode="drop")
        aggr_prod = aggr_prod.at[item_ids].add(
            aggr_prod_update(uv * aggr_on, u), mode="drop"
        )
    return items, s, prod, norm, aggr_mu, aggr_prod


def half_sweep(
    state: SideState,
    data: SideData,
    other_items: jax.Array,
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    splits: Sequence[bool],
    diagonal_only: bool = False,
    strict_reference: bool = True,
    noise_scale: float = 1.0,
    solver: str = "unrolled",
    psum_axis: Optional[str] = None,
) -> SideState:
    """Resample every item of one side given the other side's items
    (Sys::sample(Sys&), c++/sample.cpp:341-385).

    ``num`` is the GLOBAL item count of this side (the reference uses global
    num() for both the hyperprior N and the covariance denominator even in
    distributed runs, c++/sample.cpp:350,379-384).  Under SPMD
    (``psum_axis``), sum/prod/norm partials are psum'd before forming the
    covariance — giving the *exact* global covariance, unlike the
    reference's missing-cross-terms approximation (SURVEY §2 quirks).
    """
    # Hyperprior resample from the previous sweep's stats
    # (c++/sample.cpp:349-350).
    hp = sample_hyper(jax.random.fold_in(key, 0), num, state.sum, state.cov)

    items, s, prod, norm, aggr_mu, aggr_prod = sweep_core(
        state.items,
        state.aggr_mu,
        state.aggr_prod,
        data,
        other_items,
        hp,
        jax.random.fold_in(key, 1),
        it,
        mean_rating=mean_rating,
        alpha=alpha,
        burnin=burnin,
        splits=splits,
        diagonal_only=diagonal_only,
        strict_reference=strict_reference,
        noise_scale=noise_scale,
        solver=solver,
        noise_num=num,
    )

    if psum_axis is not None:
        s = jax.lax.psum(s, psum_axis)
        prod = jax.lax.psum(prod, psum_axis)
        norm = jax.lax.psum(norm, psum_axis)

    # cov = (prod - sum sum' / N) / (N - 1) with global N
    # (c++/sample.cpp:379-384); exact across shards here.
    n_f = jnp.asarray(num, other_items.dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)

    return SideState(
        items=items,
        hp=hp,
        sum=s,
        cov=cov,
        norm=norm,
        aggr_mu=aggr_mu,
        aggr_prod=aggr_prod,
    )


def predict(
    ev: EvalData,
    est: EvalState,
    user_items: jax.Array,
    movie_items: jax.Array,
    it: jax.Array,
    *,
    mean_rating: jax.Array,
    burnin: int,
    gather_dtype=None,
    axis_name=None,
    nnz_true: Optional[int] = None,
    fused_gather: bool = False,
) -> tuple[EvalState, jax.Array, jax.Array]:
    """RMSE of the instantaneous sample and the running posterior-mean
    prediction (Welford), Sys::predict (c++/sample.cpp:48-96).

    n resets during burnin exactly as the reference: n = max(0, it - burnin);
    at n==0 the average is overwritten with the current prediction and M2
    resets to 0 (c++/sample.cpp:84-86).

    ``gather_dtype`` (e.g. bf16 on TPU, mirroring the matmul-dtype policy,
    config.py) halves the HBM traffic of the two test-entry row gathers —
    the dominant cost of this op; the dot still accumulates in the state
    dtype.

    Inside a shard_map body (the entry-sharded multi-device eval,
    parallel/spmd.predict_sharded) ``ev``/``est`` hold this device's entry
    shard, ``ev.valid`` masks the padding entries, and ``axis_name`` makes
    the error sums global via psum; the per-entry Welford state is exactly
    the single-device state, just distributed.
    """
    n = jnp.maximum(it - burnin, 0)
    dtype = user_items.dtype
    if gather_dtype is not None and gather_dtype != dtype:
        user_items = user_items.astype(gather_dtype)
        movie_items = movie_items.astype(gather_dtype)
    if fused_gather:
        # One gather over the stacked [n_users + n_movies, K] table instead
        # of two: the XLA row gather's cost is dominated by a per-op fixed
        # term at test-set row counts (scripts/eval_gather_probe.py: a
        # single gather takes ~0.52 ms whether it fetches 100k or 800k
        # rows), so halving the op count nearly halves the eval phase.
        # Values are bit-identical to the split form — same rows, same
        # products (asserted end-to-end by test_fused_eval_matches_split).
        # The stacked index vector is loop-invariant (t_user / t_item are
        # scan constants) and hoisted by XLA; the [*, K] table concat costs
        # one O((n_users + n_movies) * K) copy per iteration — ~1 MB at
        # ml-1m, ~28 MB at ml-25M (still <0.1% of that iteration's HBM
        # traffic).
        nnz = ev.t_user.shape[0]
        table = jnp.concatenate([user_items, movie_items], axis=0)
        idx = jnp.concatenate(
            [ev.t_user, ev.t_item + user_items.shape[0]])
        um = table[idx]          # [2*nnz_t, K]
        u, m = um[:nnz], um[nnz:]
    else:
        u = user_items[ev.t_user]    # [nnz_t, K]
        m = movie_items[ev.t_item]   # [nnz_t, K]
    pred = jnp.sum((u * m).astype(dtype), axis=-1) + mean_rating

    delta = pred - est.pavg
    n_f = jnp.asarray(n, dtype)
    avg = jnp.where(n == 0, pred, est.pavg + delta / jnp.maximum(n_f, 1.0))
    m2 = jnp.where(n == 0, 0.0, est.pm2 + delta * (pred - avg))

    if ev.valid is None:
        se = jnp.sum((ev.t_val - pred) ** 2)
        se_avg = jnp.sum((ev.t_val - avg) ** 2)
        nump = jnp.asarray(ev.t_val.shape[0], dtype)
    else:
        se = jnp.sum(ev.valid * (ev.t_val - pred) ** 2)
        se_avg = jnp.sum(ev.valid * (ev.t_val - avg) ** 2)
        # the true entry count is statically known to the caller; a runtime
        # float sum of the mask can lose integer exactness past 2^24
        # entries per shard, so prefer the constant
        nump = (jnp.asarray(nnz_true, dtype) if nnz_true is not None
                else jnp.sum(ev.valid))
    if axis_name is not None:
        se, se_avg = jax.lax.psum((se, se_avg), axis_name)
        if nnz_true is not None:
            nump = jnp.asarray(nnz_true, dtype)  # already the GLOBAL count
        else:
            nump = jax.lax.psum(nump, axis_name)
    rmse = jnp.sqrt(se / nump)
    rmse_avg = jnp.sqrt(se_avg / nump)
    return EvalState(pavg=avg, pm2=m2), rmse, rmse_avg


def predict_deferred(
    ev: EvalData,
    est: EvalState,
    users_stack: jax.Array,   # [n, pn_u, K] — iteration c's U table
    movies_stack: jax.Array,  # [n, pn_m, K]
    it0: jax.Array,           # iteration number of stack slot 0
    *,
    mean_rating: jax.Array,
    burnin: int,
    gather_dtype=None,
) -> tuple[EvalState, jax.Array, jax.Array]:
    """Chunk-batched :func:`predict`: same per-iteration math and outputs,
    with the 2n per-iteration test-entry row gathers (the ml-1m
    iteration's largest single cost, docs/PERF.md §predict) replaced by 2
    gathers of n x nnz_t rows from the stacked per-iteration factor tables
    — the XLA row gather's per-row cost IMPROVES with gather size
    (scripts/eval_gather_probe.py), and predict needs nothing but the
    tables, so deferral to the chunk boundary is trajectory-exact.
    The Welford recurrence (sequential in n by construction) runs as a
    cheap elementwise scan over the pre-gathered predictions."""
    n, pn_u, k = users_stack.shape
    pn_m = movies_stack.shape[1]
    dtype = users_stack.dtype
    if gather_dtype is not None and gather_dtype != dtype:
        users_stack = users_stack.astype(gather_dtype)
        movies_stack = movies_stack.astype(gather_dtype)
    nnz = ev.t_user.shape[0]
    steps = jnp.arange(n, dtype=ev.t_user.dtype)
    iu = (steps[:, None] * pn_u + ev.t_user[None, :]).reshape(-1)
    im = (steps[:, None] * pn_m + ev.t_item[None, :]).reshape(-1)
    gu = users_stack.reshape(n * pn_u, k).at[iu].get(
        mode="promise_in_bounds")
    gm = movies_stack.reshape(n * pn_m, k).at[im].get(
        mode="promise_in_bounds")
    preds = (jnp.sum((gu * gm).astype(dtype), axis=-1).reshape(n, nnz)
             + mean_rating)

    nump = (jnp.asarray(nnz, dtype) if ev.valid is None
            else jnp.sum(ev.valid))

    def body(carry, inp):
        pavg, pm2 = carry
        pred, it = inp
        nn = jnp.maximum(it - burnin, 0)
        delta = pred - pavg
        n_f = jnp.asarray(nn, dtype)
        avg = jnp.where(nn == 0, pred, pavg + delta / jnp.maximum(n_f, 1.0))
        m2 = jnp.where(nn == 0, 0.0, pm2 + delta * (pred - avg))
        if ev.valid is None:
            se = jnp.sum((ev.t_val - pred) ** 2)
            se_avg = jnp.sum((ev.t_val - avg) ** 2)
        else:
            se = jnp.sum(ev.valid * (ev.t_val - pred) ** 2)
            se_avg = jnp.sum(ev.valid * (ev.t_val - avg) ** 2)
        return (avg, m2), (jnp.sqrt(se / nump), jnp.sqrt(se_avg / nump))

    its = it0 + jnp.arange(n, dtype=it0.dtype)
    (pavg, pm2), (rmse, rmse_avg) = jax.lax.scan(
        body, (est.pavg, est.pm2), (preds, its)
    )
    return EvalState(pavg=pavg, pm2=pm2), rmse, rmse_avg


def gibbs_iter(
    movies: SideState,
    users: SideState,
    est: EvalState,
    movies_data: SideData,
    users_data: SideData,
    ev: EvalData,
    key: jax.Array,
    it: jax.Array,
    *,
    num_movies: int,
    num_users: int,
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    movies_splits: Sequence[bool],
    users_splits: Sequence[bool],
    diagonal_only: bool = False,
    strict_reference: bool = True,
    noise_scale: float = 1.0,
    solver: str = "unrolled",
) -> tuple[SideState, SideState, EvalState, Metrics]:
    """One full Gibbs iteration (c++/bpmf.cpp:184-196): movies given users,
    users given movies, then evaluation."""
    key_it = jax.random.fold_in(key, it)
    movies = half_sweep(
        movies,
        movies_data,
        users.items,
        jax.random.fold_in(key_it, 0),
        it,
        num=num_movies,
        mean_rating=mean_rating,
        alpha=alpha,
        burnin=burnin,
        splits=movies_splits,
        diagonal_only=diagonal_only,
        strict_reference=strict_reference,
        noise_scale=noise_scale,
        solver=solver,
    )
    users = half_sweep(
        users,
        users_data,
        movies.items,
        jax.random.fold_in(key_it, 1),
        it,
        num=num_users,
        mean_rating=mean_rating,
        alpha=alpha,
        burnin=burnin,
        splits=users_splits,
        diagonal_only=diagonal_only,
        strict_reference=strict_reference,
        noise_scale=noise_scale,
        solver=solver,
    )
    est, rmse, rmse_avg = predict(
        ev,
        est,
        users.items,
        movies.items,
        it,
        mean_rating=mean_rating,
        burnin=burnin,
    )
    metrics = Metrics(
        rmse=rmse,
        rmse_avg=rmse_avg,
        norm_users=jnp.sqrt(users.norm),
        norm_movies=jnp.sqrt(movies.norm),
    )
    return movies, users, est, metrics
