"""The single SPMD training program replacing the reference's nine
communication backends (SURVEY.md §2 #8-#18).

Two exchange modes over a 1-D device mesh (axis ``'i'``), selected at
runtime instead of compile time:

* ``gather`` — value exchange: U and V are sharded over the mesh; before a
  half-sweep the frozen other side is ``all_gather``-ed and each device
  resamples its own item shard.  This is the MPI_BCAST / MPI_ISEND /
  MPI_PUT / GASPI / ArgoDSM family (their differences are overlap
  strategies that XLA owns on ICI).  On sparse connectivity the
  all_gather can be replaced by :func:`halo_gather` (``Config.halo``) —
  the opt_conn analog exchanging only referenced rows.
* ``reduce`` — statistic exchange (ENABLE_REDUCE, MPI_REDUCE /
  MPI_ALLREDUCE): the other side is NOT gathered; each device computes
  partial per-item (Gram, rhs) from the edges whose other-side endpoint it
  owns (preComputeMuLambda's local_only filter, c++/sample.cpp:248-258) and
  a ``psum_scatter`` lands the summed statistics on the owner shard, which
  then solves for its items in one batched Cholesky.

Both modes psum (sum, prod, norm) each half-sweep — the analog of
``reduce_sum_cov_norm()`` (c++/mpi_common.h:44-50) — and compute the EXACT
global covariance (the reference's multi-rank covariance drops cross-rank
terms, c++/sample.cpp:379-384; single-rank runs agree exactly).

Per-item noise is keyed by original item id (ops/update.item_noise), so
gather and reduce modes on any device count produce the same trajectory up
to float reduction order.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from bpmf_tpu.models.bpmf import (
    SideData,
    SideState,
    aggr_prod_update,
    sweep_core,
)
from bpmf_tpu.ops.mvnormal import HyperParams, sample_hyper
from bpmf_tpu.ops.cholsolve import get_solver
from bpmf_tpu.ops.update import (
    BucketDev,
    gram_rhs,
    item_noise,
    posterior_precision_rhs,
)

AXIS = "i"


def _hyper(key, num, state, ablate):
    """sample_hyper, or the fixed init value under ablate='nohyper'
    (perf-debug: isolates the hyperprior resample's small-op chain)."""
    from bpmf_tpu.ops.mvnormal import HyperParams

    if "nohyper" in ablate.split(","):
        k = state.sum.shape[-1]
        return HyperParams.init(k, state.sum.dtype)
    return sample_hyper(key, num, state.sum, state.cov)


def _noise(side_key, ids, k, dtype, num, ablate):
    """item_noise, or zeros under ablate='nonoise' (perf-debug: isolates
    the per-side threefry noise table)."""
    if "nonoise" in ablate.split(","):
        return jnp.zeros((ids.shape[0], k), dtype)
    return item_noise(side_key, ids, k, dtype, num=num)



def _combine_prior_rhs(rhs_t, hp, prior_tri_l, prior_rhs_l, dtype):
    """rhs + prior contribution, [K, I] (c++/sample.cpp:272-285).

    Per-item propagated prior: the static rhs when available
    (strict_reference=False), else the sampled hyper-mean quirk
    Lambda_i @ hp.mu (c++/sample.cpp:285).  Shared prior: Lambda @ mu.
    One place for all three fused sweeps so the quirk/dtype handling
    cannot diverge between them."""
    if prior_tri_l is not None:
        from bpmf_tpu.ops.pallas_solve import prior_rhs_from_tri

        prior_rhs = (prior_rhs_l if prior_rhs_l is not None
                     else prior_rhs_from_tri(prior_tri_l, hp.mu))
        return rhs_t.astype(dtype) + prior_rhs
    prior_rhs = hp.lambda_f @ hp.mu                              # [K]
    return rhs_t.astype(dtype) + prior_rhs[:, None]


def _bucket_specs():
    return BucketDev(
        nbr=P(AXIS, None, None),
        val=P(AXIS, None, None),
        mask=P(AXIS, None, None),
        row_slot=P(AXIS, None),
        item_ids=P(AXIS, None),
        orig_ids=P(AXIS, None),
        slot_valid=P(AXIS, None),
    )


def _take0(b: BucketDev) -> BucketDev:
    """Inside shard_map the stacked [D, ...] arrays arrive as [1, ...]."""
    return BucketDev(*(x[0] for x in b))


def halo_gather(
    other_l: jax.Array,      # [lp, K] this device's shard of the frozen side
    send_rows: tuple,        # per round r=1..D-1: [H_r] local rows to send
                             # to (me+r) % D
    recv_pos: tuple,         # per round: [H_r] global positions for the
                             # rows received from (me-r) % D
    n_devices: int,
) -> jax.Array:
    """Connectivity-aware replacement for the frozen-side ``all_gather``
    (partition.HaloLayout; opt_conn analog, c++/assign.cpp:215-286).

    D-1 ``ppermute`` rounds on a ring schedule; round r sends each device's
    [H_r, K] payload to (me+r) % D and scatters the rows received from
    (me-r) % D at their padded global positions.  Payload widths are
    per-round statics (partition.build_halo_layout), so a single heavy pair
    only inflates its own round.  Padding entries land on a dump slot past
    the buffer end.  Returns a [D*lp, K] buffer identical to the all_gather
    result on every row any bucket references; unreferenced rows are zero
    (read only under a zero mask, ops/update.gram_rhs)."""
    lp, k = other_l.shape
    n_global = n_devices * lp
    me = lax.axis_index(AXIS)
    buf = jnp.zeros((n_global + 1, k), other_l.dtype)
    # the zero must match axis_index's int32 under jax_enable_x64
    buf = lax.dynamic_update_slice(
        buf, other_l, (me * lp, jnp.zeros((), me.dtype))
    )
    for r in range(1, n_devices):
        payload = jnp.take(other_l, send_rows[r - 1], axis=0)
        recv = lax.ppermute(
            payload, AXIS,
            perm=[(i, (i + r) % n_devices) for i in range(n_devices)],
        )
        buf = buf.at[recv_pos[r - 1]].set(recv)
    return buf[:n_global]


def gather_half_sweep(
    mesh: Mesh,
    state: SideState,
    data: SideData,            # buckets stacked [D, ...]; prop in padded layout
    other_items: jax.Array,    # [D*local_pad_other, K] sharded
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    splits,
    diagonal_only: bool,
    strict_reference: bool,
    noise_scale: float,
    solver: str = "unrolled",
    matmul_dtype: str = "float32",
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
    halo: tuple = (None, None),        # (send_rows, recv_pos): per-round
                                       # tuples of [D, H_r] device arrays
) -> SideState:
    """Value-exchange half-sweep (Sys::sample + bcast-family comm).

    ``halo``: when set (partition.HaloLayout device arrays), the frozen
    side is exchanged connectivity-aware via :func:`halo_gather` instead of
    a full all_gather — same values on every referenced row."""
    dtype = other_items.dtype
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)

    has_aggr = state.aggr_mu is not None
    has_prop = data.prop_mu is not None
    has_halo = halo[0] is not None
    n_dev = mesh.shape[AXIS]

    def body(items_l, aggr_mu_l, aggr_prod_l, prop_mu_l, prop_lambda_l,
             other_l, halo_send_l, halo_recv_l, *buckets_flat):
        buckets = tuple(
            _take0(BucketDev(*buckets_flat[j * 7 : (j + 1) * 7]))
            for j in range(len(splits))
        )
        if halo_send_l is not None:
            other_full = halo_gather(
                other_l,
                tuple(x[0] for x in halo_send_l),
                tuple(x[0] for x in halo_recv_l),
                n_dev,
            )
        else:
            other_full = lax.all_gather(other_l, AXIS, tiled=True)
        local_data = SideData(
            buckets=buckets, prop_mu=prop_mu_l, prop_lambda=prop_lambda_l
        )
        items_l, s, prod, norm, aggr_mu_l, aggr_prod_l = sweep_core(
            items_l,
            aggr_mu_l,
            aggr_prod_l,
            local_data,
            other_full,
            hp,
            side_key,
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
            gather_dtype=(
                jnp.bfloat16 if matmul_dtype == "bfloat16" else None
            ),
            ablate=ablate,
        )
        # reduce_sum_cov_norm (c++/mpi_common.h:44-50) as one fused psum
        s = lax.psum(s, AXIS)
        prod = lax.psum(prod, AXIS)
        norm = lax.psum(norm, AXIS)
        return items_l, aggr_mu_l, aggr_prod_l, s, prod, norm

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    prop_mu_spec = P(AXIS, None) if has_prop else P()
    prop_lam_spec = P(AXIS, None, None) if has_prop else P()
    bspecs = _bucket_specs()
    in_specs = (
        P(AXIS, None),            # items
        aggr_spec,
        aggr_prod_spec,
        prop_mu_spec,
        prop_lam_spec,
        P(AXIS, None),            # other items
        # halo send_rows / recv_pos: per-round [D, H_r] arrays
        tuple(P(AXIS, None) for _ in halo[0]) if has_halo else P(),
        tuple(P(AXIS, None) for _ in halo[1]) if has_halo else P(),
    ) + tuple(s for _ in splits for s in bspecs)
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )

    buckets_flat = tuple(x for b in data.buckets for x in b)
    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        state.items,
        state.aggr_mu,
        state.aggr_prod,
        data.prop_mu,
        data.prop_lambda,
        other_items,
        halo[0],
        halo[1],
        *buckets_flat,
    )

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def dense_half_sweep(
    mesh: Mesh,
    state: SideState,
    a_ind: jax.Array,          # [D*local_pad, other_padded] 0/1 indicator,
                               # PRE-CAST to the matmul dtype (bf16 on TPU)
    a_val: jax.Array,          # [D*local_pad, other_padded] pre-centered
                               # (r - mean) * alpha * indicator, matmul dtype
    prop_mu: Optional[jax.Array],
    prop_lambda: Optional[jax.Array],
    other_items: jax.Array,    # [D_other*local_pad_other, K] sharded
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    local_orig: jax.Array,     # [D, local_pad]
    local_valid: jax.Array,    # [D, local_pad]
    alpha: float,
    burnin: int,
    diagonal_only: bool,
    strict_reference: bool,
    noise_scale: float,
    solver: str = "xla",
    matmul_dtype: str = "float32",
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
) -> SideState:
    """Dense-adjacency half-sweep: computeMuLambda as two MXU matmuls
    (see partition.build_dense_layout).  No gathers, no scatters — the
    whole local item shard is recomputed in place.  Numerically identical
    to the bucketed path (same noise keying), so trajectories match across
    implementations.

    The indicator/value blocks are precomputed at setup (sampler.py) in
    the MXU input dtype: deriving them per-iteration from the raw f32
    ratings block costs three elementwise passes over the [I, N] block —
    ~3x the HBM traffic of the matmuls themselves (measured ~1.7x
    end-to-end on ml-1m synth)."""
    dtype = other_items.dtype
    k = other_items.shape[-1]
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)

    has_aggr = state.aggr_mu is not None
    has_prop = prop_mu is not None

    def body(aggr_mu_l, aggr_prod_l, prop_mu_l, prop_lambda_l,
             other_l, local_orig_l, local_valid_l, a_ind_l, a_val_l):
        local_orig_l = local_orig_l[0]
        local_valid_l = local_valid_l[0]
        local_pad = local_orig_l.shape[0]

        other_full = lax.all_gather(other_l, AXIS, tiled=True)  # [N, K]
        md = a_ind_l.dtype

        # rowwise outer products of the frozen side: [N, K*K]
        if "nomatmul" in ablate.split(","):
            gram = jnp.zeros((local_pad, k, k), dtype) + jnp.eye(k, dtype=dtype) * (
                1.0 + other_full[0, 0] * 1e-12
            )
            rhs = jnp.zeros((local_pad, k), dtype) + a_val_l[:, :1].astype(dtype)
        else:
            p = jnp.einsum(
                "nk,nl->nkl", other_full, other_full,
                preferred_element_type=dtype,
            ).reshape(other_full.shape[0], k * k)
            gram = jnp.matmul(a_ind_l, p.astype(md), preferred_element_type=dtype)
            gram = gram.reshape(local_pad, k, k)
            rhs = jnp.matmul(
                a_val_l, other_full.astype(md), preferred_element_type=dtype
            )

        precision, full_rhs = posterior_precision_rhs(
            gram,
            rhs,
            jnp.arange(local_pad),
            hp,
            alpha,
            prop_mu=prop_mu_l,
            prop_lambda=prop_lambda_l,
            diagonal_only=diagonal_only,
            strict_reference=strict_reference,
        )
        noise = _noise(side_key, local_orig_l, k, dtype, num, ablate)
        if noise_scale != 1.0:
            noise = noise * noise_scale
        if "nosolve" in ablate.split(","):
            u = full_rhs + noise + precision[:, 0, :]
        else:
            u = get_solver(solver)(precision, full_rhs, noise)

        uv = u * local_valid_l[:, None]
        s = lax.psum(uv.sum(axis=0), AXIS)
        prod = lax.psum(
            jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype), AXIS
        )
        norm = lax.psum(jnp.vdot(uv, u), AXIS)
        aggr_on = jnp.asarray(it >= burnin, dtype)
        if aggr_mu_l is not None:
            aggr_mu_l = aggr_mu_l + uv * aggr_on
            aggr_prod_l = aggr_prod_l + aggr_prod_update(uv * aggr_on, u)
        return u, aggr_mu_l, aggr_prod_l, s, prod, norm

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    prop_mu_spec = P(AXIS, None) if has_prop else P()
    prop_lam_spec = P(AXIS, None, None) if has_prop else P()
    in_specs = (
        aggr_spec,
        aggr_prod_spec,
        prop_mu_spec,
        prop_lam_spec,
        P(AXIS, None),            # other items (gathered inside)
        P(AXIS, None),            # local_orig
        P(AXIS, None),            # local_valid
        P(AXIS, None),            # dense indicator block
        P(AXIS, None),            # dense value block
    )
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )

    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        state.aggr_mu,
        state.aggr_prod,
        prop_mu,
        prop_lambda,
        other_items,
        local_orig,
        local_valid,
        a_ind,
        a_val,
    )

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def dense_half_sweep_fused(
    mesh: Mesh,
    state: SideState,
    a_ind_t: jax.Array,        # [other_padded, D*local_pad] indicator,
                               # TRANSPOSED, matmul dtype, sharded on dim 1
    a_val: jax.Array,          # [D*local_pad, other_padded] centered values,
                               # ROW-major (the rhs matmul wants M = items;
                               # an M=K output starves the 128-wide MXU)
    other_items: jax.Array,    # [D*local_pad_other, K] sharded
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    local_orig: jax.Array,     # [D, local_pad]
    local_valid: jax.Array,    # [D, local_pad]
    alpha: float,
    burnin: int,
    noise_scale: float,
    interpret: bool = False,
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
    prior_tri_t: Optional[jax.Array] = None,   # [T, D*local_pad] per-item
                                               # prior precision, packed
                                               # (pack_prior_tri), item-sharded
    prior_rhs_t: Optional[jax.Array] = None,   # [K, D*local_pad] static prior
                                               # rhs (strict_reference=False);
                                               # None = derive from hp.mu
) -> SideState:
    """Dense half-sweep with the packed-triangle fused solve
    (ops/pallas_solve.tri_combine_solve_sample).

    Three wins over :func:`dense_half_sweep` (measured on v5e, ml-1m):
    (1) the Gram matmul contracts against the PACKED lower triangle of the
    frozen side's outer products — ~0.55x the MXU flops of the full K^2
    columns; (2) the Gram never materializes in full [B, K, K] form in HBM
    and the prior combine happens on the VMEM tile — one memory pass
    saved; (3) everything downstream of the matmul is batch-last, so the
    [B,K,K] -> [K,K,B] transpose disappears.  Numerics: identical math,
    f32 accumulation, same noise keying -> trajectories match the other
    implementations to reassociation tolerance."""
    from bpmf_tpu.ops.pallas_solve import (
        tri_combine_solve_sample,
        tri_expand_rows,
        tri_index_pairs,
        tri_tight_pairs,
    )

    dtype = other_items.dtype
    k = other_items.shape[-1]
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)
    md = a_ind_t.dtype
    # Triangle layout for the Gram matmul: TIGHT (no per-column pad rows,
    # ~0.85x the MXU flops) needs a [T_tight, I] -> [T, I] row-expansion
    # memory pass before the solver — 1.23 ms at chembl's I=167k (measured,
    # scripts/bench_solver.py) vs ~0.1 ms of pad flops for emitting the
    # ALIGNED layout straight from the matmul.  Expansion traffic scales
    # with I (local items), the wider p_tri operand with N (frozen side),
    # so: aligned when I >= N, tight+expand otherwise.  BPMF_TRI_ALIGNED_MM
    # in {auto,0,1} overrides (A/B knob).
    i_items = a_val.shape[0] // mesh.devices.size
    n_other = a_ind_t.shape[0]
    _amm = os.environ.get("BPMF_TRI_ALIGNED_MM", "auto")
    mm_aligned = (i_items >= n_other) if _amm == "auto" else _amm == "1"
    if mm_aligned:
        tri_i_np, tri_j_np = tri_index_pairs(k)
        row_map_np = np.arange(tri_i_np.shape[0], dtype=np.int32)
    else:
        tri_i_np, tri_j_np, row_map_np = tri_tight_pairs(k)
    tri_i = jnp.asarray(tri_i_np)
    tri_j = jnp.asarray(tri_j_np)

    has_aggr = state.aggr_mu is not None
    has_prior = prior_tri_t is not None
    has_static_rhs = prior_rhs_t is not None

    def body(aggr_mu_l, aggr_prod_l, other_l, local_orig_l, local_valid_l,
             a_ind_t_l, a_val_l, prior_tri_l, prior_rhs_l):
        local_orig_l = local_orig_l[0]
        local_valid_l = local_valid_l[0]

        other_full = lax.all_gather(other_l, AXIS, tiled=True)  # [N, K]
        v_t = other_full.T                                       # [K, N]
        i_loc = a_val_l.shape[0]
        t_tot = row_map_np.shape[0]
        if "nomatmul" in ablate.split(","):                      # perf-debug
            gram_tri_t = jnp.zeros((t_tot, i_loc), dtype) + v_t[:1, :1] * 1e-12
            rhs = jnp.zeros((i_loc, k), dtype) + a_val_l[:, :1].astype(dtype)
        else:
            # packed lower triangle of the rowwise outer products, [T, N]
            p_tri_t = (jnp.take(v_t, tri_i, axis=0)
                       * jnp.take(v_t, tri_j, axis=0)).astype(md)
            gram_tri_t = jnp.matmul(
                p_tri_t, a_ind_t_l, preferred_element_type=dtype
            )                                                    # [T*, I]
            if not mm_aligned:
                gram_tri_t = tri_expand_rows(gram_tri_t, k)      # [T, I]
            rhs = jnp.matmul(
                a_val_l, other_full.astype(md), preferred_element_type=dtype
            )                                                    # [I, K]
            # barrier: without it XLA re-fuses the transpose into the matmul
            # and picks the M=32 output orientation, which starves the MXU
            # (measured 0.07 vs 0.02 ms on ml-1m)
            rhs = jax.lax.optimization_barrier(rhs)
        rhs_full_t = _combine_prior_rhs(                         # [K, I]
            rhs.T, hp, prior_tri_l if has_prior else None,
            prior_rhs_l if has_static_rhs else None, dtype,
        )
        noise = _noise(side_key, local_orig_l, k, dtype, num, ablate)
        if noise_scale != 1.0:
            noise = noise * noise_scale
        if "nosolve" in ablate.split(","):                       # perf-debug
            u_t = rhs_full_t + noise.T + gram_tri_t[:k, :]
        else:
            u_t = tri_combine_solve_sample(
                gram_tri_t, hp.lambda_f, rhs_full_t, noise.T, alpha,
                interpret=interpret,
                lam_tri_t=prior_tri_l if has_prior else None,
            )                                                    # [K, I]
        u = u_t.T

        uv = u * local_valid_l[:, None]
        s = lax.psum(uv.sum(axis=0), AXIS)
        prod = lax.psum(
            jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype), AXIS
        )
        norm = lax.psum(jnp.vdot(uv, u), AXIS)
        aggr_on = jnp.asarray(it >= burnin, dtype)
        if aggr_mu_l is not None:
            aggr_mu_l = aggr_mu_l + uv * aggr_on
            aggr_prod_l = aggr_prod_l + aggr_prod_update(uv * aggr_on, u)
        return u, aggr_mu_l, aggr_prod_l, s, prod, norm

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    in_specs = (
        aggr_spec,
        aggr_prod_spec,
        P(AXIS, None),            # other items (gathered inside)
        P(AXIS, None),            # local_orig
        P(AXIS, None),            # local_valid
        P(None, AXIS),            # transposed indicator block
        P(AXIS, None),            # row-major value block
        P(None, AXIS) if has_prior else P(),       # packed per-item prior
        P(None, AXIS) if has_static_rhs else P(),  # static prior rhs
    )
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )

    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        state.aggr_mu,
        state.aggr_prod,
        other_items,
        local_orig,
        local_valid,
        a_ind_t,
        a_val,
        prior_tri_t,
        prior_rhs_t,
    )

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def reduce_half_sweep_chunked(
    mesh: Mesh,
    state: SideState,
    data_per_dest,              # [D] of SideData: dest-grouped buckets
    other_items: jax.Array,     # [D*local_pad_other, K] sharded — NOT gathered
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    local_pad: int,             # per-device padded item count of THIS side
    splits_per_dest,            # [D] of per-bucket split flags (static)
    local_orig: jax.Array,      # [D, local_pad]
    local_valid: jax.Array,     # [D, local_pad]
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    diagonal_only: bool,
    strict_reference: bool,
    noise_scale: float,
    solver: str = "unrolled",
    matmul_dtype: str = "float32",
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
) -> SideState:
    """Statistic-exchange half-sweep with O(local_pad * K^2) peak memory.

    :func:`reduce_half_sweep` scatters every device's partial stats into a
    [padded_num, K, K] buffer before one psum_scatter — O(global N * K^2)
    PER DEVICE, which stops scaling exactly where REDUCE mode is needed
    (667 MB/device at ml-25M users K=32; the reference reduces owner
    slices instead, c++/mpi_reduce.h:29-45).  Here edges are pre-grouped by
    destination shard (partition.build_reduce_layout_chunked) and the loop
    goes one destination at a time: accumulate a [local_pad, K, K] partial,
    psum it, and only the owner keeps the result.  Comm volume is 2x the
    single psum_scatter (a psum is reduce_scatter + all_gather), traded for
    a 1/D peak-memory footprint."""
    dtype = other_items.dtype
    k = other_items.shape[-1]
    n_dev = mesh.devices.size
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)

    has_aggr = state.aggr_mu is not None
    has_prop = data_per_dest[0].prop_mu is not None

    def body(aggr_mu_l, aggr_prod_l, prop_mu_l, prop_lambda_l,
             other_l, local_orig_l, local_valid_l, *flat):
        local_orig_l = local_orig_l[0]
        local_valid_l = local_valid_l[0]
        me = lax.axis_index(AXIS)

        gram_l = jnp.zeros((local_pad, k, k), dtype)
        rhs_l = jnp.zeros((local_pad, k), dtype)
        pos = 0
        for dest in range(n_dev):
            splits = splits_per_dest[dest]
            n_b = len(splits)
            bflat = flat[pos : pos + n_b * 7]
            pos += n_b * 7
            g_part = jnp.zeros((local_pad, k, k), dtype)
            r_part = jnp.zeros((local_pad, k), dtype)
            for j, split in enumerate(splits):
                b = _take0(BucketDev(*bflat[j * 7 : (j + 1) * 7]))
                n_slots = b.item_ids.shape[0]
                g, r = gram_rhs(
                    b, other_l, mean_rating, alpha, split=split,
                    n_slots=n_slots,
                    gather_dtype=(
                        jnp.bfloat16 if matmul_dtype == "bfloat16" else None
                    ),
                    ablate=ablate,
                )
                g_part = g_part.at[b.item_ids].add(
                    g * b.slot_valid[:, None, None]
                )
                r_part = r_part.at[b.item_ids].add(r * b.slot_valid[:, None])
            # per-owner-rank MPI_Reduce (mpi_reduce.h:29-45): sum across
            # devices, owner keeps its slice
            g_sum = lax.psum(g_part, AXIS)
            r_sum = lax.psum(r_part, AXIS)
            keep = me == dest
            gram_l = jnp.where(keep, g_sum, gram_l)
            rhs_l = jnp.where(keep, r_sum, rhs_l)

        precision, full_rhs = posterior_precision_rhs(
            gram_l,
            rhs_l,
            jnp.arange(local_pad),
            hp,
            alpha,
            prop_mu=prop_mu_l,
            prop_lambda=prop_lambda_l,
            diagonal_only=diagonal_only,
            strict_reference=strict_reference,
        )
        noise = _noise(side_key, local_orig_l, k, dtype, num, ablate)
        if noise_scale != 1.0:
            noise = noise * noise_scale
        u = get_solver(solver)(precision, full_rhs, noise)

        uv = u * local_valid_l[:, None]
        s = lax.psum(uv.sum(axis=0), AXIS)
        prod = lax.psum(
            jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype), AXIS
        )
        norm = lax.psum(jnp.vdot(uv, u), AXIS)
        aggr_on = jnp.asarray(it >= burnin, dtype)
        if aggr_mu_l is not None:
            aggr_mu_l = aggr_mu_l + uv * aggr_on
            aggr_prod_l = aggr_prod_l + aggr_prod_update(uv * aggr_on, u)
        return u, aggr_mu_l, aggr_prod_l, s, prod, norm

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    prop_mu_spec = P(AXIS, None) if has_prop else P()
    prop_lam_spec = P(AXIS, None, None) if has_prop else P()
    bspecs = _bucket_specs()
    in_specs = (
        aggr_spec,
        aggr_prod_spec,
        prop_mu_spec,
        prop_lam_spec,
        P(AXIS, None),            # other items (stays sharded)
        P(AXIS, None),            # local_orig
        P(AXIS, None),            # local_valid
    ) + tuple(
        s
        for splits in splits_per_dest
        for _ in splits
        for s in bspecs
    )
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )

    sd0 = data_per_dest[0]
    buckets_flat = tuple(
        x for data in data_per_dest for b in data.buckets for x in b
    )
    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        state.aggr_mu,
        state.aggr_prod,
        sd0.prop_mu,
        sd0.prop_lambda,
        other_items,
        local_orig,
        local_valid,
        *buckets_flat,
    )

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def dense8_half_sweep(
    state: SideState,
    codes: jax.Array,          # [users_pad, movies_pad] int8 rating codes
    other_items: jax.Array,    # [num_other_pad, K]
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    local_orig: jax.Array,     # [1, padded_num]
    local_valid: jax.Array,    # [1, padded_num]
    alpha: float,
    burnin: int,
    noise_scale: float,
    cs: float,                 # scale * alpha      (value = offset + scale*code)
    cb: float,                 # (offset - mean) * alpha
    orientation: str,          # 'rows' (users sweep) | 'cols' (movies sweep)
    matmul_dtype,
    interpret: bool = False,
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
    prior_tri_t: Optional[jax.Array] = None,   # [T, padded_num] per-item
                                               # prior (pack_prior_tri)
    prior_rhs_t: Optional[jax.Array] = None,   # [K, padded_num] static rhs
                                               # (strict_reference=False)
) -> SideState:
    """int8 dense-stream half-sweep (ops/dense8): single-chip only, no
    exchange — the one shared code array serves both sides.  Math is the
    dense path's (computeMuLambda as MXU matmuls) with the indicator and
    centered values derived in-kernel from the int8 codes, so per-iteration
    HBM traffic is one int8 pass over the ratings instead of two bf16
    block reads (4x less at equal shapes, and the only option that fits
    ml-25M on one chip)."""
    from bpmf_tpu.ops.dense8 import (
        dense8_gram_rhs_cols,
        dense8_gram_rhs_rows,
        dense8_sweep_solve,
        packed_tri_t,
        solve_fused_enabled,
    )
    from bpmf_tpu.ops.pallas_solve import tri_combine_solve_sample

    dtype = other_items.dtype
    k = other_items.shape[-1]
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)
    lo = local_orig[0]
    lv = local_valid[0]

    # frozen side, transposed + its packed-triangle operand (built ONCE per
    # half-sweep; the kernels stream tiles of both)
    v_t = other_items.T.astype(matmul_dtype)
    noise = _noise(side_key, lo, k, dtype, num, ablate)
    if noise_scale != 1.0:
        noise = noise * noise_scale
    ablates = ablate.split(",")
    # megakernel: Gram/rhs + prior combine + Cholesky-solve-sample in ONE
    # pallas_call — the [T, I] f32 Gram never round-trips HBM and the
    # tight->aligned expansion pass disappears (ops/dense8._kernel_fused_solve).
    # Shared-prior path only; the matmul/solve ablations and the per-item
    # propagated prior keep the split pipeline.
    from bpmf_tpu.ops.dense8 import solve_fused_mode, solve_fused_supported

    fused_layout = solve_fused_mode()
    fused_solve = (
        solve_fused_enabled()
        and solve_fused_supported(k, fused_layout)
        and prior_tri_t is None
        and "nomatmul" not in ablates
        and "nosolve" not in ablates
    )
    if fused_solve:
        from bpmf_tpu.ops.dense8 import pt_mode

        n_items = (codes.shape[0] if orientation == "rows"
                   else codes.shape[1])
        if (fused_layout == "tight"
                and pt_mode(n_items, v_t.shape[1], k, True,
                            orientation) == "inkernel"):
            p_t = None  # selections built in-kernel (tight layout)
        else:
            p_t = packed_tri_t(
                v_t.astype(dtype), aligned=fused_layout == "aligned"
            ).astype(matmul_dtype)
        prior_rhs = (hp.lambda_f @ hp.mu)[:, None]               # [K, 1]
        u_t = dense8_sweep_solve(
            codes, p_t, v_t, hp.lambda_f, prior_rhs, noise.T,
            cs, cb, alpha, orientation, layout=fused_layout,
            interpret=interpret,
        )                                                    # [K, I]
    else:
        if "nomatmul" in ablates:                            # perf-debug
            from bpmf_tpu.ops.pallas_solve import tri_offsets

            _, t_tot = tri_offsets(k)
            n_items = (codes.shape[0] if orientation == "rows"
                       else codes.shape[1])
            gram_t = (jnp.zeros((t_tot, n_items), dtype)
                      + v_t[:1, :1].astype(dtype) * 1e-12)
            rhs_t = jnp.zeros((k, n_items), dtype)
        else:
            from bpmf_tpu.ops.dense8 import pt_mode

            n_items = (codes.shape[0] if orientation == "rows"
                       else codes.shape[1])
            if pt_mode(n_items, v_t.shape[1], k, False,
                       orientation) == "inkernel":
                p_t = None  # built in-kernel from one-hot selections
            else:
                p_t = packed_tri_t(v_t.astype(dtype)).astype(matmul_dtype)
            kernel = (dense8_gram_rhs_rows if orientation == "rows"
                      else dense8_gram_rhs_cols)
            gram_t, rhs_t = kernel(codes, p_t, v_t, cs, cb,
                                   interpret=interpret)
            # tight [T_tight, I] -> solver-aligned [T, I] (static slices;
            # computing the Gram tight saves the aligned layout's 17.5% pad
            # flops on the MXU — tri_tight_pairs)
            from bpmf_tpu.ops.pallas_solve import tri_expand_rows

            gram_t = tri_expand_rows(gram_t, k)
        gram_t = gram_t.astype(dtype)
        rhs_full_t = _combine_prior_rhs(                         # [K, I]
            rhs_t, hp, prior_tri_t, prior_rhs_t, dtype,
        )
        if "nosolve" in ablates:                             # perf-debug
            u_t = rhs_full_t + noise.T + gram_t[:k, :]
        else:
            u_t = tri_combine_solve_sample(
                gram_t, hp.lambda_f, rhs_full_t, noise.T, alpha,
                interpret=interpret, lam_tri_t=prior_tri_t,
            )                                                # [K, I]
    u = u_t.T

    uv = u * lv[:, None]
    s = uv.sum(axis=0)
    prod = jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype)
    norm = jnp.vdot(uv, u)
    aggr_on = jnp.asarray(it >= burnin, dtype)
    aggr_mu, aggr_prod = state.aggr_mu, state.aggr_prod
    if aggr_mu is not None:
        aggr_mu = aggr_mu + uv * aggr_on
        aggr_prod = aggr_prod + aggr_prod_update(uv * aggr_on, u)

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=u, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def dense8_half_sweep_sharded(
    mesh: Mesh,
    state: SideState,
    codes: jax.Array,          # [R, C] int8, sharded P(AXIS, None) — rows
                               # are the USERS side's padded device order
    other_items: jax.Array,    # [other_padded, K] sharded over the mesh
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    local_orig: jax.Array,     # [D, local_pad]
    local_valid: jax.Array,    # [D, local_pad]
    alpha: float,
    burnin: int,
    noise_scale: float,
    cs: float,
    cb: float,
    orientation: str,          # 'rows' (users sweep) | 'cols' (movies sweep)
    matmul_dtype,
    interpret: bool = False,
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
    prior_tri_t: Optional[jax.Array] = None,   # [T, padded_num] per-item
                                               # prior, item-sharded dim 1
    prior_rhs_t: Optional[jax.Array] = None,   # [K, padded_num] static rhs
                                               # (strict_reference=False)
) -> SideState:
    """Multi-chip int8 dense-stream half-sweep: the code array is sharded
    by USER rows, so each device streams only its [R/D, C] int8 shard —
    the huge-sparse fast path scales past one chip's HBM.

    * users sweep (``rows``): value exchange — ``all_gather`` the (small)
      frozen movies side (C*K values: 3.8 MB at ml-25M), each device
      computes its own users' gram/rhs from its code shard and solves
      locally.
    * movies sweep (``cols``): statistic exchange — each device contracts
      its local user rows into PARTIAL per-movie stats and ONE
      ``psum_scatter`` lands the summed [T+K, C/D] slab on the movie
      owner shard, which solves its movies locally.  This is the
      ENABLE_REDUCE pattern (c++/mpi_reduce.h:29-45) at (T+K)*C*4 bytes
      per iteration (~133 MB at ml-25M) riding ICI.

    Trajectories equal the single-chip dense8 path (same noise keying,
    same f32 accumulation; only the psum reduction order differs).
    """
    from bpmf_tpu.ops.dense8 import (
        dense8_gram_rhs_cols,
        dense8_gram_rhs_rows,
        packed_tri_t,
    )
    from bpmf_tpu.ops.pallas_solve import (
        tri_combine_solve_sample,
        tri_expand_rows,
    )

    dtype = other_items.dtype
    k = other_items.shape[-1]
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)
    has_aggr = state.aggr_mu is not None
    has_prior = prior_tri_t is not None
    has_static_rhs = prior_rhs_t is not None

    def tail(gram_tight_t, rhs_t, lo_l, lv_l, aggr_mu_l, aggr_prod_l,
             prior_tri_l, prior_rhs_l):
        gram_t = tri_expand_rows(gram_tight_t, k).astype(dtype)
        rhs_full_t = _combine_prior_rhs(
            rhs_t, hp, prior_tri_l if has_prior else None,
            prior_rhs_l if has_static_rhs else None, dtype,
        )
        noise = _noise(side_key, lo_l, k, dtype, num, ablate)
        if noise_scale != 1.0:
            noise = noise * noise_scale
        u_t = tri_combine_solve_sample(
            gram_t, hp.lambda_f, rhs_full_t, noise.T, alpha,
            interpret=interpret,
            lam_tri_t=prior_tri_l if has_prior else None,
        )
        u = u_t.T
        uv = u * lv_l[:, None]
        s = lax.psum(uv.sum(axis=0), AXIS)
        prod = lax.psum(
            jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype), AXIS
        )
        norm = lax.psum(jnp.vdot(uv, u), AXIS)
        aggr_on = jnp.asarray(it >= burnin, dtype)
        if aggr_mu_l is not None:
            aggr_mu_l = aggr_mu_l + uv * aggr_on
            aggr_prod_l = aggr_prod_l + aggr_prod_update(
                uv * aggr_on, u
            )
        return u, aggr_mu_l, aggr_prod_l, s, prod, norm

    if orientation == "rows":

        def body(aggr_mu_l, aggr_prod_l, codes_l, other_l, lo_l, lv_l,
                 prior_tri_l, prior_rhs_l):
            from bpmf_tpu.ops.dense8 import pt_mode

            other_full = lax.all_gather(other_l, AXIS, tiled=True)  # [C, K]
            v_t = other_full.T.astype(matmul_dtype)
            if pt_mode(codes_l.shape[0], v_t.shape[1], k, False,
                       "rows") == "inkernel":
                p_t = None
            else:
                p_t = packed_tri_t(other_full.T).astype(matmul_dtype)
            gram_t, rhs_t = dense8_gram_rhs_rows(
                codes_l, p_t, v_t, cs, cb, interpret=interpret
            )                                    # [T_tight, R/D], [K, R/D]
            return tail(gram_t, rhs_t, lo_l[0], lv_l[0],
                        aggr_mu_l, aggr_prod_l, prior_tri_l, prior_rhs_l)

    else:

        def body(aggr_mu_l, aggr_prod_l, codes_l, other_l, lo_l, lv_l,
                 prior_tri_l, prior_rhs_l):
            from bpmf_tpu.ops.dense8 import pt_mode

            # frozen users rows on this device line up with the code shard
            # rows — no gather at all
            v_t = other_l.T.astype(matmul_dtype)
            if pt_mode(codes_l.shape[1], v_t.shape[1], k, False,
                       "cols") == "inkernel":
                p_t = None
            else:
                p_t = packed_tri_t(other_l.T).astype(matmul_dtype)
            gram_t, rhs_t = dense8_gram_rhs_cols(
                codes_l, p_t, v_t, cs, cb, interpret=interpret
            )                                    # PARTIAL [T_tight, C], [K, C]
            t_rows = gram_t.shape[0]
            both = jnp.concatenate([gram_t, rhs_t], axis=0)
            both = lax.psum_scatter(
                both, AXIS, scatter_dimension=1, tiled=True
            )                                    # [T_tight+K, C/D]
            return tail(both[:t_rows], both[t_rows:], lo_l[0], lv_l[0],
                        aggr_mu_l, aggr_prod_l, prior_tri_l, prior_rhs_l)

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    in_specs = (
        aggr_spec,
        aggr_prod_spec,
        P(AXIS, None),           # code shard (user rows)
        P(AXIS, None),           # frozen side items
        P(AXIS, None),           # local_orig
        P(AXIS, None),           # local_valid
        P(None, AXIS) if has_prior else P(),       # packed per-item prior
        P(None, AXIS) if has_static_rhs else P(),  # static prior rhs
    )
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )
    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(state.aggr_mu, state.aggr_prod, codes, other_items,
      local_orig, local_valid, prior_tri_t, prior_rhs_t)

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def reduce_half_sweep(
    mesh: Mesh,
    state: SideState,
    data: SideData,             # reduce-layout buckets; prop in padded layout
    other_items: jax.Array,     # [D*local_pad_other, K] sharded — NOT gathered
    key: jax.Array,
    it: jax.Array,
    *,
    num: int,
    padded_num: int,            # D * local_pad of THIS side
    local_orig: jax.Array,      # [D, local_pad] original id per local slot
    local_valid: jax.Array,     # [D, local_pad]
    mean_rating: jax.Array,
    alpha: float,
    burnin: int,
    splits,
    diagonal_only: bool,
    strict_reference: bool,
    noise_scale: float,
    solver: str = "unrolled",
    matmul_dtype: str = "float32",
    ablate: str = "",
    hp: Optional[HyperParams] = None,  # precomputed pair draw (sampler)
) -> SideState:
    """Statistic-exchange half-sweep (ENABLE_REDUCE family)."""
    dtype = other_items.dtype
    k = other_items.shape[-1]
    if hp is None:
        hp = _hyper(jax.random.fold_in(key, 0), num, state, ablate)
    side_key = jax.random.fold_in(key, 1)

    has_aggr = state.aggr_mu is not None
    has_prop = data.prop_mu is not None

    def body(aggr_mu_l, aggr_prod_l, prop_mu_l, prop_lambda_l,
             other_l, local_orig_l, local_valid_l, *buckets_flat):
        local_orig_l = local_orig_l[0]
        local_valid_l = local_valid_l[0]
        local_pad = local_orig_l.shape[0]

        # partial per-item stats from locally-owned other-side vectors
        gram_full = jnp.zeros((padded_num, k, k), dtype)
        rhs_full = jnp.zeros((padded_num, k), dtype)
        for j, split in enumerate(splits):
            b = _take0(BucketDev(*buckets_flat[j * 7 : (j + 1) * 7]))
            n_slots = b.item_ids.shape[0]
            g, r = gram_rhs(
                b, other_l, mean_rating, alpha, split=split, n_slots=n_slots,
                gather_dtype=(
                    jnp.bfloat16 if matmul_dtype == "bfloat16" else None
                ),
                ablate=ablate,
            )
            gram_full = gram_full.at[b.item_ids].add(
                g * b.slot_valid[:, None, None]
            )
            rhs_full = rhs_full.at[b.item_ids].add(r * b.slot_valid[:, None])

        # land the summed stats on the owner shard (psum_scatter == the
        # per-owner MPI_Reduce of mpi_reduce.h:29-45)
        gram_l = lax.psum_scatter(gram_full, AXIS, scatter_dimension=0, tiled=True)
        rhs_l = lax.psum_scatter(rhs_full, AXIS, scatter_dimension=0, tiled=True)

        precision, full_rhs = posterior_precision_rhs(
            gram_l,
            rhs_l,
            jnp.arange(local_pad),
            hp,
            alpha,
            prop_mu=prop_mu_l,
            prop_lambda=prop_lambda_l,
            diagonal_only=diagonal_only,
            strict_reference=strict_reference,
        )
        noise = _noise(side_key, local_orig_l, k, dtype, num, ablate)
        if noise_scale != 1.0:
            noise = noise * noise_scale
        u = get_solver(solver)(precision, full_rhs, noise)

        uv = u * local_valid_l[:, None]
        s = lax.psum(uv.sum(axis=0), AXIS)
        prod = lax.psum(
            jnp.einsum("sk,sl->kl", uv, u, preferred_element_type=dtype), AXIS
        )
        norm = lax.psum(jnp.vdot(uv, u), AXIS)
        aggr_on = jnp.asarray(it >= burnin, dtype)
        if aggr_mu_l is not None:
            aggr_mu_l = aggr_mu_l + uv * aggr_on
            aggr_prod_l = aggr_prod_l + aggr_prod_update(uv * aggr_on, u)
        return u, aggr_mu_l, aggr_prod_l, s, prod, norm

    aggr_spec = P(AXIS, None) if has_aggr else P()
    aggr_prod_spec = P(AXIS, None) if has_aggr else P()
    prop_mu_spec = P(AXIS, None) if has_prop else P()
    prop_lam_spec = P(AXIS, None, None) if has_prop else P()
    bspecs = _bucket_specs()
    in_specs = (
        aggr_spec,
        aggr_prod_spec,
        prop_mu_spec,
        prop_lam_spec,
        P(AXIS, None),            # other items (stays sharded)
        P(AXIS, None),            # local_orig
        P(AXIS, None),            # local_valid
    ) + tuple(s for _ in splits for s in bspecs)
    out_specs = (
        P(AXIS, None),
        aggr_spec,
        aggr_prod_spec,
        P(),
        P(),
        P(),
    )

    buckets_flat = tuple(x for b in data.buckets for x in b)
    items, aggr_mu, aggr_prod, s, prod, norm = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        state.aggr_mu,
        state.aggr_prod,
        data.prop_mu,
        data.prop_lambda,
        other_items,
        local_orig,
        local_valid,
        *buckets_flat,
    )

    n_f = jnp.asarray(num, dtype)
    cov = (prod - jnp.outer(s, s) / n_f) / (n_f - 1.0)
    return SideState(
        items=items, hp=hp, sum=s, cov=cov, norm=norm,
        aggr_mu=aggr_mu, aggr_prod=aggr_prod,
    )


def predict_sharded(
    mesh: Mesh,
    ev,
    est,
    user_items: jax.Array,
    movie_items: jax.Array,
    it: jax.Array,
    *,
    mean_rating: jax.Array,
    burnin: int,
    gather_dtype=None,
    nnz_true: int | None = None,
    fused_gather: bool = False,
):
    """Entry-sharded test evaluation (Sys::predict, c++/sample.cpp:48-96,
    whose reference analog restricts each rank to its local item range,
    c++/sample.cpp:56-65).

    The single-device :func:`bpmf_tpu.models.bpmf.predict` replicates the
    whole test-entry row gather on every device — a fixed ~10 ms at ml-25M
    scale that bounds strong scaling before communication does (the
    "replicated costs" note in docs/PERF.md).  Here the COO test triples
    and the Welford state are sharded over the mesh (padded to a device
    multiple; ``ev.valid`` masks the padding), each device gathers only its
    nnz_t/D rows from the all_gather-ed factor tables, and one psum makes
    the error sums global.  Per-entry Welford values are exactly the
    single-device values, so trajectories and outputs are unchanged up to
    float reduction order in the psum."""
    from bpmf_tpu.models.bpmf import EvalData, EvalState, predict

    def body(tu, ti, tv, valid, pavg, pm2, u_l, m_l):
        uf = lax.all_gather(u_l, AXIS, tiled=True)
        mf = lax.all_gather(m_l, AXIS, tiled=True)
        est2, rmse, rmse_avg = predict(
            EvalData(tu, ti, tv, valid),
            EvalState(pavg, pm2),
            uf,
            mf,
            it,
            mean_rating=mean_rating,
            burnin=burnin,
            gather_dtype=gather_dtype,
            axis_name=AXIS,
            nnz_true=nnz_true,
            fused_gather=fused_gather,
        )
        return est2.pavg, est2.pm2, rmse, rmse_avg

    pavg, pm2, rmse, rmse_avg = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS), P(AXIS), P(), P()),
        check_vma=False,
    )(ev.t_user, ev.t_item, ev.t_val, ev.valid, est.pavg, est.pm2,
      user_items, movie_items)
    return EvalState(pavg=pavg, pm2=pm2), rmse, rmse_avg
