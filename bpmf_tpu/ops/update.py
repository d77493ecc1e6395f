"""Batched per-item conditional Gibbs update — the hot path.

TPU-native re-design of the reference hot loop (c++/sample.cpp:263-336 and
computeMuLambda c++/sample.cpp:248-258).  Per item i with rated neighbor
vectors {v_j} and centered ratings {r_ij - mean}:

    Lambda*_i = Lambda_hp + alpha * sum_j v_j v_j'
    rhs_i     = Lambda_hp @ mu_hp + alpha * sum_j v_j (r_ij - mean)
    L L'      = Lambda*_i                      (Cholesky)
    u_i       = L'^-1 ( N(0,I) + L^-1 rhs_i )  (posterior MVN draw)

Batched over a degree bucket: the Gram accumulation is one
``einsum('rwk,rwl->rkl')`` (MXU batched matmul), Cholesky and the two
triangular solves use the batched ``lax.linalg`` primitives, and the noise
is row ``orig_id`` of a per-(side, iter) threefry table (see noise_table) —
preserving the reference's schedule-independent determinism property
(rng_set_pos((idx+1)*K*(iter+1)), c++/sample.cpp:266) statistically.

Reference quirk kept under Config.strict_reference (default): with a
propagated posterior the per-item prior term is ``propLambda_i @ hp.mu``
— the *shared* sampled hyper-mean, not the propagated per-item mean
(c++/sample.cpp:285 uses ``hp.mu`` even though ``hp_mu`` was just loaded
from propMu).  With strict_reference=False the mathematically intended
``propLambda_i @ propMu_i`` is used.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from bpmf_tpu.ops.mvnormal import HyperParams


class BucketDev(NamedTuple):
    """Device-resident arrays of one degree bucket (see bpmf_tpu.sparse)."""

    nbr: jax.Array         # [R, W] int32
    val: jax.Array         # [R, W] compute dtype (raw ratings)
    mask: jax.Array        # [R, W] compute dtype
    row_slot: jax.Array    # [R] int32
    item_ids: jax.Array    # [S] int32 — scatter index into the items array
    orig_ids: jax.Array    # [S] int32 — original global id (noise keying)
    slot_valid: jax.Array  # [S] compute dtype


class UpdateOut(NamedTuple):
    u: jax.Array           # [S, K] new item vectors (garbage in padding slots)
    item_ids: jax.Array    # [S]
    slot_valid: jax.Array  # [S]


def gram_rhs(
    bucket: BucketDev,
    other_items: jax.Array,   # [num_other_pad, K]
    mean_rating: jax.Array,   # scalar
    alpha: float,
    *,
    split: bool,
    n_slots: int,
    gather_dtype=None,
    ablate: str = "",
) -> tuple[jax.Array, jax.Array]:
    """Accumulate per-slot Gram [S,K,K] and rhs [S,K] over rated neighbors.

    The O(nnz * K^2) dominant work of the sweep (computeMuLambda,
    c++/sample.cpp:248-258) as MXU batched matmuls.

    ``ablate`` is a perf-debug knob (Config.ablate): 'nogather' / 'nogram'
    skip phases to isolate their cost.
    """
    r_rows, width = bucket.nbr.shape
    k = other_items.shape[-1]
    dtype = other_items.dtype
    if gather_dtype is not None and gather_dtype != dtype:
        # gathering in bf16 halves the dominant HBM gather traffic; the
        # Gram contraction runs at the same MXU precision either way and
        # accumulates in the compute dtype (preferred_element_type)
        other_items = other_items.astype(gather_dtype)
    if "nogather" in ablate.split(","):
        # skip the neighbor gather entirely (constant fake neighborhoods)
        vg = jnp.broadcast_to(other_items[:1, None, :], (r_rows, width, k))
    else:
        # flat 1-D row gather: 2-D index arrays compile to a pathological
        # gather on TPU (minutes of compile, ~30x slower execution —
        # measured); the flat form lowers to the fast row-gather path.
        vg = jnp.take(other_items, bucket.nbr.reshape(-1), axis=0)
        vg = vg.reshape(r_rows, width, k)              # [R, W, K]
    vg = vg * bucket.mask[..., None]
    wts = (bucket.val - mean_rating) * bucket.mask * alpha  # [R, W]
    if "nogram" in ablate.split(","):
        # keep the gather, skip the MXU contraction
        gram = jnp.zeros((r_rows, k, k), dtype) + vg[:, :1, :1, None].astype(dtype)
        rhs = vg.sum(axis=1).astype(dtype)
    else:
        # preferred_element_type is the COMPUTE dtype (f32), not vg.dtype:
        # with a bf16 gather the Gram/rhs must still accumulate in f32
        # (config.py contract; segment_sum below reuses these outputs).
        gram = jnp.einsum("rwk,rwl->rkl", vg, vg, preferred_element_type=dtype)
        rhs = jnp.einsum("rwk,rw->rk", vg, wts, preferred_element_type=dtype)
    if split:
        gram = jax.ops.segment_sum(gram, bucket.row_slot, num_segments=n_slots)
        rhs = jax.ops.segment_sum(rhs, bucket.row_slot, num_segments=n_slots)
    else:
        gram = gram[:n_slots]
        rhs = rhs[:n_slots]
    return gram, rhs


def chol_solve_sample(
    precision: jax.Array,   # [S, K, K] posterior precision Lambda*_i
    rhs: jax.Array,         # [S, K]
    noise: jax.Array,       # [S, K] ~ N(0, I)
) -> jax.Array:
    """u = U \\ (noise + L \\ rhs) with L L' = precision
    (c++/sample.cpp:306-324)."""
    chol = lax.linalg.cholesky(precision)  # [S, K, K] lower
    y = lax.linalg.triangular_solve(
        chol, rhs[..., None], left_side=True, lower=True
    )
    y = y + noise[..., None]
    u = lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )
    return u[..., 0]


def noise_table(side_key: jax.Array, num: int, k: int, dtype) -> jax.Array:
    """N(0, I_K) noise for EVERY item of a side, [num + 1, K] (row ``num``
    feeds padding slots).

    This is the TPU analog of the reference's counter-based RNG positioning
    rng_set_pos((idx+1)*K*(iter+1)) (c++/sample.cpp:266): the draw for item
    idx depends only on (seed, side, iter, idx) — NOT on which device,
    bucket, or slot processes it — so trajectories are independent of
    sharding layout and exchange mode (the reference has the same property
    across nprocs).  One batched threefry call; under SPMD every device
    computes the identical table (redundant but trivially cheap) and
    row-gathers its slots.  A per-item vmapped fold_in would be the direct
    analog but compiles catastrophically on TPU (~300 s — measured)."""
    return jax.random.normal(side_key, (num + 1, k), dtype=dtype)


def item_noise(side_key: jax.Array, orig_ids: jax.Array, k: int, dtype,
               num: Optional[int] = None) -> jax.Array:
    """Noise rows for the given original item ids (see noise_table).
    ``num`` is the side's GLOBAL item count; defaults to max over the batch
    only for convenience in tests — pass it explicitly in real use."""
    n = int(num) if num is not None else int(orig_ids.shape[0])
    table = noise_table(side_key, max(n, int(orig_ids.shape[0])), k, dtype)
    return jnp.take(table, orig_ids, axis=0)


def posterior_precision_rhs(
    gram: jax.Array,     # [S, K, K]
    rhs: jax.Array,      # [S, K]
    item_ids: jax.Array, # [S] — index into prop arrays when present
    hp: HyperParams,
    alpha: float,
    *,
    prop_mu: Optional[jax.Array] = None,
    prop_lambda: Optional[jax.Array] = None,
    diagonal_only: bool = False,
    strict_reference: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Combine data statistics with the (shared or per-item propagated)
    prior into the posterior precision and rhs (c++/sample.cpp:272-304)."""
    n_slots, k = rhs.shape
    dtype = rhs.dtype

    if prop_lambda is not None:
        lam_hp = prop_lambda[item_ids]                 # [S, K, K]
        if strict_reference:
            # c++/sample.cpp:285 quirk: shared hp.mu with per-item propLambda
            prior_rhs = jnp.einsum("skl,l->sk", lam_hp, hp.mu)
        else:
            prior_rhs = jnp.einsum("skl,sl->sk", lam_hp, prop_mu[item_ids])
    else:
        lam_hp = hp.lambda_f                            # [K, K] broadcast below
        prior_rhs = lam_hp @ hp.mu                      # [K]
        lam_hp = jnp.broadcast_to(lam_hp, (n_slots, k, k))
        prior_rhs = jnp.broadcast_to(prior_rhs, (n_slots, k))

    precision = lam_hp + alpha * gram                  # MM = hp_LambdaF + alpha*MM
    if diagonal_only:
        # BPMF_NO_COVARIANCE / ONLY_VARIANCE (c++/sample.cpp:300-304)
        eye = jnp.eye(k, dtype=dtype)
        precision = eye * precision
    return precision, rhs + prior_rhs


def sample_bucket(
    bucket: BucketDev,
    other_items: jax.Array,
    hp: HyperParams,
    mean_rating: jax.Array,
    alpha: float,
    side_key: jax.Array,
    *,
    split: bool,
    prop_mu: Optional[jax.Array] = None,       # [num_pad, K] per-item prior mean
    prop_lambda: Optional[jax.Array] = None,   # [num_pad, K, K] per-item prior prec
    diagonal_only: bool = False,
    strict_reference: bool = True,
    noise_scale: float = 1.0,
    noise_num: Optional[int] = None,
) -> UpdateOut:
    """Draw new vectors for every item slot of one degree bucket."""
    n_slots = bucket.item_ids.shape[0]
    k = other_items.shape[-1]
    dtype = other_items.dtype

    gram, rhs = gram_rhs(
        bucket, other_items, mean_rating, alpha, split=split, n_slots=n_slots
    )
    precision, full_rhs = posterior_precision_rhs(
        gram,
        rhs,
        bucket.item_ids,
        hp,
        alpha,
        prop_mu=prop_mu,
        prop_lambda=prop_lambda,
        diagonal_only=diagonal_only,
        strict_reference=strict_reference,
    )

    noise = item_noise(side_key, bucket.orig_ids, k, dtype, num=noise_num)
    if noise_scale != 1.0:  # test hook: deterministic posterior-mean checks
        noise = noise * noise_scale
    u = chol_solve_sample(precision, full_rhs, noise)
    return UpdateOut(u=u, item_ids=bucket.item_ids, slot_valid=bucket.slot_valid)
