"""The public single-device model API (models.bpmf.half_sweep / gibbs_iter)
must work standalone — it is the library-level entry point documented for
embedding without the host Sampler (the reference exposes the same surface
as Sys::sample, c++/sample.cpp:341-385)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from bpmf_tpu.models.bpmf import (
    EvalData,
    EvalState,
    SideData,
    gibbs_iter,
    init_side_state,
)
from bpmf_tpu.ops.update import BucketDev
from bpmf_tpu.parallel import partition as part
from tests.conftest import make_ratings


def _side_data(m_csc, maps, other_maps, dtype=jnp.float32):
    layout = part.build_gather_layout(m_csc, maps, other_maps.orig_to_padded)
    buckets = tuple(
        BucketDev(
            nbr=jnp.asarray(b.nbr[0]),
            val=jnp.asarray(b.val[0], dtype),
            mask=jnp.asarray(b.mask[0], dtype),
            row_slot=jnp.asarray(b.row_slot[0]),
            item_ids=jnp.asarray(b.item_ids[0]),
            orig_ids=jnp.asarray(b.orig_ids[0]),
            slot_valid=jnp.asarray(b.slot_valid[0], dtype),
        )
        for b in layout.buckets
    )
    return SideData(buckets=buckets), layout.splits


def test_gibbs_iter_public_api():
    train, test = make_ratings(seed=3)
    k = 4
    users_csc = sp.csc_matrix(train.T)
    movies = part.make_maps(
        part.assign_items(np.diff(train.indptr), 1), train.shape[1]
    )
    users = part.make_maps(
        part.assign_items(np.diff(users_csc.indptr), 1), users_csc.shape[1]
    )
    m_data, m_splits = _side_data(train, movies, users)
    u_data, u_splits = _side_data(users_csc, users, movies)

    state_m = init_side_state(movies.padded_num, k, jnp.float32, aggregate=False)
    state_u = init_side_state(users.padded_num, k, jnp.float32, aggregate=False)

    tcoo = test.tocoo()
    ev = EvalData(
        t_user=jnp.asarray(users.orig_to_padded[tcoo.row], jnp.int32),
        t_item=jnp.asarray(movies.orig_to_padded[tcoo.col], jnp.int32),
        t_val=jnp.asarray(tcoo.data, jnp.float32),
    )
    est = EvalState(
        pavg=jnp.zeros((test.nnz,), jnp.float32),
        pm2=jnp.zeros((test.nnz,), jnp.float32),
    )
    mean_rating = jnp.asarray(train.sum() / train.nnz, jnp.float32)
    key = jax.random.PRNGKey(0)

    rmses = []
    for it in range(4):
        state_m, state_u, est, metrics = gibbs_iter(
            state_m, state_u, est, m_data, u_data, ev, key,
            jnp.asarray(it, jnp.int32),
            num_movies=movies.num,
            num_users=users.num,
            mean_rating=mean_rating,
            alpha=2.0,
            burnin=1,
            movies_splits=m_splits,
            users_splits=u_splits,
        )
        rmses.append(float(metrics.rmse_avg))
    assert all(np.isfinite(r) for r in rmses), rmses
    assert rmses[-1] < rmses[0] * 1.2  # chain is sane, not diverging
