"""Mid-run checkpoint / resume.

The reference has NO mid-run checkpointing (SURVEY.md §5) — its functional
substitute is posterior propagation (-o writes the final posterior, -m/-l
feed it back as priors, c++/bpmf.cpp:221-240 + c++/sample.cpp:157-174),
which restarts the CHAIN, not the run.  This module adds true resume: the
full sampler state (items, hyperparams, stats, aggregates, Welford
predictions, iteration counter, RNG key) round-trips through one .npz file,
so a resumed run continues the exact same trajectory.

Format: flat npz with dotted keys; arrays are device-fetched on save and
re-sharded on load.  Works at any device count — state arrays are stored in
ORIGINAL item order, so a checkpoint written on one mesh can resume on
another (the same layout-invariance that makes D-device runs match 1-device
runs applies).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from bpmf_tpu.models.bpmf import EvalState, SideState
from bpmf_tpu.ops.mvnormal import HyperParams
from bpmf_tpu.parallel.mesh import to_host

FORMAT_VERSION = 1


def dataset_hash(sampler) -> np.uint64:
    """Content hash of (train, test) — binds a checkpoint to its dataset so
    a resume against different data fails loudly instead of silently
    producing a garbage trajectory."""
    import zlib

    h = 0
    for m in (sampler.train, sampler.test):
        for arr in (m.indptr, m.indices, m.data):
            h = zlib.crc32(np.ascontiguousarray(arr).tobytes(), h)
        h = zlib.crc32(np.asarray(m.shape, np.int64).tobytes(), h)
    return np.uint64(h)


def _side_to_host(side, state: SideState) -> dict:
    """Fetch one side's state in ORIGINAL item order."""
    idx = side.maps.orig_to_padded
    out = {
        "items": to_host(state.items, np.float64)[idx],
        "hp.mu": to_host(state.hp.mu, np.float64),
        "hp.lambda_f": to_host(state.hp.lambda_f, np.float64),
        "hp.lambda_l": to_host(state.hp.lambda_l, np.float64),
        "sum": to_host(state.sum, np.float64),
        "cov": to_host(state.cov, np.float64),
        "norm": to_host(state.norm, np.float64),
    }
    if state.aggr_mu is not None:
        from bpmf_tpu.models.bpmf import aggr_prod_full

        out["aggr_mu"] = to_host(state.aggr_mu, np.float64)[idx]
        # the on-disk format keeps the full [num, K, K] (stable across the
        # packed-triangle device-state change; pack again on load)
        out["aggr_prod"] = aggr_prod_full(
            to_host(state.aggr_prod, np.float64)[idx],
            state.aggr_mu.shape[-1],
        )
    return out


def save(path: str, sampler) -> None:
    """Write the sampler's full state to ``path`` (.npz).  In a
    multi-process run the host fetches are collective (every process must
    call save) and only process 0 writes the file."""
    payload = {
        "format_version": FORMAT_VERSION,
        "iter": sampler.iter,
        "key": np.asarray(sampler.key),
        "num_latent": sampler.cfg.num_latent,
        "nsims": sampler.cfg.nsims,
        "burnin": sampler.cfg.burnin,
        "dataset_hash": dataset_hash(sampler),
        # strip the entry-shard padding (multi-device eval pads nnz_t up to
        # a device multiple) so checkpoints are device-count-independent
        "eval.pavg": to_host(sampler.est.pavg, np.float64)[: len(sampler.t_val)],
        "eval.pm2": to_host(sampler.est.pm2, np.float64)[: len(sampler.t_val)],
        "rmse": sampler.rmse,
        "rmse_avg": sampler.rmse_avg,
    }
    for name, side, state in (
        ("movies", sampler.movies, sampler.state_m),
        ("users", sampler.users, sampler.state_u),
    ):
        for k, v in _side_to_host(side, state).items():
            payload[f"{name}.{k}"] = v
    import jax

    if jax.process_index() == 0:
        np.savez_compressed(path, **payload)


def _side_from_host(sampler, side, data: dict, prefix: str, aggregate: bool) -> SideState:
    dtype = sampler.dtype
    idx = side.maps.orig_to_padded
    pn = side.maps.padded_num
    k = sampler.cfg.num_latent

    def scatter(arr):
        out = np.zeros((pn,) + arr.shape[1:], arr.dtype)
        out[idx] = arr
        return out

    shard = sampler._shard
    items = shard(jnp.asarray(scatter(data[f"{prefix}.items"]), dtype), 0)
    hp = HyperParams(
        mu=jnp.asarray(data[f"{prefix}.hp.mu"], dtype),
        lambda_f=jnp.asarray(data[f"{prefix}.hp.lambda_f"], dtype),
        lambda_l=jnp.asarray(data[f"{prefix}.hp.lambda_l"], dtype),
    )
    aggr_mu = aggr_prod = None
    if aggregate:
        if f"{prefix}.aggr_mu" in data:
            from bpmf_tpu.models.bpmf import aggr_prod_pack

            aggr_mu = shard(jnp.asarray(scatter(data[f"{prefix}.aggr_mu"]), dtype), 0)
            aggr_prod = shard(
                jnp.asarray(
                    aggr_prod_pack(scatter(data[f"{prefix}.aggr_prod"])), dtype
                ),
                0,
            )
        else:
            aggr_mu = shard(jnp.zeros((pn, k), dtype), 0)
            aggr_prod = shard(jnp.zeros((pn, k * (k + 1) // 2), dtype), 0)
    return SideState(
        items=items,
        hp=hp,
        sum=jnp.asarray(data[f"{prefix}.sum"], dtype),
        cov=jnp.asarray(data[f"{prefix}.cov"], dtype),
        norm=jnp.asarray(data[f"{prefix}.norm"], dtype),
        aggr_mu=aggr_mu,
        aggr_prod=aggr_prod,
    )


def load(path: str, sampler) -> None:
    """Restore state saved by :func:`save` into a set-up sampler (its
    dataset/config must match; device count may differ)."""
    data = dict(np.load(path))
    version = int(data["format_version"])
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    if int(data["num_latent"]) != sampler.cfg.num_latent:
        raise ValueError(
            f"checkpoint K={int(data['num_latent'])} != config K={sampler.cfg.num_latent}"
        )
    if "dataset_hash" in data:
        want = np.uint64(data["dataset_hash"])
        have = dataset_hash(sampler)
        if want != have:
            raise ValueError(
                f"checkpoint was written for a different dataset "
                f"(hash {want:#x} != {have:#x}); refusing to resume"
            )
    sampler.setup()
    aggregate = bool(sampler.cfg.output_dir)
    sampler.state_m = _side_from_host(sampler, sampler.movies, data, "movies", aggregate)
    sampler.state_u = _side_from_host(sampler, sampler.users, data, "users", aggregate)
    # re-pad + re-shard the eval state to this sampler's entry layout
    # (multi-device pads nnz_t up to a device multiple, sampler.py setup)
    nnz_pad = sampler.ev.t_val.shape[0]
    pavg_np = np.pad(data["eval.pavg"], (0, nnz_pad - len(data["eval.pavg"])))
    pm2_np = np.pad(data["eval.pm2"], (0, nnz_pad - len(data["eval.pm2"])))
    pavg = jnp.asarray(pavg_np, sampler.dtype)
    pm2 = jnp.asarray(pm2_np, sampler.dtype)
    if sampler.n_devices > 1:
        pavg = sampler._shard(pavg, 1)
        pm2 = sampler._shard(pm2, 1)
    sampler.est = EvalState(pavg=pavg, pm2=pm2)
    sampler.iter = int(data["iter"])
    sampler.key = jnp.asarray(data["key"])
    sampler.rmse = float(data["rmse"])
    sampler.rmse_avg = float(data["rmse_avg"])
