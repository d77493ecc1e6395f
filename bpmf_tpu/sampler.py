"""Host-side Gibbs sampling driver.

The analog of the reference ``main()`` (c++/bpmf.cpp:69-260): loads the
train/test matrices, builds both sides, runs the Gibbs loop with the
reference's per-iteration log line, and writes the output files.  The whole
per-iteration computation (two half-sweeps + evaluation) is a single jitted
XLA program; the host loop only feeds the iteration counter and fetches the
four scalar metrics.
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from bpmf_tpu.config import Config
from bpmf_tpu.io import read_matrix, write_matrix
from bpmf_tpu.models.bpmf import (
    EvalData,
    EvalState,
    SideData,
    SideState,
    gibbs_iter,
    init_side_state,
    predict,
)
from bpmf_tpu.ops.update import BucketDev
from bpmf_tpu.sparse import BucketedSide, bucketize, pad_count
from bpmf_tpu.utils.counters import Counters, tick


class Side:
    """Host metadata for one side (name, sizes, bucket layout, outputs).

    The reference's Sys has movies = columns of the train matrix and users =
    rows (transpose ctor, c++/bpmf.cpp:131-132, c++/sample.cpp:132-137).
    """

    def __init__(
        self,
        name: str,
        m_csc: sp.csc_matrix,
        cfg: Config,
    ):
        self.name = name
        self.m = m_csc  # [num_other, num] — items are columns
        self.num = m_csc.shape[1]
        self.num_pad = pad_count(self.num + 1)
        self.scratch_id = self.num
        self.bucketed: BucketedSide = bucketize(
            m_csc,
            np.arange(self.num, dtype=np.int32),
            self.scratch_id,
            max_bucket_width=cfg.max_bucket_width,
        )
        self.splits = tuple(b.split for b in self.bucketed.buckets)
        self.prop_mu: Optional[np.ndarray] = None      # [num, K]
        self.prop_lambda: Optional[np.ndarray] = None  # [num, K, K]

    def nnz(self) -> int:
        return self.m.nnz

    def add_prop_posterior(self, fnames: str, num_latent: int) -> None:
        """Load propagated posterior '-m/-l mu.ddm,Lambda.ddm'
        (Sys::add_prop_posterior, c++/sample.cpp:157-174).  Shapes are
        asserted exactly like the reference: mu is K x num, Lambda is
        K^2 x num (column i reshapes to K x K column-major)."""
        if not fnames:
            return
        if "," not in fnames:
            raise ValueError(
                f"propagated posterior needs two files 'mu.ddm,Lambda.ddm', got {fnames!r}"
            )
        mu_name, lambda_name = fnames.split(",", 1)
        mu = read_matrix(mu_name)
        lam = read_matrix(lambda_name)
        k = num_latent
        assert mu.shape == (k, self.num), (mu.shape, (k, self.num))
        assert lam.shape == (k * k, self.num), (lam.shape, (k * k, self.num))
        self.prop_mu = np.ascontiguousarray(mu.T)
        self.prop_lambda = np.ascontiguousarray(
            lam.reshape((k, k, self.num), order="F").transpose(2, 0, 1)
        )

    def device_data(self, dtype) -> SideData:
        buckets = tuple(
            BucketDev(
                nbr=jnp.asarray(b.nbr),
                val=jnp.asarray(b.val, dtype),
                mask=jnp.asarray(b.mask, dtype),
                row_slot=jnp.asarray(b.row_slot),
                item_ids=jnp.asarray(b.item_ids),
                slot_valid=jnp.asarray(b.slot_valid, dtype),
            )
            for b in self.bucketed.buckets
        )
        prop_mu = prop_lambda = None
        if self.prop_mu is not None:
            k = self.prop_mu.shape[1]
            pm = np.zeros((self.num_pad, k), dtype=self.prop_mu.dtype)
            pm[: self.num] = self.prop_mu
            pl = np.tile(np.eye(k), (self.num_pad, 1, 1))
            pl[: self.num] = self.prop_lambda
            prop_mu = jnp.asarray(pm, dtype)
            prop_lambda = jnp.asarray(pl, dtype)
        return SideData(buckets=buckets, prop_mu=prop_mu, prop_lambda=prop_lambda)


class BPMF:
    """End-to-end sampler (single-device path; the SPMD path lives in
    bpmf_tpu.parallel.spmd and shares all model code)."""

    def __init__(
        self,
        cfg: Config,
        train: Optional[sp.spmatrix] = None,
        test: Optional[sp.spmatrix] = None,
        out=None,
    ):
        self.cfg = cfg
        self.counters = Counters(cfg.profile)
        self.out = out if out is not None else sys.stdout

        if train is None:
            train = read_matrix(cfg.train_file)
        if test is None:
            test = read_matrix(cfg.test_file)
        train = sp.csc_matrix(train)
        test = sp.csc_matrix(test)
        # conservativeResize to the common bounding shape (c++/sample.cpp:119-122)
        rows = max(train.shape[0], test.shape[0])
        cols = max(train.shape[1], test.shape[1])
        train.resize((rows, cols))
        test.resize((rows, cols))
        self.train = train
        self.test = test

        self.mean_rating = train.sum() / train.nnz
        # movies: columns of R; users: rows of R (c++/bpmf.cpp:131-132)
        self.movies = Side("movs", train, cfg)
        self.users = Side("users", sp.csc_matrix(train.T), cfg)
        if cfg.prop_v:
            self.movies.add_prop_posterior(cfg.prop_v, cfg.num_latent)
        if cfg.prop_u:
            self.users.add_prop_posterior(cfg.prop_u, cfg.num_latent)

        tcoo = test.tocoo()
        order = np.lexsort((tcoo.row, tcoo.col))  # column-major like Eigen
        self.t_user = tcoo.row[order].astype(np.int32)
        self.t_item = tcoo.col[order].astype(np.int32)
        self.t_val = tcoo.data[order]

        self.iter = -1  # like Sys::iter (c++/sample.cpp:113)
        self.rmse = float("nan")
        self.rmse_avg = float("nan")
        self.average_items_sec = 0.0
        self.average_ratings_sec = 0.0
        self._setup_done = False

    # -- setup ------------------------------------------------------------

    def setup(self) -> None:
        if self._setup_done:
            return
        cfg = self.cfg
        if cfg.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        aggregate = bool(cfg.output_dir)
        self.movies_data = self.movies.device_data(self.dtype)
        self.users_data = self.users.device_data(self.dtype)
        self.ev = EvalData(
            t_user=jnp.asarray(self.t_user),
            t_item=jnp.asarray(self.t_item),
            t_val=jnp.asarray(self.t_val, self.dtype),
        )
        self.state_m = init_side_state(
            self.movies.num_pad, cfg.num_latent, self.dtype, aggregate
        )
        self.state_u = init_side_state(
            self.users.num_pad, cfg.num_latent, self.dtype, aggregate
        )
        self.est = EvalState(
            pavg=jnp.zeros((len(self.t_val),), self.dtype),
            pm2=jnp.zeros((len(self.t_val),), self.dtype),
        )
        self.key = jax.random.PRNGKey(cfg.seed)
        mean_rating = jnp.asarray(self.mean_rating, self.dtype)
        self._mean_rating_dev = mean_rating

        def _iter(movies, users, est, movies_data, users_data, ev, key, it):
            return gibbs_iter(
                movies,
                users,
                est,
                movies_data,
                users_data,
                ev,
                key,
                it,
                num_movies=self.movies.num,
                num_users=self.users.num,
                mean_rating=mean_rating,
                alpha=cfg.alpha,
                burnin=cfg.burnin,
                movies_splits=self.movies.splits,
                users_splits=self.users.splits,
                diagonal_only=cfg.diagonal_only,
                strict_reference=cfg.strict_reference,
            )

        self._iter_fn = jax.jit(_iter, donate_argnums=(0, 1, 2))
        self._setup_done = True
        self._log_banner()

    def _log(self, msg: str) -> None:
        print(msg, file=self.out, flush=True)

    def _log_banner(self) -> None:
        cfg = self.cfg
        m = self.movies
        # dataset statistics banner (Sys::init, c++/sample.cpp:203-219)
        degs = np.diff(self.train.tocsc().indptr)
        bp1, bp2 = 24, 10500  # breakpoint1/2 (c++/bpmf.h:255-256)
        self._log(f"mean rating: {self.mean_rating:.6g}")
        self._log(f"total number of ratings in train: {self.train.nnz}")
        self._log(f"total number of ratings in test: {self.test.nnz}")
        self._log(f"average ratings per row: {degs.mean():.6g}")
        self._log(f"rows > break_point1: {100.0 * (degs > bp1).mean():.6g}")
        self._log(f"rows > break_point2: {100.0 * (degs > bp2).mean():.6g}")
        self._log(f"num movs: {self.movies.num}")
        self._log(f"num users: {self.users.num}")
        if m.prop_mu is not None or self.users.prop_mu is not None:
            self._log("with propagated posterior")
        self._log(f"num_latent: {cfg.num_latent}")
        self._log(f"nsims: {cfg.nsims}")
        self._log(f"burnin: {cfg.burnin}")
        self._log(f"alpha: {cfg.alpha}")
        self._log(f"update_freq: {cfg.update_freq}")
        self._log(
            "bucket layout movs: "
            + ", ".join(
                f"{b.n_rows}x{b.width}" for b in self.movies.bucketed.buckets
            )
            + f" (pad ratio {self.movies.bucketed.padded_ratio():.2f})"
        )
        self._log(
            "bucket layout users: "
            + ", ".join(
                f"{b.n_rows}x{b.width}" for b in self.users.bucketed.buckets
            )
            + f" (pad ratio {self.users.bucketed.padded_ratio():.2f})"
        )

    # -- Gibbs loop --------------------------------------------------------

    def step(self) -> dict:
        """One full Gibbs iteration; returns host metrics."""
        self.iter += 1
        it = jnp.asarray(self.iter, jnp.int32)
        self.state_m, self.state_u, self.est, metrics = self._iter_fn(
            self.state_m,
            self.state_u,
            self.est,
            self.movies_data,
            self.users_data,
            self.ev,
            self.key,
            it,
        )
        return metrics

    def run(self) -> float:
        """Full training run with the reference's per-iteration log line
        (c++/bpmf.cpp:180-210, print format c++/sample.cpp:101-107).
        Returns Final Avg RMSE."""
        self.setup()
        cfg = self.cfg
        begin = tick()
        num_items = self.users.num + self.movies.num
        nnz = self.train.nnz
        sample_dumps = []

        for i in range(cfg.nsims):
            start = tick()
            with self.counters.scope("main"):
                metrics = self.step()
                metrics = jax.device_get(metrics)
            stop = tick()
            self.rmse = float(metrics.rmse)
            self.rmse_avg = float(metrics.rmse_avg)
            items_per_sec = num_items / (stop - start)
            ratings_per_sec = nnz / (stop - start)
            self.average_items_sec += items_per_sec
            self.average_ratings_sec += ratings_per_sec
            phase = "Burnin" if self.iter < cfg.burnin else "Sampling"
            self._log(
                f"0: {phase} iteration {self.iter}:\t RMSE: {self.rmse:3.4f}\t"
                f"avg RMSE: {self.rmse_avg:3.4f}\t"
                f"FU({float(metrics.norm_users):6.2f})\t"
                f"FM({float(metrics.norm_movies):6.2f})\t"
                f"items/sec: {items_per_sec:6.2f}\t"
                f"ratings/sec: {ratings_per_sec / 1e6:6.2f}M"
            )
            if cfg.verbose and cfg.output_dir:
                # per-iteration model dump (-v, c++/bpmf.cpp:200-209)
                u = np.asarray(self.state_u.items[: self.users.num], np.float64)
                v = np.asarray(self.state_m.items[: self.movies.num], np.float64)
                write_matrix(os.path.join(cfg.output_dir, f"U-{i}.ddm"), u.T)
                write_matrix(os.path.join(cfg.output_dir, f"V-{i}.ddm"), v.T)
                sample_dumps.append(i)

        elapsed = tick() - begin

        # final all-items prediction pass (c++/bpmf.cpp:225,242): one more
        # Welford update with the last sample, matching the reference.
        est, rmse, rmse_avg = predict(
            self.ev,
            self.est,
            self.state_u.items,
            self.state_m.items,
            jnp.asarray(self.iter, jnp.int32),
            mean_rating=self._mean_rating_dev,
            burnin=cfg.burnin,
        )
        self.est = est
        self.rmse = float(rmse)
        self.rmse_avg = float(rmse_avg)

        if cfg.output_dir:
            self.write_output()

        niter = max(self.iter + 1, 1)
        self._log(f"Total time: {elapsed:.6g}")
        self._log(f"Final Avg RMSE: {self.rmse_avg:.6g}")
        self._log(
            f"  computed on {len(self.t_val)} items "
            f"(100% of total items in test set)"
        )
        self._log(f"Average items/sec: {self.average_items_sec / niter:.6g}")
        self._log(f"Average ratings/sec: {self.average_ratings_sec / niter:.6g}")
        rep = self.counters.report()
        if rep:
            self._log(rep)
        return self.rmse_avg

    # -- outputs -----------------------------------------------------------

    def write_output(self) -> None:
        """Write Pavg/Pm2 predictions and the aggregated posterior
        (c++/bpmf.cpp:221-240)."""
        cfg = self.cfg
        odir = cfg.output_dir
        os.makedirs(odir, exist_ok=True)
        shape = self.test.shape

        pavg = np.asarray(self.est.pavg, np.float64)
        pm2 = np.asarray(self.est.pm2, np.float64)
        pavg_m = sp.csc_matrix((pavg, (self.t_user, self.t_item)), shape=shape)
        pm2_m = sp.csc_matrix((pm2, (self.t_user, self.t_item)), shape=shape)
        write_matrix(os.path.join(odir, "Pavg.sdm"), pavg_m)
        write_matrix(os.path.join(odir, "Pm2.sdm"), pm2_m)

        for prefix, side, state in (
            ("U", self.users, self.state_u),
            ("V", self.movies, self.state_m),
        ):
            mu, lam = self._finalize_mu_lambda(side, state)
            write_matrix(os.path.join(odir, f"{prefix}-mu.ddm"), mu)
            write_matrix(os.path.join(odir, f"{prefix}-Lambda.ddm"), lam)

    def _finalize_mu_lambda(self, side: Side, state: SideState):
        """aggr sums -> posterior mean (K x num) and per-item precision
        (K^2 x num) (Sys::finalize_mu_lambda, c++/bpmf.cpp:281-295)."""
        cfg = self.cfg
        nsamples = cfg.nsims - cfg.burnin
        aggr_mu = np.asarray(state.aggr_mu[: side.num], np.float64)   # [num, K]
        aggr_prod = np.asarray(state.aggr_prod[: side.num], np.float64)
        k = aggr_mu.shape[1]
        outer = np.einsum("nk,nl->nkl", aggr_mu, aggr_mu) / nsamples
        cov = (aggr_prod - outer) / (nsamples - 1)
        prec = np.linalg.inv(cov)                                      # [num, K, K]
        mu = (aggr_mu / nsamples).T                                    # [K, num]
        # column i = vec(prec_i) column-major, like Eigen Map (bpmf.cpp:292)
        lam = prec.transpose(1, 2, 0).reshape(k * k, side.num, order="F")
        return mu, lam
