"""Host-side Gibbs sampling driver.

The analog of the reference ``main()`` (c++/bpmf.cpp:69-260): loads the
train/test matrices, builds both sides, runs the Gibbs loop with the
reference's per-iteration log line, and writes the output files.

Execution is ALWAYS the SPMD program of bpmf_tpu.parallel.spmd over a 1-D
``jax.sharding.Mesh`` (a single device is just a 1-device mesh): U and V are
sharded over the ``'i'`` axis, exchange mode is ``gather`` (value exchange)
or ``reduce`` (statistic exchange) — the runtime replacement for the
reference's nine compile-time comm backends.  The whole per-iteration
computation (two half-sweeps + evaluation) is one jitted XLA program; the
host loop feeds the iteration counter and fetches four scalar metrics.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bpmf_tpu.config import Config
from bpmf_tpu.io import read_matrix, write_matrix
from bpmf_tpu.models.bpmf import (
    EvalData,
    EvalState,
    Metrics,
    SideData,
    SideState,
    predict,
)
from bpmf_tpu.ops.mvnormal import HyperParams
from bpmf_tpu.ops.update import BucketDev
from bpmf_tpu.parallel import partition as part
from bpmf_tpu.parallel.mesh import make_mesh, to_host
from bpmf_tpu.parallel.spmd import (
    AXIS,
    dense8_half_sweep,
    dense8_half_sweep_sharded,
    dense_half_sweep,
    dense_half_sweep_fused,
    gather_half_sweep,
    reduce_half_sweep,
    reduce_half_sweep_chunked,
)
from bpmf_tpu.utils.counters import Counters, tick


class Side:
    """Host metadata for one side (movies = columns of the train matrix,
    users = rows; c++/bpmf.cpp:131-132, c++/sample.cpp:132-137)."""

    def __init__(self, name: str, m_csc: sp.csc_matrix, cfg: Config,
                 n_devices: int):
        self.name = name
        self.m = m_csc  # [num_other, num] — items are columns
        self.num = m_csc.shape[1]
        self.degrees = np.diff(m_csc.indptr)
        ids = part.assign_items(self.degrees, n_devices, balance=cfg.permute)
        self.maps = part.make_maps(ids, self.num)
        self.gather: Optional[part.GatherLayout] = None
        self.halo: Optional[part.HaloLayout] = None
        self.reduce: Optional[part.ReduceLayout] = None
        self.reduce_chunked: Optional[part.ReduceLayoutChunked] = None
        self.chunked_splits: tuple = ()
        self.dense: Optional[np.ndarray] = None        # [D, local_pad, other_pad]
        self.impl: str = "bucketed"
        self.prop_mu: Optional[np.ndarray] = None      # [num, K]
        self.prop_lambda: Optional[np.ndarray] = None  # [num, K, K]

    def nnz(self) -> int:
        return self.m.nnz

    def add_prop_posterior(self, fnames: str, num_latent: int) -> None:
        """Load propagated posterior '-m/-l mu.ddm,Lambda.ddm'
        (Sys::add_prop_posterior, c++/sample.cpp:157-174).  Shapes asserted
        like the reference: mu is K x num, Lambda is K^2 x num (column i
        reshapes to K x K column-major)."""
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

    # -- device data -------------------------------------------------------

    def _buckets_dev(self, buckets, dtype, shard):
        return tuple(
            BucketDev(
                nbr=shard(jnp.asarray(b.nbr), 3),
                val=shard(jnp.asarray(b.val, dtype), 3),
                mask=shard(jnp.asarray(b.mask, jnp.int8), 3),
                row_slot=shard(jnp.asarray(b.row_slot), 2),
                item_ids=shard(jnp.asarray(b.item_ids), 2),
                orig_ids=shard(jnp.asarray(b.orig_ids), 2),
                slot_valid=shard(jnp.asarray(b.slot_valid, dtype), 2),
            )
            for b in buckets
        )

    def prop_padded_np(self, num_latent: int):
        """Propagated posterior in padded device order; padding slots get an
        identity precision and zero mean (their draws are masked out)."""
        k = num_latent
        pn = self.maps.padded_num
        pm = np.zeros((pn, k), self.prop_mu.dtype)
        pl = np.tile(np.eye(k), (pn, 1, 1))
        idx = self.maps.orig_to_padded
        pm[idx] = self.prop_mu
        pl[idx] = self.prop_lambda
        return pm, pl

    def _prop_dev(self, dtype, shard, num_latent):
        if self.prop_mu is None:
            return None, None
        pm, pl = self.prop_padded_np(num_latent)
        return (
            shard(jnp.asarray(pm, dtype), 0),
            shard(jnp.asarray(pl, dtype), 0),
        )

    def device_data(self, dtype, shard, num_latent, mode: str,
                    skip_prop: bool = False):
        """``skip_prop``: the side's sweep consumes the propagated posterior
        through the packed-triangle operands (sampler aux 'prior') instead —
        don't upload the [num_pad, K, K] form at all."""
        if skip_prop:
            prop_mu, prop_lambda = None, None
        else:
            prop_mu, prop_lambda = self._prop_dev(dtype, shard, num_latent)
        gather_data = SideData(
            buckets=(
                self._buckets_dev(self.gather.buckets, dtype, shard)
                if self.gather is not None else ()
            ),
            prop_mu=prop_mu,
            prop_lambda=prop_lambda,
        )
        reduce_data = None
        if mode == "reduce" and self.reduce_chunked is not None:
            # list of per-destination SideData; prop rides on the first
            self.chunked_splits = tuple(
                splits for _, splits in self.reduce_chunked.per_dest
            )
            reduce_data = [
                SideData(
                    buckets=self._buckets_dev(buckets, dtype, shard),
                    prop_mu=prop_mu if d == 0 else None,
                    prop_lambda=prop_lambda if d == 0 else None,
                )
                for d, (buckets, _) in enumerate(self.reduce_chunked.per_dest)
            ]
        elif mode == "reduce" and self.reduce is not None:
            reduce_data = SideData(
                buckets=self._buckets_dev(self.reduce.buckets, dtype, shard),
                prop_mu=prop_mu,
                prop_lambda=prop_lambda,
            )
        return gather_data, reduce_data


class BPMF:
    """End-to-end sampler over a 1-D device mesh."""

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

        n_avail = len(jax.devices())
        self.n_devices = cfg.n_devices if cfg.n_devices > 0 else n_avail
        if self.n_devices > n_avail:
            raise ValueError(
                f"requested {self.n_devices} devices, only {n_avail} available"
            )
        self.mode = "gather" if cfg.comm_mode == "auto" else cfg.comm_mode

        # movies: columns of R; users: rows of R (c++/bpmf.cpp:131-132)
        self.movies = Side("movs", train, cfg, self.n_devices)
        self.users = Side("users", sp.csc_matrix(train.T), cfg, self.n_devices)
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
        # 'auto' dtype: resolve against the data BEFORE anything reads
        # cfg.dtype (x64 flag, solver/matmul policies, dense8 eligibility)
        resolved_dtype = cfg.resolve_dtype(min(self.train.shape))
        if cfg.dtype == "auto" and resolved_dtype == "float64":
            self._log(
                f"dtype auto -> float64: min side {min(self.train.shape)} < "
                f"2*K={2 * cfg.num_latent} (f32's Cholesky headroom is not "
                "enough when the Normal-Wishart df barely exceeds K; the "
                "all-double reference never faces this)"
            )
        cfg.dtype = resolved_dtype
        # Persistent XLA compilation cache: TPU compiles of the sweep program
        # can take minutes (backend-dependent); cache them across processes.
        cache_dir = os.environ.get(
            "BPMF_XLA_CACHE", os.path.expanduser("~/.cache/bpmf_tpu_xla")
        )
        if (
            cache_dir
            and not jax.config.jax_compilation_cache_dir
            and jax.default_backend() == "tpu"  # CPU AOT entries are
            # machine-feature-specific and can SIGILL on another host
        ):
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if cfg.dtype == "float64":
            jax.config.update("jax_enable_x64", True)
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        dtype = self.dtype

        self.mesh = make_mesh(self.n_devices)

        # int8 dense-stream eligibility (ops/dense8): one shared
        # [users_pad, movies_pad] int8 code array, ratings on an exact
        # affine grid (true for the whole MovieLens family).  Multi-chip:
        # the array is sharded by user rows (dense8_half_sweep_sharded) —
        # each device stores and streams R/D x C int8.
        from bpmf_tpu.ops.dense8 import (
            BLOCK_MULTIPLE,
            quantize_values,
        )
        from bpmf_tpu.ops.pallas_solve import tri_fused_supported

        self._codes = None
        self._d8_quant = None
        d8_ok = (
            cfg.gram_impl in ("auto", "dense8")
            and cfg.dtype == "float32"
            and not cfg.diagonal_only
            # profiling ablations keep the path eligible so --profile
            # attribution measures THIS path, not a fallback (the sharded
            # variant implements only nopredict)
            and cfg.ablate in (
                ("", "nopredict", "nomatmul", "nosolve", "nohyper", "nonoise")
                if self.n_devices == 1
                else ("", "nopredict", "nohyper", "nonoise")
            )
            and tri_fused_supported(cfg.num_latent)
        )
        if d8_ok:
            q = quantize_values(self.train.data)
            rp = -(-self.users.maps.padded_num // BLOCK_MULTIPLE) * BLOCK_MULTIPLE
            cp = -(-self.movies.maps.padded_num // BLOCK_MULTIPLE) * BLOCK_MULTIPLE
            # the budget is PER DEVICE: rows shard over the mesh
            d8_ok = (
                q is not None
                and rp * cp // self.n_devices <= cfg.dense8_limit_bytes
            )
            self._d8_quant = q
        if cfg.gram_impl == "dense8" and not d8_ok:
            raise ValueError(
                "gram_impl='dense8' needs float32, grid-quantizable "
                "ratings, and K within the fused tri kernel's VMEM budget"
            )

        def d8_side_ok(side: Side) -> bool:
            if not d8_ok:
                return False
            if side.prop_mu is not None and not tri_fused_supported(
                cfg.num_latent, peritem=True
            ):
                # the propagated posterior rides the fused solver as a
                # second [T, B] VMEM tile (ops/pallas_solve, per-item
                # variant); fall back when K doesn't fit that budget
                return False
            if cfg.gram_impl == "dense8":
                return True
            # auto: TPU only (interpret-mode Pallas off-TPU is tests-only).
            # Both exchange modes ride the dense-stream program: the sharded
            # variant never replicates the big (users) side — its sweep
            # all_gathers only the small side's vectors, and the other
            # sweep exchanges per-item statistics via psum_scatter — so an
            # explicit --mode reduce keeps REDUCE's memory contract
            # (c++/mpi_reduce.h:29-45) without falling back to the slow
            # bucketed program (a banner line records the routing).
            # Engage only under the default solver family — a user-forced
            # exact solver keeps the path that honors it.  dense8 is
            # preferred at EVERY eligible scale since round 5: the round-2
            # "fused dense wins below the budget" note (7.8M vs 6.9M
            # items/s) predates the fold/aligned dense8 kernels, and the
            # round-5 in-context A/B measured dense8 faster at ml-100k
            # (0.98x), ml-1m/4 (0.86x) and ml-1m (0.94x) scale — one int8
            # pass over the ratings beats two bf16 block reads — and its
            # program compiles ~10x faster than the fused dense sweep
            # (12.6 vs 119.7 s at ml-1m; docs/measurements/
            # r5_ml1m_impl_ab.log, r5_ml100k_impl_ab.log)
            return (
                jax.default_backend() == "tpu"
                and self.mode in ("gather", "reduce")
                and cfg.resolve_solver("tpu") in ("smart", "pallas")
            )

        # per-side Gram implementation: int8 dense-stream where eligible;
        # dense bf16 adjacency (two MXU matmuls, zero gathers — see
        # partition.build_dense_layout) while the block fits the budget;
        # degree-bucketed padded CSR beyond that.
        def choose_impl(side: Side, other: Side) -> str:
            if d8_side_ok(side):
                return "dense8"
            if cfg.gram_impl == "dense8":  # side excluded (prop posterior)
                return "dense" if self.mode == "gather" else "bucketed"
            if cfg.gram_impl != "auto":
                return cfg.gram_impl
            if self.mode != "gather":
                return "bucketed"
            a_bytes = side.maps.padded_num * other.maps.padded_num * 4
            if a_bytes > cfg.dense_limit_bytes:
                return "bucketed"
            return "dense"

        self.movies.impl = choose_impl(self.movies, self.users)
        self.users.impl = choose_impl(self.users, self.movies)

        if "dense8" in (self.movies.impl, self.users.impl):
            # the shared code array needs both sides' padded counts to be
            # multiples of the kernel block size
            for side in (self.movies, self.users):
                side.maps = part.make_maps(
                    side.maps.ids_per_dev, side.num, multiple=BLOCK_MULTIPLE
                )

        # layouts
        with self.counters.scope("layout"):
            for side, other in (
                (self.movies, self.users),
                (self.users, self.movies),
            ):
                if side.impl == "dense8":
                    pass  # shared code array, built once below
                elif side.impl == "dense":
                    side.dense = part.build_dense_layout(
                        side.m, side.maps,
                        other.maps.orig_to_padded, other.maps.padded_num,
                    )
                elif self.mode == "reduce":
                    full_buf = (
                        side.maps.padded_num * cfg.num_latent ** 2
                        * (8 if cfg.dtype == "float64" else 4)
                    )
                    chunked = cfg.reduce_chunked == "on" or (
                        cfg.reduce_chunked == "auto"
                        and self.n_devices > 1
                        and full_buf > cfg.reduce_chunk_limit_bytes
                    )
                    if chunked:
                        side.reduce_chunked = part.build_reduce_layout_chunked(
                            side.m, side.maps, other.maps.ids_per_dev,
                            cfg.max_bucket_width, cfg.bucket_growth,
                        )
                    else:
                        side.reduce = part.build_reduce_layout(
                            side.m, side.maps.orig_to_padded,
                            side.maps.padded_num, other.maps.ids_per_dev,
                            cfg.max_bucket_width, cfg.bucket_growth,
                        )
                else:
                    side.gather = part.build_gather_layout(
                        side.m, side.maps,
                        other.maps.orig_to_padded, cfg.max_bucket_width,
                        cfg.bucket_growth,
                    )
                    # connectivity-aware exchange (opt_conn analog): only
                    # when the halo at least halves the volume —
                    # dense-connectivity datasets keep the all_gather.
                    # The 0.5 threshold is a layout-arithmetic heuristic,
                    # not a measurement: D-1 serialized ppermute rounds can
                    # lose to one fused all_gather near the break-even, and
                    # real multi-chip hardware was unavailable to calibrate
                    # it.  Force with --halo on/off where it matters.
                    if self.n_devices > 1 and cfg.halo != "off":
                        hl = part.build_halo_layout(
                            side.m, side.maps, other.maps
                        )
                        if cfg.halo == "on" or hl.volume_ratio <= 0.5:
                            side.halo = hl

        def shard(x, rank):
            spec = P(AXIS, *([None] * (rank - 1)))
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        self._shard = shard

        if "dense8" in (self.movies.impl, self.users.impl):
            from bpmf_tpu.ops.dense8 import build_code_array

            q = self._d8_quant
            coo = self.train.tocoo()
            codes_np = build_code_array(
                self.users.maps.orig_to_padded[coo.row],
                self.movies.maps.orig_to_padded[coo.col],
                coo.data,
                q,
                self.users.maps.padded_num,
                self.movies.maps.padded_num,
            )
            with self.counters.scope("upload"):
                # numpy straight to device — jnp.asarray first would create
                # a second device copy of the multi-GB array.  Sharded by
                # user rows: each device holds R/D x C int8.
                self._codes = jax.device_put(
                    codes_np, NamedSharding(self.mesh, P(AXIS, None))
                )
            del codes_np
            self._d8_cs = float(q.scale * cfg.alpha)
            self._d8_cb = float((q.offset - self.mean_rating) * cfg.alpha)
        self._d8_interpret = jax.default_backend() != "tpu"
        self.solver = cfg.resolve_solver(jax.default_backend())
        self.matmul_dtype = cfg.resolve_matmul_dtype(jax.default_backend())
        md = jnp.bfloat16 if self.matmul_dtype == "bfloat16" else dtype
        self._md = md

        # packed-triangle fused dense sweep eligibility (per side: needs the
        # shared hyperprior — the propagated-posterior branch keeps the
        # generic path)
        from bpmf_tpu.ops.pallas_solve import tri_fused_supported

        def fuse_ok(side: Side) -> bool:
            if cfg.fuse_dense == "off" or side.impl != "dense":
                return False
            eligible = (
                tri_fused_supported(cfg.num_latent)
                and not cfg.diagonal_only
                and cfg.ablate in ("", "nopredict", "nomatmul", "nosolve",
                                   "nohyper", "nonoise")
                # propagated posterior rides the fused solver as a second
                # [T, B] VMEM tile (per-item prior variant) when K fits
                and (side.prop_mu is None
                     or tri_fused_supported(cfg.num_latent, peritem=True))
                and self.solver in ("smart", "pallas")
            )
            if cfg.fuse_dense == "on":
                return eligible
            return eligible and jax.default_backend() == "tpu"

        self._fuse_interpret = (
            cfg.fuse_dense == "on" and jax.default_backend() != "tpu"
        )
        def prior_fast(side: Side) -> bool:
            # the side's sweep consumes the propagated posterior through the
            # packed-triangle operands instead of the [num_pad, K, K] form
            # (c++/sample.cpp:272-283 on the fast paths)
            return side.prop_mu is not None and (
                side.impl == "dense8" or fuse_ok(side)
            )

        aggregate = bool(cfg.output_dir)
        with self.counters.scope("upload"):
            self.movies_gdata, self.movies_rdata = self.movies.device_data(
                dtype, shard, cfg.num_latent, self.mode,
                skip_prop=prior_fast(self.movies),
            )
            self.users_gdata, self.users_rdata = self.users.device_data(
                dtype, shard, cfg.num_latent, self.mode,
                skip_prop=prior_fast(self.users),
            )

        # per-side auxiliary maps (reduce + dense paths)
        self._aux = {}
        for side in (self.movies, self.users):
            aux = dict(
                local_orig=shard(jnp.asarray(side.maps.local_orig), 2),
                local_valid=shard(jnp.asarray(side.maps.local_valid, dtype), 2),
                dense=None,
            )
            aux["fused"] = fuse_ok(side)
            aux["prior"] = (None, None)
            aux["halo"] = (None, None)
            if side.halo is not None:
                aux["halo"] = (
                    tuple(shard(jnp.asarray(a), 2)
                          for a in side.halo.send_rows),
                    tuple(shard(jnp.asarray(a), 2)
                          for a in side.halo.recv_pos),
                )
            if prior_fast(side):
                # packed-triangle per-item prior precision [T, num_pad]
                # (batch-last, item-sharded) + the static prior rhs when the
                # mathematically-intended Lambda_i @ propMu_i applies
                # (strict_reference=False); under the reference's
                # c++/sample.cpp:285 quirk the rhs depends on the sampled
                # hp.mu and is derived inside the sweep instead
                from bpmf_tpu.ops.pallas_solve import pack_prior_tri

                pm, pl = side.prop_padded_np(cfg.num_latent)

                def shard_cols(x):
                    return jax.device_put(
                        x, NamedSharding(self.mesh, P(None, AXIS))
                    )

                prior_tri_t = shard_cols(
                    jnp.asarray(pack_prior_tri(pl, cfg.num_latent), dtype)
                )
                prior_rhs_t = None
                if not cfg.strict_reference:
                    rhs_np = np.einsum("skl,sl->sk", pl, pm).T  # [K, pn]
                    prior_rhs_t = shard_cols(
                        jnp.asarray(np.ascontiguousarray(rhs_np), dtype)
                    )
                aux["prior"] = (prior_tri_t, prior_rhs_t)
            if side.impl == "dense8":
                # the shared code array is passed ONCE as its own jit
                # argument (self._codes) — passing the same buffer through
                # both sides' dense slots makes XLA reserve its HBM twice
                pass
            elif side.impl == "dense":
                # precompute the indicator / centered-value blocks in the
                # MXU input dtype once: deriving them per-iteration from
                # the raw f32 block costs ~3x the matmuls' HBM traffic
                d, lp, opn = side.dense.shape
                flat = side.dense.reshape(d * lp, opn)
                ind_np = flat != 0
                val_np = (
                    (flat - np.float32(self.mean_rating))
                    * ind_np
                    * np.float32(cfg.alpha)
                ).astype(np.float32)
                if aux["fused"]:
                    # fused sweep: indicator TRANSPOSED [N, D*lp] for the
                    # packed-tri Gram matmul (device d owns columns
                    # [d*lp, (d+1)*lp)); values stay row-major for the rhs
                    def shard_t(x):
                        return jax.device_put(
                            x, NamedSharding(self.mesh, P(None, AXIS))
                        )

                    aux["dense"] = (
                        shard_t(jnp.asarray(np.ascontiguousarray(ind_np.T), md)),
                        shard(jnp.asarray(val_np, md), 0),
                    )
                else:
                    aux["dense"] = (
                        shard(jnp.asarray(ind_np, md), 0),
                        shard(jnp.asarray(val_np, md), 0),
                    )
            self._aux[side.name] = aux

        # eval data in padded index space.  Multi-device: the test entries
        # and the Welford state are SHARDED over the mesh (padded to a
        # device multiple, `valid` masking the padding) so the per-entry
        # row gather — a replicated ~10 ms at ml-25M scale — splits 1/D
        # per device (parallel/spmd.predict_sharded).
        tu_np = self.users.maps.orig_to_padded[self.t_user].astype(np.int32)
        ti_np = self.movies.maps.orig_to_padded[self.t_item].astype(np.int32)
        tv_np = np.asarray(self.t_val)
        if self.n_devices > 1:
            nnz_t = len(tv_np)
            pad = (-nnz_t) % self.n_devices
            valid_np = np.ones(nnz_t + pad, np.float32)
            valid_np[nnz_t:] = 0.0
            self.ev = EvalData(
                t_user=shard(jnp.asarray(np.pad(tu_np, (0, pad))), 1),
                t_item=shard(jnp.asarray(np.pad(ti_np, (0, pad))), 1),
                t_val=shard(jnp.asarray(np.pad(tv_np, (0, pad)), dtype), 1),
                valid=shard(jnp.asarray(valid_np, dtype), 1),
            )
        else:
            self.ev = EvalData(
                t_user=jnp.asarray(tu_np),
                t_item=jnp.asarray(ti_np),
                t_val=jnp.asarray(tv_np, dtype),
            )

        def init_state(side: Side) -> SideState:
            k = cfg.num_latent
            pn = side.maps.padded_num
            return SideState(
                items=shard(jnp.zeros((pn, k), dtype), 0),
                hp=HyperParams.init(k, dtype),
                sum=jnp.zeros((k,), dtype),
                cov=jnp.zeros((k, k), dtype),
                norm=jnp.zeros((), dtype),
                aggr_mu=shard(jnp.zeros((pn, k), dtype), 0) if aggregate else None,
                aggr_prod=(
                    shard(jnp.zeros((pn, k * (k + 1) // 2), dtype), 0)
                    if aggregate else None
                ),
            )

        self.state_m = init_state(self.movies)
        self.state_u = init_state(self.users)
        nnz_pad = self.ev.t_val.shape[0]
        if self.n_devices > 1:
            self.est = EvalState(
                pavg=shard(jnp.zeros((nnz_pad,), dtype), 1),
                pm2=shard(jnp.zeros((nnz_pad,), dtype), 1),
            )
        else:
            self.est = EvalState(
                pavg=jnp.zeros((nnz_pad,), dtype),
                pm2=jnp.zeros((nnz_pad,), dtype),
            )
        self.key = jax.random.PRNGKey(cfg.seed)
        mean_rating = jnp.asarray(self.mean_rating, dtype)
        self._mean_rating_dev = mean_rating

        mesh = self.mesh
        mode = self.mode
        common = dict(
            mean_rating=mean_rating,
            alpha=cfg.alpha,
            burnin=cfg.burnin,
            diagonal_only=cfg.diagonal_only,
            strict_reference=cfg.strict_reference,
            noise_scale=1.0,
            solver=self.solver,
            matmul_dtype=self.matmul_dtype,
            ablate=cfg.ablate,
        )

        def sweep(state, gdata, rdata, dense, maps, other_items, key, it,
                  side: Side, codes=None, hp=None, prior=(None, None),
                  halo=(None, None)):
            # maps = (local_orig, local_valid): passed as jit arguments, not
            # closures — closed-over sharded arrays are rejected in
            # multi-process runs (they span non-addressable devices)
            local_orig, local_valid = maps
            aux = self._aux[side.name]
            if side.impl == "dense8":
                d8 = (
                    dense8_half_sweep if self.n_devices == 1
                    else functools.partial(dense8_half_sweep_sharded, mesh)
                )
                return d8(
                    state, codes, other_items, key, it,
                    num=side.num,
                    local_orig=local_orig,
                    local_valid=local_valid,
                    alpha=cfg.alpha,
                    burnin=cfg.burnin,
                    noise_scale=1.0,
                    cs=self._d8_cs,
                    cb=self._d8_cb,
                    orientation="rows" if side is self.users else "cols",
                    matmul_dtype=md,
                    interpret=self._d8_interpret,
                    ablate=cfg.ablate,
                    hp=hp,
                    prior_tri_t=prior[0],
                    prior_rhs_t=prior[1],
                )
            if side.impl == "dense" and aux["fused"]:
                return dense_half_sweep_fused(
                    mesh, state, dense[0], dense[1], other_items, key, it,
                    num=side.num,
                    local_orig=local_orig,
                    local_valid=local_valid,
                    alpha=cfg.alpha,
                    burnin=cfg.burnin,
                    noise_scale=1.0,
                    interpret=self._fuse_interpret,
                    ablate=cfg.ablate,
                    hp=hp,
                    prior_tri_t=prior[0],
                    prior_rhs_t=prior[1],
                )
            if side.impl == "dense":
                kw = dict(common)
                kw.pop("mean_rating")  # baked into the precomputed a_val
                return dense_half_sweep(
                    mesh, state, dense[0], dense[1],
                    gdata.prop_mu, gdata.prop_lambda,
                    other_items, key, it,
                    num=side.num,
                    local_orig=local_orig,
                    local_valid=local_valid,
                    hp=hp,
                    **kw,
                )
            if mode == "reduce" and side.reduce_chunked is not None:
                return reduce_half_sweep_chunked(
                    mesh, state, rdata, other_items, key, it,
                    num=side.num,
                    local_pad=side.maps.local_pad,
                    splits_per_dest=side.chunked_splits,
                    local_orig=local_orig,
                    local_valid=local_valid,
                    hp=hp,
                    **common,
                )
            if mode == "reduce":
                return reduce_half_sweep(
                    mesh, state, rdata, other_items, key, it,
                    num=side.num,
                    padded_num=side.maps.padded_num,
                    local_orig=local_orig,
                    local_valid=local_valid,
                    splits=side.reduce.splits,
                    hp=hp,
                    **common,
                )
            return gather_half_sweep(
                mesh, state, gdata, other_items, key, it,
                num=side.num, splits=side.gather.splits, hp=hp, halo=halo,
                **common,
            )

        fused_eval = cfg.fused_eval_gather != "off"

        def run_predict(ev, est, u_items, m_items, it, gather_dtype=None):
            # multi-device: entry-sharded eval (the per-entry row gather is
            # the replicated cost that bounds strong scaling, docs/PERF.md)
            if self.n_devices > 1:
                from bpmf_tpu.parallel.spmd import predict_sharded

                return predict_sharded(
                    mesh, ev, est, u_items, m_items, it,
                    mean_rating=mean_rating, burnin=cfg.burnin,
                    gather_dtype=gather_dtype, nnz_true=len(self.t_val),
                    fused_gather=fused_eval,
                )
            return predict(
                ev, est, u_items, m_items, it,
                mean_rating=mean_rating, burnin=cfg.burnin,
                gather_dtype=gather_dtype, fused_gather=fused_eval,
            )

        self._predict = run_predict

        def _iter(state_m, state_u, est, m_gdata, m_rdata, u_gdata, u_rdata,
                  ev, key, it, m_dense=None, u_dense=None, codes=None,
                  m_maps=None, u_maps=None, m_prior=(None, None),
                  u_prior=(None, None), m_halo=(None, None),
                  u_halo=(None, None), skip_predict=False):
            key_it = jax.random.fold_in(key, it)
            # both sides' hyperprior draws in one vmapped chain (they
            # condition only on the previous iteration's stats; sampled
            # inside the sweeps they serialize ~30 tiny ops — measured
            # 0.16 ms of the 1.13 ms ml-1m iteration).  Same per-side key
            # streams as the in-sweep draws they replace.
            if "nohyper" in cfg.ablate.split(","):
                hp_m = hp_u = None
            else:
                from bpmf_tpu.ops.mvnormal import sample_hyper_pair

                k_m = jax.random.fold_in(jax.random.fold_in(key_it, 0), 0)
                k_u = jax.random.fold_in(jax.random.fold_in(key_it, 1), 0)
                hp_m, hp_u = sample_hyper_pair(
                    jnp.stack([k_m, k_u]),
                    (self.movies.num, self.users.num),
                    jnp.stack([state_m.sum, state_u.sum]),
                    jnp.stack([state_m.cov, state_u.cov]),
                )
            state_m = sweep(
                state_m, m_gdata, m_rdata, m_dense, m_maps, state_u.items,
                jax.random.fold_in(key_it, 0), it, self.movies, codes=codes,
                hp=hp_m, prior=m_prior, halo=m_halo,
            )
            state_u = sweep(
                state_u, u_gdata, u_rdata, u_dense, u_maps, state_m.items,
                jax.random.fold_in(key_it, 1), it, self.users, codes=codes,
                hp=hp_u, prior=u_prior, halo=u_halo,
            )
            if skip_predict or "nopredict" in cfg.ablate.split(","):
                est2, rmse, rmse_avg = est, jnp.zeros(()), jnp.zeros(())
            else:
                est2, rmse, rmse_avg = run_predict(
                    ev, est, state_u.items, state_m.items, it,
                )
            metrics = Metrics(
                rmse=rmse,
                rmse_avg=rmse_avg,
                norm_users=jnp.sqrt(state_u.norm),
                norm_movies=jnp.sqrt(state_m.norm),
            )
            return state_m, state_u, est2, metrics

        self._iter_fn = jax.jit(_iter, donate_argnums=(0, 1, 2))
        self._iter_impl = _iter
        self._chunk_fns: dict[int, object] = {}
        self._setup_done = True
        self._log_banner()

    def _chunk_fn(self, n: int):
        """Jitted scan over n full Gibbs iterations — one dispatch, one
        device sync; amortizes host/launch latency over the inherently
        serial MCMC chain (SURVEY.md §7 risk 4)."""
        if n in self._chunk_fns:
            return self._chunk_fns[n]
        import jax.lax as lax

        iter_impl = self._iter_impl
        cfg = self.cfg
        # chunk-batched eval (models/bpmf.predict_deferred): the scan emits
        # each iteration's factor tables (n x ~10 MB at ml-1m — cheap) and
        # ONE pair of big gathers replaces the n per-iteration pairs.  The
        # XLA row gather's per-row cost improves with gather size
        # (scripts/eval_gather_probe.py), and the per-iteration predict is
        # the largest single cost of the ml-1m iteration (docs/PERF.md).
        # Single-device only: the multi-device eval is already entry-sharded
        # and the stacked tables would multiply the all_gather volume by n.
        # deferral group size: the per-group footprint (2 g nnz_t K 4B of
        # gather output + g (pn_u+pn_m) K 4B of stacked tables) must fit
        # the budget — at ml-25M scale (6M test entries) unbounded deferral
        # OOMs the chip, while at ml-1m the probe-measured fixed gather
        # cost (~0.55 ms regardless of 100k..800k rows,
        # scripts/eval_gather_probe.py) amortizes ~1/g per iteration.
        k = cfg.num_latent
        per_iter_bytes = 4 * k * (
            2 * len(self.t_val)
            + self.users.maps.padded_num
            + self.movies.maps.padded_num
        )
        g = min(n, max(1, cfg.defer_predict_limit_bytes // per_iter_bytes),
                32)  # ≥97% of the fixed cost is gone by g=32
        # 'auto' resolves to OFF: the in-context A/B (scripts/defer_ab.py,
        # v5e) measured deferral SLOWER than the in-iteration predict in
        # both regimes — ml-1m 1.281 vs 1.179 ms/iter (g=19), chembl
        # 13.56 vs 10.64 (g=13) — the opposite of the out-of-context
        # gather probe's prediction (the group restructure costs more
        # than the amortized gather saves; chembl's delta tracks its big
        # aggr arrays through the nested scan).  Kept as an explicit
        # 'on' knob for re-measurement on other hardware.
        defer = (
            cfg.defer_predict == "on"
            and self.n_devices == 1
            and g > 1
            and "nopredict" not in cfg.ablate.split(",")
        )

        def chunk(state_m, state_u, est, m_gdata, m_rdata, u_gdata, u_rdata,
                  ev, key, it0, m_dense, u_dense, codes, m_maps, u_maps,
                  m_prior, u_prior, m_halo, u_halo):
            def body(carry, it):
                sm, su, e = carry
                sm, su, e, met = iter_impl(
                    sm, su, e, m_gdata, m_rdata, u_gdata, u_rdata,
                    ev, key, it, m_dense, u_dense, codes, m_maps, u_maps,
                    m_prior, u_prior, m_halo, u_halo,
                    skip_predict=defer,
                )
                ys = (met, (su.items, sm.items)) if defer else (met, None)
                return (sm, su, e), ys

            if not defer:
                (sm, su, e), (mets, _) = lax.scan(
                    body, (state_m, state_u, est),
                    it0 + jnp.arange(n, dtype=jnp.int32),
                )
                return sm, su, e, mets

            from bpmf_tpu.models.bpmf import predict_deferred

            def sweep_group(carry, its_g):
                # its_g: [g] absolute iteration numbers.  gather_dtype None
                # matches the in-iteration predict bitwise (bf16 gathers
                # measured slower there anyway, docs/PERF.md §predict).
                carry, (mets, stacks) = lax.scan(body, carry, its_g)
                sm, su, e = carry
                e, rmse, rmse_avg = predict_deferred(
                    ev, e, stacks[0], stacks[1], its_g[0],
                    mean_rating=self._mean_rating_dev,
                    burnin=cfg.burnin,
                )
                mets = Metrics(
                    rmse=rmse, rmse_avg=rmse_avg,
                    norm_users=mets.norm_users,
                    norm_movies=mets.norm_movies,
                )
                return (sm, su, e), mets

            q, r = divmod(n, g)
            carry = (state_m, state_u, est)
            its = it0 + jnp.arange(q * g, dtype=jnp.int32).reshape(q, g)
            carry, mets = lax.scan(sweep_group, carry, its)
            mets = jax.tree.map(
                lambda x: x.reshape((q * g,) + x.shape[2:]), mets
            )
            if r:
                carry, mets_r = sweep_group(
                    carry, it0 + q * g + jnp.arange(r, dtype=jnp.int32)
                )
                mets = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]), mets, mets_r
                )
            sm, su, e = carry
            return sm, su, e, mets

        fn = jax.jit(chunk, donate_argnums=(0, 1, 2))
        self._chunk_fns[n] = fn
        return fn

    def run_chunk(self, n: int) -> Metrics:
        """Advance the chain n iterations in one XLA call; returns stacked
        per-iteration Metrics (leading axis n)."""
        fn = self._chunk_fn(n)
        it0 = jnp.asarray(self.iter + 1, jnp.int32)
        self.state_m, self.state_u, self.est, mets = fn(
            self.state_m, self.state_u, self.est,
            self.movies_gdata, self.movies_rdata,
            self.users_gdata, self.users_rdata,
            self.ev, self.key, it0,
            self._aux["movs"]["dense"], self._aux["users"]["dense"],
            self._codes, self._maps_arg("movs"), self._maps_arg("users"),
            self._aux["movs"]["prior"], self._aux["users"]["prior"],
            self._aux["movs"]["halo"], self._aux["users"]["halo"],
        )
        self.iter += n
        return mets

    def _log(self, msg: str) -> None:
        print(msg, file=self.out, flush=True)

    def _log_banner(self) -> None:
        cfg = self.cfg
        # dataset statistics banner (Sys::init, c++/sample.cpp:203-219);
        # the reference prints the degree stats once per Sys — both sides
        bp1, bp2 = 24, 10500  # breakpoint1/2 (c++/bpmf.h:255-256)
        self._log(f"mean rating: {self.mean_rating:.6g}")
        self._log(f"total number of ratings in train: {self.train.nnz}")
        self._log(f"total number of ratings in test: {self.test.nnz}")
        for side in (self.movies, self.users):
            degs = side.degrees
            self._log(
                f"{side.name}: average ratings per row: {degs.mean():.6g}"
            )
            self._log(
                f"{side.name}: rows > break_point1: "
                f"{100.0 * (degs > bp1).mean():.6g}"
            )
            self._log(
                f"{side.name}: rows > break_point2: "
                f"{100.0 * (degs > bp2).mean():.6g}"
            )
        self._log(f"num movs: {self.movies.num}")
        self._log(f"num users: {self.users.num}")
        if self.movies.prop_mu is not None or self.users.prop_mu is not None:
            self._log("with propagated posterior")
        self._log(f"num_latent: {cfg.num_latent}")
        self._log(f"ndevices: {self.n_devices} (mode: {self.mode})")
        self._log(f"nsims: {cfg.nsims}")
        self._log(f"burnin: {cfg.burnin}")
        self._log(f"alpha: {cfg.alpha}")
        self._log(f"update_freq: {cfg.update_freq}")
        if self.n_devices > 1:
            # assignment unbalance stats (Sys::assign prints the same idea,
            # c++/assign.cpp:140-173)
            for side in (self.movies, self.users):
                work = np.array([
                    (10 + side.degrees[ids]).sum()
                    for ids in side.maps.ids_per_dev
                ])
                self._log(
                    f"assign {side.name}: work/device min {work.min()} "
                    f"max {work.max()} unbalance "
                    f"{work.max() / max(work.mean(), 1):.3f}"
                )
        for side in (self.movies, self.users):
            if side.impl == "dense8":
                r, c = self._codes.shape
                self._log(
                    f"gram layout {side.name}: int8 dense-stream "
                    f"{r}x{c} shared code array ({r * c / 1e6:.0f} MB)"
                )
                if self.mode == "reduce":
                    # explicit --mode reduce at dense-stream scale rides the
                    # hybrid program; REDUCE's memory contract holds (the
                    # sharded side is never replicated — its stats are
                    # psum_scatter'd; only the small side is all_gathered)
                    self._log(
                        f"gram layout {side.name}: reduce mode via "
                        "dense-stream hybrid (stat exchange on the sharded "
                        "sweep, small-side value exchange)"
                    )
                continue
            if side.impl == "dense":
                d, lp, opn = side.dense.shape
                nbytes = jnp.dtype(self._md).itemsize
                self._log(
                    f"gram layout {side.name}: dense adjacency "
                    f"{d}x{lp}x{opn} x2 blocks "
                    f"({2 * d * lp * opn * nbytes / 1e6:.0f} MB {self.matmul_dtype})"
                )
                continue
            if side.reduce_chunked is not None:
                n_b = sum(len(s) for s in side.chunked_splits)
                self._log(
                    f"gram layout {side.name}: reduce-chunked, "
                    f"{len(side.chunked_splits)} destination shards, "
                    f"{n_b} buckets (peak stat buffer "
                    f"{side.maps.local_pad}x{cfg.num_latent}^2 per device)"
                )
                continue
            layout = side.reduce if self.mode == "reduce" else side.gather
            # stacked buckets are [D, R, W]
            self._log(
                f"gram layout {side.name}: buckets "
                + ", ".join(
                    f"{b.nbr.shape[0]}x{b.nbr.shape[1]}x{b.nbr.shape[2]}"
                    for b in layout.buckets
                )
                + "  (devices x rows x width)"
            )
            if side.halo is not None:
                # connectivity-aware exchange chosen (opt_conn analog)
                self._log(
                    f"halo {side.name}: <= {side.halo.halo_rows} rows/pair "
                    f"(per-round widths; volume "
                    f"{side.halo.volume_ratio:.2f}x of all_gather)"
                )
                # per-pair message-count matrix (assign.cpp:238-250 analog)
                pc = side.halo.pair_counts
                self._log(f"halo {side.name} rows from -> to:")
                for s in range(pc.shape[0]):
                    self._log(
                        "  " + " ".join(f"{int(c):7d}" for c in pc[s])
                    )

    # -- Gibbs loop --------------------------------------------------------

    def _maps_arg(self, name: str):
        aux = self._aux[name]
        return (aux["local_orig"], aux["local_valid"])

    def step(self) -> Metrics:
        """One full Gibbs iteration; returns device metrics."""
        self.iter += 1
        it = jnp.asarray(self.iter, jnp.int32)
        self.state_m, self.state_u, self.est, metrics = self._iter_fn(
            self.state_m,
            self.state_u,
            self.est,
            self.movies_gdata,
            self.movies_rdata,
            self.users_gdata,
            self.users_rdata,
            self.ev,
            self.key,
            it,
            self._aux["movs"]["dense"],
            self._aux["users"]["dense"],
            self._codes,
            self._maps_arg("movs"),
            self._maps_arg("users"),
            self._aux["movs"]["prior"],
            self._aux["users"]["prior"],
            self._aux["movs"]["halo"],
            self._aux["users"]["halo"],
        )
        return metrics

    def items_host(self, side: Side, state: SideState) -> np.ndarray:
        """Items in original order, [num, K] (the bcast+unpermute step,
        c++/bpmf.cpp:217-224)."""
        arr = to_host(state.items, np.float64)
        return arr[side.maps.orig_to_padded]

    def run(self) -> float:
        """Full training run with the reference's per-iteration log line
        (c++/bpmf.cpp:180-210, print format c++/sample.cpp:101-107).
        Returns Final Avg RMSE."""
        self.setup()
        cfg = self.cfg
        if cfg.resume:
            from bpmf_tpu import checkpoint

            checkpoint.load(cfg.resume, self)
            self._log(f"resumed from {cfg.resume} at iteration {self.iter}")
        begin = tick()
        num_items = self.users.num + self.movies.num
        nnz = self.train.nnz

        chunk = max(1, cfg.chunk) if not cfg.verbose else 1
        done = self.iter + 1
        last_ckpt = done
        while done < cfg.nsims:
            n = min(chunk, cfg.nsims - done)
            start = tick()
            # the device sync makes the scope wall time honest even if a
            # future metrics path stops forcing a transfer
            with self.counters.scope(
                "main", sync=lambda: jax.block_until_ready(self.state_u.items)
            ):
                if n == 1:
                    metrics = jax.device_get(self.step())
                    stacked = [metrics]
                else:
                    stacked_dev = self.run_chunk(n)
                    stacked = [
                        Metrics(*(np.asarray(x)[j] for x in stacked_dev))
                        for j in range(n)
                    ]
            stop = tick()
            if not np.isfinite(float(stacked[-1].rmse)):
                # the reference aborts on Cholesky failure
                # (c++/sample.cpp:308); a non-PD posterior or overflow
                # surfaces here as a non-finite RMSE
                raise FloatingPointError(
                    f"non-finite RMSE at iteration {done + n - 1} — "
                    "Cholesky failure or numerical overflow"
                )
            per_iter = (stop - start) / n
            items_per_sec = num_items / per_iter
            ratings_per_sec = nnz / per_iter
            for j, metrics in enumerate(stacked):
                it = done + j
                self.rmse = float(metrics.rmse)
                self.rmse_avg = float(metrics.rmse_avg)
                self.average_items_sec += items_per_sec
                self.average_ratings_sec += ratings_per_sec
                phase = "Burnin" if it < cfg.burnin else "Sampling"
                self._log(
                    f"0: {phase} iteration {it}:\t RMSE: {self.rmse:3.4f}\t"
                    f"avg RMSE: {self.rmse_avg:3.4f}\t"
                    f"FU({float(metrics.norm_users):6.2f})\t"
                    f"FM({float(metrics.norm_movies):6.2f})\t"
                    f"items/sec: {items_per_sec:6.2f}\t"
                    f"ratings/sec: {ratings_per_sec / 1e6:6.2f}M"
                )
            if cfg.verbose and cfg.output_dir:
                # per-iteration model dump (-v, c++/bpmf.cpp:200-209);
                # fetches are collective, writes are process-0-only
                u = self.items_host(self.users, self.state_u)
                v = self.items_host(self.movies, self.state_m)
                if jax.process_index() == 0:
                    write_matrix(
                        os.path.join(cfg.output_dir, f"U-{done}.ddm"), u.T
                    )
                    write_matrix(
                        os.path.join(cfg.output_dir, f"V-{done}.ddm"), v.T
                    )
            done += n
            if (
                cfg.checkpoint_path
                and cfg.checkpoint_freq
                and done < cfg.nsims
                # boundary-crossing trigger: `done` advances in steps of
                # `chunk`, so a plain modulo test would silently never fire
                # when checkpoint_freq is not a multiple of chunk
                and done - last_ckpt >= cfg.checkpoint_freq
            ):
                from bpmf_tpu import checkpoint

                checkpoint.save(cfg.checkpoint_path, self)
                last_ckpt = done

        elapsed = tick() - begin

        # final all-items prediction pass (c++/bpmf.cpp:225,242): one more
        # Welford update with the last sample, matching the reference.
        est, rmse, rmse_avg = self._predict(
            self.ev,
            self.est,
            self.state_u.items,
            self.state_m.items,
            jnp.asarray(self.iter, jnp.int32),
            gather_dtype=self._md,
        )
        self.est = est
        self.rmse = float(rmse)
        self.rmse_avg = float(rmse_avg)

        if cfg.checkpoint_path:
            from bpmf_tpu import checkpoint

            checkpoint.save(cfg.checkpoint_path, self)
        if cfg.output_dir:
            with self.counters.scope("output"):
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
        if cfg.profile:
            self._log(self.profile_phases())
        return self.rmse_avg

    def profile_phases(self, iters: int = 25) -> str:
        """Device-synced sweep-phase attribution (--profile).

        The in-context analog of the reference's per-phase BPMF_COUNTER
        scopes (c++/counters.cpp:31-56, c++/sample.cpp:326-327): because a
        half-sweep here is ONE fused XLA program, phases are attributed by
        whole-program differencing — re-timing the compiled iteration with
        individual phases ablated (Config.ablate) — rather than in-program
        timers, which would break fusion and measure a different program.
        Standalone micro-benchmarks of the same ops mis-measure badly
        (XLA picks different layouts/fusions out of context), so deltas
        against the real program are the honest number.

        Cost: each ablation variant builds and compiles a fresh program
        (5-6 compiles).  Negligible at small scale; at the huge-sparse
        regime (ml-25M) each compile is a multi-GB program, so --profile
        there costs tens of minutes of compile time on top of the run —
        use it for one-off attribution, not routine benchmarking
        (docs/PERF.md quotes the resulting deltas so reruns are rarely
        needed).
        """
        import dataclasses

        def fetch(mets) -> float:
            # VALUE fetch, not block_until_ready: remote-execution runtimes
            # can return from block before the computation finishes, and an
            # ablated metric can constant-fold; the norm always depends on
            # the full sweep
            return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])

        def timed(sampler) -> float:
            fetch(sampler.run_chunk(iters))
            best = float("inf")
            for _ in range(3):
                t0 = tick()
                fetch(sampler.run_chunk(iters))
                best = min(best, tick() - t0)
            return best / iters

        full = timed(self)  # post-run: extra chain steps are harmless
        impls = {self.users.impl, self.movies.impl}
        variants = ["nopredict", "nosolve", "nomatmul", "nohyper", "nonoise"]
        if "bucketed" in impls:
            variants.append("nogather")
        names = {
            "nopredict": "predict/eval",
            "nosolve": "cholesky-solve-sample",
            "nomatmul": "gram matmul",
            "nogather": "neighbor gather",
            "nohyper": "hyperprior resample",
            "nonoise": "noise tables",
        }
        lines = [
            f"sweep phase attribution (device-synced, {iters}-iter chunks):",
            f"  full iteration           {full * 1e3:9.4f} ms",
        ]
        for v in variants:
            # output_dir stays: aggregation arrays must match `self` for the
            # deltas to isolate the ablated phase alone (no files are
            # written — only run() does that)
            cfg2 = dataclasses.replace(
                self.cfg, ablate=v, profile=False,
                checkpoint_path="", resume="",
            )
            s = BPMF(cfg2, train=self.train, test=self.test,
                     out=open(os.devnull, "w"))
            s.setup()
            t = timed(s)
            lines.append(
                f"  {names[v]:<24} {max(full - t, 0.0) * 1e3:9.4f} ms"
                f"  (iteration without it: {t * 1e3:.4f})"
            )
        lines.append(
            "  (residual = gram/exchange + hyper + noise + stats)"
        )
        return "\n".join(lines)

    # -- outputs -----------------------------------------------------------

    def write_output(self) -> None:
        """Write Pavg/Pm2 predictions and the aggregated posterior
        (c++/bpmf.cpp:221-240)."""
        cfg = self.cfg
        odir = cfg.output_dir
        # the host fetches below are collective in a multi-process run, so
        # every process computes; only process 0 touches the filesystem
        write = jax.process_index() == 0
        if write:
            os.makedirs(odir, exist_ok=True)
        shape = self.test.shape

        nnz_t = len(self.t_val)  # strip eval-shard padding (multi-device)
        pavg = to_host(self.est.pavg, np.float64)[:nnz_t]
        pm2 = to_host(self.est.pm2, np.float64)[:nnz_t]
        pavg_m = sp.csc_matrix((pavg, (self.t_user, self.t_item)), shape=shape)
        pm2_m = sp.csc_matrix((pm2, (self.t_user, self.t_item)), shape=shape)
        if write:
            write_matrix(os.path.join(odir, "Pavg.sdm"), pavg_m)
            write_matrix(os.path.join(odir, "Pm2.sdm"), pm2_m)

        for prefix, side, state in (
            ("U", self.users, self.state_u),
            ("V", self.movies, self.state_m),
        ):
            mu, lam = self._finalize_mu_lambda(side, state)
            if write:
                write_matrix(os.path.join(odir, f"{prefix}-mu.ddm"), mu)
                write_matrix(os.path.join(odir, f"{prefix}-Lambda.ddm"), lam)

    def _finalize_mu_lambda(self, side: Side, state: SideState):
        """aggr sums -> posterior mean (K x num) and per-item precision
        (K^2 x num) (Sys::finalize_mu_lambda, c++/bpmf.cpp:281-295)."""
        cfg = self.cfg
        nsamples = cfg.nsims - cfg.burnin
        idx = side.maps.orig_to_padded
        from bpmf_tpu.models.bpmf import aggr_prod_full

        aggr_mu = to_host(state.aggr_mu, np.float64)[idx]        # [num, K]
        k = aggr_mu.shape[1]
        aggr_prod = aggr_prod_full(
            to_host(state.aggr_prod, np.float64)[idx], k
        )
        outer = np.einsum("nk,nl->nkl", aggr_mu, aggr_mu) / nsamples
        cov = (aggr_prod - outer) / (nsamples - 1)
        prec = np.linalg.inv(cov)                                 # [num, K, K]
        mu = (aggr_mu / nsamples).T                               # [K, num]
        # column i = vec(prec_i) column-major, like Eigen Map (bpmf.cpp:292)
        lam = prec.transpose(1, 2, 0).reshape(k * k, side.num, order="F")
        return mu, lam
