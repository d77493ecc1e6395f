#!/usr/bin/env python
"""Warm-start fast-path timing (BASELINE config 4 at scale).

The propagated posterior (-m/-l, c++/sample.cpp:157-174,272-283) rides the
fused/dense8 fast paths as a packed per-item [T, B] prior-precision tile
(ops/pallas_solve, peritem variants) — which doubles the solver's VMEM
tile and has never been timed on hardware.  This measures ml-1m-synth
ms/iter cold (shared hyperprior) vs warm (per-item priors on BOTH sides);
the target is warm <= ~1.2x cold.

The prior files are fabricated (per-item SPD precisions around the
hyperprior's scale): the code path and cost are identical to a real
posterior; only the trajectory differs.

Usage: python scripts/bench_warmstart.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fabricate_prior(num: int, k: int, seed: int, path_mu: str, path_lam: str):
    from bpmf_tpu.io import write_matrix

    rng = np.random.default_rng(seed)
    mu = rng.normal(scale=0.3, size=(k, num))
    # per-item precision: scaled identity + a rank-1 bump, SPD by build
    w = rng.normal(scale=0.2, size=(num, k))
    lam = np.einsum("nk,nl->nkl", w, w) + 2.0 * np.eye(k)[None]
    write_matrix(path_mu, mu)
    # column i = vec(lam_i) column-major (Eigen Map, c++/bpmf.cpp:292)
    write_matrix(path_lam, lam.transpose(1, 2, 0).reshape(k * k, num, order="F"))


def timed_run(train, test, k, iters, prop_u="", prop_v=""):
    import jax

    from bpmf_tpu.config import Config
    from bpmf_tpu.sampler import BPMF

    cfg = Config(num_latent=k, nsims=5 * iters, burnin=2,
                 prop_u=prop_u, prop_v=prop_v)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()

    def fetch(mets):
        return float(np.asarray(jax.device_get(mets.norm_users)).ravel()[-1])

    fetch(s.run_chunk(iters))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        m = s.run_chunk(iters)
        fetch(m)
        best = min(best, time.perf_counter() - t0)
    rmse = float(jax.device_get(m.rmse_avg)[-1])
    return best / iters * 1e3, rmse, (s.users.impl, s.movies.impl)


def main():
    from bpmf_tpu.datasets import synth_movielens

    k = int(os.environ.get("BENCH_K", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "200"))
    train, test = synth_movielens()
    nu, nm = train.shape

    d = "/tmp/bpmf_warmstart"
    os.makedirs(d, exist_ok=True)
    fu = (os.path.join(d, "U-mu.ddm"), os.path.join(d, "U-Lambda.ddm"))
    fv = (os.path.join(d, "V-mu.ddm"), os.path.join(d, "V-Lambda.ddm"))
    if not os.path.exists(fv[1]):
        fabricate_prior(nu, k, 1, *fu)
        fabricate_prior(nm, k, 2, *fv)

    cold, rmse_c, impl_c = timed_run(train, test, k, iters)
    print(f"cold : {cold:8.4f} ms/iter  rmse_avg {rmse_c:.4f}  impl {impl_c}",
          flush=True)
    warm, rmse_w, impl_w = timed_run(
        train, test, k, iters,
        prop_u=",".join(fu), prop_v=",".join(fv),
    )
    print(f"warm : {warm:8.4f} ms/iter  rmse_avg {rmse_w:.4f}  impl {impl_w}",
          flush=True)
    print(f"ratio: {warm / cold:.3f}x  (target <= ~1.2x)", flush=True)


if __name__ == "__main__":
    main()
