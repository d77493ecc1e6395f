#!/usr/bin/env python
"""Round-5 debug: tiny (data/tiny) diverges to NaN on TPU under the new
dense8-at-every-scale default (commit 0cc5d6c) — for BOTH BPMF_D8_PT
settings with some seeds — while round-4's impl choice ('dense' below the
dense budget) passed the tiny gate every round.  The gram/rhs kernels are
bit-identical pt-wise in isolation (scripts/inpt_numeric_check.py), so
this steps the sampler per-iteration across (impl, matmul_dtype, seed)
to locate the destabilizer.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(gram_impl: str, matmul_dtype: str, seed: int, iters: int = 9):
    from bpmf_tpu.config import Config
    from bpmf_tpu.io import read_matrix
    from bpmf_tpu.sampler import BPMF

    train = read_matrix("/root/reference/data/tiny/train.mtx")
    test = read_matrix("/root/reference/data/tiny/test.mtx")
    cfg = Config(num_latent=32, nsims=iters, burnin=0, chunk=1, seed=seed,
                 gram_impl=gram_impl, matmul_dtype=matmul_dtype)
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.setup()
    tag = f"{gram_impl}/{matmul_dtype}/seed={seed}"
    last = None
    for it in range(iters):
        m = s.step()
        u = s.items_host(s.users, s.state_u)
        v = s.items_host(s.movies, s.state_m)
        last = (float(m.rmse_avg), np.linalg.norm(u), np.linalg.norm(v))
        if not np.isfinite(float(m.rmse)):
            print(f"  [{tag}] NON-FINITE at it {it + 1}", flush=True)
            return False
    print(f"  [{tag}] ok: avg rmse {last[0]:.4f} "
          f"FU {last[1]:.2f} FM {last[2]:.2f}", flush=True)
    return True


def main():
    for seed in (1234, 42, 7):
        for gram_impl, md in (
            ("dense8", "auto"),      # the round-5 default at tiny (bf16)
            ("dense8", "float32"),   # same kernels, f32 MXU inputs
            ("dense", "auto"),       # the round-4 default at tiny
        ):
            run(gram_impl, md, seed)


if __name__ == "__main__":
    main()
