#!/usr/bin/env python
"""Validate the aggregated posterior against the per-iteration sample dumps.

The analog of the reference's data/tiny/compute_mu_lambda.py (reference
test #3, SURVEY.md §4): numpy recomputes the posterior mean and per-item
precision from the ``-v`` per-iteration ``U-*.ddm`` dumps and compares
them against the run's aggregated ``U-mu.ddm`` / ``U-Lambda.ddm`` outputs.

Usage: python scripts/compute_mu_lambda.py [OUTPUT_DIR] [PREFIX]
  OUTPUT_DIR  directory written by a `bpmf ... -v -o DIR` run (default:
              output/)
  PREFIX      U (users, default) or V (movies)

Exit code 0 when both norm differences are small.  NOTE: exact agreement
needs every post-burnin sample in the dumps and nsims-burnin > K (the
aggregated Lambda is the inverse SAMPLE covariance, bpmf.cpp:281-295).
"""
import math
import re
import sys
from glob import glob

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bpmf_tpu.io import read_matrix

odir = sys.argv[1] if len(sys.argv) > 1 else "output"
prefix = sys.argv[2] if len(sys.argv) > 2 else "U"

files = sorted(
    glob(f"{odir}/{prefix}-[0-9]*.ddm"),
    key=lambda p: int(re.search(r"-(\d+)\.ddm$", p).group(1)),
)
if not files:
    sys.exit(f"no {prefix}-N.ddm sample dumps in {odir}/ (run with -v -o)")
us = [read_matrix(f) for f in files]  # each [K, num]
mu_file = read_matrix(f"{odir}/{prefix}-mu.ddm")
lam_flat = read_matrix(f"{odir}/{prefix}-Lambda.ddm")
k = int(math.sqrt(lam_flat.shape[0]))
num = mu_file.shape[1]

# the aggregation covers post-burnin samples: use the trailing window the
# run averaged (nsamples = columns implied by the Lambda math is unknown
# here, so compare with ALL dumps — matches a burnin-0 -v run like the
# reference's tiny flow)
stacked = np.stack(us)                      # [S, K, num]
mu_py = stacked.mean(axis=0)                # [K, num]
d_mu = np.linalg.norm(mu_py - mu_file)
print(f"samples: {len(us)}  norm(mu_py - mu_file) = {d_mu:.6f}")

ok = d_mu < 1e-6 * max(np.linalg.norm(mu_file), 1.0)

# per-item precision = inverse SAMPLE covariance; only well-defined (and
# only asserted) when there are more samples than latent dims — the
# reference's tiny flow prints the same comparison without asserting
if len(us) > k:
    prec_py = np.empty((k, k, num))
    for i in range(num):
        cov = np.cov(stacked[:, :, i], rowvar=False)
        prec_py[:, :, i] = np.linalg.inv(cov)
    lam = lam_flat.reshape(k, k, num, order="F")
    d_lam = np.linalg.norm(prec_py - lam) / max(np.linalg.norm(lam), 1e-12)
    print(f"rel norm(Lambda_py - Lambda_file) = {d_lam:.6f}")
    ok = ok and d_lam < 1e-5
else:
    print(f"Lambda check skipped: {len(us)} samples <= K={k} "
          "(sample covariance singular)")

print("OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
