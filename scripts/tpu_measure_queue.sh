#!/bin/bash
# One-shot TPU measurement queue: every perf number the docs/bench track,
# ordered cheapest/most-informative first.  Useful after code changes that
# touch the hot kernels, or after a TPU-tunnel outage (the axon relay can
# wedge for hours; probe with a SUBPROCESS timeout before running this —
# an in-process jax.devices() hangs forever on a wedged tunnel).
#
# Logs land in /tmp/tpuq_*.log; /tmp/tpuq_done marks completion.
set -x
cd "$(dirname "$0")/.."

# 0. tiny CLI smoke on the real TPU (first Mosaic compile of new kernels).
# PYTHONPATH: the package is not pip-installed, and the run cd's away.
( export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" && cd $(mktemp -d) && \
    mkdir output && timeout 900 python -m bpmf_tpu.cli -r -k -i 9 -b 0 -v \
    -n /root/reference/data/tiny/train.mtx -p /root/reference/data/tiny/test.mtx \
    -o output/ && grep "Final Avg RMSE" bpmf_0.out ) > /tmp/tpuq_tiny.log 2>&1

# 1. eval-gather locality probe (ml-1m predict headroom)
timeout 900 python scripts/eval_gather_probe.py > /tmp/tpuq_gather.log 2>&1

# 2. grouped-solver A/B at ml-1m scale (BENCH_FAST: primary leg only)
BENCH_FAST=1 BENCH_ITERS=200 timeout 1200 python bench.py > /tmp/tpuq_ml1m_grouped.log 2>&1
BPMF_TRI_GROUPED=0 BENCH_FAST=1 BENCH_ITERS=200 timeout 1200 python bench.py > /tmp/tpuq_ml1m_ungrouped.log 2>&1

# 3. full bench (chembl + ml-25M legs, fold default on; budget raised so
#    the FULL-scale ml-25M leg fits — the default 720 s only fits half)
BENCH_BUDGET_S=1400 timeout 2100 python bench.py > /tmp/tpuq_bench_full.log 2>&1

# 4. dense8 fold A/B microbench
timeout 1800 python scripts/bench_dense8.py > /tmp/tpuq_fold_ab.log 2>&1

echo DONE > /tmp/tpuq_done
