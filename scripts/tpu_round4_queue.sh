#!/bin/bash
# Round-4 follow-up measurements (after tpu_measure_queue.sh):
# the open perf questions, ordered by information value.
# Logs land in /tmp/r4q_*.log; /tmp/r4q_done marks completion.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

# 1. chembl phase attribution (root-cause the 14 ms vs <=11 ms target)
timeout 1500 python scripts/profile_regimes.py chembl > /tmp/r4q_chembl_profile.log 2>&1

# 2. chembl grouped A/B (the grouped kernel's TARGET regime; the queue's
#    earlier A/B only covered ml-1m where it is a wash)
BENCH_PLATFORM=tpu BENCH_ITERS=100 timeout 900 python bench.py --leg chembl > /tmp/r4q_chembl_grouped1.log 2>&1
BPMF_TRI_GROUPED=0 BENCH_PLATFORM=tpu BENCH_ITERS=100 timeout 900 python bench.py --leg chembl > /tmp/r4q_chembl_grouped0.log 2>&1

# 3. chembl solver lane-block sweep
BPMF_TRI_BLOCK=256 BENCH_PLATFORM=tpu BENCH_ITERS=100 timeout 900 python bench.py --leg chembl > /tmp/r4q_chembl_b256.log 2>&1
BPMF_TRI_BLOCK=1024 BENCH_PLATFORM=tpu BENCH_ITERS=100 timeout 900 python bench.py --leg chembl > /tmp/r4q_chembl_b1024.log 2>&1

# 4. ml-25M full leg, generous timeout (datagen+upload+compile dominate;
#    the pickle caches for reruns)
BENCH_PLATFORM=tpu BENCH_ITERS=20 timeout 2400 python bench.py --leg ml25m_full > /tmp/r4q_ml25m.log 2>&1

# 5. extended eval-gather probe (rate-vs-rows, unchecked, dense-P extract)
timeout 900 python scripts/eval_gather_probe.py > /tmp/r4q_gather.log 2>&1

# 6. ml-1m phase attribution (predict share with current code)
timeout 1200 python scripts/profile_regimes.py ml1m > /tmp/r4q_ml1m_profile.log 2>&1

# 7. warm-start fast path (BASELINE config 4; target <= 1.2x cold)
BENCH_ITERS=200 timeout 1200 python scripts/bench_warmstart.py > /tmp/r4q_warmstart.log 2>&1

# 8. dense8 fold A/B microbench (rerun: the first attempt died on a
#    CPU-exact tolerance that real-MXU bf16 passes cannot meet)
timeout 1800 python scripts/bench_dense8.py > /tmp/r4q_fold_ab.log 2>&1

echo DONE > /tmp/r4q_done
