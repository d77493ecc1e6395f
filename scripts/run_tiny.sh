#!/bin/bash
# The reference's golden smoke flow (data/tiny/run_test.sh) against the
# TPU-native CLI: 9 iterations, burnin 0, verbose dumps, outputs, RMSE
# asserted from the redirected log.  Pass the tiny train/test mtx paths
# (defaults to the reference checkout's data/tiny if present).
set -e
TRAIN=${1:-/root/reference/data/tiny/train.mtx}
TEST=${2:-/root/reference/data/tiny/test.mtx}
EXPECT_MAX=${3:-4.5}

rm -rf output bpmf_0.out
mkdir -p output
python -m bpmf_tpu.cli -r -k -i 9 -b 0 -v -n "$TRAIN" -p "$TEST" -o output/

RMSE=$(grep "Final Avg RMSE" bpmf_0.out | cut -d : -f 2)
echo "Final Avg RMSE: $RMSE (gate: < $EXPECT_MAX)"
python - "$RMSE" "$EXPECT_MAX" <<'PY'
import sys
rmse, gate = float(sys.argv[1]), float(sys.argv[2])
sys.exit(0 if rmse < gate else 1)
PY
echo OK
