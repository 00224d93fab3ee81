#!/bin/bash
# 30k quality-ladder refresh under corrected tint semantics (r5,
# VERDICT r4 #3): the bench.py headline's quality-parity citation
# (parity 23.6 vs preset 23.59, BASELINE.md r2) predates the
# tint-background correction (PARITY.md B#12, commit aa3371c) — both
# legs re-run here under the SHIPPED defaults
# (tint_random_background=False) on the same default procedural scene,
# snapshotted to results/conv30k-{parity,preset}-r5.
#   usage: run_conv30k_refresh.sh [steps]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS="${1:-30000}"

run_one() {
  local method="$1" exp="$2"
  echo "=== train $method -> $exp ($(date +%T)) ==="
  timeout 7200 python -m rsn.cli.train "$method" \
    --experiment-name "$exp" \
    --pipeline.datamanager.dataparser synthetic \
    --steps-per-eval-batch 500 --steps-per-eval-image 2000 \
    --steps-per-log 100 \
    --max-num-iterations "$STEPS" || { echo "TRAIN FAILED $method"; return 1; }
  local run_dir
  run_dir=$(ls -dt "outputs/$exp/$method"/*/ | head -1)
  echo "=== eval $run_dir ($(date +%T)) ==="
  timeout 3600 python -m rsn.cli.eval --load-dir "$run_dir" \
    || { echo "EVAL FAILED $method"; return 1; }
  python tools/snapshot_result.py "$run_dir" "$exp"
}

run_one reflect-sampling-nerf "conv30k-parity-r5"
run_one reflect-sampling-nerf-proposal "conv30k-preset-r5"
echo "=== ALL DONE ($(date +%T)) ==="
