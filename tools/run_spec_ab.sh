#!/bin/bash
# Specular-scene A/B/C: does the reflection machinery earn its cost?
# (VERDICT r2 task 3.)  Three 30k runs on scene="specular":
#   mipnerf                          — primary-only control
#   reflect-sampling-nerf            — parity default (coarse/fine)
#   reflect-sampling-nerf-proposal   — recommended preset (propreflect)
# Sequential: only ONE process may touch the TPU at a time.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run_one() {
  local method="$1" exp="$2"
  echo "=== train $method -> $exp ($(date +%T)) ==="
  timeout 3600 python -m rsn.cli.train "$method" \
    --experiment-name "$exp" \
    --pipeline.datamanager.dataparser synthetic \
    --pipeline.datamanager.data specular \
    --max-num-iterations 30000 || { echo "TRAIN FAILED $method"; return 1; }
  local run_dir
  run_dir=$(ls -dt "outputs/$exp/$method"/*/ | head -1)
  echo "=== eval $run_dir ($(date +%T)) ==="
  timeout 1800 python -m rsn.cli.eval --load-dir "$run_dir" \
    || { echo "EVAL FAILED $method"; return 1; }
  python tools/snapshot_result.py "$run_dir" "$exp"
}

run_one mipnerf spec30k-mipnerf
run_one reflect-sampling-nerf spec30k-parity
run_one reflect-sampling-nerf-proposal spec30k-preset
echo "=== ALL DONE ($(date +%T)) ==="
