#!/bin/bash
# r4: refresh the 100k-step preset quality point (VERDICT r3 #6) — the
# recorded 23.19/0.907 predates the proposal-for-reflect flip (commit
# 644508b); this re-runs the full reference horizon (100,000 steps,
# reflect_sampling_nerf_config.py:32) with the SHIPPED preset defaults
# (use_proposal_reflect=True) on the standard 4-cam synthetic scene and
# snapshots into results/conv100k-preset-r4.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

echo "=== train preset 100k ($(date +%T)) ==="
timeout 14400 python -m rsn.cli.train reflect-sampling-nerf-proposal \
  --experiment-name conv100k-preset-r4 \
  --pipeline.datamanager.dataparser synthetic \
  --steps-per-eval-batch 500 --steps-per-eval-image 5000 \
  --steps-per-log 100 \
  --max-num-iterations 100000 || { echo "TRAIN FAILED"; exit 1; }
run_dir=$(ls -dt "outputs/conv100k-preset-r4/reflect-sampling-nerf-proposal"/*/ | head -1)
echo "=== eval $run_dir ($(date +%T)) ==="
timeout 3600 python -m rsn.cli.eval --load-dir "$run_dir" \
  || { echo "EVAL FAILED"; exit 1; }
python tools/snapshot_result.py "$run_dir" conv100k-preset-r4
echo "=== DONE ($(date +%T)) ==="
