#!/bin/bash
# Specular-scene A/B/C round 2: properly fed (48 cams @ 96^2).
# The first round (12 cams @ 64^2, results/spec30k-{mipnerf,parity})
# showed the full model fits train RGB (loss_mid_fine 0.0014) but its
# normals never become multi-view consistent (predicted_normal_loss
# 0.29 dominates) and eval craters — the mirror benchmark needs enough
# views to pin geometry, like the 100-view Blender sets the reference
# targets.  Eval cadences relaxed (pure logging; no effect on quality).
# --steps-per-log 100: the dispatch chunk is capped by the log cadence
# (trainer._next_chunk), so the default 10 pays a tunnel RTT every 10
# steps — ~2-3x wall-clock on this backend.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="specular:cams=48,res=96"

run_one() {
  local method="$1" exp="$2"
  echo "=== train $method -> $exp ($(date +%T)) ==="
  timeout 5400 python -m rsn.cli.train "$method" \
    --experiment-name "$exp" \
    --pipeline.datamanager.dataparser synthetic \
    --pipeline.datamanager.data "$DATA" \
    --steps-per-eval-batch 500 --steps-per-eval-image 2000 \
    --steps-per-log 100 \
    --max-num-iterations 30000 || { echo "TRAIN FAILED $method"; return 1; }
  local run_dir
  run_dir=$(ls -dt "outputs/$exp/$method"/*/ | head -1)
  echo "=== eval $run_dir ($(date +%T)) ==="
  timeout 3600 python -m rsn.cli.eval --load-dir "$run_dir" \
    || { echo "EVAL FAILED $method"; return 1; }
  python tools/snapshot_result.py "$run_dir" "$exp"
}

run_one mipnerf spec48c30k-mipnerf
run_one reflect-sampling-nerf spec48c30k-parity
run_one reflect-sampling-nerf-proposal spec48c30k-preset
echo "=== ALL DONE ($(date +%T)) ==="
