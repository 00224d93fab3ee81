#!/bin/bash
# Extrapolated-view A/B (r5, VERDICT r4 #4): the untried
# saturation-breaker.  Train on the standard shinyfloor camera band
# (elev 20.5-48.6 deg) but EVAL on cameras OUTSIDE it
# (extrap=hi: elev 53-67.5 deg, rsn/data/synthetic.py EXTRAP_BANDS).
# The r4 saturation analysis (BASELINE.md) showed dense in-band eval
# views let a primary-only model interpolate reflections as
# view-dependent texture; extrapolated eval denies interpolation —
# primary-only must extrapolate its angular fake, while the reflected
# composite's geometry-based resampling transfers by construction.
#   usage: run_extrap_ab.sh [steps] [legs]
#     steps: default 30000; legs: "quick" = mipnerf+parity only
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="shinyfloor:cams=48,res=96,extrap=hi"
STEPS="${1:-30000}"
LEGS="${2:-all}"

run_one() {
  local method="$1" exp="$2"
  echo "=== train $method -> $exp ($(date +%T)) ==="
  timeout 7200 python -m rsn.cli.train "$method" \
    --experiment-name "$exp" \
    --pipeline.datamanager.dataparser synthetic \
    --pipeline.datamanager.data "$DATA" \
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

TAG="extrap${STEPS}"
run_one mipnerf "${TAG}-mipnerf"
run_one reflect-sampling-nerf "${TAG}-parity"
if [ "$LEGS" != "quick" ]; then
  run_one reflect-sampling-nerf-proposal "${TAG}-preset"
fi
echo "=== ALL DONE ($(date +%T)) ==="
