#!/bin/bash
# Shinyfloor A/B/C (r4): the reflection subsystem's positive-evidence
# benchmark on the scene class where reflected-ray resampling has the
# clearest edge (rsn/data/synthetic.py: flat glossy checker floor under
# three hovering diffuse satellites — trivial normals, strong-parallax
# reflections).  The curved-mirror and glossy-sphere A/Bs
# (results/spec*-*, results/glossy30k-*) are recorded negative/marginal
# results: on a volumetric SPHERE at this resolution ∇σ normals never
# become multi-view consistent, so the reflected pass fires in wrong
# directions.  A plane removes the normals obstacle entirely.
#   usage: run_shinyfloor_ab.sh [steps] [legs]
#     steps: default 30000; legs: "quick" = mipnerf+parity only
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="shinyfloor:cams=48,res=96"
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

TAG="shiny${STEPS}"
run_one mipnerf "${TAG}-mipnerf"
run_one reflect-sampling-nerf "${TAG}-parity"
if [ "$LEGS" != "quick" ]; then
  run_one reflect-sampling-nerf-proposal "${TAG}-preset"
fi
echo "=== ALL DONE ($(date +%T)) ==="
