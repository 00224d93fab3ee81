#!/bin/bash
# Glossy-scene A/B/C: the reflection subsystem's quality benchmark on
# the scene class the reference actually targets (shiny-Blender-style:
# textured diffuse anchor under a glossy coat).  The mirror-scene A/Bs
# (results/spec30k-*, results/spec48c30k-*) are recorded NEGATIVE
# results: with no diffuse anchor the density field fakes reflections
# and normals never become multi-view consistent, so reflected passes
# HURT (BASELINE.md).  The glossy scene pins geometry via the diffuse
# checker; here reflected-ray resampling must beat primary-only.
# Cadence notes as in run_spec48_ab.sh.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
DATA="glossy:cams=48,res=96"

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

run_one mipnerf glossy30k-mipnerf
run_one reflect-sampling-nerf glossy30k-parity
run_one reflect-sampling-nerf-proposal glossy30k-preset
echo "=== ALL DONE ($(date +%T)) ==="
