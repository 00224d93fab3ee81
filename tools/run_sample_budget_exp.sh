#!/bin/bash
# TPU experiment driver: preset sample-budget throughput sweep + 30k
# quality ladder (bf16, the shipped perf path).  Runs everything
# SEQUENTIALLY — only one process may own the TPU.
#
#   nohup bash tools/run_sample_budget_exp.sh > /tmp/sample_exp.log 2>&1 &
#
# Ladder baseline is the shipped preset (fine 128, reflect 64/64) at
# bf16 so candidates compare dtype-for-dtype; prior fp32 ladder
# (BASELINE.md r2) pinned 23.59 vs parity 23.6 at fine 128.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

echo "==== decompose (where the preset step time goes) ===="
python tools/exp_preset_decompose.py

echo "==== throughput sweep ===="
python tools/exp_preset_samples.py

for cfg in "128 64 64 base128" "96 64 64 f96" "64 64 64 f64" "64 48 48 f64r48"; do
  set -- $cfg
  NI=$1; NRC=$2; NRI=$3; NAME=$4
  echo "==== quality run $NAME: fine=$NI reflect=$NRC/$NRI ===="
  python -m rsn.cli.train reflect-sampling-nerf-proposal \
    --pipeline.datamanager.dataparser synthetic \
    --pipeline.model.compute-dtype bfloat16 \
    --pipeline.model.num-importance-samples "$NI" \
    --pipeline.model.num-reflect-coarse-samples "$NRC" \
    --pipeline.model.num-reflect-importance-samples "$NRI" \
    --max-num-iterations 30000 \
    --experiment-name "sweep30k-$NAME" --output-dir outputs
  RUN=$(ls -d "outputs/sweep30k-$NAME"/reflect-sampling-nerf-proposal/* | tail -1)
  python -m rsn.cli.eval --load-dir "$RUN"
done
echo "==== DONE ===="
