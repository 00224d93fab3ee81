#!/bin/bash
# r4 perf-probe batch: render + train budgets for both shipped configs
# plus the compaction-bucket sensitivity table (VERDICT r3 #3/#4/#7).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
echo "=== render budget: parity ($(date +%T)) ==="
timeout 1800 python tools/exp_render_budget.py
echo "=== render budget: preset ($(date +%T)) ==="
timeout 1800 python tools/exp_render_budget.py --preset
echo "=== train budget: preset propreflect ($(date +%T)) ==="
timeout 1800 python tools/exp_budget.py --propreflect
echo "=== train budget: parity ($(date +%T)) ==="
timeout 1800 python tools/exp_budget.py --parity
echo "=== pdf variants at render shape ($(date +%T)) ==="
timeout 1800 python tools/exp_pdf_variants.py 16384
echo "=== render profile: parity ($(date +%T)) ==="
timeout 1800 python tools/exp_render_profile.py
echo "=== compaction sweep ($(date +%T)) ==="
timeout 2400 python tools/exp_compaction_sweep.py
echo "=== DONE ($(date +%T)) ==="
