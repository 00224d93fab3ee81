#!/bin/bash
# One-shot TPU probe sweep (run ONLY when no other process holds the
# TPU): render + train budgets for the preset and parity paths, saved
# under /tmp/probes_r3/.  Each probe is its own process; first compile
# on novel shapes can take minutes (CLAUDE.md ops note).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=/tmp/probes_r3
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%T)) ==="
  timeout 1800 "$@" 2>&1 | tee "$OUT/$name.log" | tail -20
}

run render_budget_preset python tools/exp_render_budget.py --preset
run render_budget_parity python tools/exp_render_budget.py
run budget_propreflect   python tools/exp_budget.py --propreflect
run budget_parity        python tools/exp_budget.py --parity
echo "=== probes done ($(date +%T)) ==="
