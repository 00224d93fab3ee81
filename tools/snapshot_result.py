"""Snapshot a training run's evidence into the tracked results/ tree.

outputs/ is gitignored (checkpoints are large), which in round 2 led to
the quality-evidence trail being deleted between rounds (VERDICT r2
weak #3).  This tool copies the SMALL artifacts that back BASELINE.md's
quality claims — config.json, eval.json, and the tail of
train_log.jsonl — into results/<name>/ so they are committed with the
claims they support.

Usage: python tools/snapshot_result.py <run_dir> <name>
"""
from __future__ import annotations

import json
import os
import shutil
import sys

TAIL_LINES = 30


def snapshot(run_dir: str, name: str, repo_root: str = ".") -> str:
    out = os.path.join(repo_root, "results", name)
    os.makedirs(out, exist_ok=True)
    for fname in ("config.json", "eval.json"):
        src = os.path.join(run_dir, fname)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, fname))
    log = os.path.join(run_dir, "train_log.jsonl")
    if os.path.exists(log):
        with open(log) as f:
            lines = f.readlines()
        with open(os.path.join(out, "train_log_tail.jsonl"), "w") as f:
            f.writelines(lines[-TAIL_LINES:])
    meta = {"run_dir": os.path.abspath(run_dir)}
    with open(os.path.join(out, "source.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out


if __name__ == "__main__":
    print(snapshot(sys.argv[1], sys.argv[2]))
