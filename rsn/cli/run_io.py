"""Run-dir IO shared by eval/render CLIs: config.json + checkpoint load."""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Tuple

from rsn.configs import (BugCompat, DataManagerConfig, ModelConfig,
                         OptimizerGroupConfig, PipelineConfig, TrainerConfig)


def _from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    sub = {"pipeline": PipelineConfig, "datamanager": DataManagerConfig,
           "model": ModelConfig, "bug_compat": BugCompat}
    for k, v in d.items():
        if k not in hints:
            continue
        if k in sub and isinstance(v, dict):
            kwargs[k] = _from_dict(sub[k], v)
        elif k == "optimizers" and isinstance(v, dict):
            kwargs[k] = {name: OptimizerGroupConfig(**g)
                         for name, g in v.items()}
        else:
            kwargs[k] = v
    return cls(**kwargs)


def load_config(run_dir: str) -> TrainerConfig:
    with open(os.path.join(run_dir, "config.json")) as f:
        return _from_dict(TrainerConfig, json.load(f))


def load_run(run_dir: str) -> Tuple[Any, TrainerConfig, int]:
    """-> (params, config, step) from a run dir's latest checkpoint.
    Use `load_run_full` when the optional state groups (camera deltas,
    proposal field) are needed too."""
    params, config, step, _ = load_run_full(run_dir)
    return params, config, step


def load_run_full(run_dir: str):
    """-> (params, config, step, extras) where extras may contain the
    'camera' and 'proposal' param groups.

    Restores the checkpoint from its own saved structure (no abstract
    tree) so no dataset access or optimizer reconstruction is needed —
    eval/render/viewer work even when the training data is absent.
    Optimizer states come back as plain pytrees and are ignored here;
    resuming training goes through Trainer.restore, which restores
    against the real optax structures.
    """
    from rsn.engine import checkpoints as ckpt_lib

    config = load_config(run_dir)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    path = ckpt_lib.latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = ckpt_lib.load_checkpoint(path, None)
    extras = {k: restored[k] for k in ("camera", "proposal")
              if k in restored}
    return restored["params"], config, int(restored["step"]), extras
