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
    """-> (params, config, step) from a run dir's latest checkpoint."""
    import jax
    from rsn.engine import checkpoints as ckpt_lib
    from rsn.engine.optimizers import build_field_optimizer
    from rsn.models import field as field_lib

    config = load_config(run_dir)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    path = ckpt_lib.latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    params0 = field_lib.init_field_params(jax.random.PRNGKey(0))
    opt0 = build_field_optimizer(config.optimizers).init(params0)
    restored = ckpt_lib.load_checkpoint(
        path, {"params": params0, "opt_state": opt0, "step": 0})
    return restored["params"], config, int(restored["step"])
