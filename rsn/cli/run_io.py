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

    Optional state groups (camera deltas, proposal field) are loaded
    when the config says they exist and attached to the returned
    TrainerConfig-independent side channel `load_run.extras` — callers
    that need them use `load_run_full`.
    """
    params, config, step, _ = load_run_full(run_dir)
    return params, config, step


def load_run_full(run_dir: str):
    """-> (params, config, step, extras) where extras may contain
    'camera' and 'proposal' param groups."""
    import jax
    from rsn.engine import checkpoints as ckpt_lib
    from rsn.engine.optimizers import build_field_optimizer, build_optimizer
    from rsn.models import field as field_lib

    config = load_config(run_dir)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    path = ckpt_lib.latest_checkpoint(ckpt_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    params0 = field_lib.init_field_params(jax.random.PRNGKey(0))
    opt0 = build_field_optimizer(config.optimizers).init(params0)
    abstract = {"params": params0, "opt_state": opt0, "step": 0}
    cam_mode = config.pipeline.datamanager.camera_optimizer
    if cam_mode != "off":
        from rsn.data.blender import load_dataset
        from rsn.models import camera_opt as camera_opt_lib
        dm = config.pipeline.datamanager
        train_ds = load_dataset(dm.dataparser, dm.data or "", "train",
                                dm.downscale_factor, dm.scale_factor)
        cam0 = camera_opt_lib.init_camera_opt_params(
            train_ds.cameras.num_cameras, cam_mode)
        abstract["camera"] = cam0
        abstract["camera_opt_state"] = build_optimizer(
            config.optimizers["camera_opt"]).init(cam0)
    if config.pipeline.model.use_proposal:
        from rsn.models import proposal as proposal_lib
        prop0 = proposal_lib.init_proposal_params(jax.random.PRNGKey(0))
        abstract["proposal"] = prop0
        abstract["proposal_opt_state"] = build_optimizer(
            config.optimizers["proposal_networks"]).init(prop0)
    restored = ckpt_lib.load_checkpoint(path, abstract)
    extras = {k: restored[k] for k in ("camera", "proposal")
              if k in restored}
    return restored["params"], config, int(restored["step"]), extras
