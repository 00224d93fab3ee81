"""Optimizers + schedulers rebuilt on optax.

Reproduces the reference's optimizer table
(reflect_sampling_nerf_config.py:44-58):

  proposal_networks: Adam(lr 1e-3, eps 1e-15), exp decay -> 1e-4 @ 200k
  fields:            RAdam(lr 1e-3, eps 1e-15), exp decay -> 1e-4 @ 50k
  camera_opt:        Adam(lr 1e-3, eps 1e-15), exp decay -> 1e-4 @ 5k

Only "fields" binds parameters (reference model.py:134-139 returns just
the field params; SURVEY.md B#6) — the other groups are kept in the
config surface for CLI parity but create no optimizer state.

The exponential decay matches nerfstudio ExponentialDecayScheduler with
no warmup: lr(t) = lr_init * (lr_final/lr_init)^(min(t, T)/T).
"""
from __future__ import annotations

from typing import Dict

import optax

from rsn.configs import OptimizerGroupConfig


def exponential_decay(lr_init: float, lr_final: float,
                      max_steps: int) -> optax.Schedule:
    def schedule(count):
        import jax.numpy as jnp
        t = jnp.minimum(count, max_steps) / max_steps
        return lr_init * (lr_final / lr_init) ** t
    return schedule


def build_optimizer(cfg: OptimizerGroupConfig) -> optax.GradientTransformation:
    schedule = exponential_decay(cfg.lr, cfg.lr_final, cfg.max_steps)
    if cfg.optimizer == "adam":
        return optax.adam(learning_rate=schedule, eps=cfg.eps)
    if cfg.optimizer == "radam":
        return optax.radam(learning_rate=schedule, eps=cfg.eps)
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def build_field_optimizer(
        optimizers: Dict[str, OptimizerGroupConfig]
) -> optax.GradientTransformation:
    """The single live parameter group ("fields")."""
    return build_optimizer(optimizers["fields"])
