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


def flatten_optimizer(
        opt: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run `opt` on a single raveled parameter vector.

    A per-leaf optimizer update on the field's ~30 small tensors lowers
    to ~30 tiny XLA fusions whose launch overhead dominates: measured
    1.2-1.4 ms/step on a v5e chip for a 0.62M-param RAdam update that
    is ~20 us of actual memory traffic (tools/exp_budget.py r3).  On
    one contiguous vector it is a single fusion.  Identical math: Adam/
    RAdam are elementwise, so ravel/unravel commutes with the update
    (moment state becomes vectors — checkpoints migrate on restore,
    trainer.restore)."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        vec, _ = ravel_pytree(params)
        return opt.init(vec)

    def update(grads, state, params=None):
        gvec, unravel = ravel_pytree(grads)
        pvec = ravel_pytree(params)[0] if params is not None else None
        upd, state = opt.update(gvec, state, pvec)
        return unravel(upd), state

    return optax.GradientTransformation(init, update)


def migrate_opt_state(old_state):
    """Per-leaf optimizer moments (pre-flatten_optimizer checkpoints)
    -> the flattened-vector state.  Identical trajectory: the update is
    elementwise and ravel_pytree orders leaves the same way here and in
    flatten_optimizer."""
    from jax.flatten_util import ravel_pytree

    def mig(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=s.count,
                                          mu=ravel_pytree(s.mu)[0],
                                          nu=ravel_pytree(s.nu)[0])
        return s

    return tuple(mig(s) for s in old_state)


def build_optimizer(cfg: OptimizerGroupConfig,
                    flatten: bool = True) -> optax.GradientTransformation:
    schedule = exponential_decay(cfg.lr, cfg.lr_final, cfg.max_steps)
    if cfg.optimizer == "adam":
        opt = optax.adam(learning_rate=schedule, eps=cfg.eps)
    elif cfg.optimizer == "radam":
        opt = optax.radam(learning_rate=schedule, eps=cfg.eps)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return flatten_optimizer(opt) if flatten else opt


def build_field_optimizer(
        optimizers: Dict[str, OptimizerGroupConfig]
) -> optax.GradientTransformation:
    """The single live parameter group ("fields")."""
    return build_optimizer(optimizers["fields"])
