"""Decompose the train step's ~3.4ms non-kernel time (kernel sum is
~17.1ms of a ~20.5ms step at batch 1024 — exp_kernel_breakdown.py).

Times, cumulatively jitted as whole programs:
  fwd      — loss value only (no grad)
  grad     — value_and_grad (adds the backward)
  step     — full train step (adds sampling + optimizer + state)

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_step_decompose.py
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsn.configs import TrainerConfig
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.trainer import (TrainState, loss_coefficients_traced,
                                make_train_step, sample_pixel_batch)
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.utils.timing import time_fn


def main():
    config = TrainerConfig()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16")
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(7)
    bundle, gt = sample_pixel_batch(images, ds.cameras, 1024, key)
    bundle = model_lib.apply_collider(bundle, mcfg)
    coeffs = loss_coefficients_traced(jnp.int32(1000))

    def loss_fn(p, k):
        outputs = model_lib.get_outputs(p, bundle, k, mcfg, training=True,
                                       rays_live=False)
        return sum(jax.tree.leaves(model_lib.get_loss_dict(
            outputs, gt, coeffs)))

    fwd = jax.jit(loss_fn)
    t_fwd = time_fn(fwd, params, key)
    print(f"fwd loss only        : {t_fwd*1e3:6.2f} ms")

    grad = jax.jit(jax.value_and_grad(loss_fn))
    t_grad = time_fn(lambda p, k: grad(p, k)[0], params, key)
    print(f"value_and_grad       : {t_grad*1e3:6.2f} ms "
          f"(bwd adds {1e3*(t_grad-t_fwd):.2f})")

    # eval-mode forward (render path per-batch cost, no normals dgrad)
    def eval_loss(p, k):
        outputs = model_lib.get_outputs(p, bundle, k, mcfg, training=False)
        return jnp.mean(outputs["mid_rgb_fine"])
    t_eval = time_fn(jax.jit(eval_loss), params, key)
    print(f"eval-mode fwd        : {t_eval*1e3:6.2f} ms")

    cfg = dataclasses.replace(
        config, pipeline=dataclasses.replace(config.pipeline, model=mcfg))
    train_step, optimizer = make_train_step(cfg)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0))
    step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    t_step = time_fn(lambda s, k: step_fn(s, k)[1]["total_loss"],
                     state, key)
    print(f"full train step      : {t_step*1e3:6.2f} ms "
          f"(sampling+opt+state adds {1e3*(t_step-t_grad):.2f})")


if __name__ == "__main__":
    main()
