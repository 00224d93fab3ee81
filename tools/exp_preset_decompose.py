"""Decompose the PRESET (proposal) train step — the bench headline.

Times, cumulatively jitted as whole programs, at the preset's real
shapes (1024 rays, 64 proposal + 128 fine + 64+64 reflected at the
0.5 compaction cap):

  prop        — proposal sampling + weights only
  fine        — + fine pass (fused v4 kernel fwd)
  loss fwd    — full get_outputs + get_loss_dict, no grad
  grad        — value_and_grad
  full step   — sampling + optimizer(s) + state

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_preset_decompose.py
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_optimizer
from rsn.engine.trainer import (TrainState, loss_coefficients_traced,
                                make_train_step, sample_pixel_batch)
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn


def main():
    config = get_method("reflect-sampling-nerf-proposal").config_factory()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16")
    config = dataclasses.replace(
        config, pipeline=dataclasses.replace(config.pipeline, model=mcfg))
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))

    key = jax.random.PRNGKey(7)
    bundle, gt = sample_pixel_batch(images, ds.cameras, 1024, key)
    bundle = model_lib.apply_collider(bundle, mcfg)
    coeffs = dict(loss_coefficients_traced(jnp.int32(5000)),
                  interlevel_loss=jnp.float32(mcfg.interlevel_loss_mult))
    if mcfg.distortion_loss_mult:
        coeffs["distortion_loss"] = jnp.float32(mcfg.distortion_loss_mult)

    from rsn.core.spacing import identity_spacing, spaced_sample

    def prop_only(pp, k):
        rs = spaced_sample(bundle, identity_spacing(),
                           mcfg.num_proposal_samples, key=k)
        w = rs.get_weights(proposal_lib.proposal_density(pp, rs))
        return jnp.sum(w)

    t = time_fn(jax.jit(prop_only), prop, key)
    print(f"proposal pass only    : {t*1e3:6.2f} ms")

    def loss_fn(p, pp, k):
        outputs = model_lib.get_outputs(p, bundle, k, mcfg, training=True,
                                        rays_live=False,
                                        prop_params=pp,
                                        prop_anneal=jnp.float32(1.0))
        return sum(jax.tree.leaves(model_lib.get_loss_dict(
            outputs, gt, coeffs))), outputs

    fwd = jax.jit(lambda p, pp, k: loss_fn(p, pp, k)[0])
    t_fwd = time_fn(fwd, params, prop, key)
    print(f"loss fwd (no grad)    : {t_fwd*1e3:6.2f} ms")

    grad = jax.jit(jax.value_and_grad(
        lambda p, pp, k: loss_fn(p, pp, k)[0], argnums=(0, 1)))
    t_grad = time_fn(lambda p, pp, k: grad(p, pp, k)[0], params, prop, key)
    print(f"value_and_grad        : {t_grad*1e3:6.2f} ms "
          f"(bwd adds {1e3*(t_grad-t_fwd):.2f})")

    train_step, optimizer = make_train_step(config)
    state = TrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.int32(0), proposal=prop,
        proposal_opt_state=build_optimizer(
            config.optimizers["proposal_networks"]).init(prop))
    step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    t_step = time_fn(lambda s, k: step_fn(s, k)[1]["total_loss"],
                     state, key)
    print(f"full preset step      : {t_step*1e3:6.2f} ms "
          f"(sampling+opt adds {1e3*(t_step-t_grad):.2f}) "
          f"-> {1024/t_step:,.0f} rays/s")


if __name__ == "__main__":
    main()
