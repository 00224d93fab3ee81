"""Preset sample-budget sweep: train throughput vs per-ray sample counts.

The proposal preset inherited the reference's 128 fine + 64/64
reflected samples (reflect_sampling_nerf_model.py:46-54) even though
its coarse pass is a proposal distribution — and proposal-guided
NeRFs (nerfacto, mip-NeRF-360) converge with 48-64 fine samples.
This sweeps the budget at the preset's real batch (1024) to find the
throughput curve; quality at each point is then checked with 30k-step
CLI runs before any default changes.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_preset_samples.py
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_optimizer
from rsn.engine.trainer import TrainState, make_train_step
from rsn.models import field as field_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn

# (num_proposal, num_importance, num_reflect_coarse, num_reflect_importance)
SWEEP = [
    (64, 128, 64, 64),   # shipped preset default
    (64, 96, 64, 64),
    (64, 64, 64, 64),
    (96, 64, 64, 64),    # more (cheap) proposal, half the fine budget
    (64, 64, 48, 48),
    (96, 64, 48, 48),
    (64, 48, 48, 48),
]


def main() -> None:
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(0)

    base = get_method("reflect-sampling-nerf-proposal").config_factory()
    for np_, ni, nrc, nri in SWEEP:
        mcfg = dataclasses.replace(
            base.pipeline.model, compute_dtype="bfloat16",
            num_proposal_samples=np_, num_importance_samples=ni,
            num_reflect_coarse_samples=nrc,
            num_reflect_importance_samples=nri)
        config = dataclasses.replace(
            base, pipeline=dataclasses.replace(base.pipeline, model=mcfg))
        train_step, optimizer = make_train_step(config)
        state = TrainState(
            params=params, opt_state=optimizer.init(params),
            step=jnp.int32(0), proposal=prop,
            proposal_opt_state=build_optimizer(
                config.optimizers["proposal_networks"]).init(prop))
        step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
        # time the WHOLE step (state out) — see bench_train_paths.py
        fn = lambda s, k: step_fn(s, k)[1]["total_loss"]
        batch = config.pipeline.datamanager.train_num_rays_per_batch
        dt = time_fn(fn, state, key)
        print(f"prop{np_:4d} fine{ni:4d} refl{nrc:3d}/{nri:3d}: "
              f"{dt*1e3:7.2f} ms/step  {batch/dt:10,.0f} rays/s",
              flush=True)


if __name__ == "__main__":
    main()
