"""A/B timing of the train step: XLA path vs fused Pallas kernels.

Run on TPU (default env):  python tools/bench_train_paths.py [batch]
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from rsn.configs import TrainerConfig
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.trainer import TrainState, make_train_step
from rsn.models import field as field_lib
from rsn.utils.timing import time_fn


def build(batch: int, **model_kw):
    config = TrainerConfig()
    dm = dataclasses.replace(config.pipeline.datamanager,
                             train_num_rays_per_batch=batch)
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16", **model_kw)
    config = dataclasses.replace(
        config, pipeline=dataclasses.replace(
            config.pipeline, model=mcfg, datamanager=dm))
    train_step, optimizer = make_train_step(config)
    return config, train_step, optimizer


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)

    for name, kw in (
        ("xla", {"use_pallas": False, "use_pallas_train": False}),
        ("pallas_train", {"use_pallas": True, "use_pallas_train": True,
                          "use_pallas_acts": False}),
        ("pallas_acts", {"use_pallas": True, "use_pallas_train": True,
                         "use_pallas_acts": True}),
    ):
        config, train_step, optimizer = build(batch, **kw)
        state = TrainState(params=params, opt_state=optimizer.init(params),
                           step=jnp.int32(0))
        # jit the WHOLE step: selecting total_loss inside the jit would
        # let XLA dead-code-eliminate the backward + optimizer update
        step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
        fn = lambda s, k: step_fn(s, k)[1]["total_loss"]
        dt = time_fn(fn, state, key)
        print(f"{name:>14}: {dt*1e3:8.2f} ms/step  "
              f"{batch/dt:12,.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
