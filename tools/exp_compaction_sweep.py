"""Compaction-bucket sensitivity sweep (VERDICT r3 #7).

The bench headline quotes train throughput at the adaptive controller's
SETTLED steady-state bucket on the bench scene (0.625: trained mask
fraction 0.41-0.43 + headroom).  That bucket is scene-dependent — a
mirror-heavy scene settles at 0.75-1.0 and train throughput falls
toward the dense number.  This probe makes the dependence explicit:
train rays/s at every controller bucket {0.5, 0.625, 0.75, 1.0} for
BOTH shipped configs (parity = reference-default coarse/fine;
preset = reflect-sampling-nerf-proposal), one table for BASELINE.md.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools/exp_compaction_sweep.py
"""
from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.configs import TrainerConfig
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_optimizer
from rsn.engine.trainer import TrainState, make_train_step
from rsn.models import field as field_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn

BUCKETS = (0.5, 0.625, 0.75, 1.0)


def main():
    config = TrainerConfig()
    batch = config.pipeline.datamanager.train_num_rays_per_batch
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)

    def timed(mcfg_t, prop_params=None):
        cfg_t = dataclasses.replace(
            config,
            pipeline=dataclasses.replace(config.pipeline, model=mcfg_t))
        ts_fn, opt = make_train_step(cfg_t)
        st = TrainState(
            params=params, opt_state=opt.init(params), step=jnp.int32(0),
            proposal=prop_params,
            proposal_opt_state=(build_optimizer(
                cfg_t.optimizers["proposal_networks"]).init(prop_params)
                if prop_params is not None else None))
        fn = jax.jit(lambda s, k: ts_fn(s, images, ds.cameras, k))
        dt = time_fn(lambda s, k: fn(s, k)[1]["total_loss"], st, key)
        return batch / dt

    results = {}
    parity_m = dataclasses.replace(config.pipeline.model,
                                   compute_dtype="bfloat16")
    preset_m = dataclasses.replace(
        get_method("reflect-sampling-nerf-proposal")
        .config_factory().pipeline.model,
        compute_dtype="bfloat16")
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    for name, m, pp in (("parity", parity_m, None),
                        ("preset", preset_m, prop)):
        for b in BUCKETS:
            mcfg_b = dataclasses.replace(m, reflect_ray_fraction=b)
            r = timed(mcfg_b, pp)
            results[f"{name}@{b:g}"] = round(r, 1)
            print(f"{name} bucket {b:g}: {r:,.0f} train rays/s",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
