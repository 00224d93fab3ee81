"""A/B the eval kernel's narrow output store (V3_EVAL_COLS=16 vs the
padded 128): times the FULL preset + parity product-image render at the
bench shapes.  Run on TPU."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.core.rays import RayBundle
from rsn.kernels import field_pallas as fp
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn

R = 16384


def main():
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))

    for method, use_prop in (("reflect-sampling-nerf-proposal", True),
                             ("reflect-sampling-nerf", False)):
        config = get_method(method).config_factory()
        mcfg = dataclasses.replace(config.pipeline.model,
                                   compute_dtype="bfloat16",
                                   eval_reflect_ray_fraction=0.625,
                                   adaptive_eval_reflect_fraction=False)
        bundle = RayBundle(
            origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
            directions=d, pixel_area=jnp.full((R, 1), 1e-6),
            nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
        bundle = model_lib.apply_collider(bundle, mcfg)
        pp = prop if use_prop else None
        for cols in (16, 128):
            fp.V3_EVAL_COLS = cols
            render = jax.jit(lambda p, b, k: model_lib.final_rgb(
                model_lib.get_outputs(p, b, k, mcfg, training=False,
                                      prop_params=pp)))
            t = time_fn(render, params, bundle, key)
            print(f"{method:34s} cols={cols:3d}: {t*1e3:7.3f} ms "
                  f"-> {R/t:,.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
