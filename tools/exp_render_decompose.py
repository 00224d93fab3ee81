"""Decompose the PRESET eval/render path — bench's prender number.

Times, each jitted as a whole program at the bench's render shape
(16384 rays, proposal 64 + fine 128 + reflected 64+64 at the settled
eval compaction fraction):

  fine kernel  — v3 forward at the fine shape (prep included)
  pass 1+2     — proposal + fine pass composites (no reflect)
  full         — full get_outputs + final_rgb (the bench program)

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_render_decompose.py [frac]
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib
from rsn.core.rays import RayBundle
from rsn.utils.timing import time_fn


def main():
    frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    config = get_method("reflect-sampling-nerf-proposal").config_factory()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16",
                               adaptive_eval_reflect_fraction=False,
                               eval_reflect_ray_fraction=frac)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))

    R = 16384
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    bundle = model_lib.apply_collider(bundle, mcfg)

    # fine-shape kernel alone (with input prep, as the model runs it)
    from rsn.core.spacing import identity_spacing, spaced_sample
    fcfg = model_lib._field_cfg(mcfg)

    def fine_kernel(p, k):
        rs = spaced_sample(bundle, identity_spacing(),
                           mcfg.num_importance_samples, key=None)
        f, _, _ = model_lib._eval_field(p, rs, fcfg, training=False)
        return jnp.sum(f["_out"].astype(jnp.float32))

    t = time_fn(jax.jit(fine_kernel), params, key)
    print(f"fine kernel+prep      : {t*1e3:6.2f} ms")

    # passes 1+2 only (primary-only family shares the code path)
    m_noref = dataclasses.replace(mcfg, use_reflection=False)
    f12 = jax.jit(lambda p, pp, k: model_lib.final_rgb(
        model_lib.get_outputs(p, bundle, k, m_noref, training=False,
                              prop_params=pp)))
    t12 = time_fn(f12, params, prop, key)
    print(f"passes 1+2 composited : {t12*1e3:6.2f} ms")

    for name, m in (("reflect", mcfg),
                    ("reflect+prop3", dataclasses.replace(
                        mcfg, use_proposal_reflect=True))):
        full = jax.jit(lambda p, pp, k, m=m: model_lib.final_rgb(
            model_lib.get_outputs(p, bundle, k, m, training=False,
                                  prop_params=pp)))
        tf = time_fn(full, params, prop, key)
        print(f"full ({name:13s}): {tf*1e3:6.2f} ms "
              f"-> {R/tf:,.0f} rays/s (frac {frac})")


if __name__ == "__main__":
    main()
