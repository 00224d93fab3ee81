"""Same-process A/B: XLA vs fused-Pallas proposal density on the
preset render (r4).  Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools/exp_prop_kernel_ab.py
"""
import dataclasses
import jax, jax.numpy as jnp
from rsn.cli.registry import get_method
from rsn.core.rays import RayBundle
from rsn.models import field as field_lib, model as model_lib, proposal as proposal_lib
from rsn.utils.timing import time_fn

config = get_method("reflect-sampling-nerf-proposal").config_factory()
mcfg = dataclasses.replace(config.pipeline.model, compute_dtype="bfloat16",
                           adaptive_eval_reflect_fraction=False,
                           eval_reflect_ray_fraction=0.625)
params = field_lib.init_field_params(jax.random.PRNGKey(0))
prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
R = 16384
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (R, 3)); d = d / jnp.linalg.norm(d, -1, keepdims=True)
bundle = RayBundle(origins=jnp.broadcast_to(jnp.asarray([0.,0.,4.]), (R,3)),
                   directions=d, pixel_area=jnp.full((R,1),1e-6),
                   nears=jnp.zeros((R,1)), fars=jnp.ones((R,1)))
bundle = model_lib.apply_collider(bundle, mcfg)
for rounds in range(2):
  for label, flag in (("xla-prop", False), ("kernel-prop", True)):
    cfg = dataclasses.replace(mcfg, use_pallas_proposal=flag)
    f = jax.jit(lambda p, b, k: model_lib.final_rgb(
        model_lib.get_outputs(p, b, k, cfg, training=False, prop_params=prop)))
    t = time_fn(f, params, bundle, key)
    print(f"round{rounds} {label:12s}: {t*1e3:7.3f} ms  -> {R/t:,.0f} rays/s", flush=True)

# r4 result (v5e, same-process A/B, two rounds):
#   round0 xla-prop    :  37.840 ms  -> 432,977 rays/s
#   round0 kernel-prop :  40.455 ms  -> 404,989 rays/s
#   round1 xla-prop    :  37.809 ms  -> 433,333 rays/s
#   round1 kernel-prop :  40.355 ms  -> 405,997 rays/s
# NEGATIVE: XLA already fuses the tiny proposal MLP into surrounding
# ops; the fused kernel's extra prep + launch boundaries cost more
# than they save.  The component probe's 4.7 ms "prop_coarse" is the
# STANDALONE cost, not the marginal cost inside the fused program.
