"""THE train-step time budget (VERDICT r2 #1): split the preset (and
optionally parity) train step into field-kernel time vs everything
else, each timed as its own jitted program at the step's exact shapes,
and rank what remains.

Components timed individually:
  pixgen     — sample_pixel_batch + collider (ray generation)
  prop       — proposal pass (64 samples, tiny MLP) fwd+bwd-equivalent
  pdf        — one pdf_sample at the fine shape (sorting/searchsorted)
  fine_k     — fused field train kernel fwd+bwd at 1024x128
  refl_k     — fused field train kernel fwd+bwd at Kx64 (x2 passes)
  opt        — RAdam update on the 0.62M params (+ proposal adam)
  full       — the whole preset train step (the real number)
  remainder  — full - sum(above): compositing, losses, top_k/scatter,
               ISH g-bands, interlevel/distortion, misc glue

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_budget.py
  [--propreflect] [--parity]
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_field_optimizer, build_optimizer
from rsn.engine.trainer import (TrainState, loss_coefficients_traced,
                                make_train_step, sample_pixel_batch)
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn, time_kernel


def main():
    propreflect = "--propreflect" in sys.argv
    parity = "--parity" in sys.argv
    if parity:
        config = get_method("reflect-sampling-nerf").config_factory()
    else:
        config = get_method(
            "reflect-sampling-nerf-proposal").config_factory()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16",
                               use_proposal_reflect=propreflect,
                               **({"reflect_ray_fraction": 1.0}
                                  if parity else {}))
    config = dataclasses.replace(
        config, pipeline=dataclasses.replace(config.pipeline, model=mcfg))
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = (proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
            if mcfg.use_proposal else None)

    key = jax.random.PRNGKey(7)
    R = 1024
    budget = {}

    # --- pixgen ---
    def pixgen(k):
        b, gt = sample_pixel_batch(images, ds.cameras, R, k)
        b = model_lib.apply_collider(b, mcfg)
        return b.origins.sum() + gt.sum()
    budget["pixgen"] = time_kernel(jax.jit(pixgen), key)

    bundle, gt = sample_pixel_batch(images, ds.cameras, R, key)
    bundle = model_lib.apply_collider(bundle, mcfg)

    from rsn.core.spacing import identity_spacing, spaced_sample
    from rsn.core.sampling import pdf_sample

    rs_uni = spaced_sample(bundle, identity_spacing(),
                           mcfg.num_proposal_samples
                           if mcfg.use_proposal else
                           mcfg.num_coarse_samples, key=key)

    if mcfg.use_proposal:
        def prop_fwd_bwd(pp, k):
            def f(pp):
                w = rs_uni.get_weights(
                    proposal_lib.proposal_density(pp, rs_uni))
                return jnp.sum(w * w)
            return jax.value_and_grad(f)(pp)[0]
        budget["prop"] = time_kernel(jax.jit(prop_fwd_bwd), prop, key)

    # --- pdf sampling at the fine shape ---
    w = jnp.abs(jax.random.normal(key, rs_uni.starts.shape))
    def pdf_only(w, k):
        rs = pdf_sample(bundle, rs_uni, w, identity_spacing(),
                        mcfg.num_importance_samples, key=k)
        return rs.starts.sum()
    budget["pdf_fine"] = time_kernel(jax.jit(pdf_only), w, key)

    # --- fused field train kernels at exact shapes ---
    from rsn.kernels.field_pallas import IN_COLS, mid_g_bands
    from rsn.kernels.field_train import fused_field_train

    def kernel_fwd_bwd(n_rays, S, want_normals, want_dmc):
        k2 = jax.random.PRNGKey(3)
        mc = jnp.pad(
            jnp.concatenate(
                [jax.random.normal(k2, (n_rays * S, 3)) * 0.5,
                 jnp.abs(jax.random.normal(k2, (n_rays * S, 3))) * 1e-2],
                -1), ((0, 0), (0, IN_COLS - 6))).astype(jnp.float32)
        d = jax.random.normal(k2, (n_rays, 3))
        d = d / jnp.linalg.norm(d, -1, keepdims=True)
        g = mid_g_bands(params, d)
        tile = 2048
        rays_per_tile = max(8, tile // S)

        def f(p, mc, g):
            out = fused_field_train(p, mc, g, S, S * rays_per_tile,
                                    want_normals, True, want_dmc)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        fb = jax.jit(jax.grad(f))
        return time_kernel(lambda mc, g: fb(params, mc, g), mc, g)

    budget["fine_kernel"] = kernel_fwd_bwd(R, mcfg.num_importance_samples,
                                           True, False)
    frac = 1.0 if parity else 0.625  # the settled adaptive bucket
    K = R if frac >= 1.0 else max(8, int(R * frac))
    t_refl = kernel_fwd_bwd(K, mcfg.num_reflect_importance_samples,
                            False, True)
    n_refl_kernel_passes = 1 if propreflect else 2
    budget["reflect_kernels"] = t_refl * n_refl_kernel_passes
    if not mcfg.use_proposal:
        budget["coarse_kernel"] = kernel_fwd_bwd(
            R, mcfg.num_coarse_samples, True, False)

    # --- pdf at reflect shape ---
    rs_r = spaced_sample(
        jax.tree.map(lambda x: x[:K], bundle),
        identity_spacing(), mcfg.num_reflect_coarse_samples, key=key)
    wr = jnp.abs(jax.random.normal(key, rs_r.starts.shape))
    def pdf_r(w, k):
        rs = pdf_sample(jax.tree.map(lambda x: x[:K], bundle), rs_r, w,
                        identity_spacing(),
                        mcfg.num_reflect_importance_samples, key=k)
        return rs.starts.sum()
    budget["pdf_reflect"] = time_kernel(jax.jit(pdf_r), wr, key)

    # --- optimizer update alone ---
    optimizer = build_field_optimizer(config.optimizers)
    opt_state = optimizer.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    def opt_only(os_, g):
        upd, os2 = optimizer.update(g, os_, params)
        return jax.tree.leaves(upd)[0].sum()
    budget["optimizer"] = time_kernel(jax.jit(opt_only), opt_state, grads)

    # --- the real full step ---
    train_step, optimizer2 = make_train_step(config)
    state = TrainState(
        params=params, opt_state=optimizer2.init(params),
        step=jnp.int32(0), proposal=prop,
        proposal_opt_state=(build_optimizer(
            config.optimizers["proposal_networks"]).init(prop)
            if prop is not None else None))
    step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    t_full = time_fn(lambda s, k: step_fn(s, k)[1]["total_loss"],
                     state, key)

    label = ("parity" if parity else
             "preset+propreflect" if propreflect else "preset")
    print(f"=== train-step budget ({label}, R={R}, frac={frac}) ===")
    known = 0.0
    for k, v in budget.items():
        print(f"  {k:16s}: {v*1e3:6.3f} ms")
        known += v
    print(f"  {'SUM known':16s}: {known*1e3:6.3f} ms")
    print(f"  {'FULL step':16s}: {t_full*1e3:6.3f} ms "
          f"-> {R/t_full:,.0f} rays/s")
    print(f"  {'remainder':16s}: {(t_full-known)*1e3:6.3f} ms "
          f"(compositing/losses/scatter/g-bands/glue)")


if __name__ == "__main__":
    main()
