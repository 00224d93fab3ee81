"""Render-path time budget (r3): split the eval/render step into
field-kernel time vs glue, each timed as its own jitted program at the
render's exact shapes, and rank what remains.

The r2 plane-layout work moved the composites onto full-lane (R, S)
tiles; the prior decomposition only covered the TRAIN step (which is
kernel-dominated).  The render path was measured at ~96 TF/s effective
vs ~150 TF/s for the raw v3 kernel — this probe locates the ~1/3 of
render wall-clock that is not kernel time.

Components timed individually (parity config; --preset for the
recommended preset):
  v3_coarse / v3_fine / v3_reflect — fused forward kernels, exact shapes
  prep       — packed_contract_planes + pad at the fine shape
  g_bands    — ISH mid_g_bands at R (+ K for reflect passes)
  sampling   — spaced_sample + pdf_sample chains (all four passes)
  composites — pass-2 plane composites (rgb/diff/tint/normals/rough/
               depth-median/acc) from a (R, S, V3_OUT) kernel output
  inf_color  — background env color on the K-subset
  compaction — mask + top_k + bundle gather + two scatters
  full       — the whole final_rgb render (the real number)

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools/exp_render_budget.py [--preset]
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.core.rays import RayBundle
from rsn.core.sampling import pdf_sample
from rsn.core.spacing import (identity_spacing, reciprocal_spacing,
                              spaced_sample)
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib
from rsn.utils.timing import time_fn, time_kernel

R = 16384


def main():
    preset = "--preset" in sys.argv
    method = ("reflect-sampling-nerf-proposal" if preset
              else "reflect-sampling-nerf")
    config = get_method(method).config_factory()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16")
    fcfg = model_lib._field_cfg(mcfg)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = (proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
            if mcfg.use_proposal else None)

    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    bundle = model_lib.apply_collider(bundle, mcfg)

    budget = {}

    # --- fused v3 forward kernels at exact shapes -----------------
    from rsn.kernels.field_pallas import (IN_COLS, V3_OUT, field_forward_v3,
                                          mid_g_bands, pack_params_v3f)
    packed = pack_params_v3f(params)

    def kernel_fwd(n_rays, S):
        k2 = jax.random.PRNGKey(3)
        mc = jnp.pad(
            jnp.concatenate(
                [jax.random.normal(k2, (n_rays * S, 3)) * 0.5,
                 jnp.abs(jax.random.normal(k2, (n_rays * S, 3))) * 1e-2],
                -1), ((0, 0), (0, IN_COLS - 6))).astype(jnp.float32)
        dd = jax.random.normal(k2, (n_rays, 3))
        dd = dd / jnp.linalg.norm(dd, -1, keepdims=True)
        g = mid_g_bands(params, dd)
        tile = 4096
        rays_per_tile = max(8, tile // S)

        def f(mc, g):
            out = field_forward_v3(packed, mc, g, S, S * rays_per_tile)
            return jnp.sum(out.astype(jnp.float32))
        return time_kernel(jax.jit(f), mc, g)

    S_fine = mcfg.num_importance_samples
    S_refl = mcfg.num_reflect_importance_samples
    # settled eval compaction bucket at the bench's ~0.50 mask fraction
    frac = 0.625
    K = max(8, int(R * frac))
    budget["v3_fine"] = kernel_fwd(R, S_fine)
    if mcfg.use_proposal:
        def prop_coarse(k):
            rs = spaced_sample(bundle, identity_spacing(),
                               mcfg.num_proposal_samples, key=None)
            w = rs.get_weights(proposal_lib.proposal_density(prop, rs))
            return w.sum()
        budget["prop_coarse"] = time_kernel(jax.jit(prop_coarse), key)
    else:
        budget["v3_coarse"] = kernel_fwd(R, mcfg.num_coarse_samples)
    n_refl_kernels = 1 if (mcfg.use_proposal
                           and mcfg.use_proposal_reflect) else 2
    budget["v3_reflect"] = kernel_fwd(K, S_refl) * n_refl_kernels

    # --- glue pieces ----------------------------------------------
    rs_fine = spaced_sample(bundle, identity_spacing(), S_fine, key=None)

    def prep(rs):
        from rsn.core.contract import packed_contract_planes
        return packed_contract_planes(rs, IN_COLS).sum()
    budget["prep_fine"] = time_kernel(jax.jit(prep), rs_fine)

    def gb(dd):
        return mid_g_bands(params, dd, fcfg.sh_l8_m7_2x).sum()
    budget["g_bands"] = (time_kernel(jax.jit(gb), d)
                         + 2 * time_kernel(jax.jit(gb), d[:K]))

    # sampling chains: uniform + pdf (primary), recip + pdf (reflected)
    w_fake = jnp.abs(jax.random.normal(key, rs_fine.starts[..., 0].shape))

    def sampling(w, k):
        n_c = (mcfg.num_proposal_samples if mcfg.use_proposal
               else mcfg.num_coarse_samples)
        rs_u = spaced_sample(bundle, identity_spacing(), n_c, key=None)
        rs_p = pdf_sample(bundle, rs_u, w[:, :n_c, None],
                          identity_spacing(), S_fine, key=None)
        sub = jax.tree.map(lambda x: x[:K], bundle)
        recip = reciprocal_spacing(mcfg.reciprocal_tan)
        rs_r = spaced_sample(sub, recip, mcfg.num_reflect_coarse_samples,
                             key=None)
        rs_rp = pdf_sample(sub, rs_r,
                           w[:K, :mcfg.num_reflect_coarse_samples, None],
                           recip, S_refl, key=None)
        return (rs_u.starts.sum() + rs_p.starts.sum() + rs_r.starts.sum()
                + rs_rp.starts.sum())
    budget["sampling"] = time_kernel(jax.jit(sampling), w_fake, key)

    # pass-2 plane composites from a fake kernel output
    out_fake = jax.random.normal(key, (R, S_fine, V3_OUT),
                                 jnp.float32).astype(jnp.bfloat16)

    def composites(out, k):
        from rsn.core.render import (composite_planes,
                                     render_depth_median_planes,
                                     render_rgb_planes, safe_sqrt,
                                     weights_planes)
        from rsn.kernels.field_pallas import (V3_DENSITY, V3_DIFF,
                                              V3_NORMALS, V3_ROUGH, V3_TINT)
        f32 = jnp.float32
        dens = jax.nn.softplus(out[..., V3_DENSITY].astype(f32))
        deltas = (rs_fine.ends - rs_fine.starts)[..., 0]
        wS = weights_planes(dens, deltas)
        acc = jnp.sum(wS, axis=-1, keepdims=True)
        dep = render_depth_median_planes(wS, rs_fine.starts[..., 0],
                                         rs_fine.ends[..., 0])
        white = jnp.asarray([1.0, 1.0, 1.0])
        rgb = render_rgb_planes(wS, [out[..., i].astype(f32)
                                     for i in range(3)], white,
                                training=False)
        dif = render_rgb_planes(wS, [out[..., i].astype(f32)
                                     for i in range(V3_DIFF.start,
                                                    V3_DIFF.stop)],
                                white, training=False)
        tin = render_rgb_planes(wS, [out[..., i].astype(f32)
                                     for i in range(V3_TINT.start,
                                                    V3_TINT.stop)],
                                None, key=k, training=False)
        nraw = [-out[..., i].astype(f32)
                for i in range(V3_NORMALS.start, V3_NORMALS.stop)]
        nn = jnp.maximum(safe_sqrt(nraw[0]**2 + nraw[1]**2 + nraw[2]**2),
                         1e-12)
        pn = jnp.concatenate(composite_planes(wS, *[p / nn for p in nraw]),
                             axis=-1)
        rough = composite_planes(
            wS, jax.nn.sigmoid(out[..., V3_ROUGH].astype(f32)))[0]
        return (acc.sum() + dep.sum() + rgb.sum() + dif.sum() + tin.sum()
                + pn.sum() + rough.sum())
    budget["composites"] = time_kernel(jax.jit(composites), out_fake, key)

    # variant: transpose the kernel output ONCE to (C, R, S) contiguous
    # planes, then composite from those — replaces up to ~14 strided
    # lane-subset extracts of the (R, S, 16) array with one relayout
    def composites_T(out, k):
        planes = jnp.moveaxis(out.astype(jnp.float32), -1, 0)  # (C,R,S)
        from rsn.core.render import (composite_planes,
                                     render_depth_median_planes,
                                     render_rgb_planes, safe_sqrt,
                                     weights_planes)
        from rsn.kernels.field_pallas import (V3_DENSITY, V3_DIFF,
                                              V3_NORMALS, V3_ROUGH, V3_TINT)
        dens = jax.nn.softplus(planes[V3_DENSITY])
        deltas = (rs_fine.ends - rs_fine.starts)[..., 0]
        wS = weights_planes(dens, deltas)
        acc = jnp.sum(wS, axis=-1, keepdims=True)
        dep = render_depth_median_planes(wS, rs_fine.starts[..., 0],
                                         rs_fine.ends[..., 0])
        white = jnp.asarray([1.0, 1.0, 1.0])
        rgb = render_rgb_planes(wS, [planes[i] for i in range(3)], white,
                                training=False)
        dif = render_rgb_planes(wS, [planes[i] for i in
                                     range(V3_DIFF.start, V3_DIFF.stop)],
                                white, training=False)
        tin = render_rgb_planes(wS, [planes[i] for i in
                                     range(V3_TINT.start, V3_TINT.stop)],
                                None, key=k, training=False)
        nraw = [-planes[i] for i in range(V3_NORMALS.start,
                                          V3_NORMALS.stop)]
        nn = jnp.maximum(safe_sqrt(nraw[0]**2 + nraw[1]**2 + nraw[2]**2),
                         1e-12)
        pn = jnp.concatenate(composite_planes(wS, *[p / nn for p in nraw]),
                             axis=-1)
        rough = composite_planes(wS, jax.nn.sigmoid(planes[V3_ROUGH]))[0]
        return (acc.sum() + dep.sum() + rgb.sum() + dif.sum() + tin.sum()
                + pn.sum() + rough.sum())
    budget["composites_T"] = time_kernel(jax.jit(composites_T), out_fake,
                                         key)

    # inf_color on the K-subset
    sqr = jnp.abs(jax.random.normal(key, (K, 1))) * 1e-4

    def inf(dd, s):
        return field_lib.get_inf_color(params, dd, s, fcfg).sum()
    budget["inf_color"] = time_kernel(jax.jit(inf), d[:K], sqr)

    # compaction logistics: mask -> top_k -> gathers -> two scatters
    acc_fake = jax.random.uniform(key, (R, 1))
    ndd_fake = jax.random.normal(key, (R, 1))

    def compaction(acc, ndd):
        mask = jnp.logical_and(acc > 0.01, ndd < 0).reshape(-1)
        _, sel = jax.lax.top_k(mask.astype(jnp.float32), K)
        b2 = jax.tree.map(lambda x: x[sel], bundle)
        selected = jnp.zeros((R,), bool).at[sel].set(True)
        sub = jnp.ones((K, 3)) * acc[:K]
        inner = jnp.zeros((R, 3)).at[sel].set(sub)
        inner2 = jnp.zeros((R, 1)).at[sel].set(sub[:, :1])
        return (b2.origins.sum() + inner.sum() + inner2.sum()
                + selected.sum())
    budget["compaction"] = time_kernel(jax.jit(compaction), acc_fake,
                                       ndd_fake)

    # --- the real full render -------------------------------------
    mcfg_r = dataclasses.replace(mcfg, eval_reflect_ray_fraction=frac)
    render = jax.jit(lambda p, b, k: model_lib.final_rgb(
        model_lib.get_outputs(p, b, k, mcfg_r, training=False,
                              prop_params=prop)))
    t_full = time_fn(render, params, bundle, key)

    label = "preset" if preset else "parity"
    print(f"=== render budget ({label}, R={R}, frac={frac}, K={K}) ===")
    known = 0.0
    for k, v in budget.items():
        print(f"  {k:14s}: {v*1e3:7.3f} ms")
        if k != "composites_T":  # variant, not a pipeline component
            known += v
    print(f"  {'SUM known':12s}: {known*1e3:7.3f} ms")
    print(f"  {'FULL render':12s}: {t_full*1e3:7.3f} ms "
          f"-> {R/t_full:,.0f} rays/s")
    print(f"  {'remainder':12s}: {(t_full-known)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
