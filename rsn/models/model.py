"""The 4-pass reflect-sampling NeRF renderer + losses.

Rebuilds the reference ``ReflectSamplingNeRFModel.get_outputs`` /
``get_loss_dict`` (reflect_sampling_nerf_model.py:142-430) as pure,
fixed-shape, jittable functions:

  pass 1  coarse:  128 stratified-uniform samples in [near=2, far=6]
  pass 2  fine:    128 PDF samples from coarse weights (include_original=False)
  pass 3  reflect coarse: 64 reciprocal-spaced (tan=0.25) samples on
          secondary rays spawned from the fine surface estimate
  pass 4  reflect fine:   64 PDF samples from pass-3 weights

TPU-first redesign vs the reference:
- The reference boolean-gathers the masked ray subset and early-returns
  when it is empty (model.py:229-260) — data-dependent shapes.  Here the
  reflected passes run for ALL rays at fixed shape and the mask selects
  between the reflected result and the background fill with `jnp.where`;
  values and gradients are identical to the reference's gather/scatter
  (unselected branches contribute exactly zero gradient).
- Host-sync prints (model.py:230,262-265,342) are dropped; debug telemetry
  is available via `jax.debug.print` behind a flag in the trainer.
- stop_gradient placements replicate the reference's .detach() pattern
  exactly (ray-level diff/tint/pred-normals/n_dot_d, reflected weights,
  roughness into ISH, reflected ray origins/directions, PDF bins).

All rng is explicit: a single key per step is split into the stratified /
PDF-jitter / random-background consumers.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from rsn.configs import ModelConfig
from rsn.core import rays as rays_lib
from rsn.core.contract import contract_blob
from rsn.core.rays import RayBundle
from rsn.core.render import (WHITE, blend_background_for_loss_computation,
                             composite_planes, normalize,
                             render_accumulation, render_depth_median,
                             render_depth_median_planes, render_normals,
                             render_rgb, render_rgb_planes, render_scalar,
                             safe_sqrt, weights_planes)
from rsn.core.sampling import pdf_sample
from rsn.core.spacing import (identity_spacing, reciprocal_spacing,
                              spaced_sample)
from rsn.models import field as field_lib
from rsn.models.field import FieldConfig, Params

sg = jax.lax.stop_gradient


def _field_cfg(cfg: ModelConfig) -> FieldConfig:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    on_accel = jax.default_backend() != "cpu"
    # pallas_interpret lets the CPU test suite drive the kernel-branch
    # glue (eval path only; the train kernels are interpret-tested
    # directly in tests/test_field_train_kernel.py)
    use_pallas = (cfg.use_pallas and dtype == jnp.bfloat16
                  and (on_accel or cfg.pallas_interpret))
    return FieldConfig(compute_dtype=dtype,
                       sh_l8_m7_2x=cfg.bug_compat.sh_l8_m7_2x,
                       use_pallas=use_pallas,
                       use_pallas_train=(use_pallas and on_accel
                                         and cfg.use_pallas_train),
                       save_acts=(use_pallas and on_accel
                                  and cfg.use_pallas_train
                                  and cfg.use_pallas_acts),
                       pallas_interpret=cfg.pallas_interpret)


def apply_collider(ray_bundle: RayBundle, cfg: ModelConfig) -> RayBundle:
    """NearFarCollider: constant near/far planes (base Model behavior;
    collider_params near 2.0 / far 6.0 asserted at model.py:89-91)."""
    ones = jnp.ones_like(ray_bundle.origins[..., :1])
    return ray_bundle.replace(nears=ones * cfg.collider_near_plane,
                              fars=ones * cfg.collider_far_plane)


def _eval_field(params: Params, ray_samples, fcfg: FieldConfig,
                training: bool, want_normals: bool = False,
                want_dmc: bool = True):
    """One field evaluation shared by all four passes: contraction +
    trunk + heads + factored mid branch.

    Returns dict(density, diff, tint, rough_raw, pred_normals, mid_out
    [, normals]) plus (mean, cov_diag) for the analytic-normals target.
    The render path (not training, cfg.use_pallas) runs the fully fused
    Pallas v3 kernel; training uses the XLA composition for autodiff —
    or, with use_pallas_train, the custom-VJP fused kernel whose v4
    forward also emits the analytic-normals gradient (want_normals).

    want_dmc=False asserts this call's mean/cov cotangent is dead
    (primary passes when rays are autograd leaves) so the fused train
    path can run the no-IPE backward; see fused_field_train.
    """
    ray_dirs = ray_samples.directions[..., 0, :]  # constant along ray

    use_kernel = fcfg.use_pallas and (not training
                                      or fcfg.use_pallas_train)
    if use_kernel:
        from rsn.core.contract import packed_contract_planes
        from rsn.kernels import field_pallas as fp

        R, S = ray_samples.starts.shape[0], ray_samples.starts.shape[1]
        # v3 (render) is fastest at tile 4096, the v4 forward at 2048
        # (tools/exp_halves_tile.py min-of-3 sweep); the recompute-
        # backward carries ~3x the live set and clamps itself to 1024
        # inside fused_field_train._bwd
        base_tile = 2048 if training else 4096
        if fcfg.pallas_interpret:  # keep CPU interpret tests tractable
            base_tile = 64
        # >=8 rays per tile: the per-ray g_bands blocks (fwd expansion
        # and bwd dg reduction) need >=8 sublanes (Mosaic constraint)
        rays_per_tile = max(8, base_tile // S)
        tile = S * rays_per_tile
        r_pad = -(-R // rays_per_tile) * rays_per_tile
        # blob+contract+pack in (R, S) component planes (full-lane VPU
        # tiles; the (R, S, 3) form wastes 125/128 lanes — contract.py)
        mc = jnp.pad(packed_contract_planes(ray_samples, fp.IN_COLS),
                     ((0, (r_pad - R) * S), (0, 0)))
        g = fp.mid_g_bands(params, ray_dirs, fcfg.sh_l8_m7_2x)
        g = jnp.pad(g, ((0, r_pad - R), (0, 0)))
        if training:
            from rsn.kernels.field_train import fused_field_train
            out = fused_field_train(params, mc, g, S, tile,
                                    training and want_normals,
                                    fcfg.save_acts, want_dmc)[:R * S]
        else:
            # narrow store (V3_EVAL_COLS): only cols [0, 14) carry data
            # at eval — 8x less kernel-output HBM traffic than V3_OUT.
            # n_halves=4: more independent row chunks overlap the
            # VPU-tail-limited eval forward (exp_r5_sweep, ~3%)
            out = fp.field_forward_v3(fp.pack_params_v3f(params), mc, g, S,
                                      tile,
                                      interpret=fcfg.pallas_interpret,
                                      out_cols=fp.V3_EVAL_COLS,
                                      n_halves=4)[:R * S]
        out = out.reshape(R, S, out.shape[-1])
        preact = out[..., fp.V3_DENSITY:fp.V3_DENSITY + 1].astype(
            jnp.float32)
        f = {
            "density": jax.nn.softplus(preact + field_lib.DENSITY_BIAS),
            "diff": out[..., fp.V3_DIFF].astype(jnp.float32),
            "tint": out[..., fp.V3_TINT].astype(jnp.float32),
            "rough_raw": out[..., fp.V3_ROUGH:fp.V3_ROUGH + 1].astype(
                jnp.float32),
            "pred_normals": normalize(
                -out[..., fp.V3_NORMALS].astype(jnp.float32)),
            "mid_out": out[..., fp.V3_MID].astype(jnp.float32),
        }
        if training and want_normals:
            dpdm = out[..., fp.V4_DPDM].astype(jnp.float32)
            f["normals"] = sg(-normalize(dpdm))
        # raw (R, S, V3_OUT) kernel output: the eval path composites
        # directly from its (R, S) column planes (full-lane VPU tiles)
        f["_out"] = out
        # mean/cov_diag are consumed only by the XLA analytic-normals
        # fallback, which the kernel path never takes (normals come
        # from the fused v4 forward)
        return f, None, None

    blob = rays_lib.get_gaussian_blob(ray_samples)
    mean, cov_diag = contract_blob(blob)
    f = field_lib.get_field_outputs(params, mean, cov_diag, fcfg,
                                    differentiable=training)
    rough_sp = jax.nn.softplus(f["rough_raw"])
    mid = field_lib.get_mid_factored(params, ray_dirs, sg(rough_sp),
                                     f["bottleneck"], fcfg)
    f["mid_out"] = f["diff"] + f["tint"] * mid
    return f, mean, cov_diag


def _weights_from_planes(out_planes, ray_samples):
    """Compositing weights from the kernel output's density column, on
    (R, S) sample-minor planes (identical math to get_weights; the
    single place the eval plane paths decode density — keep in sync
    with _eval_field's f["density"])."""
    from rsn.kernels.field_pallas import V3_DENSITY

    dens = jax.nn.softplus(
        out_planes[..., V3_DENSITY].astype(jnp.float32)
        + field_lib.DENSITY_BIAS)
    deltas = (ray_samples.ends - ray_samples.starts)[..., 0]
    return weights_planes(dens, deltas)


def _density_pass(params: Params, ray_samples, fcfg: FieldConfig):
    """Density-only coarse field eval (output-aware coarse, VERDICT r4
    #2): when the caller consumes no coarse rgb (product-image renders:
    rsn-render orbit/path/video, the viewer), the coarse pass feeds
    ONLY the PDF resampler + accumulation/depth — all functions of
    density — so the heads matmul, mid branch, and their serial VPU
    tail are skipped entirely.  -> (R, S) compositing-weight planes,
    bit-identical to the full path's weights (same IPE/trunk/density
    column on the kernel path; same get_density on the XLA path)."""
    if fcfg.use_pallas:
        from rsn.core.contract import packed_contract_planes
        from rsn.kernels import field_pallas as fp

        R, S = ray_samples.starts.shape[0], ray_samples.starts.shape[1]
        # 8192 wins the density-kernel tile sweep (exp_r5_sweep: 0.94 vs
        # 1.00 ms at 4096 for 131k samples)
        base_tile = 64 if fcfg.pallas_interpret else 8192
        rays_per_tile = max(8, base_tile // S)
        tile = S * rays_per_tile
        r_pad = -(-R // rays_per_tile) * rays_per_tile
        mc = jnp.pad(packed_contract_planes(ray_samples, fp.IN_COLS),
                     ((0, (r_pad - R) * S), (0, 0)))
        out = fp.field_forward_density(
            fp.pack_params_density(params), mc, tile,
            interpret=fcfg.pallas_interpret)[:R * S]
        dens = jax.nn.softplus(
            out.reshape(R, S, fp.DENS_COLS)[..., 0].astype(jnp.float32)
            + field_lib.DENSITY_BIAS)
        deltas = (ray_samples.ends - ray_samples.starts)[..., 0]
        return weights_planes(dens, deltas)
    blob = rays_lib.get_gaussian_blob(ray_samples)
    mean, cov_diag = contract_blob(blob)
    # 2D-flatten exactly like get_field_outputs so the density is
    # BIT-identical to the full path's (3D matmuls accumulate in a
    # different order)
    shape = mean.shape[:-1]
    density, _, _ = field_lib.get_density(
        params, mean.reshape(-1, 3), cov_diag.reshape(-1, 3), fcfg)
    return ray_samples.get_weights(
        density.reshape(*shape, 1))[..., 0]


def _primary_pass(params: Params, ray_samples, fcfg: FieldConfig,
                  training: bool, rays_live: bool = True):
    """Shared body of passes 1 & 2: field evals + per-sample heads.

    rays_live=False: the ray bundle's origins/directions/pixel_area are
    autograd leaves (no camera optimizer), so — with the PDF bins
    detached (core/sampling.py) — this pass's mean/cov carry no live
    gradient and the fused train kernel may skip the IPE backward."""
    f, mean, cov_diag = _eval_field(params, ray_samples, fcfg, training,
                                    want_normals=training,
                                    want_dmc=rays_live)
    out_planes = f.get("_out") if not training else None
    if out_planes is not None:
        weights = _weights_from_planes(out_planes, ray_samples)[..., None]
    else:
        weights = ray_samples.get_weights(f["density"])

    pred_normals = f["pred_normals"]
    if training:
        # fused kernel path emits the analytic-normals target in-kernel;
        # XLA path recomputes it via jax.grad under stop_gradient
        normals = f.get("normals")
        if normals is None:
            normals = field_lib.get_analytic_normals(params, mean,
                                                     cov_diag, fcfg)
    else:
        normals = sg(pred_normals)
    dirs = ray_samples.directions
    # sg(dirs): in the reference, ray directions are autograd LEAVES —
    # the orientation loss n_hat.d trains the normals head only, never
    # torques rays.  With the camera optimizer enabled, a live d edge
    # here makes pose-only optimization DIVERGE (ray alignment error
    # 2.0 deg -> 31 deg, tools/exp_camera_opt_recovery.py); severing it
    # changes no values and no field gradients.
    reflections, n_dot_d = field_lib.get_reflection(sg(dirs), pred_normals)

    return dict(weights=weights, rough_raw=f["rough_raw"],
                pred_normals=pred_normals,
                normals=normals, reflections=reflections, n_dot_d=n_dot_d,
                diff=f["diff"], tint=f["tint"], mid=f["mid_out"],
                out_planes=out_planes)


def _reflect_pass(params: Params, ray_samples, bg_color, fcfg: FieldConfig,
                  training: bool):
    """Shared body of passes 3 & 4: reflected radiance with detached
    weights (model.py:292-313, 317-339)."""
    f, _, _ = _eval_field(params, ray_samples, fcfg, training)
    out = f.get("_out") if not training else None
    if out is not None:
        # eval kernel path: plane-layout weights + composite
        wS = _weights_from_planes(out, ray_samples)
        composited = render_rgb_planes(
            wS, [out[..., c].astype(jnp.float32) for c in range(3)],
            background_color=bg_color, training=False)
        return wS[..., None], composited
    weights = sg(ray_samples.get_weights(f["density"]))
    composited = render_rgb(f["mid_out"], weights, background_color=bg_color,
                            training=training)
    return weights, composited


def get_outputs(params: Params, ray_bundle: RayBundle, key: jax.Array,
                cfg: ModelConfig, training: bool,
                prop_params=None, prop_anneal=None,
                rays_live: bool = True,
                need_coarse_rgb: bool = True) -> Dict[str, jax.Array]:
    """The 4-pass render. ray_bundle must already be collided.

    rays_live: whether ray_bundle's geometry carries live gradients
    (True whenever in doubt — the trainer passes False when the camera
    optimizer is off, letting the fused train kernels skip the dead
    IPE backward of the primary passes; the reflected passes always
    keep it, their cone radius is live through the roughness head).

    With cfg.use_proposal and prop_params given, the coarse pass runs
    the small proposal field instead of the main field (density only,
    ~50x cheaper per sample; rsn/models/proposal.py) — a deliberate
    optional deviation from the reference's mip-NeRF coarse/fine
    scheme.  The fine and reflected passes are unchanged.

    prop_anneal: optional scalar in [0, 1]; the fine pass resamples
    from w_prop**prop_anneal (mip-NeRF-360 weight annealing — uniform
    early, proposal-shaped once trained).  None or 1.0 = off.  Only the
    SAMPLING histogram is annealed; the interlevel loss still trains
    the raw proposal weights.
    """
    fcfg = _field_cfg(cfg)
    k_uni, k_pdf, k_tint, k_recip, k_refl_pdf = jax.random.split(key, 5)
    strat = lambda k: k if training else None
    uniform = identity_spacing()
    white = jnp.asarray(WHITE)
    use_prop = cfg.use_proposal and prop_params is not None

    # ---- pass 1: coarse (model.py:148-177) ----
    if use_prop:
        from rsn.models import proposal as proposal_lib

        def prop_density(rs):
            """Proposal density: fused Pallas kernel on the eval/render
            path (r4: the XLA composition charged ~4.7 of 37.8 ms of
            the preset render to this tiny MLP's unfused pipeline —
            tools/exp_render_budget.py); XLA composition under
            training for autodiff."""
            if fcfg.use_pallas and cfg.use_pallas_proposal and not training:
                from rsn.kernels.proposal_pallas import (
                    proposal_density_kernel)
                return proposal_density_kernel(
                    prop_params, rs, interpret=fcfg.pallas_interpret)
            return proposal_lib.proposal_density(prop_params, rs)

        rs_uniform = spaced_sample(ray_bundle, uniform,
                                   cfg.num_proposal_samples,
                                   key=strat(k_uni))
        w_prop = rs_uniform.get_weights(prop_density(rs_uniform))
        c = None
        coarse_weights = sg(w_prop)
        sampling_weights = coarse_weights
        if prop_anneal is not None:
            # anneal ONLY the sampling histogram (w**a with a->1): the
            # reported coarse outputs and the interlevel loss keep the
            # raw weights.  w == 0 stays 0 (jnp 0**0 == 1 would
            # teleport samples into empty bins — guard it).
            sampling_weights = jnp.where(
                coarse_weights > 0.0,
                coarse_weights ** jnp.asarray(prop_anneal,
                                              coarse_weights.dtype),
                0.0)
        accumulation_coarse = render_accumulation(coarse_weights)
        depth_coarse = render_depth_median(coarse_weights,
                                           rs_uniform.starts,
                                           rs_uniform.ends)
        # no coarse rgb in proposal mode: background fill only
        mid_rgb_coarse = white * (1.0 - accumulation_coarse)
    elif not training and not need_coarse_rgb:
        # output-aware coarse (VERDICT r4 #2): the caller consumes no
        # coarse rgb (need_coarse_rgb=False is only offered by render
        # paths whose product is final_rgb — rsn-render orbit/path/
        # video, the viewer, bench's product-image timing), so the
        # coarse pass runs density-only; mid_rgb_coarse gets the
        # proposal-mode background fill and must not be consumed.
        rs_uniform = spaced_sample(ray_bundle, uniform,
                                   cfg.num_coarse_samples,
                                   key=strat(k_uni))
        wS = _density_pass(params, rs_uniform, fcfg)
        c = None
        coarse_weights = wS[..., None]
        sampling_weights = coarse_weights
        accumulation_coarse = jnp.sum(wS, axis=-1, keepdims=True)
        depth_coarse = render_depth_median_planes(
            wS, rs_uniform.starts[..., 0], rs_uniform.ends[..., 0])
        mid_rgb_coarse = white * (1.0 - accumulation_coarse)
    else:
        rs_uniform = spaced_sample(ray_bundle, uniform,
                                   cfg.num_coarse_samples,
                                   key=strat(k_uni))
        c = _primary_pass(params, rs_uniform, fcfg, training, rays_live)
        coarse_weights = c["weights"]
        sampling_weights = coarse_weights
        if c["out_planes"] is not None:  # eval kernel path: plane layout
            wS = coarse_weights[..., 0]
            accumulation_coarse = jnp.sum(wS, axis=-1, keepdims=True)
            depth_coarse = render_depth_median_planes(
                wS, rs_uniform.starts[..., 0], rs_uniform.ends[..., 0])
            mid_rgb_coarse = render_rgb_planes(
                wS, [c["out_planes"][..., i].astype(jnp.float32)
                     for i in range(3)], white, training=False)
        else:
            accumulation_coarse = render_accumulation(c["weights"])
            depth_coarse = render_depth_median(c["weights"],
                                               rs_uniform.starts,
                                               rs_uniform.ends)
            mid_rgb_coarse = jnp.clip(
                render_rgb(c["mid"], c["weights"], white,
                           training=training),
                0.0, 1.0)

    # ---- pass 2: fine (model.py:182-227) ----
    rs_pdf = pdf_sample(ray_bundle, rs_uniform, sampling_weights, uniform,
                        cfg.num_importance_samples, key=strat(k_pdf))
    f = _primary_pass(params, rs_pdf, fcfg, training, rays_live)
    tint_bg = "random" if cfg.bug_compat.tint_random_background else None
    if f["out_planes"] is not None:  # eval kernel path: plane layout
        from rsn.kernels.field_pallas import (V3_DIFF, V3_NORMALS,
                                              V3_ROUGH, V3_TINT)

        out = f["out_planes"]
        f32 = jnp.float32
        wS = f["weights"][..., 0]
        accumulation_fine = jnp.sum(wS, axis=-1, keepdims=True)
        depth_fine = render_depth_median_planes(
            wS, rs_pdf.starts[..., 0], rs_pdf.ends[..., 0])
        mid_rgb_fine = render_rgb_planes(
            wS, [out[..., i].astype(f32) for i in range(3)], white,
            training=False)
        diff_fine = render_rgb_planes(
            wS, [out[..., i].astype(f32)
                 for i in range(V3_DIFF.start, V3_DIFF.stop)],
            white, training=False)
        # replicate render_rgb's eval clip on the tint composite too
        tint_fine = render_rgb_planes(
            wS, [out[..., i].astype(f32)
                 for i in range(V3_TINT.start, V3_TINT.stop)],
            tint_bg, key=k_tint, training=False)
        # per-sample pred_normals = normalize(-raw) (render.normalize
        # semantics: x / max(safe_sqrt(sum x^2), eps)), composited
        nraw = [-out[..., i].astype(f32)
                for i in range(V3_NORMALS.start, V3_NORMALS.stop)]
        nnorm = jnp.maximum(
            safe_sqrt(nraw[0]**2 + nraw[1]**2 + nraw[2]**2), 1e-12)
        pred_normals_fine = jnp.concatenate(
            composite_planes(wS, *[p / nnorm for p in nraw]), axis=-1)
        rough_plane = jax.nn.sigmoid(out[..., V3_ROUGH].astype(f32))
        (roughness,) = composite_planes(wS, rough_plane)
    else:
        accumulation_fine = render_accumulation(f["weights"])
        depth_fine = render_depth_median(f["weights"], rs_pdf.starts,
                                         rs_pdf.ends)
        mid_rgb_fine = jnp.clip(
            render_rgb(f["mid"], f["weights"], white, training=training),
            0.0, 1.0)
        # ray-level composites feeding the reflected pass (model.py:215-227)
        diff_fine = render_rgb(f["diff"], f["weights"], white,
                               training=training)
        tint_fine = render_rgb(f["tint"], f["weights"], tint_bg,
                               key=k_tint, training=training)
        pred_normals_fine = render_normals(f["pred_normals"], f["weights"])
        rough_sig = jax.nn.sigmoid(f["rough_raw"])
        roughness = render_scalar(rough_sig, f["weights"])  # live grad
    diff_fine = sg(diff_fine)
    tint_fine = sg(tint_fine)
    pred_normals_fine = sg(pred_normals_fine)
    n_dot_d = sg(jnp.sum(pred_normals_fine * ray_bundle.directions,
                         axis=-1, keepdims=True))

    mask = jnp.logical_and(
        accumulation_fine > cfg.mask_accumulation_threshold,
        n_dot_d < 0).reshape(-1)  # (R,)

    outputs = {
        "mid_rgb_coarse": mid_rgb_coarse,
        "mid_rgb_fine": mid_rgb_fine,
        "accumulation_coarse": sg(accumulation_coarse),
        "accumulation_fine": sg(accumulation_fine),
        "depth_coarse": sg(depth_coarse),
        "depth_fine": sg(depth_fine),
        "weights_coarse": sg(coarse_weights),
        "weights_fine": sg(f["weights"]),
        "pred_normals_fine": f["pred_normals"],
        "normals_fine": sg(f["normals"]),
        "n_dot_d_fine": f["n_dot_d"],
        "diff": diff_fine,
        "tint": tint_fine,
        "roughness": roughness,
        "mask": mask,
        # fraction of rays that are masked but beyond the compaction cap
        # (0.0 whenever #masked <= K, i.e. exact reference semantics)
        "reflect_overflow": jnp.float32(0.0),
    }
    if use_prop:
        # interlevel-loss inputs: LIVE proposal weights + the two
        # spacing-domain histograms (rsn/models/proposal.py)
        outputs["prop_weights"] = w_prop
        outputs["prop_spacing_bins"] = jnp.concatenate(
            [rs_uniform.spacing_starts[..., 0],
             rs_uniform.spacing_ends[..., -1:, 0]], axis=-1)
        outputs["fine_spacing_bins"] = jnp.concatenate(
            [rs_pdf.spacing_starts[..., 0],
             rs_pdf.spacing_ends[..., -1:, 0]], axis=-1)
        if cfg.distortion_loss_mult:
            # LIVE fine weights (outputs["weights_fine"] is detached):
            # the regularizer must reach the main field's density
            from rsn.models import proposal as proposal_lib
            outputs["distortion"] = proposal_lib.distortion_per_ray(
                f["weights"], outputs["fine_spacing_bins"])[..., None]
    elif c is not None:  # density-only coarse emits no per-sample heads
        outputs.update({
            "pred_normals_coarse": c["pred_normals"],
            "normals_coarse": sg(c["normals"]),
            "n_dot_d_coarse": c["n_dot_d"],
        })
    if not cfg.use_reflection:
        # primary-only model family ("mipnerf" method): passes 3/4 and
        # their outputs are skipped entirely; the fine pass's
        # mid_rgb_fine is the product image.  No reference counterpart
        # (the reference model is always reflection-aware).
        return outputs

    # ---- reflected ray bundle (model.py:267-290) ----
    origins = sg(ray_bundle.origins + depth_fine * ray_bundle.directions)
    reflections = sg(normalize(
        ray_bundle.directions - 2.0 * n_dot_d * pred_normals_fine))
    sqradius = 2.0 * jnp.abs(n_dot_d) * roughness**2  # grad via roughness
    near = 0.0 if cfg.bug_compat.reflect_near_zero else cfg.reflect_near
    ones = jnp.ones_like(depth_fine)
    reflect_bundle = RayBundle(
        origins=origins, directions=reflections,
        pixel_area=jnp.pi * sqradius,
        nears=ones * near, fars=ones * cfg.reflect_far)

    # Fixed-shape compaction (TPU replacement for the reference's
    # boolean gather, model.py:267): when reflect_ray_fraction < 1,
    # passes 3/4 run only on the top-K masked rays (top_k on the mask).
    # Exact reference semantics whenever #masked <= K; excess masked
    # rays fall back to the background fill, counted by the
    # "reflect_overflow" output so the trainer's adaptive controller
    # can raise the cap (rsn/engine/trainer.py).  Training and eval
    # have separate caps; eval defaults to 1.0 = every masked ray
    # processed exactly, like the reference's gather (model.py:267-289).
    R = mask.shape[0]
    frac = (cfg.reflect_ray_fraction if training
            else cfg.eval_reflect_ray_fraction)
    # floor of 8 keeps kernel tiles sane; cap at R (tiny per-device
    # batches, e.g. the multichip dryrun, would otherwise ask top_k for
    # more rays than exist)
    K = R if frac >= 1.0 else min(R, max(8, int(R * frac)))
    if K < R:
        _, sel = jax.lax.top_k(mask.astype(jnp.float32), K)
        reflect_bundle = jax.tree.map(lambda x: x[sel], reflect_bundle)
        sqradius_sel = sqradius[sel]
        reflections_sel = reflections[sel]
        # rays that are masked but beyond the cap fall back to bg fill
        selected = jnp.zeros((R,), bool).at[sel].set(True)
        eff_mask_col = (mask & selected)[:, None]
        reflect_overflow = jnp.mean((mask & ~selected).astype(jnp.float32))
    else:
        sel = None
        sqradius_sel = sqradius
        reflections_sel = reflections
        eff_mask_col = None
        reflect_overflow = jnp.float32(0.0)
    background_color = field_lib.get_inf_color(params, reflections_sel,
                                               sqradius_sel, fcfg)

    # ---- pass 3: reflected coarse (model.py:292-313) ----
    recip = reciprocal_spacing(cfg.reciprocal_tan)
    rs_recip = spaced_sample(reflect_bundle, recip,
                             cfg.num_reflect_coarse_samples,
                             key=strat(k_recip))
    bg_fill = white * (1.0 - accumulation_fine)  # live acc (model.py:240-241)
    mask_col = mask[:, None] if eff_mask_col is None else eff_mask_col

    def scatter_reflect(composited_sub):
        """K-subset reflected radiance -> (R, 3) full result."""
        if sel is None:
            inner = composited_sub
        else:
            inner = jnp.zeros((R, 3), composited_sub.dtype).at[sel].set(
                composited_sub)
        return jnp.where(
            mask_col, jnp.clip(diff_fine + tint_fine * inner, 0.0, 1.0),
            bg_fill)

    use_prop_reflect = use_prop and cfg.use_proposal_reflect
    w_refl_prop = None
    if use_prop_reflect:
        # proposal-for-reflect: the small proposal field places pass 4's
        # samples (no full-field pass 3, no reflect-coarse rgb — the
        # same treatment use_proposal gives pass 1); trains on a second
        # interlevel term (get_loss_dict) over the reciprocal-spacing
        # histograms
        from rsn.models import proposal as proposal_lib
        # Evaluate the proposal on DETACHED geometry: rs_recip's
        # pixel_area is live through roughness (sqradius above), and the
        # interlevel loss keeps w_refl_prop live — without the detach it
        # would leak gradient into the MAIN field's roughness head,
        # violating the invariant that interlevel trains only the
        # proposal field (proposal.py:115; ADVICE r2).  Proposal-param
        # gradients still flow.
        rs_recip_sg = jax.tree.map(jax.lax.stop_gradient, rs_recip)
        w_refl_prop = rs_recip_sg.get_weights(prop_density(rs_recip_sg))
        w_refl_coarse = sg(w_refl_prop)
        refl_sampling_weights = w_refl_coarse
        if prop_anneal is not None:
            refl_sampling_weights = jnp.where(
                w_refl_coarse > 0.0,
                w_refl_coarse ** jnp.asarray(prop_anneal,
                                             w_refl_coarse.dtype),
                0.0)
        # no reflect-coarse rgb exists in this mode (pass 3 runs no
        # color heads) — omit the key rather than emit background fill
        # that eval panels would show as a "render" (ADVICE r2)
        mid_reflect_coarse = None
    elif not training and not need_coarse_rgb:
        # output-aware pass 3 (r5, extends VERDICT r4 #2 to the
        # reflected coarse pass): product renders consume no
        # reflect-coarse rgb (render_image's product_only keep-list) —
        # only its density weights feed the reflected PDF resampler —
        # so pass 3 runs the density-only kernel too; downstream is
        # bit-identical (same density column -> same PDF bins,
        # tests/test_model_kernel_glue.py).  mid_reflect_coarse is
        # omitted, matching the proposal-for-reflect contract above.
        w_refl_coarse = _density_pass(params, rs_recip, fcfg)[..., None]
        refl_sampling_weights = w_refl_coarse
        mid_reflect_coarse = None
    else:
        w_refl_coarse, mid_reflect_coarse_in = _reflect_pass(
            params, rs_recip, background_color, fcfg, training)
        refl_sampling_weights = w_refl_coarse
        mid_reflect_coarse = scatter_reflect(mid_reflect_coarse_in)

    # ---- pass 4: reflected fine (model.py:317-341) ----
    rs_refl_pdf = pdf_sample(reflect_bundle, rs_recip, refl_sampling_weights,
                             recip, cfg.num_reflect_importance_samples,
                             key=strat(k_refl_pdf))
    w_refl_fine, mid_reflect_fine_in = _reflect_pass(
        params, rs_refl_pdf, background_color, fcfg, training)
    mid_reflect_fine = scatter_reflect(mid_reflect_fine_in)
    depth_sub = render_depth_median(
        w_refl_fine, rs_refl_pdf.starts, rs_refl_pdf.ends)
    if sel is None:
        depth_reflect_fine = depth_sub
    else:
        depth_reflect_fine = jnp.zeros((R, 1), depth_sub.dtype).at[sel].set(
            depth_sub)

    if mid_reflect_coarse is not None:
        outputs["mid_reflect_coarse"] = mid_reflect_coarse
    outputs.update({
        "mid_reflect_fine": mid_reflect_fine,
        # always emitted at fixed shape; valid only where mask (SURVEY B#10)
        "depth_reflect_fine": depth_reflect_fine,
        "reflect_overflow": reflect_overflow,
    })
    if use_prop_reflect:
        # second interlevel term's inputs (reciprocal spacing domain):
        # LIVE proposal weights on the reflected K-subset + both
        # histograms' spacing edges; w_refl_fine is already detached
        # (interlevel stop-gradients its fine side anyway)
        outputs["reflect_prop_weights"] = w_refl_prop
        outputs["reflect_prop_spacing_bins"] = jnp.concatenate(
            [rs_recip.spacing_starts[..., 0],
             rs_recip.spacing_ends[..., -1:, 0]], axis=-1)
        outputs["reflect_fine_spacing_bins"] = jnp.concatenate(
            [rs_refl_pdf.spacing_starts[..., 0],
             rs_refl_pdf.spacing_ends[..., -1:, 0]], axis=-1)
        outputs["reflect_weights_fine"] = w_refl_fine
    return outputs


def final_rgb(outputs):
    """The product image of a render: the reflection-composited fine
    rgb when the reflected passes ran (reference semantics,
    model.py:439), else the plain fine rgb (primary-only
    use_reflection=False mode, which never emits mid_reflect_*)."""
    return outputs.get("mid_reflect_fine", outputs["mid_rgb_fine"])


# Loss-key classification for gradient routing (consumed by the
# trainer's camera-optimizer path): pose gradients flow ONLY from the
# photometric losses + the pose regularizer — the normal/orientation
# regularizers act on rays-as-leaves in the reference and steering rays
# off the density diverges (see make_train_step).  Every key
# get_loss_dict can emit MUST appear in exactly one set; the trainer
# asserts full classification so a future loss can't silently get the
# wrong routing (ADVICE r1).
PHOTOMETRIC_LOSS_KEYS = frozenset({
    "loss_mid_coarse", "loss_mid_fine",
    "loss_reflect_mid_coarse", "loss_reflect_mid_fine",
})
NON_PHOTOMETRIC_LOSS_KEYS = frozenset({
    "predicted_normal_loss_coarse", "predicted_normal_loss_fine",
    "orientation_loss_coarse", "orientation_loss_fine",
    "interlevel_loss", "distortion_loss",
})


def get_loss_dict(outputs: Dict[str, jax.Array], gt_image: jax.Array,
                  coefficients: Dict[str, float]) -> Dict[str, jax.Array]:
    """The 8 active losses (model.py:346-430), scaled by `coefficients`.

    gt_image: (R, 3) or (R, 4); RGBA is background-blended like
    RGBRenderer.blend_background_for_loss_computation (WHITE bg).
    """
    def mse(a, b):
        return jnp.mean((a - b) ** 2)

    pred_mid_coarse, gt_rgb = blend_background_for_loss_computation(
        outputs["mid_rgb_coarse"], outputs["accumulation_coarse"], gt_image)
    losses = {
        "loss_mid_fine": mse(gt_rgb, outputs["mid_rgb_fine"]),
        # sums, not means (model.py:403-407); weights/normals detached,
        # pred_normals & n_dot_d live
        "predicted_normal_loss_fine": jnp.sum(
            outputs["weights_fine"] * jnp.sum(
                (outputs["normals_fine"] - outputs["pred_normals_fine"]) ** 2,
                axis=-1, keepdims=True)),
        "orientation_loss_fine": jnp.sum(
            outputs["weights_fine"]
            * jax.nn.relu(outputs["n_dot_d_fine"]) ** 2),
    }
    if "mid_reflect_fine" in outputs:  # absent in primary-only mode
        losses["loss_reflect_mid_fine"] = mse(
            gt_rgb, outputs["mid_reflect_fine"])
        if "mid_reflect_coarse" in outputs:
            # proposal-for-reflect omits the reflect-coarse rgb (pass 3
            # has no color heads there), like use_proposal drops
            # loss_mid_coarse
            losses["loss_reflect_mid_coarse"] = mse(
                gt_rgb, outputs["mid_reflect_coarse"])
    if "prop_weights" in outputs:
        # proposal mode: the coarse pass has no rgb/normal heads; the
        # proposal field trains on the interlevel loss instead
        from rsn.models import proposal as proposal_lib

        losses["interlevel_loss"] = proposal_lib.interlevel_loss(
            outputs["weights_fine"], outputs["fine_spacing_bins"],
            outputs["prop_weights"], outputs["prop_spacing_bins"])
        if "reflect_prop_weights" in outputs:
            # second term: the reflected histograms (reciprocal spacing)
            losses["interlevel_loss"] = (
                losses["interlevel_loss"] + proposal_lib.interlevel_loss(
                    outputs["reflect_weights_fine"],
                    outputs["reflect_fine_spacing_bins"],
                    outputs["reflect_prop_weights"],
                    outputs["reflect_prop_spacing_bins"]))
        if "distortion" in outputs:
            # per-ray values computed on LIVE weights in get_outputs
            losses["distortion_loss"] = jnp.mean(outputs["distortion"])
    else:
        losses.update({
            "loss_mid_coarse": mse(gt_rgb, pred_mid_coarse),
            "predicted_normal_loss_coarse": jnp.sum(
                outputs["weights_coarse"] * jnp.sum(
                    (outputs["normals_coarse"]
                     - outputs["pred_normals_coarse"]) ** 2,
                    axis=-1, keepdims=True)),
            "orientation_loss_coarse": jnp.sum(
                outputs["weights_coarse"]
                * jax.nn.relu(outputs["n_dot_d_coarse"]) ** 2),
        })
    # strict lookup: a silently defaulted coefficient would train at the
    # wrong weight with no error (callers in proposal mode must supply
    # "interlevel_loss", as make_train_step/make_eval_batch_step do)
    return {k: v * coefficients[k] for k, v in losses.items()}
