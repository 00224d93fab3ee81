"""Phase 3: localize the reflected-pass NaN at the saved step-15036
state (/tmp/nan_state): check get_inf_color, the reflected ray-sample
geometry, and the field eval on BOTH the Pallas and XLA paths.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/debug_prop_nan3.py <run_dir>
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rsn.cli.run_io import load_config
from rsn.engine import checkpoints as ckpt_lib
from rsn.engine.trainer import sample_pixel_batch
from rsn.data.synthetic import make_synthetic_dataset
from rsn.models import field as field_lib
from rsn.models import model as model_lib


def stats(name, v):
    v = np.asarray(jax.device_get(v), np.float32)
    flags = "" if np.isfinite(v).all() else "  <-- NON-FINITE"
    print(f"  {name:28} finite={np.isfinite(v).all()} "
          f"min={np.nanmin(v):+.4e} max={np.nanmax(v):+.4e} "
          f"nan={np.isnan(v).sum()}{flags}", flush=True)


def main():
    run = sys.argv[1]
    cfg = load_config(run)
    mcfg = cfg.pipeline.model
    params0 = field_lib.init_field_params(jax.random.PRNGKey(0))
    path = ckpt_lib.latest_checkpoint("/tmp/nan_state")
    from rsn.models import proposal as proposal_lib
    prop0 = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    restored = ckpt_lib.load_checkpoint(path)
    params = jax.tree.map(jnp.asarray, restored["params"])
    prop = jax.tree.map(jnp.asarray, restored["proposal"])
    step = restored["step"]
    print("state step:", step)

    ds = make_synthetic_dataset(split='train')  # trainer default
    images = jnp.asarray(ds.images)
    key = jax.random.PRNGKey(cfg.seed)
    k_pix, k_render = jax.random.split(jax.random.fold_in(
        key, jnp.int32(step)))
    bundle, gt = sample_pixel_batch(
        images, ds.cameras, cfg.pipeline.datamanager.train_num_rays_per_batch,
        k_pix)
    bundle = model_lib.apply_collider(bundle, mcfg)

    # run get_outputs up to the reflected bundle by replicating the
    # trace (training=True), but instrumented: pull the pieces from a
    # jitted probe fn
    def make_probe(fcfg):
      @jax.jit
      def probe(params, prop, bundle, key):
        from rsn.core.spacing import (identity_spacing,
            reciprocal_spacing, spaced_sample)
        from rsn.core.sampling import pdf_sample
        from rsn.core import rays as rays_lib
        from rsn.core.contract import contract_blob

        cfg_ = mcfg
        k_uni, k_pdf, k_tint, k_recip, k_refl_pdf = jax.random.split(key, 5)
        uniform = identity_spacing()
        rs_uniform = spaced_sample(bundle, uniform, cfg_.num_proposal_samples,
                                   key=k_uni)
        w_prop = rs_uniform.get_weights(
            proposal_lib.proposal_density(prop, rs_uniform))
        rs_pdf = pdf_sample(bundle, rs_uniform, jax.lax.stop_gradient(w_prop),
                            uniform, cfg_.num_importance_samples, key=k_pdf)
        f, _, _ = model_lib._eval_field(params, rs_pdf, fcfg, True)
        weights = rs_pdf.get_weights(f["density"])
        from rsn.core.render import (render_accumulation, render_rgb,
                                     render_depth_median, render_normals,
                                     render_scalar, normalize)
        sg = jax.lax.stop_gradient
        acc = render_accumulation(weights)
        depth_fine = render_depth_median(weights, rs_pdf.starts, rs_pdf.ends)
        diff_fine = sg(render_rgb(f["diff"], weights, None, training=True))
        pred_n = sg(render_normals(f["pred_normals"], weights))
        n_dot_d = sg(jnp.sum(pred_n * bundle.directions, -1, keepdims=True))
        rough = render_scalar(jax.nn.sigmoid(f["rough_raw"]), weights)
        origins = sg(bundle.origins + depth_fine * bundle.directions)
        refl = sg(normalize(bundle.directions - 2.0 * n_dot_d * pred_n))
        sqradius = 2.0 * jnp.abs(n_dot_d) * rough**2
        bg = field_lib.get_inf_color(params, refl, sqradius, fcfg)
        from rsn.core.rays import RayBundle
        ones = jnp.ones_like(depth_fine)
        rb = RayBundle(origins=origins, directions=refl,
                       pixel_area=jnp.pi * sqradius, nears=ones * 0.0,
                       fars=ones * cfg_.reflect_far)
        recip = reciprocal_spacing(cfg_.reciprocal_tan)
        rs_recip = spaced_sample(rb, recip, cfg_.num_reflect_coarse_samples,
                                 key=k_recip)
        blob = rays_lib.get_gaussian_blob(rs_recip)
        mean_c, cov_c = contract_blob(blob)
        fr, _, _ = model_lib._eval_field(params, rs_recip, fcfg, True)
        wr = sg(rs_recip.get_weights(fr["density"]))
        comp = render_rgb(fr["mid_out"], wr, background_color=bg,
                          training=True)
        return dict(sqradius=sqradius, rough=rough, bg=bg,
                    r_mean=mean_c, r_cov=cov_c,
                    r_density=fr["density"], r_mid=fr["mid_out"],
                    r_diff=fr["diff"], r_tint=fr["tint"],
                    r_rough_raw=fr["rough_raw"], wr=wr, comp=comp,
                    blob_mean=blob.mean, blob_dirvar=blob.dir_variance,
                    blob_radvar=blob.radius_variance)
      return probe

    base_fcfg = model_lib._field_cfg(mcfg)
    for use_pallas in (True, False):
        print(f"---- use_pallas={use_pallas}")
        fcfg = dataclasses.replace(base_fcfg, use_pallas=use_pallas,
                                   use_pallas_train=use_pallas)
        out = make_probe(fcfg)(params, prop, bundle, k_render)
        for k in sorted(out):
            stats(k, out[k])




def drill(run):
    """Isolate the NaN ray inside get_inf_color and dump intermediates."""
    cfg = load_config(run)
    mcfg = cfg.pipeline.model
    path = ckpt_lib.latest_checkpoint("/tmp/nan_state")
    restored = ckpt_lib.load_checkpoint(path)
    params = jax.tree.map(jnp.asarray, restored["params"])
    prop = jax.tree.map(jnp.asarray, restored["proposal"])
    step = restored["step"]
    ds = make_synthetic_dataset(split='train')
    images = jnp.asarray(ds.images)
    key = jax.random.PRNGKey(cfg.seed)
    k_pix, k_render = jax.random.split(jax.random.fold_in(
        key, jnp.int32(step)))
    bundle, _ = sample_pixel_batch(
        images, ds.cameras, cfg.pipeline.datamanager.train_num_rays_per_batch,
        k_pix)
    bundle = model_lib.apply_collider(bundle, mcfg)
    fcfg = dataclasses.replace(model_lib._field_cfg(mcfg), use_pallas=True,
                               use_pallas_train=True)
    out = make_probe_inputs(fcfg, mcfg, prop)(params, bundle, k_render)
    refl, sqr = out
    bg = jax.jit(lambda p, r, s: field_lib.get_inf_color(p, r, s, fcfg))(
        params, refl, sqr)
    bad = np.where(~np.isfinite(np.asarray(bg)).all(axis=-1))[0]
    print("bad rays:", bad)
    for i in bad[:3]:
        r = np.asarray(refl[i]); s = np.asarray(sqr[i])
        print(f"ray {i}: refl={r} |refl|={np.linalg.norm(r):.8f} "
              f"sqradius={s}")
        # stepwise recompute (host-controlled, jitted pieces)
        mean = 2.0 * refl[i:i+1]
        cov = 0.6 * sqr[i:i+1] * (1.0 - refl[i:i+1] * refl[i:i+1])
        print("  mean", np.asarray(mean), "cov", np.asarray(cov))
        from rsn.core.encodings import ipe_encode
        enc = jax.jit(ipe_encode)(mean, cov)
        stats("enc", enc)
        emb = jax.jit(lambda p, e: field_lib.mlp_base(p, e,
                                                      fcfg.compute_dtype))(
            params, enc)
        stats("emb", emb)
        bneck = jax.jit(lambda p, e: field_lib._dense(
            p["bottleneck"], e, fcfg.compute_dtype,
            out_dtype=fcfg.compute_dtype))(params, emb)
        stats("bottleneck", bneck)
        low = jax.jit(lambda p, e: field_lib.get_low(p, e, True, fcfg))(
            params, emb)
        stats("low", low)


def make_probe_inputs(fcfg, mcfg, prop):
    from rsn.models import proposal as proposal_lib

    @jax.jit
    def probe(params, bundle, key):
        from rsn.core.spacing import (identity_spacing,
            reciprocal_spacing, spaced_sample)
        from rsn.core.sampling import pdf_sample
        from rsn.core.render import (render_rgb, render_depth_median,
                                     render_normals, render_scalar,
                                     normalize)
        cfg_ = mcfg
        k_uni, k_pdf, k_tint, k_recip, k_refl_pdf = jax.random.split(key, 5)
        uniform = identity_spacing()
        rs_uniform = spaced_sample(bundle, uniform, cfg_.num_proposal_samples,
                                   key=k_uni)
        w_prop = rs_uniform.get_weights(
            proposal_lib.proposal_density(prop, rs_uniform))
        rs_pdf = pdf_sample(bundle, rs_uniform, jax.lax.stop_gradient(w_prop),
                            uniform, cfg_.num_importance_samples, key=k_pdf)
        f, _, _ = model_lib._eval_field(params, rs_pdf, fcfg, True)
        weights = rs_pdf.get_weights(f["density"])
        sg = jax.lax.stop_gradient
        pred_n = sg(render_normals(f["pred_normals"], weights))
        n_dot_d = sg(jnp.sum(pred_n * bundle.directions, -1, keepdims=True))
        rough = render_scalar(jax.nn.sigmoid(f["rough_raw"]), weights)
        refl = sg(normalize(bundle.directions - 2.0 * n_dot_d * pred_n))
        sqradius = 2.0 * jnp.abs(n_dot_d) * rough**2
        return refl, sqradius
    return probe


if len(sys.argv) > 2 and sys.argv[2] == "drill":
    drill(sys.argv[1])
    sys.exit(0)


if __name__ == "__main__" and not (len(sys.argv) > 2):
    main()
