"""Kernel-branch model glue, exercised on CPU via Pallas interpret mode.

The eval render path (use_pallas) composites directly from the fused
kernel's (R, S) column planes (weights_planes / render_rgb_planes /
render_depth_median_planes) instead of the (R, S, 3) reference-layout
functions.  This test locks the WHOLE kernel-branch get_outputs —
plane prep (packed_contract_planes), the v3 kernel, plane weights and
composites — against the XLA composition within bf16 kernel tolerance,
on the CPU suite (pallas_interpret=True; no TPU needed).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.configs import ModelConfig
from rsn.core.rays import RayBundle
from rsn.data.synthetic import make_synthetic_dataset
from rsn.models import field as field_lib
from rsn.models import model as model_lib


@pytest.fixture(scope="module")
def setup():
    mcfg = ModelConfig(num_coarse_samples=8, num_importance_samples=8,
                       num_reflect_coarse_samples=8,
                       num_reflect_importance_samples=8)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    # crafted normals give a mixed mask (some rays reflect, some don't)
    params["normals"]["w"] = jnp.zeros_like(params["normals"]["w"])
    params["normals"]["b"] = jnp.asarray([0.0, 5.0, 0.0])
    ds = make_synthetic_dataset(num_cameras=1, H=4, W=4)
    from rsn.data.cameras import generate_image_rays

    o, d, pa = generate_image_rays(ds.cameras, 0)
    bundle = RayBundle(origins=o, directions=d, pixel_area=pa,
                       nears=jnp.zeros((o.shape[0], 1)),
                       fars=jnp.zeros((o.shape[0], 1)))
    bundle = model_lib.apply_collider(bundle, mcfg)
    return mcfg, params, bundle


def test_eval_kernel_glue_matches_xla_path(setup):
    mcfg, params, bundle = setup
    key = jax.random.PRNGKey(1)

    xla_cfg = dataclasses.replace(mcfg, use_pallas=False)
    kernel_cfg = dataclasses.replace(mcfg, compute_dtype="bfloat16",
                                     pallas_interpret=True)
    out_x = model_lib.get_outputs(params, bundle, key, xla_cfg,
                                  training=False)
    out_k = model_lib.get_outputs(params, bundle, key, kernel_cfg,
                                  training=False)
    assert set(out_k) == set(out_x)
    # the kernel path runs the trunk in bf16 with poly transcendentals;
    # ray-level composites agree to bf16 tolerance.  The mask is a
    # thresholded bool — require exact agreement (the crafted normals
    # keep rays far from the threshold).
    np.testing.assert_array_equal(np.asarray(out_k["mask"]),
                                  np.asarray(out_x["mask"]))
    for k in ("mid_rgb_coarse", "mid_rgb_fine", "mid_reflect_coarse",
              "mid_reflect_fine", "accumulation_coarse",
              "accumulation_fine", "diff", "tint", "roughness",
              "pred_normals_fine", "n_dot_d_fine"):
        np.testing.assert_allclose(
            np.asarray(out_k[k], np.float32),
            np.asarray(out_x[k], np.float32),
            atol=0.05, rtol=0.05, err_msg=k)
    # depth is a bin MIDPOINT selection (median): bf16 density noise can
    # only move it by whole bins — require most rays to pick the same bin
    same = np.mean(np.isclose(np.asarray(out_k["depth_fine"]),
                              np.asarray(out_x["depth_fine"]), rtol=0.05))
    assert same > 0.8, same


def test_eval_kernel_glue_compaction_matches_full(setup):
    """Plane-path eval compaction (top-K masked rays) must equal the
    full fraction-1.0 plane path wherever #masked <= K."""
    mcfg, params, bundle = setup
    key = jax.random.PRNGKey(1)
    full_cfg = dataclasses.replace(mcfg, compute_dtype="bfloat16",
                                   pallas_interpret=True)
    # mask fraction is 0.5 on this batch; 0.75 cap never overflows
    cap_cfg = dataclasses.replace(full_cfg, eval_reflect_ray_fraction=0.75)
    out_f = model_lib.get_outputs(params, bundle, key, full_cfg,
                                  training=False)
    out_c = model_lib.get_outputs(params, bundle, key, cap_cfg,
                                  training=False)
    assert float(out_c["reflect_overflow"]) == 0.0
    for k in ("mid_reflect_coarse", "mid_reflect_fine"):
        np.testing.assert_allclose(np.asarray(out_c[k]),
                                   np.asarray(out_f[k]),
                                   atol=1e-6, rtol=1e-6, err_msg=k)
    # depth_reflect_fine is "valid only where mask" (SURVEY B#10):
    # unmasked rays carry garbage in the full path and zeros under
    # compaction — compare the masked rows only
    m = np.asarray(out_f["mask"])
    np.testing.assert_allclose(np.asarray(out_c["depth_reflect_fine"])[m],
                               np.asarray(out_f["depth_reflect_fine"])[m],
                               atol=1e-6, rtol=1e-6,
                               err_msg="depth_reflect_fine[mask]")


def test_eval_proposal_kernel_path_matches_xla(setup):
    """r4 fused proposal kernel on the eval path (use_proposal +
    use_proposal_reflect): the whole kernel-branch get_outputs with the
    Pallas proposal density must match the XLA composition within bf16
    kernel tolerance."""
    from rsn.models import proposal as proposal_lib

    mcfg, params, bundle = setup
    key = jax.random.PRNGKey(1)
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    base = dataclasses.replace(mcfg, use_proposal=True,
                               use_proposal_reflect=True,
                               num_proposal_samples=8)
    xla_cfg = dataclasses.replace(base, use_pallas=False)
    # use_pallas_proposal defaults OFF (measured negative on v5e,
    # BASELINE.md r4) — enabled here to keep the kernel path covered
    kernel_cfg = dataclasses.replace(base, compute_dtype="bfloat16",
                                     pallas_interpret=True,
                                     use_pallas_proposal=True)
    out_x = model_lib.get_outputs(params, bundle, key, xla_cfg,
                                  training=False, prop_params=prop)
    out_k = model_lib.get_outputs(params, bundle, key, kernel_cfg,
                                  training=False, prop_params=prop)
    assert set(out_k) == set(out_x)
    np.testing.assert_array_equal(np.asarray(out_k["mask"]),
                                  np.asarray(out_x["mask"]))
    for k in ("mid_rgb_fine", "mid_reflect_fine", "accumulation_fine",
              "diff", "tint", "roughness"):
        np.testing.assert_allclose(
            np.asarray(out_k[k], np.float32),
            np.asarray(out_x[k], np.float32),
            atol=0.05, rtol=0.05, err_msg=k)


def test_density_only_coarse_is_bit_identical_downstream(setup):
    """Output-aware coarse (need_coarse_rgb=False, VERDICT r4 #2): the
    density-only coarse pass must leave every downstream output BIT-
    IDENTICAL to the full path — same coarse weights feed the same PDF
    bins — on both the kernel-glue path and the XLA path.  Only
    mid_rgb_coarse differs (documented background fill)."""
    mcfg, params, bundle = setup
    key = jax.random.PRNGKey(1)
    for cfg in (dataclasses.replace(mcfg, use_pallas=False),
                dataclasses.replace(mcfg, compute_dtype="bfloat16",
                                    pallas_interpret=True)):
        full = model_lib.get_outputs(params, bundle, key, cfg,
                                     training=False)
        dens = model_lib.get_outputs(params, bundle, key, cfg,
                                     training=False,
                                     need_coarse_rgb=False)
        # the density-only coarse emits no per-sample coarse heads
        # (they exist only for the coarse losses / eval diagnostics);
        # r5: pass 3 is density-only too, so the reflect-coarse rgb is
        # omitted (the product render's keep-list never reads it)
        dropped = {"pred_normals_coarse", "normals_coarse",
                   "n_dot_d_coarse", "mid_reflect_coarse"}
        assert set(dens) == set(full) - dropped
        for k in dens:
            if k == "mid_rgb_coarse":
                continue  # background fill by contract
            np.testing.assert_array_equal(
                np.asarray(dens[k]), np.asarray(full[k]),
                err_msg=f"{k} ({'kernel' if cfg.use_pallas else 'xla'})")
