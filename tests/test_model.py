"""Model-level tests: output-key parity (SURVEY.md App C), fixed shapes,
mask semantics, loss keys/coefficients + warmup schedule, and the
stop-gradient contract replicating the reference's detach pattern.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.configs import (LOSS_COEFFICIENTS, ModelConfig,
                         loss_coefficients_at_step)
from rsn.core.rays import RayBundle
from rsn.models import field as F
from rsn.models import model as M

CFG = ModelConfig(num_coarse_samples=16, num_importance_samples=16,
                  num_reflect_coarse_samples=8,
                  num_reflect_importance_samples=8)

EXPECTED_KEYS = {
    # per-ray output keys (reference model.py:233-258,341 / SURVEY App C)
    "mid_rgb_coarse", "mid_rgb_fine", "mid_reflect_coarse",
    "mid_reflect_fine", "accumulation_coarse", "accumulation_fine",
    "depth_coarse", "depth_fine", "weights_coarse", "weights_fine",
    "pred_normals_coarse", "pred_normals_fine", "normals_coarse",
    "normals_fine", "n_dot_d_coarse", "n_dot_d_fine", "diff", "tint",
    "roughness", "mask", "depth_reflect_fine",
    # rsn addition: compaction-cap overflow accounting (scalar; 0.0
    # whenever the fixed-shape compaction is exact)
    "reflect_overflow",
}


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = F.init_field_params(key)
    R = 8
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((R, 3)), directions=d,
                   pixel_area=jnp.full((R, 1), 1e-6),
                   nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    rb = M.apply_collider(rb, CFG)
    out = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, CFG, True))(
        params, rb, key)
    return params, rb, out


def test_output_keys_match_reference(setup):
    _, _, out = setup
    assert set(out.keys()) == EXPECTED_KEYS


def test_output_shapes_fixed(setup):
    _, rb, out = setup
    R = rb.num_rays
    assert out["mid_rgb_fine"].shape == (R, 3)
    assert out["weights_coarse"].shape == (R, CFG.num_coarse_samples, 1)
    assert out["mask"].shape == (R,) and out["mask"].dtype == bool
    assert out["depth_reflect_fine"].shape == (R, 1)


def test_collider_sets_near_far(setup):
    _, rb, _ = setup
    assert float(rb.nears[0, 0]) == 2.0 and float(rb.fars[0, 0]) == 6.0


def test_unmasked_rays_get_background_fill(setup):
    """Where mask is False, mid_reflect_* == white * (1 - accumulation_fine)
    (reference model.py:240-241 + early return)."""
    _, _, out = setup
    m = np.asarray(out["mask"])
    if (~m).any():
        fill = 1.0 - np.asarray(out["accumulation_fine"])[~m]
        np.testing.assert_allclose(
            np.asarray(out["mid_reflect_fine"])[~m], np.tile(fill, (1, 3)),
            rtol=1e-5, atol=1e-6)


def test_loss_keys_and_scaling(setup):
    _, _, out = setup
    gt = jnp.full((8, 3), 0.5)
    coeffs = loss_coefficients_at_step(100)
    ld = M.get_loss_dict(out, gt, coeffs)
    assert set(ld.keys()) == {
        "loss_mid_coarse", "loss_mid_fine", "loss_reflect_mid_coarse",
        "loss_reflect_mid_fine", "predicted_normal_loss_coarse",
        "predicted_normal_loss_fine", "orientation_loss_coarse",
        "orientation_loss_fine"}
    # warmup zeroing
    ld0 = M.get_loss_dict(out, gt, loss_coefficients_at_step(0))
    assert float(ld0["orientation_loss_fine"]) == 0.0
    assert float(ld0["loss_mid_fine"]) == pytest.approx(
        float(ld["loss_mid_fine"]))
    # coefficient table parity (reference model.py:56-69)
    assert LOSS_COEFFICIENTS["predicted_normal_loss_fine"] == 3e-4
    assert LOSS_COEFFICIENTS["orientation_loss_coarse"] == 1e-2


def test_normal_losses_dont_touch_density_head(setup):
    """weights & normals are detached in the outputs dict (reference
    model.py:246-251), so predicted-normal/orientation losses must have
    exactly zero gradient on the density head."""
    params, rb, _ = setup
    key = jax.random.PRNGKey(3)

    def loss(p):
        out = M.get_outputs(p, rb, key, CFG, True)
        c = {k: 0.0 for k in LOSS_COEFFICIENTS}
        c["predicted_normal_loss_fine"] = 1.0
        c["orientation_loss_fine"] = 1.0
        ld = M.get_loss_dict(out, jnp.full((8, 3), 0.5), c)
        return sum(ld.values())

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["density"]["w"]).max()) == 0.0
    # but they DO reach the pred-normals head
    assert float(jnp.abs(g["normals"]["w"]).max()) > 0.0


def test_rgb_loss_reaches_density(setup):
    params, rb, _ = setup
    key = jax.random.PRNGKey(4)

    def loss(p):
        out = M.get_outputs(p, rb, key, CFG, True)
        c = {k: 0.0 for k in LOSS_COEFFICIENTS}
        c["loss_mid_fine"] = 1.0
        return sum(M.get_loss_dict(out, jnp.full((8, 3), 0.5), c).values())

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["density"]["w"]).max()) > 0.0
    assert float(jnp.abs(g["trunk"][0]["w"]).max()) > 0.0


def test_eval_mode_deterministic(setup):
    params, rb, _ = setup
    f = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, CFG, False))
    o1 = f(params, rb, jax.random.PRNGKey(0))
    o2 = f(params, rb, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(o1["mid_rgb_fine"]),
                               np.asarray(o2["mid_rgb_fine"]))
    # eval normals are the predicted normals (reference model.py:161-162)
    np.testing.assert_allclose(np.asarray(o1["normals_fine"]),
                               np.asarray(o1["pred_normals_fine"]))


def test_eval_is_key_independent(setup):
    """At eval the ENTIRE forward must be key-independent: samplers use
    deterministic midpoints and (r4 tint-background correction, PARITY
    B#12) no composite blends random noise.  DIFFERENT keys must give
    bit-identical products — the lock against any stochastic term
    sneaking back into the product image (the r1-r3 tint noise cost a
    measured −5 dB of eval speckle)."""
    params, rb, _ = setup
    f = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, CFG, False))
    o1 = f(params, rb, jax.random.PRNGKey(0))
    o2 = f(params, rb, jax.random.PRNGKey(12345))
    for k in ("mid_rgb_fine", "mid_reflect_fine", "tint", "diff",
              "depth_fine", "roughness"):
        np.testing.assert_array_equal(np.asarray(o1[k]),
                                      np.asarray(o2[k]), err_msg=k)


def test_grads_finite_all_params(setup):
    params, rb, _ = setup

    def loss(p):
        out = M.get_outputs(p, rb, jax.random.PRNGKey(5), CFG, True)
        return sum(M.get_loss_dict(out, jnp.full((8, 3), 0.5),
                                   loss_coefficients_at_step(100)).values())

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())


def test_reflect_compaction_exact_when_under_cap(setup):
    """With #masked <= K the compacted reflected passes must reproduce
    the uncompacted results exactly (same rng path per selected ray is
    not guaranteed, but eval-mode samplers are deterministic)."""
    import dataclasses
    params, rb, _ = setup
    key = jax.random.PRNGKey(11)
    full = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, CFG, False))(
        params, rb, key)
    n_masked = int(np.asarray(full["mask"]).sum())
    if n_masked == 0 or n_masked > 6:
        pytest.skip(f"fixture mask count {n_masked} unsuited")
    cfg2 = dataclasses.replace(CFG, eval_reflect_ray_fraction=6.0 / 8.0)
    comp = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, cfg2, False))(
        params, rb, key)
    np.testing.assert_allclose(np.asarray(comp["mid_reflect_fine"]),
                               np.asarray(full["mid_reflect_fine"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(comp["mask"]),
                                  np.asarray(full["mask"]))


def test_eval_ignores_training_compaction_cap(setup):
    """The TRAINING cap (reflect_ray_fraction) must not affect eval:
    eval/render exactness is governed only by eval_reflect_ray_fraction
    (default 1.0 = reference-gather semantics on every masked ray)."""
    import dataclasses
    params, rb, _ = setup
    key = jax.random.PRNGKey(13)
    base = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, CFG, False))(
        params, rb, key)
    cfg2 = dataclasses.replace(CFG, reflect_ray_fraction=0.25)
    capped = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, cfg2, False))(
        params, rb, key)
    for k in ("mid_reflect_fine", "mid_reflect_coarse",
              "depth_reflect_fine"):
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(capped[k]), err_msg=k)
    assert float(capped["reflect_overflow"]) == 0.0


def test_reflect_compaction_over_cap_falls_back(setup):
    """With K below the masked count, excess masked rays must get the
    background fill (and stay finite)."""
    import dataclasses
    params, rb, _ = setup
    cfg2 = dataclasses.replace(CFG,
                               eval_reflect_ray_fraction=0.01)  # min K=8
    # force tiny K by many rays: use the 8-ray fixture -> K = max(8, .08)=8
    # -> same as full; instead test fraction on a 32-ray bundle
    key = jax.random.PRNGKey(12)
    d = jax.random.normal(key, (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb32 = M.apply_collider(
        __import__("rsn.core.rays", fromlist=["RayBundle"]).RayBundle(
            origins=jnp.zeros((32, 3)), directions=d,
            pixel_area=jnp.full((32, 1), 1e-6),
            nears=jnp.zeros((32, 1)), fars=jnp.ones((32, 1))), CFG)
    cfg2 = dataclasses.replace(CFG, eval_reflect_ray_fraction=0.25)  # K=8
    out = jax.jit(lambda p, r, k: M.get_outputs(p, r, k, cfg2, False))(
        params, rb32, key)
    assert bool(jnp.isfinite(out["mid_reflect_fine"]).all())
    assert out["mid_reflect_fine"].shape == (32, 3)
    # overflow accounting: every masked ray beyond K=8 is reported
    n_masked = int(np.asarray(out["mask"]).sum())
    expect = max(0, n_masked - 8) / 32.0
    assert float(out["reflect_overflow"]) == pytest.approx(expect)
