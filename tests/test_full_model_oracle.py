"""Whole-model end-to-end parity: rsn vs the standalone torch oracle.

Locks the ENTIRE graph (samplers -> field -> 4-pass get_outputs ->
get_loss_dict, reference reflect_sampling_nerf_model.py:142-430) in one
test, not just components: fp32 forward parity on every output key AND
parameter-gradient parity through the shared weight layout.

Determinism contract: sampling uses eval-mode (midpoint) u's in BOTH
frameworks — rsn's stratified/PDF jitter is disabled by monkeypatching
the sampler entry points to drop their keys — while the reference's
TRAINING semantics (requires_grad means, analytic normals, detach
pattern) stay on, so the compared gradients are the training gradients.
The tint background (nerfstudio "random" default) is pinned off in both
(bug_compat.tint_random_background=False / bg=None).
"""
import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rsn.configs import ModelConfig, loss_coefficients_at_step
from rsn.core.rays import RayBundle
from rsn.models import field as F
from rsn.models import model as M
from tests import torch_oracle as TO

CFG = ModelConfig(
    num_coarse_samples=16, num_importance_samples=16,
    num_reflect_coarse_samples=8, num_reflect_importance_samples=8,
    reflect_ray_fraction=1.0,  # oracle gathers ALL masked rays
    bug_compat=dataclasses.replace(ModelConfig().bug_compat,
                                   tint_random_background=False))
R = 16


def _bundle_np():
    rng = np.random.default_rng(3)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # half the rays look at the scene from z=+4 (masked candidates),
    # half point away (background fill path)
    d[: R // 2, 2] = -np.abs(d[: R // 2, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([0.0, 0.0, 4.0], np.float32), (R, 3))
    pa = np.full((R, 1), 1e-6, np.float32)
    return o.copy(), d, pa


def _rsn_outputs_fn():
    """get_outputs with sampler jitter forced off (keys dropped)."""
    orig_spaced = M.spaced_sample
    orig_pdf = M.pdf_sample

    def spaced_nokey(bundle, spacing, n, key=None, **kw):
        return orig_spaced(bundle, spacing, n, key=None, **kw)

    def pdf_nokey(bundle, samples, w, spacing, n, key=None, **kw):
        return orig_pdf(bundle, samples, w, spacing, n, key=None, **kw)

    return orig_spaced, orig_pdf, spaced_nokey, pdf_nokey


@pytest.fixture(scope="module")
def both():
    """Both frameworks in FLOAT64: fp32 libm/reassociation noise gets
    normalize()-amplified into the 1e-2 range on the analytic-normals
    path, drowning real defects; at f64 every tolerance below is tight
    enough that any semantic divergence (wrong constant, misplaced
    detach, off-by-one bin) fails by orders of magnitude."""
    params32 = F.init_field_params(jax.random.PRNGKey(4))
    o, d, pa = _bundle_np()
    jax.config.update("jax_enable_x64", True)
    orig_spaced, orig_pdf, spaced_nokey, pdf_nokey = _rsn_outputs_fn()
    M.spaced_sample, M.pdf_sample = spaced_nokey, pdf_nokey
    try:
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float64), params32)
        rb = RayBundle(
            origins=jnp.asarray(o, jnp.float64),
            directions=jnp.asarray(d, jnp.float64),
            pixel_area=jnp.asarray(pa, jnp.float64),
            nears=jnp.zeros((R, 1), jnp.float64),
            fars=jnp.ones((R, 1), jnp.float64))
        rb = M.apply_collider(rb, CFG)
        gt_np = np.random.default_rng(5).uniform(0, 1, (R, 3))
        gt = jnp.asarray(gt_np, jnp.float64)

        def loss_total(p):
            out = M.get_outputs(p, rb, jax.random.PRNGKey(0), CFG,
                                training=True)
            ld = M.get_loss_dict(out, gt, loss_coefficients_at_step(100))
            return sum(jax.tree.leaves(ld)), (out, ld)

        (total_j, (out_j, ld_j)), grads_j = jax.value_and_grad(
            loss_total, has_aux=True)(params)
        out_j = jax.device_get(out_j)
        ld_j = jax.device_get(ld_j)
        grads_j = jax.device_get(grads_j)
        total_j = float(total_j)
    finally:
        M.spaced_sample, M.pdf_sample = orig_spaced, orig_pdf
        jax.config.update("jax_enable_x64", False)

    # torch side (double)
    torch.set_default_dtype(torch.float64)
    try:
        tp = TO.params_to_torch(params32, requires_grad=True,
                                dtype=torch.float64)
        field = TO.TorchField(tp, sh_l8_m7_2x=CFG.bug_compat.sh_l8_m7_2x)
        tb = {
            "origins": torch.tensor(o, dtype=torch.float64),
            "directions": torch.tensor(d, dtype=torch.float64),
            "pixel_area": torch.tensor(pa, dtype=torch.float64),
            "nears": torch.full((R, 1), CFG.collider_near_plane,
                                dtype=torch.float64),
            "fars": torch.full((R, 1), CFG.collider_far_plane,
                               dtype=torch.float64),
        }
        out_t = TO.torch_get_outputs(field, tb, CFG, training=True)
        ld_t = TO.torch_get_loss_dict(out_t, torch.tensor(gt_np),
                                      loss_coefficients_at_step(100))
        total_t = sum(ld_t.values())
        total_t.backward()
    finally:
        torch.set_default_dtype(torch.float32)
    return out_j, ld_j, grads_j, out_t, ld_t, tp, total_j


def test_mask_matches(both):
    out_j, _, _, out_t, _, _, _ = both
    np.testing.assert_array_equal(np.asarray(out_j["mask"]),
                                  out_t["mask"].numpy())
    assert out_t["mask"].any(), "fixture must exercise reflected passes"
    assert not out_t["mask"].all(), "fixture must exercise bg fill"


# f64 end-to-end: residual noise is linspace/libm last-ulp (~1e-13)
# amplified at worst by normalize() of small gradients (analytic
# normals, ~1e-8 observed).  A semantic bug (wrong constant, misplaced
# detach, off-by-one bin) produces O(1) errors — 6+ orders above every
# bound here.
FORWARD_KEYS = [
    ("mid_rgb_coarse", 1e-10), ("mid_rgb_fine", 1e-10),
    ("mid_reflect_coarse", 1e-9), ("mid_reflect_fine", 1e-9),
    ("accumulation_coarse", 1e-10), ("accumulation_fine", 1e-10),
    ("depth_coarse", 1e-9), ("depth_fine", 1e-9),
    ("weights_coarse", 1e-10), ("weights_fine", 1e-10),
    ("pred_normals_coarse", 1e-8), ("pred_normals_fine", 1e-8),
    ("normals_coarse", 1e-6), ("normals_fine", 1e-6),
    ("n_dot_d_coarse", 1e-8), ("n_dot_d_fine", 1e-8),
    ("diff", 1e-10), ("tint", 1e-10), ("roughness", 1e-10),
]


@pytest.mark.parametrize("key,atol", FORWARD_KEYS)
def test_forward_output_parity(both, key, atol):
    out_j, _, _, out_t, _, _, _ = both
    a = np.asarray(out_j[key], np.float64)
    b = out_t[key].detach().numpy().reshape(a.shape)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-7, err_msg=key)


def test_depth_reflect_fine_parity(both):
    out_j, _, _, out_t, _, _, _ = both
    mask = np.asarray(out_j["mask"])
    # valid ONLY where mask (SURVEY B#10): at fraction 1.0 rsn runs the
    # reflected pass for every ray and unmasked rows carry garbage,
    # while the reference/oracle only defines masked rows
    a = np.asarray(out_j["depth_reflect_fine"], np.float64)[mask]
    b = out_t["depth_reflect_fine"].detach().numpy().reshape(-1, 1)[mask]
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)


def test_loss_dict_parity(both):
    _, ld_j, _, _, ld_t, _, _ = both
    assert set(ld_j) == set(ld_t)
    for k in ld_j:
        a, b = float(ld_j[k]), float(ld_t[k].detach())
        assert a == pytest.approx(b, rel=1e-9, abs=1e-12), (k, a, b)


def test_parameter_gradient_parity(both):
    """Training gradients of the total loss must match the torch
    reference through the whole 4-pass graph (detach pattern included:
    a misplaced stop_gradient shows up here immediately)."""
    _, _, grads_j, _, _, tp, _ = both

    def check(gj, t, name):
        gt_ = t.grad
        assert gt_ is not None, name
        a, b = np.asarray(gj), gt_.numpy()
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-7,
                                   err_msg=name)

    for i in range(8):
        check(grads_j["trunk"][i]["w"], tp["trunk"][i]["w"], f"trunk{i}.w")
        check(grads_j["trunk"][i]["b"], tp["trunk"][i]["b"], f"trunk{i}.b")
    for head in ("density", "bottleneck", "mid_mlp", "mid", "normals",
                 "roughness", "diff", "tint"):
        check(grads_j[head]["w"], tp[head]["w"], head + ".w")
        check(grads_j[head]["b"], tp[head]["b"], head + ".b")


def test_dead_low_head_gets_zero_gradient(both):
    """The `low` head exists only for checkpoint-shape parity
    (SURVEY.md B#8) — it must receive exactly zero gradient."""
    _, _, grads_j, _, _, _, _ = both
    assert float(jnp.abs(grads_j["low"]["w"]).max()) == 0.0
