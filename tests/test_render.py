"""Renderer + compositing oracle tests (SURVEY.md §4.2): get_weights vs a
hand alpha-compositing oracle, background blending, median depth, and
the conical-frustum Gaussian vs the mip-NeRF closed form in torch.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rsn.core.rays import (RayBundle, conical_frustum_to_gaussian,
                           get_ray_samples)
from rsn.core.render import (render_accumulation, render_depth_median,
                             render_rgb, render_scalar, normalize)


def make_samples(num_rays=2, num_samples=4, near=1.0, far=2.0):
    d = np.zeros((num_rays, 3), np.float32)
    d[:, 2] = 1.0
    rb = RayBundle(origins=jnp.zeros((num_rays, 3)), directions=jnp.asarray(d),
                   pixel_area=jnp.full((num_rays, 1), 1e-4),
                   nears=jnp.full((num_rays, 1), near),
                   fars=jnp.full((num_rays, 1), far))
    bins = jnp.broadcast_to(jnp.linspace(near, far, num_samples + 1),
                            (num_rays, num_samples + 1))
    sbins = (bins - near) / (far - near)
    return get_ray_samples(rb, bins, sbins)


def test_get_weights_matches_manual_compositing():
    rs = make_samples(2, 4)
    dens = np.array([[[0.0], [1.0], [2.0], [100.0]],
                     [[0.5], [0.5], [0.5], [0.5]]], np.float32)
    w = np.asarray(rs.get_weights(jnp.asarray(dens)))

    deltas = np.asarray(rs.ends - rs.starts)
    # manual: w_i = T_i (1 - exp(-sigma_i delta_i)), T_i = exp(-sum_{j<i})
    for r in range(2):
        T = 1.0
        for i in range(4):
            a = 1.0 - np.exp(-dens[r, i, 0] * deltas[r, i, 0])
            np.testing.assert_allclose(w[r, i, 0], T * a, rtol=1e-5)
            T *= np.exp(-dens[r, i, 0] * deltas[r, i, 0])


def test_weights_sum_to_one_for_opaque_ray():
    rs = make_samples(1, 8)
    w = rs.get_weights(jnp.full((1, 8, 1), 1e4))
    assert float(render_accumulation(w)[0, 0]) > 0.999


def test_rgb_background_blending():
    w = jnp.asarray([[[0.25], [0.25]]])  # acc = 0.5
    rgb = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out = render_rgb(rgb, w, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(out)[0],
                               [0.25 + 0.5, 0.25 + 0.5, 0.5], rtol=1e-6)


def test_rgb_random_background_uses_key():
    w = jnp.zeros((4, 3, 1))
    rgb = jnp.zeros((4, 3, 3))
    o1 = render_rgb(rgb, w, "random", key=jax.random.PRNGKey(0))
    o2 = render_rgb(rgb, w, "random", key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert np.asarray(o1).min() >= 0 and np.asarray(o1).max() <= 1


def test_eval_mode_clips_and_sanitizes():
    w = jnp.asarray([[[2.0]]])  # over-unity weight
    rgb = jnp.asarray([[[jnp.nan, 2.0, -1.0]]])
    out = render_rgb(rgb, w, None, training=False)
    assert bool(jnp.isfinite(out).all())
    assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0


def test_median_depth():
    rs = make_samples(1, 4, near=0.0, far=4.0)  # mids 0.5,1.5,2.5,3.5
    w = jnp.asarray([[[0.1], [0.2], [0.5], [0.2]]])
    d = render_depth_median(w, rs.starts, rs.ends)
    # cumulative: 0.1, 0.3, 0.8 -> first >= 0.5 is index 2 -> mid 2.5
    assert float(d[0, 0]) == 2.5


def test_median_depth_all_zero_weights_clamps():
    rs = make_samples(1, 4, near=0.0, far=4.0)
    w = jnp.zeros((1, 4, 1))
    d = render_depth_median(w, rs.starts, rs.ends)
    assert float(d[0, 0]) == 3.5  # clamps to last sample


def test_scalar_renderer():
    w = jnp.asarray([[[0.5], [0.25]]])
    v = jnp.asarray([[[2.0], [4.0]]])
    assert float(render_scalar(v, w)[0, 0]) == 2.0


def test_normalize_matches_torch():
    x = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    x[0] = 0.0  # degenerate
    got = np.asarray(normalize(jnp.asarray(x)))
    want = torch.nn.functional.normalize(torch.from_numpy(x), dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def torch_conical_gaussian(origins, directions, starts, ends, radius):
    """Torch oracle for the mip-NeRF cone->Gaussian closed form (same
    formula nerfstudio uses; SURVEY.md §2.2 Frustums row)."""
    mu = (starts + ends) / 2
    hw = (ends - starts) / 2
    denom = 3 * mu**2 + hw**2
    means = origins + directions * (mu + (2 * mu * hw**2) / denom)
    dir_var = hw**2 / 3 - (4 / 15) * (hw**4 * (12 * mu**2 - hw**2) / denom**2)
    rad_var = radius**2 * (mu**2 / 4 + (5 / 12) * hw**2 - (4 / 15) * hw**4 / denom)
    eye = torch.eye(3)
    dmag = torch.clamp((directions**2).sum(-1, keepdim=True), min=1e-10)
    douter = directions[..., :, None] * directions[..., None, :]
    nouter = eye - directions[..., :, None] * (directions / dmag)[..., None, :]
    cov = dir_var[..., None] * douter + rad_var[..., None] * nouter
    return means, cov


def test_conical_frustum_gaussian_matches_torch_oracle():
    rng = np.random.default_rng(4)
    o = rng.normal(0, 1, (8, 5, 3)).astype(np.float32)
    d = rng.normal(0, 1, (8, 5, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    s = rng.uniform(1, 2, (8, 5, 1)).astype(np.float32)
    e = s + rng.uniform(0.01, 0.5, (8, 5, 1)).astype(np.float32)
    r = rng.uniform(1e-3, 1e-2, (8, 5, 1)).astype(np.float32)

    mj, cj = conical_frustum_to_gaussian(*map(jnp.asarray, (o, d, s, e, r)))
    mt, ct = torch_conical_gaussian(*map(torch.from_numpy, (o, d, s, e, r)))
    np.testing.assert_allclose(np.asarray(mj), mt.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cj), ct.numpy(), rtol=1e-4,
                               atol=1e-7)


def test_safe_sqrt_zero_gradient_finite():
    """sqrt(0) backward is inf; safe_sqrt clamps it (exact forward)."""
    import jax
    from rsn.core.render import safe_sqrt

    x = jnp.asarray([0.0, 1e-12, 4.0])
    np.testing.assert_allclose(np.asarray(safe_sqrt(x)),
                               np.sqrt(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(safe_sqrt(v)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(float(g[2]), 0.25)  # exact where safe


def test_normalize_zero_vector_gradient_finite():
    import jax
    from rsn.core.render import normalize

    v = jnp.zeros((2, 3))
    np.testing.assert_allclose(np.asarray(normalize(v)), 0.0)
    g = jax.grad(lambda x: jnp.sum(normalize(x)))(v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_zero_pixel_area_blob_gradient_finite():
    """Regression: a reflected ray with sqradius == 0 (roughness
    collapse) NaN-poisoned training through sqrt(pixel_area)'s inf
    backward at train step ~560."""
    import jax
    from rsn.core.rays import RayBundle, get_gaussian_blob
    from rsn.core.spacing import identity_spacing, spaced_sample

    def f(pixel_area_scalar):
        rb = RayBundle(
            origins=jnp.zeros((2, 3)),
            directions=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
            pixel_area=jnp.full((2, 1), pixel_area_scalar),
            nears=jnp.zeros((2, 1)), fars=jnp.ones((2, 1)) * 4.0)
        rs = spaced_sample(rb, identity_spacing(), 4)
        blob = get_gaussian_blob(rs)
        return jnp.sum(blob.radius_variance) + jnp.sum(blob.mean)

    g = jax.grad(f)(0.0)
    assert np.isfinite(float(g)), g
