"""Field tests: shapes, param count (SURVEY.md §6: ~0.62 M), torch-Linear
init statistics, head semantics, reflection oracle, analytic normals vs
finite differences, and the detach contract of get_analytic_normals.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rsn.models import field as F


def params():
    return F.init_field_params(jax.random.PRNGKey(0))


def test_param_count_matches_reference_scale():
    p = params()
    n = F.num_params(p)
    # trunk 8x256 skip@4 + 9 heads ~= 0.62 M (SURVEY.md §6)
    assert 600_000 < n < 640_000


def test_init_matches_torch_linear_bounds():
    p = params()
    w = np.asarray(p["trunk"][1]["w"])  # 256 -> 256
    bound = 1.0 / np.sqrt(256)
    assert abs(w).max() <= bound
    # uniform distribution: std ~= bound/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.1 * bound


def test_density_softplus_bias():
    """density = softplus(preact + 0.5) (reference field.py:136)."""
    p = params()
    mean = jnp.zeros((4, 3))
    cov = jnp.tile(jnp.eye(3)[None] * 0.01, (4, 1, 1))
    density, emb, preact = F.get_density(p, mean, cov)
    want = np.log1p(np.exp(np.asarray(preact) + 0.5))
    np.testing.assert_allclose(np.asarray(density), want, rtol=1e-5)
    assert emb.shape == (4, 256)
    assert float(density.min()) >= 0


def test_pred_normals_are_unit():
    p = params()
    emb = jax.random.normal(jax.random.PRNGKey(1), (32, 256))
    n = F.get_pred_normals(p, emb)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0,
                               rtol=1e-5)


def test_reflection_matches_torch_oracle():
    rng = np.random.default_rng(5)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    refl, ndd = F.get_reflection(jnp.asarray(d), jnp.asarray(n))

    dt, nt = torch.from_numpy(d), torch.from_numpy(n)
    ndd_t = (dt * nt).sum(-1, keepdim=True)
    refl_t = torch.nn.functional.normalize(dt - 2 * ndd_t * nt, dim=-1)
    np.testing.assert_allclose(np.asarray(refl), refl_t.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ndd), ndd_t.numpy(), rtol=1e-5)
    # mirror law: reflection of reflection about n restores d
    r2, _ = F.get_reflection(refl, jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(r2), d, atol=1e-5)


def test_analytic_normals_match_finite_differences():
    p = params()
    rng = np.random.default_rng(6)
    mean = rng.normal(0, 0.5, (8, 3)).astype(np.float32)
    # large cov suppresses the IPE's high-frequency bands so central
    # differences at eps=1e-3 are well-conditioned in fp32
    cov = np.tile(np.eye(3, dtype=np.float32) * 1e-2, (8, 1, 1))
    normals = np.asarray(F.get_analytic_normals(p, jnp.asarray(mean),
                                                jnp.asarray(cov)))
    eps = 1e-3
    grads = np.zeros((8, 3), np.float64)
    for a in range(3):
        dm = mean.copy()
        dm[:, a] += eps
        _, _, hi = F.get_density(p, jnp.asarray(dm), jnp.asarray(cov))
        dm2 = mean.copy()
        dm2[:, a] -= eps
        _, _, lo = F.get_density(p, jnp.asarray(dm2), jnp.asarray(cov))
        grads[:, a] = (np.asarray(hi)[:, 0] - np.asarray(lo)[:, 0]) / (2 * eps)
    want = -grads / np.maximum(
        np.linalg.norm(grads, axis=-1, keepdims=True), 1e-12)
    # fp32 finite differences are noisy against the oscillatory IPE
    # (the autodiff gradient itself matches f64 central differences to
    # 1.5e-9 rel); assert direction agreement
    cos = np.sum(normals * want, axis=-1)
    assert (cos > 0.95).all(), cos


def test_analytic_normals_carry_no_gradient():
    p = params()
    mean = jnp.zeros((2, 3))
    cov = jnp.tile(jnp.eye(3)[None] * 1e-4, (2, 1, 1))

    def loss(pp):
        n = F.get_analytic_normals(pp, mean, cov)
        return jnp.sum(n**2)

    g = jax.grad(loss)(p)
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))


def test_inf_color_shape_and_range():
    p = params()
    d = jnp.asarray(np.array([[0, 0, 1.0], [1.0, 0, 0]], np.float32))
    sr = jnp.asarray(np.array([[0.01], [0.1]], np.float32))
    c = F.get_inf_color(p, d, sr)
    assert c.shape == (2, 3)
    assert float(c.min()) >= 0 and float(c.max()) <= 1


def test_bf16_trunk_close_to_fp32():
    p = params()
    mean = jnp.asarray(np.random.default_rng(7).normal(0, 0.5, (64, 3)),
                       dtype=jnp.float32)
    cov = jnp.tile(jnp.eye(3)[None] * 1e-4, (64, 1, 1))
    d32, _, _ = F.get_density(p, mean, cov, F.FieldConfig(jnp.float32))
    d16, _, _ = F.get_density(p, mean, cov, F.FieldConfig(jnp.bfloat16))
    assert d16.dtype == jnp.float32  # fp32 accumulation preserved
    np.testing.assert_allclose(np.asarray(d32), np.asarray(d16), rtol=0.1,
                               atol=0.05)


def test_inf_color_finite_when_direction_norm_rounds_above_one():
    """normalize() can round a unit direction to |d| = 1 + ~1e-7; the
    env-lookup cov 0.6*s*(1 - d^2) then goes negative on the dominant
    axis and the IPE damping exp(-4^j var/2) explodes to inf at the top
    octaves (observed NaN collapse at step 15036 of a 30k proposal
    run).  get_inf_color must relu-clamp the constructed diagonal (the
    reference does not, field.py:195-196 — latent upstream hazard)."""
    params = F.init_field_params(jax.random.PRNGKey(0))
    d = jnp.asarray([[2.0519206e-04, 1.0000001, -7.6681587e-05],
                     [0.0, -1.0000001, 0.0],
                     [0.57735032, 0.57735032, 0.57735032]])
    s = jnp.asarray([[0.8792128], [1.5], [0.0]])
    out = F.get_inf_color(params, d, s)
    assert bool(jnp.isfinite(out).all()), out
