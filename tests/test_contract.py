"""Oracle tests for the mip-NeRF-360 contraction (SURVEY.md §4.1, A.1).

The torch oracle re-derives the reference's contraction math
(reflect_sampling_nerf_field.py:98-119) independently and checks our JAX
implementation against it, including the hand-written Jacobian vs
torch.autograd's ground truth.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rsn.core.contract import contract


def torch_contract_mean(x: torch.Tensor) -> torch.Tensor:
    """Oracle: c(x) = x if |x|<=1 else (2|x|-1)/|x|^2 * x."""
    n = torch.linalg.norm(x, dim=-1, keepdim=True)
    return torch.where(n > 1, (2 * n - 1) / n**2 * x, x)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_mean_contraction_matches_oracle(rng):
    x = rng.normal(0, 2.0, size=(256, 3)).astype(np.float32)
    cov = np.einsum("ni,nj->nij",
                    rng.normal(0, 0.1, (256, 3)),
                    rng.normal(0, 0.1, (256, 3))).astype(np.float32)
    cov = cov + cov.transpose(0, 2, 1) + 0.5 * np.eye(3, dtype=np.float32)
    mean_j, _ = contract(jnp.asarray(x), jnp.asarray(cov))
    mean_t = torch_contract_mean(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_contracted_norm_is_2_minus_inv_norm(rng):
    x = rng.normal(0, 3.0, size=(128, 3)).astype(np.float32)
    norms = np.linalg.norm(x, axis=-1)
    keep = norms > 1
    x = x[keep]
    norms = norms[keep]
    mean_j, _ = contract(jnp.asarray(x), jnp.zeros((x.shape[0], 3, 3)))
    got = np.linalg.norm(np.asarray(mean_j), axis=-1)
    np.testing.assert_allclose(got, 2.0 - 1.0 / norms, rtol=1e-5)


def test_cov_transform_matches_autograd_jacobian(rng):
    """cov' = J cov J^T with J from torch.autograd on the oracle mean map."""
    x = rng.normal(0, 2.0, size=(32, 3)).astype(np.float32)
    a = rng.normal(0, 0.2, (32, 3, 3)).astype(np.float32)
    cov = np.einsum("nij,nkj->nik", a, a)  # PSD

    _, cov_j = contract(jnp.asarray(x), jnp.asarray(cov))

    for i in range(x.shape[0]):
        xi = torch.tensor(x[i], requires_grad=True)
        J = torch.autograd.functional.jacobian(torch_contract_mean, xi)
        expected = J.numpy() @ cov[i] @ J.numpy().T
        d = np.maximum(np.diagonal(expected), 0.0)
        expected = expected - np.diag(np.diagonal(expected)) + np.diag(d)
        np.testing.assert_allclose(np.asarray(cov_j[i]), expected,
                                   rtol=1e-4, atol=1e-5)


def test_inside_ball_is_identity(rng):
    x = (rng.uniform(-0.5, 0.5, (64, 3))).astype(np.float32)
    cov = np.tile(np.eye(3, dtype=np.float32) * 0.01, (64, 1, 1))
    mean_j, cov_j = contract(jnp.asarray(x), jnp.asarray(cov))
    np.testing.assert_allclose(np.asarray(mean_j), x, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cov_j), cov, atol=1e-7)


def test_factored_matches_dense(rng):
    """contract_blob (the TPU compute path, no 3x3 arrays) must equal
    diag(contract(mean, dense_cov)) exactly."""
    from rsn.core.contract import contract_blob
    from rsn.core.rays import conical_frustum_to_factored

    o = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    s = rng.uniform(0.5, 4.0, (64, 1)).astype(np.float32)
    e = s + rng.uniform(0.01, 1.0, (64, 1)).astype(np.float32)
    r = rng.uniform(1e-3, 1e-1, (64, 1)).astype(np.float32)
    blob = conical_frustum_to_factored(*map(jnp.asarray, (o, d, s, e, r)))

    mean_f, diag_f = contract_blob(blob)
    mean_d, cov_d = contract(blob.mean, blob.dense_cov())
    diag_d = jax.nn.relu(jnp.diagonal(cov_d, axis1=-2, axis2=-1))
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_d),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(diag_f), np.asarray(diag_d),
                               rtol=2e-4, atol=1e-7)


def test_zero_mean_no_nan():
    x = jnp.zeros((4, 3))
    cov = jnp.tile(jnp.eye(3)[None] * 0.1, (4, 1, 1))
    mean_j, cov_j = contract(x, cov)
    assert bool(jnp.isfinite(mean_j).all())
    assert bool(jnp.isfinite(cov_j).all())
    # gradient safety through the unselected branch
    g = jax.grad(lambda m: jnp.sum(contract(m, cov)[0]))(x)
    assert bool(jnp.isfinite(g).all())


def test_packed_contract_planes_matches_blob_path(rng):
    """The plane-layout kernel-input prep (packed_contract_planes) must
    match contract_blob(get_gaussian_blob(rs)) + concat/pad in values
    AND in gradients (the reflected passes differentiate through it via
    the live pixel_area/cone-radius chain)."""
    from rsn.core.contract import contract_blob, packed_contract_planes
    from rsn.core.rays import RayBundle, get_gaussian_blob
    from rsn.core.spacing import identity_spacing, spaced_sample

    R, S = 16, 8
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.fold_in(key, 1), (R, 3)) * 2.0
    pa = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                   (R, 1))) * 1e-4

    def samples(pa):
        bundle = RayBundle(origins=o, directions=d, pixel_area=pa,
                           nears=jnp.full((R, 1), 0.5),
                           fars=jnp.full((R, 1), 6.0))
        return spaced_sample(bundle, identity_spacing(), S, key=None)

    def ref(pa):
        rs = samples(pa)
        mean, cov = contract_blob(get_gaussian_blob(rs))
        mc = jnp.concatenate([mean, cov], axis=-1).reshape(R * S, 6)
        return jnp.pad(mc, ((0, 0), (0, 10))).astype(jnp.float32)

    def planes(pa):
        return packed_contract_planes(samples(pa), 16)

    np.testing.assert_allclose(np.asarray(planes(pa)), np.asarray(ref(pa)),
                               rtol=1e-6, atol=1e-7)
    # gradient parity through the pixel_area chain (cotangent on all
    # 16 cols; the zero-pad cols contribute nothing)
    ct = jax.random.normal(jax.random.fold_in(key, 4), (R * S, 16))
    g_ref = jax.grad(lambda pa: jnp.sum(ref(pa) * ct))(pa)
    g_pl = jax.grad(lambda pa: jnp.sum(planes(pa) * ct))(pa)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
