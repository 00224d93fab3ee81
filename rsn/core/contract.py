"""mip-NeRF-360 scene contraction of Gaussians (mean + full covariance).

Rebuilds the reference field's hand-derived contraction
(reflect_sampling_nerf_field.py:98-119) as a pure function:

  c(x)   = x                          if |x| <= 1
           (2|x| - 1)/|x|^2 * x       otherwise
  J(x)   = I                          if |x| <= 1
           ((2|x|-2)(I - x x^T/|x|^2) + I)/|x|^2   otherwise (symmetric)
  cov'   = J cov J     (J = J^T), diagonal ReLU-clamped.

Verified exact against the reference's torch expression (SURVEY.md A.1:
max abs err 3e-8 vs autograd jacobian).  Division guards keep both
`where` branches finite so JAX gradients stay NaN-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def contract(mean: jax.Array, cov: jax.Array):
    """Contract Gaussian (mean (..., 3), cov (..., 3, 3)) into radius-2 ball."""
    norm2 = jnp.sum(mean**2, axis=-1, keepdims=True)  # (..., 1)
    mask = norm2 > 1.0
    # the outside-ball branch is only *selected* when norm > 1, so its
    # denominators can be clamped to >= 1 without changing any selected
    # value — this keeps jnp.where's unselected-branch gradients finite
    # (otherwise 1/norm2^2 overflows near the origin and 0*inf => NaN)
    safe_norm2 = jnp.maximum(norm2, 1.0)
    norm = jnp.sqrt(safe_norm2)
    mean_contract = jnp.where(mask, (2.0 * norm - 1.0) / safe_norm2 * mean,
                              mean)

    norm_e = norm[..., None]  # (..., 1, 1)
    norm2_e = safe_norm2[..., None]
    outer = mean[..., :, None] * mean[..., None, :] / norm2_e
    eyes = jnp.broadcast_to(jnp.eye(3, dtype=mean.dtype), outer.shape)
    jacobian = jnp.where(mask[..., None],
                         ((2.0 * norm_e - 2.0) * (eyes - outer) + eyes)
                         / norm2_e,
                         eyes)
    # J @ cov @ J  (J symmetric; reference field.py:113)
    cov_contract = jacobian @ cov @ jacobian
    # ReLU-clamp the diagonal (reference field.py:114-115)
    diag = jnp.diagonal(cov_contract, axis1=-2, axis2=-1)  # (..., 3)
    eye = jnp.eye(3, dtype=mean.dtype)
    cov_contract = cov_contract + eye * (jax.nn.relu(diag) - diag)[..., None, :]
    return mean_contract, cov_contract


def contract_blob(blob):
    """Contraction of a FACTORED Gaussian -> (mean', diag(cov')).

    The TPU compute path: only the contracted covariance diagonal is
    ever consumed (the IPE reads diag(cov), reference field.py:129 +
    nerfstudio NeRFEncoding), and J = a*I + b*uu^T is rank-1-structured,
    so   diag(J cov J) = a^2 diag(cov) + 2ab u*(cov u) + b^2 (u.cov u) u*u
    with cov u computed from the factorization — all (..., 3) vector
    ops, no (..., 3, 3) arrays (which TPU tile-pads 56.9x; measured).

    Identical values to diag(contract(mean, dense_cov)) — asserted by
    tests/test_contract.py::test_factored_matches_dense.
    """
    mean = blob.mean
    norm2 = jnp.sum(mean**2, axis=-1, keepdims=True)
    mask = norm2 > 1.0
    safe_norm2 = jnp.maximum(norm2, 1.0)
    norm = jnp.sqrt(safe_norm2)
    mean_contract = jnp.where(mask, (2.0 * norm - 1.0) / safe_norm2 * mean,
                              mean)

    # J = a I + b u u^T (u = mean/|mean|), derived from the reference's
    # ((2n-2)(I - m m^T/n2) + I)/n2 form (field.py:111)
    a = jnp.where(mask, (2.0 * norm - 1.0) / safe_norm2, 1.0)
    b = jnp.where(mask, -(2.0 * norm - 2.0) / safe_norm2, 0.0)
    u = mean / norm

    d = blob.directions
    dv = blob.dir_variance
    rv = blob.radius_variance
    dmag2 = jnp.clip(jnp.sum(d**2, axis=-1, keepdims=True), min=1e-10)
    t = jnp.sum(d * u, axis=-1, keepdims=True)  # d . u
    cov_u = dv * d * t + rv * (u - d * t / dmag2)  # cov @ u
    u_cov_u = jnp.sum(u * cov_u, axis=-1, keepdims=True)
    diag0 = dv * d * d + rv * (1.0 - d * d / dmag2)
    diag = (a**2 * diag0 + 2.0 * a * b * u * cov_u
            + b**2 * u_cov_u * u * u)
    return mean_contract, jax.nn.relu(diag)
