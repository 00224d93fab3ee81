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


def packed_contract_planes(ray_samples, n_cols: int = 16) -> jax.Array:
    """Fused blob+contract+pack for the Pallas kernel input, computed in
    (R, S) component PLANES -> (R*S, n_cols) f32 [mean(3)|cov_diag(3)|0].

    Identical math (and values, to fp64 noise) to
    ``contract_blob(get_gaussian_blob(rs))`` + concat/pad, but every
    intermediate is an (R, S) array whose minor axis is the sample
    count — full 128-lane VPU tiles — instead of (R, S, 3)/(R, S, 1)
    arrays whose minor dim of 3 or 1 wastes 125/128 lanes (measured
    ~2-3 ms/pass of XLA glue at render shapes).  The single layout
    change is the final stack into kernel rows.

    Relies on origins/directions/pixel_area being constant along the
    sample axis (true by construction for all four passes).
    """
    from rsn.core.rays import SQRT_PI
    from rsn.core.render import safe_sqrt

    o = ray_samples.origins[..., 0, :]        # (R, 3)
    dvec = ray_samples.directions[..., 0, :]  # (R, 3)
    st = ray_samples.starts[..., 0]           # (R, S)
    en = ray_samples.ends[..., 0]             # (R, S)
    pa = ray_samples.pixel_area[..., 0, :]    # (R, 1)
    R, S = st.shape

    # conical_frustum_to_factored, plane-wise
    radius = safe_sqrt(pa) / SQRT_PI          # (R, 1)
    mu = (st + en) / 2.0
    hw = (en - st) / 2.0
    denom = 3.0 * mu**2 + hw**2
    tmid = mu + (2.0 * mu * hw**2) / denom
    dv = hw**2 / 3.0 - (4.0 / 15.0) * (
        (hw**4 * (12.0 * mu**2 - hw**2)) / denom**2)
    rv = radius**2 * ((mu**2) / 4.0 + (5.0 / 12.0) * hw**2
                      - (4.0 / 15.0) * (hw**4) / denom)
    dx = [dvec[:, i:i + 1] for i in range(3)]  # 3x (R, 1)
    m = [o[:, i:i + 1] + dx[i] * tmid for i in range(3)]  # 3x (R, S)

    # contract_blob, plane-wise
    norm2 = m[0]**2 + m[1]**2 + m[2]**2
    mask = norm2 > 1.0
    sn2 = jnp.maximum(norm2, 1.0)
    norm = jnp.sqrt(sn2)
    scale = jnp.where(mask, (2.0 * norm - 1.0) / sn2, 1.0)
    mcon = [scale * mi for mi in m]
    a = scale
    b = jnp.where(mask, -(2.0 * norm - 2.0) / sn2, 0.0)
    u = [mi / norm for mi in m]
    dmag2 = jnp.clip(dx[0]**2 + dx[1]**2 + dx[2]**2, min=1e-10)
    tdu = u[0] * dx[0] + u[1] * dx[1] + u[2] * dx[2]
    cov_u = [dv * dx[i] * tdu + rv * (u[i] - dx[i] * tdu / dmag2)
             for i in range(3)]
    ucu = u[0] * cov_u[0] + u[1] * cov_u[1] + u[2] * cov_u[2]
    diag0 = [dv * dx[i]**2 + rv * (1.0 - dx[i]**2 / dmag2)
             for i in range(3)]
    dg = [jax.nn.relu(a**2 * diag0[i] + 2.0 * a * b * u[i] * cov_u[i]
                      + b**2 * ucu * u[i] * u[i]) for i in range(3)]
    zeros = jnp.zeros_like(mcon[0])
    cols = mcon + dg + [zeros] * (n_cols - 6)
    return jnp.stack(cols, axis=-1).reshape(R * S, n_cols).astype(
        jnp.float32)
