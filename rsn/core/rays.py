"""Ray containers as JAX pytrees + conical-frustum -> Gaussian conversion.

Rebuilds the semantics the reference consumes from nerfstudio's
``cameras/rays.py`` (`RayBundle`/`RaySamples`/`Frustums`,
``frustums.get_gaussian_blob()``; consumed at reference
reflect_sampling_nerf_field.py:93 and reflect_sampling_nerf_model.py:148-156)
as immutable pytree dataclasses.  All shapes are static; the batch axis is
the leading ray axis so everything vmaps/shards trivially.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

SQRT_PI = 1.7724538509055159  # matches nerfstudio Frustums.get_gaussian_blob


@struct.dataclass
class RayBundle:
    """A batch of rays. All fields have leading shape (num_rays,).

    Mirrors the fields the reference reads off nerfstudio's RayBundle:
    origins/directions/pixel_area (model.py:267-289), nears/fars (collider).
    """

    origins: jax.Array  # (R, 3)
    directions: jax.Array  # (R, 3) unit vectors
    pixel_area: jax.Array  # (R, 1)
    nears: jax.Array  # (R, 1)
    fars: jax.Array  # (R, 1)
    camera_indices: Optional[jax.Array] = None  # (R, 1) int32

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


@struct.dataclass
class RaySamples:
    """Per-ray conical frustum samples.

    starts/ends are euclidean bin edges along the ray; spacing_* are the
    same bins in the sampler's normalized spacing domain s in [0, 1]
    (needed by the PDF resampler, like nerfstudio's
    spacing_starts/spacing_ends/spacing_to_euclidean_fn).
    """

    origins: jax.Array  # (R, S, 3)
    directions: jax.Array  # (R, S, 3)
    starts: jax.Array  # (R, S, 1) euclidean bin start
    ends: jax.Array  # (R, S, 1) euclidean bin end
    pixel_area: jax.Array  # (R, S, 1)
    spacing_starts: jax.Array  # (R, S, 1) in [0,1]
    spacing_ends: jax.Array  # (R, S, 1)

    @property
    def num_samples(self) -> int:
        return self.starts.shape[-2]

    def get_weights(self, densities: jax.Array) -> jax.Array:
        """Alpha-compositing weights w_i = T_i * (1 - exp(-sigma_i * delta_i)).

        Matches nerfstudio RaySamples.get_weights (consumed at reference
        model.py:154,188,296,322): transmittance from the *exclusive* cumsum
        of delta*density.
        """
        deltas = self.ends - self.starts  # (R, S, 1)
        delta_density = deltas * densities
        alphas = 1.0 - jnp.exp(-delta_density)
        # exclusive cumulative optical depth
        tau = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
        tau = jnp.concatenate([jnp.zeros_like(tau[..., :1, :]), tau], axis=-2)
        transmittance = jnp.exp(-tau)
        weights = alphas * transmittance
        return jnp.nan_to_num(weights)


def get_ray_samples(ray_bundle: RayBundle, euclidean_bins: jax.Array,
                    spacing_bins: jax.Array) -> RaySamples:
    """Build RaySamples from (R, S+1) euclidean + spacing bin edges."""
    num_samples = euclidean_bins.shape[-1] - 1
    broadcast = lambda x: jnp.broadcast_to(
        x[..., None, :], x.shape[:-1] + (num_samples, x.shape[-1]))
    return RaySamples(
        origins=broadcast(ray_bundle.origins),
        directions=broadcast(ray_bundle.directions),
        starts=euclidean_bins[..., :-1, None],
        ends=euclidean_bins[..., 1:, None],
        pixel_area=broadcast(ray_bundle.pixel_area),
        spacing_starts=spacing_bins[..., :-1, None],
        spacing_ends=spacing_bins[..., 1:, None],
    )


class GaussianBlob(struct.PyTreeNode):
    """mip-NeRF cone Gaussian in FACTORED form:
        cov = dir_variance * d d^T + radius_variance * (I - d d^T/|d|^2).
    TPU-first: materializing (..., 3, 3) covariances forces a (4, 128)
    tile per 3x3 block on TPU (measured 56.9x HBM padding blow-up); the
    model only ever consumes the contracted covariance DIAGONAL, which
    is computable from this factorization with vector ops only.
    """
    mean: jax.Array  # (..., 3)
    directions: jax.Array  # (..., 3)
    dir_variance: jax.Array  # (..., 1)
    radius_variance: jax.Array  # (..., 1)

    def cov_diag(self) -> jax.Array:
        d = self.directions
        dmag2 = jnp.clip(jnp.sum(d**2, axis=-1, keepdims=True), min=1e-10)
        return (self.dir_variance * d * d
                + self.radius_variance * (1.0 - d * d / dmag2))

    def dense_cov(self) -> jax.Array:
        """(..., 3, 3) covariance — for tests/oracles only (slow on TPU)."""
        d = self.directions
        eye = jnp.eye(3, dtype=d.dtype)
        dmag2 = jnp.clip(jnp.sum(d**2, axis=-1, keepdims=True), min=1e-10)
        douter = d[..., :, None] * d[..., None, :]
        nouter = eye - d[..., :, None] * (d / dmag2)[..., None, :]
        return (self.dir_variance[..., None] * douter
                + self.radius_variance[..., None] * nouter)


def conical_frustum_to_factored(origins: jax.Array, directions: jax.Array,
                                starts: jax.Array, ends: jax.Array,
                                radius: jax.Array) -> GaussianBlob:
    """mip-NeRF cone-segment -> factored Gaussian (see GaussianBlob)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    denom = 3.0 * mu**2 + hw**2
    means = origins + directions * (mu + (2.0 * mu * hw**2) / denom)
    dir_variance = (hw**2) / 3.0 - (4.0 / 15.0) * (
        (hw**4 * (12.0 * mu**2 - hw**2)) / denom**2)
    radius_variance = radius**2 * ((mu**2) / 4.0 + (5.0 / 12.0) * hw**2
                                   - (4.0 / 15.0) * (hw**4) / denom)
    return GaussianBlob(mean=means, directions=directions,
                        dir_variance=dir_variance,
                        radius_variance=radius_variance)


def conical_frustum_to_gaussian(origins: jax.Array, directions: jax.Array,
                                starts: jax.Array, ends: jax.Array,
                                radius: jax.Array):
    """mip-NeRF cone-segment -> (mean, 3x3 cov) Gaussian approximation.

    Re-derivation of the closed form used by nerfstudio
    ``utils/math.py::conical_frustum_to_gaussian`` (mip-NeRF eq. 7), which the
    reference reaches through ``frustums.get_gaussian_blob()`` (field.py:93).
    Dense-covariance variant for tests/oracles; the compute path uses
    `conical_frustum_to_factored` (TPU layout, see GaussianBlob).

    Args:
      origins/directions: (..., 3); starts/ends/radius: (..., 1)
    Returns:
      mean (..., 3), cov (..., 3, 3)
    """
    blob = conical_frustum_to_factored(origins, directions, starts, ends,
                                       radius)
    return blob.mean, blob.dense_cov()


def get_gaussian_blob(ray_samples: RaySamples) -> GaussianBlob:
    """Frustums -> factored Gaussian blobs; cone radius from pixel_area.

    Matches nerfstudio Frustums.get_gaussian_blob:
    cone_radius = sqrt(pixel_area) / sqrt(pi).
    """
    from rsn.core.render import safe_sqrt
    # safe_sqrt: reflected-ray pixel_area can be exactly 0 (roughness
    # collapse / grazing n.d) and sqrt's backward is inf there
    cone_radius = safe_sqrt(ray_samples.pixel_area) / SQRT_PI
    return conical_frustum_to_factored(
        ray_samples.origins, ray_samples.directions,
        ray_samples.starts, ray_samples.ends, cone_radius)
