"""Spacing functions and spaced (uniform/reciprocal) stratified samplers.

Rebuilds nerfstudio's ``SpacedSampler``/``UniformSampler`` semantics
(consumed at reference reflect_sampling_nerf_model.py:109-112) and the
reference's own ``ReciprocalSampler`` spacing
(reflect_sampling_nerf_components.py:14-36:
  s(t) = t / (1/tan + t),   t(s) = s / (tan * (1 - s)) )
as pure functions.  Stratified jitter is driven by an explicit PRNG key
(functional replacement for torch's global RNG).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from rsn.core.rays import RayBundle, RaySamples, get_ray_samples


class Spacing(NamedTuple):
    """A monotone spacing transform t <-> s."""
    fn: Callable[[jax.Array], jax.Array]  # t -> s
    fn_inv: Callable[[jax.Array], jax.Array]  # s -> t


def identity_spacing() -> Spacing:
    """UniformSampler: linear in euclidean distance."""
    return Spacing(fn=lambda x: x, fn_inv=lambda x: x)


def reciprocal_spacing(tan: float = 1.0) -> Spacing:
    """Reference ReciprocalSampler spacing (components.py:32-33).

    Disparity-like: concentrates samples near the ray origin; over
    [0, 256] with tan=0.25 half the samples land within t < 4.
    """
    return Spacing(
        fn=lambda x: x / (1.0 / tan + x),
        fn_inv=lambda x: x / tan / (1.0 - x),
    )


def stratify_bins(bins: jax.Array, num_rays: int, key: jax.Array,
                  single_jitter: bool = False) -> jax.Array:
    """Nerfstudio SpacedSampler stratification: jitter each bin edge
    uniformly between its neighboring bin centers."""
    nb = bins.shape[-1]
    if single_jitter:
        t_rand = jax.random.uniform(key, (num_rays, 1))
    else:
        t_rand = jax.random.uniform(key, (num_rays, nb))
    bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
    bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
    bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
    return bin_lower + (bin_upper - bin_lower) * t_rand


def spaced_sample(ray_bundle: RayBundle, spacing: Spacing, num_samples: int,
                  key: Optional[jax.Array] = None,
                  single_jitter: bool = False) -> RaySamples:
    """Sample `num_samples` frusta per ray, uniform in the spacing domain.

    Equivalent to nerfstudio SpacedSampler.generate_ray_samples: bins are
    linspace(0,1,S+1) (optionally stratified when `key` is given, i.e.
    training), then mapped through
      s -> t = spacing.fn_inv(s * s_far + (1-s) * s_near).
    """
    num_rays = ray_bundle.origins.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)  # (S+1,)
    bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))
    if key is not None:
        bins = stratify_bins(bins, num_rays, key, single_jitter)
    s_near = spacing.fn(ray_bundle.nears)  # (R, 1)
    s_far = spacing.fn(ray_bundle.fars)
    euclidean_bins = spacing.fn_inv(bins * s_far + (1.0 - bins) * s_near)
    return get_ray_samples(ray_bundle, euclidean_bins, bins)


def spacing_to_euclidean(spacing: Spacing, ray_bundle: RayBundle,
                         s: jax.Array) -> jax.Array:
    """Map normalized spacing coordinates back to euclidean distance."""
    s_near = spacing.fn(ray_bundle.nears)
    s_far = spacing.fn(ray_bundle.fars)
    return spacing.fn_inv(s * s_far + (1.0 - s) * s_near)
