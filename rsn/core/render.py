"""Volumetric compositing renderers as pure functions.

Rebuilds the nerfstudio renderers the reference instantiates at
reflect_sampling_nerf_model.py:117-124:

- `render_rgb`       — RGBRenderer: weighted sum + background blending;
                       background may be a fixed color, per-ray colors, or
                       "random" (an actual per-ray random blend, kept for
                       ablation only — r4 correction: nerfstudio's
                       combine-time "random" default returns the composite
                       UNBLENDED; the reference's tint composite therefore
                       has NO background term, see configs.BugCompat.
                       tint_random_background).
- `render_accumulation` — AccumulationRenderer.
- `render_depth_median` / `render_depth_expected` — DepthRenderer
                       (reference uses the nerfstudio default "median",
                       SURVEY.md B#9).
- `render_normals`   — NormalsRenderer (plain weighted sum).
- `render_scalar`    — SemanticRenderer, reused for roughness
                       (model.py:122,226).
- `blend_background_for_loss_computation` — RGBRenderer's loss-side
                       background blending.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

WHITE = jnp.ones(3, dtype=jnp.float32)


def render_accumulation(weights: jax.Array) -> jax.Array:
    """(R, S, 1) -> (R, 1)."""
    return jnp.sum(weights, axis=-2)


def render_rgb(rgb: jax.Array, weights: jax.Array,
               background_color: Union[jax.Array, str, None] = None,
               key: Optional[jax.Array] = None,
               training: bool = True) -> jax.Array:
    """Composite per-sample rgb (R, S, 3) with weights (R, S, 1) -> (R, 3).

    background_color:
      None        — no background term (black).
      array (3,) or (R, 3) — fixed/per-ray background.
      "random"    — uniform random background per ray (needs `key`).
    Eval (training=False) additionally nan_to_nums inputs and clips to
    [0, 1], matching nerfstudio RGBRenderer.forward.
    """
    if not training:
        rgb = jnp.nan_to_num(rgb)
    comp = jnp.sum(weights * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-2)
    if isinstance(background_color, str):
        assert background_color == "random"
        assert key is not None, "random background needs a PRNG key"
        bg = jax.random.uniform(key, comp.shape, dtype=comp.dtype)
    elif background_color is None:
        bg = None
    else:
        bg = jnp.asarray(background_color, dtype=comp.dtype)
    if bg is not None:
        comp = comp + bg * (1.0 - acc)
    if not training:
        comp = jnp.clip(comp, 0.0, 1.0)
    return comp


def render_depth_median(weights: jax.Array, starts: jax.Array,
                        ends: jax.Array) -> jax.Array:
    """Median depth: first bin midpoint where cumulative weight >= 0.5.

    Matches nerfstudio DepthRenderer(method="median"): searchsorted
    side="left" on the cumulative weights at 0.5, clamped.
    (R, S, 1) -> (R, 1).
    """
    steps = (starts + ends) / 2.0  # (R, S, 1)
    cum = jnp.cumsum(weights[..., 0], axis=-1)  # (R, S)
    # steps[first j with cum_j >= 0.5]: {cum >= 0.5} is a suffix and
    # steps are ascending, so the gather is a masked min-reduction
    # (take_along_axis is pathologically slow on TPU)
    depth = jnp.min(jnp.where(cum >= 0.5, steps[..., 0], jnp.inf),
                    axis=-1, keepdims=True)
    # all-below-0.5 rays clamp to the last sample (torch.clamp semantics)
    return jnp.minimum(depth, steps[..., -1, :])


def render_depth_expected(weights: jax.Array, starts: jax.Array,
                          ends: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Expected depth sum(w*t)/sum(w), clipped to the sampled range."""
    steps = (starts + ends) / 2.0
    depth = jnp.sum(weights * steps, axis=-2) / (
        jnp.sum(weights, axis=-2) + eps)
    return jnp.clip(depth, steps[..., 0, :].min(-1, keepdims=True),
                    steps[..., -1, :].max(-1, keepdims=True))


def render_normals(normals: jax.Array, weights: jax.Array) -> jax.Array:
    """(R, S, 3), (R, S, 1) -> (R, 3) plain weighted sum (no renorm)."""
    return jnp.sum(weights * normals, axis=-2)


def render_scalar(values: jax.Array, weights: jax.Array) -> jax.Array:
    """SemanticRenderer: weighted sum over samples, any channel count."""
    return jnp.sum(weights * values, axis=-2)


# ---- plane-layout variants ----------------------------------------------
# The kernel-branch eval path slices per-sample quantities out of the
# fused kernel's (R, S, 128) output as (R, S) component PLANES whose
# minor axis is the sample count — full 128-lane VPU tiles — instead of
# (R, S, 3)/(R, S, 1) arrays whose minor dim of 3 or 1 wastes 125/128
# lanes (measured 3x on the fine-pass composite set at render shapes).
# Same math as the (..., 3)-layout functions above, reassociated over
# the lane axis (fp32 sums differ by ulps only).


def weights_planes(density: jax.Array, deltas: jax.Array) -> jax.Array:
    """Alpha-compositing weights, plane layout: (R, S), (R, S) -> (R, S).

    Mirrors rays.RaySamples.get_weights (exclusive-cumsum transmittance,
    nerfstudio semantics) on sample-minor planes."""
    delta_density = deltas * density
    alphas = 1.0 - jnp.exp(-delta_density)
    tau = jnp.cumsum(delta_density[..., :-1], axis=-1)
    tau = jnp.concatenate([jnp.zeros_like(tau[..., :1]), tau], axis=-1)
    return jnp.nan_to_num(alphas * jnp.exp(-tau))


def composite_planes(weights: jax.Array, *planes: jax.Array) -> list:
    """Weighted per-ray reductions: (R, S) w + N x (R, S) -> N x (R, 1)."""
    return [jnp.sum(weights * p, axis=-1, keepdims=True) for p in planes]


def render_rgb_planes(weights: jax.Array, rgb_planes, background_color=None,
                      key=None, training: bool = True) -> jax.Array:
    """render_rgb on 3 (R, S) channel planes -> (R, 3)."""
    if not training:
        rgb_planes = [jnp.nan_to_num(p) for p in rgb_planes]
    comp = jnp.concatenate(composite_planes(weights, *rgb_planes), axis=-1)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if isinstance(background_color, str):
        assert background_color == "random"
        assert key is not None, "random background needs a PRNG key"
        bg = jax.random.uniform(key, comp.shape, dtype=comp.dtype)
    elif background_color is None:
        bg = None
    else:
        bg = jnp.asarray(background_color, dtype=comp.dtype)
    if bg is not None:
        comp = comp + bg * (1.0 - acc)
    if not training:
        comp = jnp.clip(comp, 0.0, 1.0)
    return comp


def render_depth_median_planes(weights: jax.Array, starts: jax.Array,
                               ends: jax.Array) -> jax.Array:
    """render_depth_median on (R, S) planes -> (R, 1)."""
    steps = (starts + ends) / 2.0  # (R, S)
    cum = jnp.cumsum(weights, axis=-1)
    depth = jnp.min(jnp.where(cum >= 0.5, steps, jnp.inf),
                    axis=-1, keepdims=True)
    return jnp.minimum(depth, steps[..., -1:])


def blend_background_for_loss_computation(
        pred_image: jax.Array, pred_accumulation: jax.Array,
        gt_image: jax.Array, background_color: jax.Array = WHITE):
    """RGBRenderer.blend_background_for_loss_computation for a fixed
    (non-"random"/"last_sample") background color.

    If gt has an alpha channel, blends it against the background; the
    prediction is returned unchanged (it already saw the bg in compositing).
    """
    if gt_image.shape[-1] == 4:
        rgb, alpha = gt_image[..., :3], gt_image[..., 3:]
        gt_image = rgb * alpha + background_color * (1.0 - alpha)
    return pred_image, gt_image


@jax.custom_jvp
def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt with an EXACT forward and a clamped backward.

    d sqrt(x)/dx = 1/(2 sqrt(x)) is infinite at x = 0; when a live
    zero reaches a sqrt (e.g. the reflected-ray cone radius
    sqrt(pixel_area) with pixel_area = pi*2|n.d|*roughness^2 == 0 after
    the roughness head collapses — observed at train step ~560), the
    inf cotangent NaN-poisons every parameter through Adam.  The torch
    reference has the identical hazard (torch.sqrt(0).backward is inf —
    plausibly why it ships a NaN tripwire, model.py:412).  Clamping the
    backward at 1/(2*max(sqrt(x), 1e-6)) keeps values bit-identical and
    gradients finite.
    """
    return jnp.sqrt(x)


@safe_sqrt.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = jnp.sqrt(x)
    return y, t / (2.0 * jnp.maximum(y, 1e-6))


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch.nn.functional.normalize(dim=-1) semantics: x / max(||x||, eps).

    The norm goes through safe_sqrt: at v == 0 the forward matches
    torch (v/eps = 0) and the gradient stays finite (jnp.linalg.norm's
    backward is 0/0 there)."""
    n = safe_sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return v / jnp.maximum(n, eps)
