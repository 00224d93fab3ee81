"""Inverse-CDF (PDF) importance resampling.

Rebuilds nerfstudio ``PDFSampler`` semantics (consumed at reference
reflect_sampling_nerf_model.py:110-112 with ``include_original=False``):
histogram padding 0.01, zero-weight eps guard 1e-5, stratified u's during
training / midpoint u's at eval, searchsorted(side="right") into the CDF
over the *existing* spacing-domain bins, linear re-interpolation, and a
stop-gradient on the produced bins.

TPU note: the searchsorted is done as a dense broadcast-compare reduction
(S+1 x S+1 per ray) — this maps onto the VPU as one fused elementwise
reduce and avoids gather-heavy binary search; at S=128 it is far below
the MXU work of the field evals it feeds.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rsn.core.rays import RayBundle, RaySamples, get_ray_samples
from rsn.core.spacing import Spacing, spacing_to_euclidean

HISTOGRAM_PADDING = 0.01
EPS = 1e-5

# Default searchsorted+gather implementation: "reduce" (4 masked VPU
# reductions) or "onehot" (count + one-hot MXU einsum).  Bit-identical
# (tests/test_samplers.py).  r4 TPU timing (tools/exp_pdf_variants.py,
# v5e): reduce WINS at every shape — render-shape fine (R=16384,
# S=128) 1.87 ms vs one-hot 3.36 ms / packed-pair 5.88 ms; train shape
# 0.06 vs 0.21 ms.  XLA already fuses the four masked reductions into
# one pass over the compare matrix; the one-hot variant materializes
# the (R, U, S+1) one-hot for the MXU and loses on bandwidth.  Kept as
# an explicit per-call argument (NOT a mutable global read at trace
# time, ADVICE r4) so the negative result is reproducible, not retried.
PDF_GATHER_IMPL = "reduce"


def pdf_sample(ray_bundle: RayBundle, ray_samples: RaySamples,
               weights: jax.Array, spacing: Spacing, num_samples: int,
               key: Optional[jax.Array] = None,
               single_jitter: bool = False,
               impl: str = PDF_GATHER_IMPL) -> RaySamples:
    """Resample `num_samples` bins per ray from coarse `weights`.

    Args:
      weights: (R, S, 1) compositing weights of the existing samples.
      key: PRNG key for stratified jitter (None => eval midpoints).
      impl: gather formulation, "reduce" (default, fastest measured) or
        "onehot" — static per call; bit-identical results.
    """
    num_bins = num_samples + 1
    w = weights[..., 0] + HISTOGRAM_PADDING  # (R, S)
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(EPS - w_sum)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate([
        jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])
    ], axis=-1)  # (R, S+1)

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)  # (S'+1,)
    u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_bins,))
    if key is not None:
        if single_jitter:
            rand = jax.random.uniform(key, cdf.shape[:-1] + (1,)) / num_bins
        else:
            rand = jax.random.uniform(key, cdf.shape[:-1] + (num_bins,)) / num_bins
        u = u + rand
    else:
        u = u + 1.0 / (2 * num_bins)

    existing_bins = jnp.concatenate([
        ray_samples.spacing_starts[..., 0],
        ray_samples.spacing_ends[..., -1:, 0],
    ], axis=-1)  # (R, S+1)

    # searchsorted(cdf, u, side="right") + the four gathers, reformulated
    # TPU-first.  Two bit-identical implementations (adversarial
    # equivalence locked by tests/test_samplers.py::
    # test_pdf_onehot_formulation_bit_identical):
    # - "reduce": {j : cdf_j <= u} is a PREFIX of the sorted cdf, so the
    #   gathered values are prefix-maxima / suffix-minima of one compare
    #   matrix — four masked VPU reductions.  take_along_axis gathers
    #   are ~500x slower on TPU (measured), hence no direct gather.
    # - "onehot": ONE compare+sum pass gives the searchsorted index;
    #   the four gathered values then come from a single batched
    #   one-hot einsum that runs on the MXU instead of three more VPU
    #   reduction passes (values are exact copies at HIGHEST precision).
    if impl == "onehot":
        S1 = cdf.shape[-1]
        idx = jnp.sum((cdf[..., None, :] <= u[..., :, None])
                      .astype(jnp.float32), axis=-1) - 1.0  # (R,U) in [0,S]
        nxt = lambda a: jnp.concatenate([a[..., 1:], a[..., -1:]], axis=-1)
        pack = jnp.stack([cdf, existing_bins, nxt(cdf),
                          nxt(existing_bins)], axis=-1)  # (R, S+1, 4)
        onehot = (idx[..., None]
                  == jax.lax.broadcasted_iota(jnp.float32, (1, 1, S1), 2)
                  ).astype(jnp.float32)  # (R, U, S+1)
        vals = jnp.einsum("rus,rsk->ruk", onehot, pack,
                          precision=jax.lax.Precision.HIGHEST)
        cdf_g0, bins_g0 = vals[..., 0], vals[..., 1]
        # *_next pre-shifted with an end clamp, so idx+1 with the
        # torch.clamp(inds, max=n-1) semantics is a plain idx-gather
        cdf_g1, bins_g1 = vals[..., 2], vals[..., 3]
    else:
        compare = cdf[..., None, :] <= u[..., :, None]  # (R, U, S+1)
        big = jnp.float32(2.0)  # all cdf/bins values are in [0, 1]
        cdf_g0 = jnp.max(jnp.where(compare, cdf[..., None, :], -big),
                         axis=-1)
        bins_g0 = jnp.max(jnp.where(compare, existing_bins[..., None, :],
                                    -big), axis=-1)
        cdf_g1 = jnp.min(jnp.where(compare, big, cdf[..., None, :]),
                         axis=-1)
        bins_g1 = jnp.min(jnp.where(compare, big,
                                    existing_bins[..., None, :]), axis=-1)
        # empty suffix (u beyond cdf[-1]): clamp to the last edge
        cdf_g1 = jnp.minimum(cdf_g1, cdf[..., -1:])
        bins_g1 = jnp.minimum(bins_g1, existing_bins[..., -1:])

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.nan_to_num(jnp.where(denom > 0, (u - cdf_g0) /
                                          jnp.where(denom > 0, denom, 1.0),
                                          0.0)), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)
    bins = jax.lax.stop_gradient(bins)  # nerfstudio detaches the bins

    euclidean_bins = spacing_to_euclidean(spacing, ray_bundle, bins)
    return get_ray_samples(ray_bundle, euclidean_bins, bins)
