"""PDF-resampler fusion A/B (r3): the parity train-step budget charges
pdf_fine ~0.77 ms (4 masked VPU reductions over the (R, U, S+1) compare
matrix, rsn/core/sampling.py) vs ~0.28 ms in proposal mode — worth
checking whether (a) the gap is real or tunnel-timing noise and (b) a
packed 2-reduction variant (one reduce over a trailing [cdf|bins] pair
axis) beats the 4-reduction form.

Variants (bit-exact by construction; asserted before timing):
  v0  current pdf_sample (4 separate where+reduce)
  v1  packed: lo/hi pairs reduced in 2 ops over (R, U, S+1, 2)

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_pdf_variants.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rsn.configs import ModelConfig
from rsn.core.rays import RayBundle
from rsn.core.sampling import pdf_sample
from rsn.core.spacing import identity_spacing, spaced_sample
from rsn.models import model as model_lib
from rsn.utils.timing import time_kernel

def _r_from_argv(default=1024):
    import sys
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return default


R = _r_from_argv()  # pass 16384 for the render shape


def pdf_sample_packed(ray_bundle, ray_samples, weights, spacing,
                      num_samples, key=None):
    """pdf_sample with the 4 masked reductions packed into 2."""
    from rsn.core.sampling import EPS, HISTOGRAM_PADDING
    from rsn.core.spacing import spacing_to_euclidean
    from rsn.core.rays import get_ray_samples

    num_bins = num_samples + 1
    w = weights[..., 0] + HISTOGRAM_PADDING
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(EPS - w_sum)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding
    pdf = w / w_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf,
                           jnp.ones_like(cdf[..., :1])], axis=-1)
    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)
    u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_bins,))
    if key is not None:
        u = u + jax.random.uniform(
            key, cdf.shape[:-1] + (num_bins,)) / num_bins
    else:
        u = u + 1.0 / (2 * num_bins)
    existing_bins = jnp.concatenate([
        ray_samples.spacing_starts[..., 0],
        ray_samples.spacing_ends[..., -1:, 0]], axis=-1)

    compare = (cdf[..., None, :] <= u[..., :, None])[..., None]  # (R,U,S+1,1)
    big = jnp.float32(2.0)
    z = jnp.stack([cdf, existing_bins], axis=-1)[..., None, :, :]
    lo = jnp.max(jnp.where(compare, z, -big), axis=-2)  # (R, U, 2)
    hi = jnp.min(jnp.where(compare, big, z), axis=-2)
    cdf_g0, bins_g0 = lo[..., 0], lo[..., 1]
    cdf_g1 = jnp.minimum(hi[..., 0], cdf[..., -1:])
    bins_g1 = jnp.minimum(hi[..., 1], existing_bins[..., -1:])

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.nan_to_num(jnp.where(denom > 0, (u - cdf_g0) /
                                          jnp.where(denom > 0, denom, 1.0),
                                          0.0)), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)
    bins = jax.lax.stop_gradient(bins)
    euclidean_bins = spacing_to_euclidean(spacing, ray_bundle, bins)
    return get_ray_samples(ray_bundle, euclidean_bins, bins)


def pdf_sample_onehot(*args, **kw):
    """pdf_sample with the count + one-hot MXU-matmul searchsorted
    (rsn/core/sampling.py impl="onehot"); bit-identical to the reduce
    form (tests/test_samplers.py)."""
    from rsn.core import sampling
    return sampling.pdf_sample(*args, **kw, impl="onehot")


def main():
    mcfg = ModelConfig()
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    bundle = model_lib.apply_collider(bundle, mcfg)

    for S_in, S_out, label in ((128, 128, "parity fine"),
                               (64, 64, "reflect"),):
        rs = spaced_sample(bundle, identity_spacing(), S_in, key=key)
        w = jnp.abs(jax.random.normal(key, rs.starts.shape))

        def v0(w, k):
            return pdf_sample(bundle, rs, w, identity_spacing(), S_out,
                              key=k).starts.sum()

        def v1(w, k):
            return pdf_sample_packed(bundle, rs, w, identity_spacing(),
                                     S_out, key=k).starts.sum()

        def v2(w, k):
            return pdf_sample_onehot(bundle, rs, w, identity_spacing(),
                                     S_out, key=k).starts.sum()

        a = jax.jit(lambda w, k: pdf_sample(
            bundle, rs, w, identity_spacing(), S_out, key=k).starts)(w, key)
        b = jax.jit(lambda w, k: pdf_sample_packed(
            bundle, rs, w, identity_spacing(), S_out, key=k).starts)(w, key)
        c = jax.jit(lambda w, k: pdf_sample_onehot(
            bundle, rs, w, identity_spacing(), S_out, key=k).starts)(w, key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

        if jax.devices()[0].platform == "cpu":
            print(f"{label:12s} S={S_in:3d}: equivalence OK "
                  "(CPU: skipping timing)", flush=True)
            continue
        t0 = time_kernel(jax.jit(v0), w, key)
        t1 = time_kernel(jax.jit(v1), w, key)
        t2 = time_kernel(jax.jit(v2), w, key)
        print(f"{label:12s} S={S_in:3d}: v0 {t0*1e3:6.3f} ms   "
              f"v1 {t1*1e3:6.3f} ms   v2 {t2*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
