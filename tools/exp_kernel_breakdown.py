"""Time each fused kernel at the train step's real shapes and report
effective TF/s, to rank optimization targets.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_kernel_breakdown.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsn.kernels.field_pallas import (field_forward_v3, field_forward_v4,
                                      mid_g_bands, pack_params_v3f,
                                      pack_params_v3f, pack_params_v4f)
from rsn.kernels.field_train import field_backward_v4
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

FL = 1.343e6  # v3 flops/sample (2*671744 MACs)


def make_inputs(n, rays):
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    return mc, d


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    p3 = pack_params_v3f(params)   # fused-forward packing
    p3u = pack_params_v3f(params)  # folded (backward, r5)
    p4 = pack_params_v4f(params)

    # primary-pass shape: 1024 rays x 128 samples
    n, rays, S = 131072, 1024, 128
    mc, d = make_inputs(n, rays)
    g = mid_g_bands(params, d)

    f3 = jax.jit(lambda mc, g: field_forward_v3(p3, mc, g, S, 2048))
    f4 = jax.jit(lambda mc, g: field_forward_v4(p4, mc, g, S, 1024))
    t3 = time_fn(f3, mc, g)
    t4 = time_fn(f4, mc, g)
    print(f"v3 fwd  (n={n}): {t3*1e3:6.2f} ms  {n*FL/t3/1e12:5.1f} TF/s "
          f"(of 1x flops)")
    print(f"v4 fwd  (n={n}): {t4*1e3:6.2f} ms  {2*n*FL/t4/1e12:5.1f} TF/s "
          f"(of 2x flops)")

    dout = jax.random.normal(jax.random.PRNGKey(2), (n, 128)).astype(
        jnp.bfloat16)
    for tile, inner in ((1024, 8), (1024, 16), (2048, 8)):
        fb = jax.jit(lambda mc, g, dout, t=tile, i=inner: field_backward_v4(
            p3u, mc, g, dout, S, t, i)[0])
        tb = time_fn(fb, mc, g, dout)
        print(f"bwd t={tile} i={inner:2d}: {tb*1e3:6.2f} ms  "
              f"{3*n*FL/tb/1e12:5.1f} TF/s (of 3x flops)")

    # reflected-pass shape: 1024 rays x 64 samples
    n2, S2 = 65536, 64
    mc2, d2 = make_inputs(n2, rays)
    g2 = mid_g_bands(params, d2)
    f3r = jax.jit(lambda mc, g: field_forward_v3(p3, mc, g, S2, 2048))
    t3r = time_fn(f3r, mc2, g2)
    print(f"v3 fwd  (n={n2}): {t3r*1e3:6.2f} ms  {n2*FL/t3r/1e12:5.1f} TF/s")
    dout2 = dout[:n2]
    fb2 = jax.jit(lambda mc, g, dout: field_backward_v4(
        p3u, mc, g, dout, S2, 1024, 8)[0])
    tb2 = time_fn(fb2, mc2, g2, dout2)
    print(f"bwd     (n={n2}): {tb2*1e3:6.2f} ms  "
          f"{3*n2*FL/tb2/1e12:5.1f} TF/s")

    step_kernels = 2 * t4 + 2 * (t3r + tb2)
    # primary bwd at best tile
    fb_best = jax.jit(lambda mc, g, dout: field_backward_v4(
        p3u, mc, g, dout, S, 1024, 8)[0])
    tbb = time_fn(fb_best, mc, g, dout)
    step_kernels += 2 * tbb
    print(f"\nsum of kernel times at train shapes: {step_kernels*1e3:.2f} ms"
          f"  (measured full step ~20.5 ms at 1024 rays)")


if __name__ == "__main__":
    main()
