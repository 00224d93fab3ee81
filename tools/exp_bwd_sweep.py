"""Sweep (tile, inner) for the recompute-backward kernel, min-of-3.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_sweep.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsn.kernels.field_pallas import V3_OUT, mid_g_bands, pack_params_v3f
from rsn.kernels.field_train import field_backward_v4
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

FL = 1.343e6


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    packed = pack_params_v3f(params)
    n, S = 131072, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (n // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    dout = jax.random.normal(jax.random.PRNGKey(2), (n, V3_OUT)).astype(
        jnp.bfloat16)

    for tile, inner in ((1024, 4), (1024, 8), (1024, 16), (1024, 32),
                        (2048, 4), (2048, 8)):
        fb = jax.jit(lambda mc, g, dout, t=tile, i=inner:
                     field_backward_v4(packed, mc, g, dout, S, t, i)[0])
        ts = [time_fn(fb, mc, g, dout) for _ in range(3)]
        t = min(ts)
        print(f"tile={tile} inner={inner:2d}: {t*1e3:5.2f} ms "
              f"({3*n*FL/t/1e12:5.1f} TF/s of 3x)")


if __name__ == "__main__":
    main()
