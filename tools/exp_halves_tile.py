"""Sweep N_HALVES x tile for the v3/v4 forward now that the poly
transcendentals shrank the VPU front-end (the halving existed to hide
IPE sin/exp under the other half's MXU trunk).

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_halves_tile.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import rsn.kernels.field_pallas as fp
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

FL = 1.343e6


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    p3 = fp.pack_params_v3f(params)
    p4 = fp.pack_params_v4f(params)
    n, S = 131072, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (n // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = fp.mid_g_bands(params, d)

    import sys
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    try:
        for halves, tile in ((1, 2048), (2, 2048), (2, 4096), (4, 2048),
                             (4, 4096)):
            fp.N_HALVES = halves
            jax.clear_caches()
            f3 = jax.jit(lambda mc, g, t=tile: fp.field_forward_v3(
                p3, mc, g, S, t))
            t3s = [time_fn(f3, mc, g) for _ in range(reps)]
            f4 = jax.jit(lambda mc, g, t=tile: fp.field_forward_v4(
                p4, mc, g, S, t))
            t4s = [time_fn(f4, mc, g) for _ in range(reps)]
            t3, t4 = min(t3s), min(t4s)
            print(f"halves={halves} tile={tile}: "
                  f"v3 {t3*1e3:5.2f} ms ({n*FL/t3/1e12:5.1f}) | "
                  f"v4 {t4*1e3:5.2f} ms ({2*n*FL/t4/1e12:5.1f})")
    finally:
        fp.N_HALVES = 2


if __name__ == "__main__":
    main()
