"""Reflect-pass backward strategy A/B (r5): at the reflected shape
(K=640 rays x 64 samples = 41k rows, want_normals=False,
want_dmc=True), is the acts-SPILL path (v6 fwd + v5 bwd: 3 compute
units + ~334 MB/step of spill DMA) still faster than the RECOMPUTE
path (v3 fwd + v4 bwd: 4 compute units, no spill)?  The spill won at
the fine shape (4 units of compute per spill byte); the reflected
passes have 25% less compute per spilled byte, so the answer may flip.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_reflect_spill.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsn.kernels import field_pallas as fp
from rsn.kernels import field_train as ft
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel

K, S = 640, 64
N = K * S  # 40960


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (N, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (N, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (K, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = fp.mid_g_bands(params, d)
    w_rand = jax.random.normal(jax.random.PRNGKey(2), (N, fp.V3_OUT))

    def value_and_grad(save_acts):
        def loss(p, m, gg):
            out = ft.fused_field_train(p, m, gg, S, 2048, False,
                                       save_acts, True)
            return jnp.sum(out.astype(jnp.float32) * w_rand)
        return jax.jit(jax.value_and_grad(loss))

    for save_acts in (True, False):
        fn = value_and_grad(save_acts)
        t = min(time_kernel(lambda m, gg: fn(params, m, gg)[0], mc, g)
                for _ in range(3))
        name = "spill (v6+v5)" if save_acts else "recompute (v3+v4)"
        print(f"  reflect fwd+bwd {name}: {t*1e3:5.2f} ms")


if __name__ == "__main__":
    main()
