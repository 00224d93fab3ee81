"""Activation-spill vs recompute backward, min-of-3 on TPU.

Times (1) the training forward v4 vs the spilling v6, (2) the recompute
backward v4 vs the recompute-free v5, and (3) the end-to-end custom-VJP
chain with save_acts off/on, at the fine-pass shape (131072 rows, S=128)
and the preset reflect shape (40960 rows, S=64).

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_acts.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rsn.kernels.field_pallas import (V3_OUT, field_forward_v4,
                                      field_forward_v6, mid_g_bands,
                                      pack_params_v3f, pack_params_v4f)
from rsn.kernels import field_train as ft
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

FL = 1.343e6  # ~flops per row per 1x pass


def bench_shape(params, n, S):
    print(f"--- n={n} S={S} ---")
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
    packed = pack_params_v3f(params)
    packed4 = pack_params_v4f(params)
    tile_fwd = 2048
    tile_bwd = S * ft.bwd_rays_per_tile(tile_fwd, S)

    f4 = jax.jit(lambda mc, g: field_forward_v4(packed4, mc, g, S,
                                                tile_fwd))
    t = min(time_fn(f4, mc, g) for _ in range(3))
    print(f"fwd v4 (recompute pair): {t*1e3:5.2f} ms "
          f"({2*n*FL/t/1e12:5.1f} TF/s of 2x)")

    f6 = jax.jit(lambda mc, g: field_forward_v6(packed4, mc, g, S,
                                                tile_fwd, True)[0])
    t = min(time_fn(f6, mc, g) for _ in range(3))
    print(f"fwd v6 (spills acts)   : {t*1e3:5.2f} ms "
          f"({2*n*FL/t/1e12:5.1f} TF/s of 2x)")
    acts = jax.jit(lambda mc, g: field_forward_v6(
        packed4, mc, g, S, tile_fwd, True)[1])(mc, g)

    b4 = jax.jit(lambda mc, g, dout: ft.field_backward_v4(
        packed, mc, g, dout, S, tile_bwd)[0])
    t = min(time_fn(b4, mc, g, dout) for _ in range(3))
    print(f"bwd v4 (recompute)     : {t*1e3:5.2f} ms "
          f"({3*n*FL/t/1e12:5.1f} TF/s of 3x)")

    b5 = jax.jit(lambda mc, g, acts, dout: ft.field_backward_v5(
        packed, mc, g, acts, dout, S, tile_bwd)[0])
    t = min(time_fn(b5, mc, g, acts, dout) for _ in range(3))
    print(f"bwd v5 (spilled acts)  : {t*1e3:5.2f} ms "
          f"({2*n*FL/t/1e12:5.1f} TF/s of its 2x)")

    for save_acts in (False, True):
        def loss(p, mc, g):
            out = ft.fused_field_train(p, mc, g, S, tile_fwd, True,
                                       save_acts)
            return jnp.sum(out.astype(jnp.float32))

        vg = jax.jit(jax.value_and_grad(loss))
        t = min(time_fn(lambda p, mc, g: vg(p, mc, g)[0], params, mc, g)
                for _ in range(3))
        print(f"fwd+bwd save_acts={int(save_acts)}  : {t*1e3:5.2f} ms "
              f"({5*n*FL/t/1e12:5.1f} TF/s of 5x)")


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    bench_shape(params, 131072, 128)
    bench_shape(params, 40960, 64)


if __name__ == "__main__":
    main()
