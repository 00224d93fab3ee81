"""Experiment: interleaved half-tiles in the fused v3 forward.

Two data-independent half-tiles let Mosaic's scheduler overlap one
half's VPU tail (bias+relu+cast, IPE transcendentals) with the other
half's MXU matmuls.  Run on TPU: python tools/exp_interleave.py
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import (DEFAULT_TILE, IN_COLS, OUT_DIM,
                                      SKIP_PAD, ENC_PAD, V3_OUT, _BAND_KS,
                                      _ipe_in_kernel, ipe_matrices,
                                      pack_params_v3, field_forward_v3,
                                      mid_g_bands)
from rsn.models.field import SKIP_AT, TRUNK_LAYERS
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn


def _half(mc, g_rep, ipe, ws, bs, wh, bh, w_emb, b_mid, w_out, b_out):
    f32, bf16 = jnp.float32, jnp.bfloat16
    A, bA, V, M = ipe
    x = _ipe_in_kernel(mc, A, bA, V, M)
    h = x
    for i in range(TRUNK_LAYERS):
        if i == SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)
        acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
    heads = jnp.dot(h, wh[:], preferred_element_type=f32) + bh[:]
    bneck = heads[:, 0:256].astype(bf16)
    density_pre = heads[:, 256:257]
    diff = jax.nn.sigmoid(heads[:, 257:260])
    tint = jax.nn.sigmoid(heads[:, 260:263])
    rough_raw = heads[:, 263:264]
    normals_raw = heads[:, 264:267]
    rough_sp = jax.nn.softplus(rough_raw)
    mid_pre = jnp.dot(bneck, w_emb[:], preferred_element_type=f32) + b_mid[:]
    for bi, k in enumerate(_BAND_KS):
        mid_pre = mid_pre + jnp.exp(-rough_sp * k) * \
            g_rep[:, bi * 128:(bi + 1) * 128]
    hmid = jnp.maximum(mid_pre, 0.0).astype(bf16)
    mid = jax.nn.sigmoid(
        jnp.dot(hmid, w_out[:], preferred_element_type=f32) + b_out[:])[:, 0:3]
    mid_out = diff + tint * mid
    zeros = jnp.zeros((mc.shape[0], V3_OUT - 14), f32)
    return jnp.concatenate([mid_out, diff, tint, normals_raw, density_pre,
                            rough_raw, zeros], axis=1).astype(jnp.bfloat16)


def _kernel_v3i(mc_ref, g_ref, A_ref, bA_ref, V_ref, M_ref, E_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=jnp.float32)
    T = mc_ref.shape[0]
    H = T // 2
    out0 = _half(mc_ref[0:H, :], g_rep[0:H, :], ipe, ws, bs, wh, bh,
                 w_emb, b_mid, w_out, b_out)
    out1 = _half(mc_ref[H:, :], g_rep[H:, :], ipe, ws, bs, wh, bh,
                 w_emb, b_mid, w_out, b_out)
    out_ref[0:H, :] = out0
    out_ref[H:, :] = out1


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray"))
def field_forward_v3i(packed, mean_cov, g_bands, samples_per_ray,
                      tile=DEFAULT_TILE):
    n = mean_cov.shape[0]
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))
    in_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(E.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops_per_row = 2 * (ENC_PAD * 256 + 3 * 256 * 256 + SKIP_PAD * 256
                         + 3 * 256 * 256 + 256 * OUT_DIM + 256 * 128
                         + 128 * 128)
    return pl.pallas_call(
        _kernel_v3i,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2),
            transcendentals=n * 200),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    n, rays, S = 131072, 1024, 128
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    p3 = pack_params_v3(params)
    FL = 1.35e6  # ~flops/sample

    for tile in (1024, 2048):
        f = jax.jit(lambda mc, g, t=tile: field_forward_v3(p3, mc, g, S, t))
        fi = jax.jit(lambda mc, g, t=tile: field_forward_v3i(p3, mc, g, S, t))
        o1, o2 = f(mc, g), fi(mc, g)
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        t1 = time_fn(f, mc, g)
        t2 = time_fn(fi, mc, g)
        print(f"tile={tile}: v3 {t1*1e3:6.2f} ms ({n*FL/t1/1e12:5.1f} TF/s)"
              f"  v3i {t2*1e3:6.2f} ms ({n*FL/t2/1e12:5.1f} TF/s)"
              f"  maxerr={err:.3e}", flush=True)


if __name__ == "__main__" and False:
    main()


# ---- unhalved reference (the pre-interleave kernel) ---------------------
def _kernel_v3u(mc_ref, g_ref, A_ref, bA_ref, V_ref, M_ref, E_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = _half(mc_ref[:], g_rep, ipe, ws, bs, wh, bh,
                       w_emb, b_mid, w_out, b_out)


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray"))
def field_forward_v3u(packed, mean_cov, g_bands, samples_per_ray,
                      tile=DEFAULT_TILE):
    n = mean_cov.shape[0]
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))
    in_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(E.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        _kernel_v3u,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


def main2():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    n, rays, S = 131072, 1024, 128
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    p3 = pack_params_v3(params)
    FL = 1.35e6
    for tile in (1024, 2048):
        fu = jax.jit(lambda mc, g, t=tile: field_forward_v3u(p3, mc, g, S, t))
        fh = jax.jit(lambda mc, g, t=tile: field_forward_v3(p3, mc, g, S, t))
        tu = time_fn(fu, mc, g)
        th = time_fn(fh, mc, g)
        print(f"tile={tile}: unhalved {tu*1e3:6.2f} ms ({n*FL/tu/1e12:5.1f}"
              f" TF/s)  halved {th*1e3:6.2f} ms ({n*FL/th/1e12:5.1f} TF/s)",
              flush=True)


if __name__ == "__main__" and True:
    main2()
