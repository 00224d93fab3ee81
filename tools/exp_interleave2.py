"""Experiment: LAYER-granularity interleaving of the two half-tiles in
the fused v3 forward.

The shipped kernel (field_pallas._field_kernel_halved) issues both
halves' IPE upfront but then runs each half's trunk+tail sequentially.
Hypothesis: alternating the two halves per trunk layer lets Mosaic
overlap half A's VPU tail (bias+relu+cast) with half B's MXU matmul for
every layer, not just the first.  Variants:

  v3   — shipped kernel (baseline)
  v3L  — trunk layers interleaved, tail per-half sequential
  v3F  — trunk + heads + mid tail fully interleaved

Run on TPU: python tools/exp_interleave2.py [n]
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import (DEFAULT_TILE, IN_COLS, OUT_DIM,
                                      V3_OUT, _BAND_KS, _ipe_parts,
                                      ipe_matrices, pack_params_v3,
                                      field_forward_v3, mid_g_bands)
from rsn.models.field import SKIP_AT, TRUNK_LAYERS
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

f32, bf16 = jnp.float32, jnp.bfloat16


def _tail(h, g_rep, wh, bh, w_emb, b_mid, w_out, b_out):
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
    zeros = jnp.zeros((h.shape[0], V3_OUT - 14), f32)
    return jnp.concatenate([mid_out, diff, tint, normals_raw, density_pre,
                            rough_raw, zeros], axis=1).astype(bf16)


def _kernel_v3L(full_tail_interleave, mc_ref, g_ref, A_ref, bA_ref, V_ref,
                M_ref, E_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=f32)
    T = mc_ref.shape[0]
    H = T // 2
    parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
             for p in range(2)]
    xs = [parts[0][0], parts[1][0]]
    hs = list(xs)
    # trunk: layer-major, halves inner
    for i in range(TRUNK_LAYERS):
        for p in range(2):
            h = hs[p]
            if i == SKIP_AT:
                h = jnp.concatenate([xs[p], h], axis=-1)
            acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
            hs[p] = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)

    if not full_tail_interleave:
        for p in range(2):
            out_ref[p * H:(p + 1) * H, :] = _tail(
                hs[p], g_rep[p * H:(p + 1) * H, :], wh, bh, w_emb, b_mid,
                w_out, b_out)
        return

    # fully interleaved tail
    heads = [jnp.dot(hs[p], wh[:], preferred_element_type=f32) + bh[:]
             for p in range(2)]
    bneck = [heads[p][:, 0:256].astype(bf16) for p in range(2)]
    mid_pre = [jnp.dot(bneck[p], w_emb[:], preferred_element_type=f32)
               + b_mid[:] for p in range(2)]
    outs = []
    for p in range(2):
        density_pre = heads[p][:, 256:257]
        diff = jax.nn.sigmoid(heads[p][:, 257:260])
        tint = jax.nn.sigmoid(heads[p][:, 260:263])
        rough_raw = heads[p][:, 263:264]
        normals_raw = heads[p][:, 264:267]
        rough_sp = jax.nn.softplus(rough_raw)
        mp = mid_pre[p]
        for bi, k in enumerate(_BAND_KS):
            mp = mp + jnp.exp(-rough_sp * k) * \
                g_rep[p * H:(p + 1) * H, bi * 128:(bi + 1) * 128]
        hmid = jnp.maximum(mp, 0.0).astype(bf16)
        mid = jax.nn.sigmoid(
            jnp.dot(hmid, w_out[:], preferred_element_type=f32)
            + b_out[:])[:, 0:3]
        mid_out = diff + tint * mid
        zeros = jnp.zeros((H, V3_OUT - 14), f32)
        outs.append(jnp.concatenate(
            [mid_out, diff, tint, normals_raw, density_pre, rough_raw,
             zeros], axis=1).astype(bf16))
    for p in range(2):
        out_ref[p * H:(p + 1) * H, :] = outs[p]


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                             "full"))
def field_forward_v3L(packed, mean_cov, g_bands, samples_per_ray,
                      tile=DEFAULT_TILE, full=False):
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
    flops_per_row = 2 * (128 * 256 + 3 * 256 * 256 + 384 * 256
                         + 3 * 256 * 256 + 256 * OUT_DIM + 256 * 128
                         + 128 * 128)
    return pl.pallas_call(
        functools.partial(_kernel_v3L, full),
        grid=grid,
        in_specs=in_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2),
            transcendentals=n * 200),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays, S = n // 128, 128
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (rays, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    p3 = pack_params_v3(params)
    FL = 1.35e6

    for tile in (1024, 2048, 4096):
        f0 = jax.jit(lambda mc, g, t=tile: field_forward_v3(p3, mc, g, S, t))
        fL = jax.jit(lambda mc, g, t=tile: field_forward_v3L(
            p3, mc, g, S, t, False))
        fF = jax.jit(lambda mc, g, t=tile: field_forward_v3L(
            p3, mc, g, S, t, True))
        o0 = f0(mc, g)
        for name, f in (("v3", f0), ("v3L", fL), ("v3F", fF)):
            try:
                o = f(mc, g)
                err = float(jnp.max(jnp.abs(
                    o0.astype(f32) - o.astype(f32))))
                t_ = time_fn(f, mc, g)
                print(f"tile={tile} {name:4}: {t_*1e3:6.2f} ms "
                      f"({n*FL/t_/1e12:5.1f} TF/s) maxerr={err:.1e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"tile={tile} {name:4}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
