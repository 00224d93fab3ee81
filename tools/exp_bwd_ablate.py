"""Ablate the recompute-backward kernel to locate its cost: full vs
no-wgrad vs no-IPE-bwd vs recompute-only.  All variants share the 2D
grid/accumulator layout of field_backward_v4 so the comparison isolates
the math, not the pipelining.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_ablate.py
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import (ENC_PAD, IN_COLS, OUT_DIM, V3_OUT,
                                      _BAND_KS, _ipe_parts, ipe_matrices,
                                      pack_params_v3)
from rsn.kernels.field_train import N_PACKED
from rsn.models import field as field_lib
from rsn.models.field import SKIP_AT, TRUNK_LAYERS
from rsn.utils.timing import time_kernel as time_fn

f32, bf16 = jnp.float32, jnp.bfloat16


def _half(mode, parts, g_rep_b, dout_b, ipe, ws, bs, wh, bh, w_emb,
          b_mid, w_out, b_out):
    A, bA, V, M = ipe
    contribs = [jnp.zeros((8, 128), f32)] * N_PACKED

    x, pre_enc, damp, u = parts
    from rsn.kernels.field_pallas import _sin2pi, _cos2pi
    sin_pre = _sin2pi(u)
    hs = []
    h = x
    for i in range(TRUNK_LAYERS):
        if i == SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)
        acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
        hs.append(h)
    heads = jnp.dot(h, wh[:], preferred_element_type=f32) + bh[:]
    bneck = heads[:, 0:256].astype(bf16)
    diff = jax.nn.sigmoid(heads[:, 257:260])
    tint = jax.nn.sigmoid(heads[:, 260:263])
    rough_sp = jax.nn.softplus(heads[:, 263:264])
    g_rep = g_rep_b.astype(f32)
    mid_pre = jnp.dot(bneck, w_emb[:], preferred_element_type=f32) + b_mid[:]
    attens = []
    for bi, k in enumerate(_BAND_KS):
        a = jnp.exp(-rough_sp * k)
        attens.append(a)
        mid_pre = mid_pre + a * g_rep[:, bi * 128:(bi + 1) * 128]
    hmid = jnp.maximum(mid_pre, 0.0).astype(bf16)
    z_out = jnp.dot(hmid, w_out[:], preferred_element_type=f32) + b_out[:]
    mid = jax.nn.sigmoid(z_out[:, 0:3])

    if mode == "recompute":
        return (mid[:, 0:1] + heads[:, 256:257],
                jnp.zeros((x.shape[0], 512), f32), contribs)

    dout = dout_b.astype(f32)
    dmid_out = dout[:, 0:3]
    ddiff = dmid_out + dout[:, 3:6]
    dtint = dmid_out * mid + dout[:, 6:9]
    dmid = dmid_out * tint

    dz3 = dmid * mid * (1.0 - mid)
    dz_out = jnp.concatenate(
        [dz3, jnp.zeros((dz3.shape[0], 125), f32)], axis=1)
    dz_out_b = dz_out.astype(bf16)
    if mode == "full":
        contribs[20] = jax.lax.dot_general(
            hmid, dz_out_b, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        contribs[21] = jnp.sum(dz_out, axis=0, keepdims=True)
    dhmid = jax.lax.dot_general(
        dz_out_b, w_out[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dmid_pre = dhmid * (mid_pre > 0.0)
    dmid_pre_b = dmid_pre.astype(bf16)
    if mode == "full":
        contribs[18] = jax.lax.dot_general(
            bneck, dmid_pre_b, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        contribs[19] = jnp.sum(dmid_pre, axis=0, keepdims=True)
    dbneck = jax.lax.dot_general(
        dmid_pre_b, w_emb[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dg_all = jnp.concatenate([attens[bi] * dmid_pre for bi in range(4)],
                             axis=1)

    d_heads = jnp.concatenate([
        dbneck, dout[:, 12:13],
        ddiff * diff * (1.0 - diff),
        dtint * tint * (1.0 - tint),
        dout[:, 13:14], dout[:, 9:12],
        jnp.zeros((dbneck.shape[0], OUT_DIM - 267), f32)], axis=1)
    d_heads_b = d_heads.astype(bf16)
    if mode == "full":
        contribs[16] = jax.lax.dot_general(
            hs[-1], d_heads_b, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        contribs[17] = jnp.sum(d_heads, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        d_heads_b, wh[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dx_extra = None
    for i in range(TRUNK_LAYERS - 1, -1, -1):
        inp = hs[i - 1] if i > 0 else x
        if i == SKIP_AT:
            inp = jnp.concatenate([x, hs[i - 1]], axis=-1)
        mask = hs[i].astype(f32) > 0.0
        dpre = (dh * mask).astype(bf16)
        if mode == "full":
            contribs[i] = jax.lax.dot_general(
                inp, dpre, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            contribs[8 + i] = jnp.sum(dh * mask, axis=0, keepdims=True)
        dinp = jax.lax.dot_general(
            dpre, ws[i][:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        if i == SKIP_AT:
            dx_extra = dinp[:, 0:ENC_PAD]
            dh = dinp[:, ENC_PAD:]
        else:
            dh = dinp
    dx = dh + dx_extra

    if mode == "no_ipe_bwd":
        return dx[:, 0:16], dg_all, contribs
    cos_pre = _cos2pi(u)
    dpre_enc = dx * (M * damp * cos_pre + (1.0 - M))
    dvar = dx * M * (-0.5) * damp * sin_pre
    dmc = (jax.lax.dot_general(dpre_enc, A, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dvar, V, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    return dmc, dg_all, contribs


def make_kernel(mode, use_wgrad):
    def kernel(mc_ref, g_ref, dout_ref, A_ref, bA_ref, V_ref, M_ref,
               E_ref, *refs):
        packed = refs[:N_PACKED]
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
         w_emb, b_mid, w_out, b_out) = packed
        outs = refs[N_PACKED:]
        dmc_ref, dg_ref = outs[:2]
        dpacked_raw = outs[2:]
        first = pl.program_id(1) == 0
        dpacked = [r.at[0] for r in dpacked_raw]

        @pl.when(first)
        def _init():
            for r in dpacked:
                r[:] = jnp.zeros(r.shape, r.dtype)

        ws = (w0, w1, w2, w3, w4, w5, w6, w7)
        bs = (b0, b1, b2, b3, b4, b5, b6, b7)
        ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
        g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=f32)
        T = mc_ref.shape[0]
        H = T // 2
        parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
                 for p in range(2)]
        dg_tot = None
        for p in range(2):
            sl = slice(p * H, (p + 1) * H)
            dmc, dg_all, contribs = _half(
                mode, parts[p], g_rep[sl, :], dout_ref[sl, :], ipe, ws,
                bs, wh, bh, w_emb, b_mid, w_out, b_out)
            dmc_ref[sl, :] = dmc[:, 0:16] if dmc.shape[1] >= 16 else \
                jnp.pad(dmc, ((0, 0), (0, 16 - dmc.shape[1])))
            dgp = jax.lax.dot_general(
                E_ref[sl, :], dg_all, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dg_tot = dgp if dg_tot is None else dg_tot + dgp
            if use_wgrad and mode == "full":
                for j, c in enumerate(contribs):
                    dpacked[j][:] += c
        dg_ref[:] = dg_tot
    return kernel


def run(mode, use_wgrad, packed, mc, g, dout, S, tile=1024, inner=8):
    n = mc.shape[0]
    n_tiles = n // tile
    outer = n_tiles // inner
    grid = (outer, inner)
    rays_per_tile = tile // S
    n_rays = n // S
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((S, 1), np.float32)))

    def row_map(o, i):
        return (o * inner + i, 0)

    in_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM)]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(E.shape, lambda o, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct((n, IN_COLS), f32),
                  jax.ShapeDtypeStruct((n_rays, 512), f32)]
    out_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM)]
    shapes = [w.shape for w in packed] if (use_wgrad and mode == "full") \
        else [(8, 128)] * N_PACKED
    for s in shapes:
        out_shapes.append(jax.ShapeDtypeStruct((outer,) + s, f32))
        out_specs.append(pl.BlockSpec((1,) + s, lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        make_kernel(mode, use_wgrad), grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(3e9), bytes_accessed=int(5e7),
            transcendentals=n * 300))
    return jax.jit(lambda mc, g, dout: fn(mc, g, dout, *ipe_ops, E,
                                          *packed)[0])


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    packed = pack_params_v3(params)
    n, S = 131072, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(f32)
    from rsn.kernels.field_pallas import mid_g_bands
    d = jax.random.normal(key, (n // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    dout = jax.random.normal(jax.random.PRNGKey(2), (n, V3_OUT)).astype(
        bf16)

    FL = 1.343e6
    for mode, wg in (("full", True), ("full", False),
                     ("no_ipe_bwd", False), ("recompute", False)):
        fn = run(mode, wg, packed, mc, g, dout, S)
        t = time_fn(fn, mc, g, dout)
        label = mode + ("+wgrad" if wg else "")
        print(f"{label:20}: {t*1e3:6.2f} ms  "
              f"({3*n*FL/t/1e12:5.1f} TF/s of 3x)")


if __name__ == "__main__":
    main()
