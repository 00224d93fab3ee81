"""Probe: recompute-free backward WITHOUT the IPE front-end.

The shipped field_backward_v5 (acts-fed) still recomputes the IPE
front-end per tile (_ipe_parts: sin/cos polys + exp2 + 2 matmuls) —
needed for (a) x, the trunk input consumed by the layer-0/skip wgrads,
and (b) the IPE backward that produces dmc (d loss/d mean_cov).  But
for the PRIMARY passes with the camera optimizer off, dmc is provably
dead (sample positions are detached PDF bins over leaf rays — the same
graph as the torch reference, where rays are autograd leaves).  If the
v6 forward also spills x (128 bf16 cols, +6% spill traffic), the
backward needs NO transcendental work at all.

This probe times the shipped v5 against the no-IPE variant at the
fine-pass shape to decide whether to productionize it.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_noipe.py
"""
from __future__ import annotations

import sys
print("SUPERSEDED (r5): this probe hand-rolls a backward kernel against the\n"
      "pre-r5 UNFUSED _bwd_half signature; the shipped backward is now the\n"
      "FOLDED form (field_train.py r5).  Its recorded conclusion stands in\n"
      "BASELINE.md; for equivalents use field_backward_v4(n_halves=1) \n"
      "(whole-tile probe) or field_backward_v6 (no-IPE, shipped).")
sys.exit(0)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import (ACTS_COLS, ENC_PAD, IN_COLS, OUT_DIM,
                                      V3_OUT, _BAND_KS, ipe_matrices,
                                      pack_params_v3)
from rsn.kernels.field_train import N_PACKED, _bwd_half, field_backward_v5
from rsn.models import field as field_lib
from rsn.models.field import SKIP_AT, TRUNK_LAYERS
from rsn.utils.timing import time_kernel as time_fn

f32, bf16 = jnp.float32, jnp.bfloat16


def _noipe_half(x_b, acts_b, g_rep_b, dout_b, ws, bs, wh, bh, w_emb,
                b_mid, w_out, b_out):
    """_bwd_half minus the IPE recompute and IPE backward: x and the
    trunk activations come from the forward spill; returns only
    (dg_all, contribs)."""
    contribs = [None] * N_PACKED
    x = x_b
    hs = [acts_b[:, i * 256:(i + 1) * 256] for i in range(TRUNK_LAYERS)]
    h = hs[-1]

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

    dout = dout_b.astype(f32)
    dmid_out = dout[:, 0:3]
    ddiff = dmid_out + dout[:, 3:6]
    dtint = dmid_out * mid + dout[:, 6:9]
    dmid = dmid_out * tint

    dz3 = dmid * mid * (1.0 - mid)
    dz_out = jnp.concatenate(
        [dz3, jnp.zeros((dz3.shape[0], 125), f32)], axis=1)
    dz_out_b = dz_out.astype(bf16)
    contribs[20] = jax.lax.dot_general(
        hmid, dz_out_b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    contribs[21] = jnp.sum(dz_out, axis=0, keepdims=True)
    dhmid = jax.lax.dot_general(
        dz_out_b, w_out[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dmid_pre = dhmid * (mid_pre > 0.0)
    dmid_pre_b = dmid_pre.astype(bf16)
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
    contribs[16] = jax.lax.dot_general(
        hs[-1], d_heads_b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    contribs[17] = jnp.sum(d_heads, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        d_heads_b, wh[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    for i in range(TRUNK_LAYERS - 1, -1, -1):
        inp = hs[i - 1] if i > 0 else x
        if i == SKIP_AT:
            inp = jnp.concatenate([x, hs[i - 1]], axis=-1)
        mask = hs[i].astype(f32) > 0.0
        dpre = (dh * mask).astype(bf16)
        contribs[i] = jax.lax.dot_general(
            inp, dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        contribs[8 + i] = jnp.sum(dh * mask, axis=0, keepdims=True)
        if i > 0:  # no dx needed: dmc is dead in this mode
            dinp = jax.lax.dot_general(
                dpre, ws[i][:], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dh = dinp[:, ENC_PAD:] if i == SKIP_AT else dinp
    return dg_all, contribs


def _noipe_kernel(xacts_ref, g_ref, dout_ref, E_ref, *refs):
    packed = refs[:N_PACKED]
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out) = packed
    outs = refs[N_PACKED:]
    dg_ref = outs[0]
    dpacked = [r.at[0] for r in outs[1:]]
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _init():
        for r in dpacked:
            r[:] = jnp.zeros(r.shape, r.dtype)

    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=f32)
    T = xacts_ref.shape[0]
    H = T // 2
    dg_tot = None
    for p in range(2):
        sl = slice(p * H, (p + 1) * H)
        dg_all, contribs = _noipe_half(
            xacts_ref[sl, ACTS_COLS:], xacts_ref[sl, :ACTS_COLS],
            g_rep[sl, :], dout_ref[sl, :], ws, bs, wh, bh,
            w_emb, b_mid, w_out, b_out)
        dgp = jax.lax.dot_general(
            E_ref[sl, :], dg_all, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dg_tot = dgp if dg_tot is None else dg_tot + dgp
        for j, c in enumerate(contribs):
            dpacked[j][:] += c
    dg_ref[:] = dg_tot


def run_noipe(packed, xacts, g, dout, S, tile=1024, inner=16):
    n = xacts.shape[0]
    n_tiles = n // tile
    inner = min(inner, n_tiles)
    while n_tiles % inner:
        inner -= 1
    outer = n_tiles // inner
    grid = (outer, inner)
    rays_per_tile = tile // S
    n_rays = n // S
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((S, 1), np.float32)))

    def row_map(o, i):
        return (o * inner + i, 0)

    in_specs = [
        pl.BlockSpec((tile, ACTS_COLS + ENC_PAD), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(E.shape, lambda o, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_shapes = [jax.ShapeDtypeStruct((n_rays, 512), jnp.float32)]
    out_specs = [pl.BlockSpec((rays_per_tile, 512), row_map,
                              memory_space=pltpu.VMEM)]
    for w in packed:
        out_shapes.append(
            jax.ShapeDtypeStruct((outer,) + w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape,
                                      lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))
    flops_per_row = 2 * 2 * (ENC_PAD * 256 + 7 * 256 * 256 + 384 * 256
                             + 256 * OUT_DIM + 256 * 128 + 128 * 128)
    fn = pl.pallas_call(
        _noipe_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * ((ACTS_COLS + ENC_PAD + V3_OUT) * 2)
            + n_rays * 4096,
            transcendentals=0),
    )
    res = fn(xacts, g, dout, E, *packed)
    return res[0], tuple(jnp.sum(a, axis=0) for a in res[1:])


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    packed = pack_params_v3(params)

    n, rays, S = 131072, 1024, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    g = jax.random.normal(key, (rays, 512), jnp.float32)
    dout = jax.random.normal(key, (n, V3_OUT), jnp.bfloat16)
    acts = jax.random.normal(key, (n, ACTS_COLS), jnp.bfloat16)
    xacts = jax.random.normal(key, (n, ACTS_COLS + ENC_PAD), jnp.bfloat16)

    FL2 = 2 * 1.343e6  # 2x flops/sample (dgrad + wgrad)

    f5 = jax.jit(functools.partial(field_backward_v5, packed,
                                   samples_per_ray=S, tile=1024, inner=16))
    t5 = time_fn(lambda mc, g, a, d: f5(mc, g, a, d)[0], mc, g, acts, dout)
    print(f"v5 (acts, ipe fwd+bwd) : {t5*1e3:6.2f} ms  "
          f"{n*FL2/t5/1e12:5.1f} TF/s of 2x")

    for tile, inner in ((1024, 16), (1024, 8), (2048, 8)):
        fn = jax.jit(functools.partial(run_noipe, packed, S=S, tile=tile,
                                       inner=inner))
        tn = time_fn(lambda x, g, d: fn(x, g, d)[0], xacts, g, dout)
        print(f"noipe t={tile} i={inner:2d}    : {tn*1e3:6.2f} ms  "
              f"{n*FL2/tn/1e12:5.1f} TF/s of 2x")


if __name__ == "__main__":
    main()
