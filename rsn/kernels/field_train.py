"""Fused field TRAINING kernel: custom-VJP around the v3/v4 forward.

Forward = rsn.kernels.field_pallas.field_forward_v3 (IPE + trunk +
heads + factored mid branch, VMEM-resident) or field_forward_v4
(v3 + the analytic-normals gradient fused into the same kernel — the
primary passes need -normalize(d preact/d mean) as a loss target, and
computing it in-kernel replaces a whole separate XLA forward+backward).
Backward is a single Pallas kernel that RECOMPUTES the forward per tile
in VMEM and backpropagates in place:

- dgrad matmuls in bf16 (fp32 accumulation); wgrads accumulate in fp32
  VMEM blocks per OUTER grid group (2D grid, inner dim innermost) and
  are reduced across groups in XLA — v3's whole-grid constant-index
  accumulators serialized Mosaic's pipeline (measured 2x slower)
- replicates the reference's detach: the roughness -> ISH attenuation
  edge carries NO gradient (model.py:174,208 roughness.detach())
- emits dmc (gradients wrt mean/cov — live through the reflected-pass
  pixel_area/roughness chain) and dg (per-ray SH partials, chained to
  the mid-MLP encoder rows outside)

Residuals are just the kernel inputs (mc, g) — nothing else is saved,
so training memory stays O(batch) instead of O(batch * layers).

Correctness: interpret-mode equivalence vs a pure-JAX shadow on CPU
(tests/test_field_train_kernel.py); bf16-level loss-curve agreement
with the XLA path on TPU.  Measured on v5e: 139k train rays/s/chip vs
73k for the XLA pipeline (batch 1024, full 128/128/64/64 model).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import (DEFAULT_TILE, ENC_PAD, FH_COLS,
                                      IN_COLS, OUT_DIM, SKIP_PAD, V3_OUT,
                                      _BAND_KS, _cos2pi, _ipe_parts,
                                      _sin2pi, field_forward_v3,
                                      field_forward_v6,
                                      ipe_matrices, pack_params_v3f)
from rsn.models.field import SKIP_AT, TRUNK_LAYERS

N_PACKED = 20  # w0..7, b0..7, w_hc, b_hc, w_out, b_out (pack_params_v3f)


def _bwd_kernel_impl(two_d, has_acts, n_halves, mc_ref, g_ref, dout_ref,
                     fout_ref, A_ref, bA_ref, V_ref, M_ref, E_ref,
                     *refs):
    if has_acts:
        acts_ref, refs = refs[0], refs[1:]
    else:
        acts_ref = None
    packed = refs[:N_PACKED]
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7,
     w_hc, b_hc, w_out, b_out) = packed
    outs = refs[N_PACKED:]
    (dmc_ref, dg_ref) = outs[:2]
    dpacked_raw = outs[2:]  # same order as packed

    # v4 (two_d): wgrad accumulators are per-OUTER-group 3D blocks
    # (1, rows, cols) re-zeroed at each inner step 0, reduced in XLA;
    # v3: whole-grid 2D accumulators zeroed once at grid step 0.
    if two_d:
        first = pl.program_id(1) == 0
        dpacked = [r.at[0] for r in dpacked_raw]
    else:
        first = pl.program_id(0) == 0
        dpacked = list(dpacked_raw)

    @pl.when(first)
    def _init():
        for r in dpacked:
            r[:] = jnp.zeros(r.shape, r.dtype)

    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])

    # per-ray g bands expand to samples via the one-hot matmul E (same
    # trick as the forward kernels); dg reduces back per-ray through
    # E^T on the MXU — the (N, 512) per-sample dg never touches HBM
    # (its bf16 write + XLA convert/reduce cost ~2.3 ms/step).
    g_rep = jnp.dot(E_ref[:], g_ref[:],
                    preferred_element_type=jnp.float32)  # (T, 512)

    # interleaved half-tiles (see field_pallas.N_HALVES): all halves'
    # IPE front-ends (VPU transcendentals) are issued upfront so they
    # overlap the first half's MXU recompute; the halves' chains are
    # otherwise data-independent and only the wgrad accumulates
    # serialize.
    T = mc_ref.shape[0]
    H = T // n_halves
    parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
             for p in range(n_halves)]
    dg_tot = None
    tile_contribs = None
    for p in range(n_halves):
        sl = slice(p * H, (p + 1) * H)
        dmc, dg_all, contribs = _bwd_half(
            parts[p], g_rep[sl, :], dout_ref[sl, :], fout_ref[sl, :],
            ipe, ws, bs, w_hc, b_hc, w_out, b_out,
            acts_b=None if acts_ref is None else acts_ref[sl, :])
        dmc_ref[sl, :] = dmc
        # per-ray reduce: E_half^T @ dg_all -> (rays_per_tile, 512)
        dgp = jax.lax.dot_general(
            E_ref[sl, :], dg_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg_tot = dgp if dg_tot is None else dg_tot + dgp
        # sum halves in registers first: ONE accumulator RMW per tile
        # instead of one per half
        tile_contribs = (contribs if tile_contribs is None else
                         [a + c for a, c in zip(tile_contribs, contribs)])
    for j, c in enumerate(tile_contribs):
        dpacked[j][:] += c
    dg_ref[:] = dg_tot


def _bwd_half(parts, g_rep_b, dout_b, fout_b, ipe, ws, bs, w_hc, b_hc,
              w_out, b_out, acts_b=None, want_dmc=True):
    """FOLDED recompute-backward for one half-tile (r5).

    Operands use the fused pack_params_v3f layout: w_hc = [heads FH_* |
    w_comb = W_bneck @ W_emb].  The 256-wide bottleneck never
    materializes here (as in the forward) — the kernel accumulates
    d w_hc / d b_hc and the caller unfolds them into bottleneck /
    mid_mlp gradients with two parameter-shaped matmuls in XLA
    (_unpack_grads; exact chain rule through the fold, fp32-reassociated
    vs the old unfused form).  vs that form this removes the 256-col
    bneck recompute + its wgrad (the heads matmul and its wgrad/dgrad
    drop from 384 to 256 columns) and fuses the heads+mid backward into
    ONE wgrad + ONE dgrad 256-wide MXU pair — ~13% fewer kernel MACs
    and two fewer serial links.

    parts: the half's precomputed IPE (x, pre_enc, damp, u).
    fout_b: the FORWARD's out block (H, >= 20) bf16 — diff/tint/rough
    (sigmoid/raw head values) and mid (V3_MIDVAL, stored by the r5
    train-width forward) are read from it instead of recomputed, so the
    backward skips the heads half of the hc matmul, the z_out matmul,
    and three sigmoid tails (the out already sits in HBM next to
    d_out; reading it costs one more narrow DMA).  bf16-rounded tail
    values shift the local sigmoid-grad factors by <= 1 bf16 ulp —
    within the kernel's bf16 gradient tolerance, applied uniformly
    across all backward variants.
    acts_b: optional (H, 2048) bf16 trunk activations spilled by
    field_forward_v6 — when given, the trunk forward recompute (8
    matmuls, ~1/3 of this kernel's FLOPs) is skipped; values are
    identical either way (the spill is the same post-relu bf16).
    want_dmc=False (only valid with a spilled x — parts may then be
    (x, None, None, None)) skips the IPE backward entirely: no
    sin/cos polys, no dvar/dpre_enc, no dmc matmuls, and no layer-0
    dgrad — for call sites whose mean/cov cotangent is provably dead
    (primary passes with the camera optimizer off: sample positions
    are detached PDF bins over leaf rays, exactly as in the torch
    reference where rays are autograd leaves).
    Returns (dmc (H,16) f32 or None, dg_all (H,512) f32 per-sample,
    contribs[20]) where contribs follow the packed-operand order
    (w0..7, b0..7, w_hc, b_hc, w_out, b_out).
    """
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    A, bA, V, M = ipe
    contribs = [None] * N_PACKED

    # ---- forward recompute (keep activations in VMEM) ----
    x, pre_enc, damp, u = parts
    if want_dmc:
        sin_pre = _sin2pi(u)

    if acts_b is None:
        hs = []  # post-relu activations, bf16
        h = x
        for i in range(TRUNK_LAYERS):
            if i == SKIP_AT:
                h = jnp.concatenate([x, h], axis=-1)
            acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
            h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
            hs.append(h)
    else:
        hs = [acts_b[:, i * 256:(i + 1) * 256]
              for i in range(TRUNK_LAYERS)]
        h = hs[-1]

    # tail values from the forward's stored out (see fout_b above):
    # V3 layout — diff 3:6, tint 6:9, rough 13, mid V3_MIDVAL
    fout = fout_b.astype(f32)
    diff = fout[:, 3:6]
    tint = fout[:, 6:9]
    rough_raw = fout[:, 13:14]
    mid = fout[:, 17:20]
    rough_sp = jax.nn.softplus(rough_raw)

    g_rep = g_rep_b.astype(f32)  # (H, 512) per-sample SH partials
    # only the mid-seed half of the hc matmul is needed (hmid for the
    # w_out wgrad + the relu mask); the heads half is never recomputed
    mid_pre = (jnp.dot(h, w_hc[:, 128:256],
                       preferred_element_type=f32)
               + b_hc[:, 128:256])
    attens = []
    for bi, k in enumerate(_BAND_KS):
        a = jnp.exp(-rough_sp * k)
        attens.append(a)
        mid_pre = mid_pre + a * g_rep[:, bi * 128:(bi + 1) * 128]
    hmid = jnp.maximum(mid_pre, 0.0).astype(bf16)

    # ---- backward ----
    dout = dout_b.astype(f32)  # (H, 128)
    dmid_out = dout[:, 0:3]
    ddiff = dmid_out + dout[:, 3:6]
    dtint = dmid_out * mid + dout[:, 6:9]
    dmid = dmid_out * tint
    dnormals = dout[:, 9:12]
    ddensity = dout[:, 12:13]
    drough = dout[:, 13:14]

    dz3 = dmid * mid * (1.0 - mid)  # (H, 3)
    dz_out = jnp.concatenate(
        [dz3, jnp.zeros((dz3.shape[0], 125), f32)], axis=1)
    dz_out_b = dz_out.astype(bf16)
    contribs[18] = jax.lax.dot_general(
        hmid, dz_out_b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    contribs[19] = jnp.sum(dz_out, axis=0, keepdims=True)
    dhmid = jax.lax.dot_general(
        dz_out_b, w_out[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dmid_pre = dhmid * (mid_pre > 0.0)

    # dg: per-sample band grads (atten edge wrt rough is DROPPED —
    # reference detaches roughness into the directional encoding);
    # ray-reduced by the caller via E^T in f32
    dg_cols = []
    for bi in range(4):
        dg_cols.append(attens[bi] * dmid_pre)
    dg_all = jnp.concatenate(dg_cols, axis=1)  # (H, 512) f32

    # heads + mid-seed backward: ONE fused 256-wide wgrad/dgrad pair
    d_heads = jnp.concatenate([
        ddensity,
        ddiff * diff * (1.0 - diff),
        dtint * tint * (1.0 - tint),
        drough,
        dnormals,
        jnp.zeros((ddensity.shape[0], 128 - FH_COLS), f32),
    ], axis=1)  # (H, 128) — FH_* column order
    d_hc = jnp.concatenate([d_heads, dmid_pre], axis=1)  # (H, 256)
    d_hc_b = d_hc.astype(bf16)
    contribs[16] = jax.lax.dot_general(
        hs[-1], d_hc_b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)
    contribs[17] = jnp.sum(d_hc, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        d_hc_b, w_hc[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    # trunk backward.  The relu masks depend only on the (loaded or
    # recomputed) activations, never on the chain — hoist them all
    # upfront so their VPU compares can overlap the serial MXU dgrads.
    masks = [hs[i].astype(f32) > 0.0  # bf16 cmpf unsupported in Mosaic
             for i in range(TRUNK_LAYERS)]
    dx_extra = None
    for i in range(TRUNK_LAYERS - 1, -1, -1):
        inp = hs[i - 1] if i > 0 else x
        if i == SKIP_AT:
            inp = jnp.concatenate([x, hs[i - 1]], axis=-1)
        mask = masks[i]
        dpre = (dh * mask).astype(bf16)
        contribs[i] = jax.lax.dot_general(
            inp, dpre, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        contribs[8 + i] = jnp.sum(dh * mask, axis=0, keepdims=True)
        if i == 0 and not want_dmc:
            break  # layer-0 dgrad only feeds the (dead) IPE backward
        dinp = jax.lax.dot_general(
            dpre, ws[i][:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        if i == SKIP_AT:
            dx_extra = dinp[:, 0:ENC_PAD]
            dh = dinp[:, ENC_PAD:]
        else:
            dh = dinp
    if not want_dmc:
        return None, dg_all, contribs
    dx = dh + (dx_extra if dx_extra is not None else 0.0)  # (H, 128) f32

    # IPE backward: x = M*(damp*sin(pre)) + (1-M)*pre
    cos_pre = _cos2pi(u)
    dpre_enc = dx * (M * damp * cos_pre + (1.0 - M))
    dvar = dx * M * (-0.5) * damp * sin_pre
    dmc = (jax.lax.dot_general(dpre_enc, A, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dvar, V, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    return dmc, dg_all, contribs


_bwd_kernel = functools.partial(_bwd_kernel_impl, False, False, 2)


def _bwd_kernel_noipe(n_halves, xacts_ref, g_ref, dout_ref, fout_ref,
                      E_ref, *refs):
    """No-IPE backward: x + trunk activations come from the v6 spill
    (spill_x layout, XACTS_COLS), dmc is not computed — no mean_cov
    input, no transcendental work at all."""
    from rsn.kernels.field_pallas import ACTS_COLS

    packed = refs[:N_PACKED]
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7,
     w_hc, b_hc, w_out, b_out) = packed
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
    g_rep = jnp.dot(E_ref[:], g_ref[:], preferred_element_type=jnp.float32)
    T = xacts_ref.shape[0]
    H = T // n_halves
    dg_tot = None
    tile_contribs = None
    for p in range(n_halves):
        sl = slice(p * H, (p + 1) * H)
        parts = (xacts_ref[sl, ACTS_COLS:], None, None, None)
        _, dg_all, contribs = _bwd_half(
            parts, g_rep[sl, :], dout_ref[sl, :], fout_ref[sl, :],
            (None,) * 4, ws, bs, w_hc, b_hc, w_out, b_out,
            acts_b=xacts_ref[sl, :ACTS_COLS], want_dmc=False)
        dgp = jax.lax.dot_general(
            E_ref[sl, :], dg_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dg_tot = dgp if dg_tot is None else dg_tot + dgp
        tile_contribs = (contribs if tile_contribs is None else
                         [a + c for a, c in zip(tile_contribs, contribs)])
    for j, c in enumerate(tile_contribs):
        dpacked[j][:] += c
    dg_ref[:] = dg_tot


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "interpret"))
def field_backward_v3(packed, mean_cov, g_bands, d_out, f_out,
                      samples_per_ray,
                      tile: int = DEFAULT_TILE, interpret: bool = False):
    """-> (dmc (N,16), dg (R,512), dpacked tuple matching `packed`).

    The per-ray SH partials enter blocked per-ray and expand to samples
    in-kernel via the one-hot matmul E; dg reduces back per-ray through
    E^T in-kernel (the (N, 512) per-sample dg never touches HBM).
    """
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    n_rays = n // samples_per_ray
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))

    in_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
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

    out_shapes = [
        jax.ShapeDtypeStruct((n, IN_COLS), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, 512), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in packed:  # fp32 accumulators, shapes of the packed operands
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    flops_per_row = 3 * 2 * (ENC_PAD * 256 + 7 * 256 * 256 + SKIP_PAD * 256
                             + 256 * OUT_DIM + 256 * 128 + 128 * 128)
    res = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2) + n_rays * 4096,
            transcendentals=n * 300),
    )(mean_cov, g_bands.astype(jnp.float32), d_out, f_out, *ipe_ops,
      E, *packed)
    return res[0], res[1], tuple(res[2:])


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "inner", "interpret",
                                               "n_halves"))
def field_backward_v4(packed, mean_cov, g_bands, d_out, f_out,
                      samples_per_ray,
                      tile: int = 512, inner: int = 8,
                      interpret: bool = False, n_halves: int = 2):
    """2D-grid recompute-backward: same math as v3, but the fp32 wgrad
    accumulators live per OUTER grid group ((outer, rows, cols) outputs,
    index_map ignoring the inner dim) and are reduced in XLA afterwards.

    v3's whole-grid constant-index accumulators serialize Mosaic's
    cross-iteration pipeline (every step read-modify-writes the same
    block); with the inner dim innermost, accumulation stays VMEM-
    resident within a group while inputs double-buffer, and the flush
    happens once per group (outer * ~2.7 MB of extra HBM writes).
    """
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    n_tiles = n // tile
    inner = max(1, min(inner, n_tiles))
    while n_tiles % inner:
        inner -= 1
    outer = n_tiles // inner
    grid = (outer, inner)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    n_rays = n // samples_per_ray
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))

    def row_map(o, i):
        return (o * inner + i, 0)

    in_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
    ]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(E.shape, lambda o, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((n, IN_COLS), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, 512), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
    ]
    for w in packed:  # per-outer-group fp32 accumulators
        out_shapes.append(
            jax.ShapeDtypeStruct((outer,) + w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape,
                                      lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))

    flops_per_row = 3 * 2 * (ENC_PAD * 256 + 7 * 256 * 256 + SKIP_PAD * 256
                             + 256 * OUT_DIM + 256 * 128 + 128 * 128)
    res = pl.pallas_call(
        functools.partial(_bwd_kernel_impl, True, False, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2) + n_rays * 4096,
            transcendentals=n * 300),
    )(mean_cov, g_bands.astype(jnp.float32), d_out, f_out, *ipe_ops,
      E, *packed)
    dmc, dg = res[0], res[1]
    dpacked = tuple(jnp.sum(a, axis=0) for a in res[2:])
    return dmc, dg, dpacked


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "inner", "interpret",
                                               "n_halves"))
def field_backward_v5(packed, mean_cov, g_bands, acts, d_out, f_out,
                      samples_per_ray, tile: int = 512, inner: int = 8,
                      interpret: bool = False, n_halves: int = 2):
    """Recompute-FREE backward: identical math and grid structure to
    field_backward_v4, but consumes the trunk activations spilled by
    field_pallas.field_forward_v6 (acts: (N, 2048) bf16) instead of
    re-running the trunk forward — removing ~1/3 of the kernel's FLOPs
    and 8 serial MXU links from its dependency chain, for ~512 B/sample
    of extra (double-buffered) HBM reads.
    """
    from rsn.kernels.field_pallas import ACTS_COLS

    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    assert acts.shape == (n, ACTS_COLS), (acts.shape, n)
    n_tiles = n // tile
    inner = max(1, min(inner, n_tiles))
    while n_tiles % inner:
        inner -= 1
    outer = n_tiles // inner
    grid = (outer, inner)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    n_rays = n // samples_per_ray
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))

    def row_map(o, i):
        return (o * inner + i, 0)

    in_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
    ]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(E.shape, lambda o, i: (0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((tile, ACTS_COLS), row_map,
                                 memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda o, i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out_shapes = [
        jax.ShapeDtypeStruct((n, IN_COLS), jnp.float32),
        jax.ShapeDtypeStruct((n_rays, 512), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((tile, IN_COLS), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
    ]
    for w in packed:  # per-outer-group fp32 accumulators
        out_shapes.append(
            jax.ShapeDtypeStruct((outer,) + w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape,
                                      lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))

    # 2x (not 3x): the forward-recompute third is replaced by the spill
    flops_per_row = 2 * 2 * (ENC_PAD * 256 + 7 * 256 * 256 + SKIP_PAD * 256
                             + 256 * OUT_DIM + 256 * 128 + 128 * 128)
    res = pl.pallas_call(
        functools.partial(_bwd_kernel_impl, True, True, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + (V3_OUT + ACTS_COLS) * 2)
            + n_rays * 4096,
            transcendentals=n * 300),
    )(mean_cov, g_bands.astype(jnp.float32), d_out, f_out, *ipe_ops,
      E, acts, *packed)
    dmc, dg = res[0], res[1]
    dpacked = tuple(jnp.sum(a, axis=0) for a in res[2:])
    return dmc, dg, dpacked


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "inner", "interpret",
                                               "n_halves"))
def field_backward_v6(packed, g_bands, xacts, d_out, f_out,
                      samples_per_ray,
                      tile: int = 512, inner: int = 8,
                      interpret: bool = False, n_halves: int = 2):
    """No-IPE recompute-free backward: same grid/accumulator structure
    as field_backward_v5, but consumes the spill_x activations
    (xacts: (N, XACTS_COLS) bf16 from field_forward_v6(spill_x=True))
    and computes NO dmc — for call sites whose mean/cov cotangent is
    provably dead (see _bwd_half want_dmc).  Removes every
    transcendental (both sin/cos polys, exp2), the dvar/dpre_enc
    elementwise chain, the two dmc matmuls, the layer-0 dgrad, and the
    (N, 16) fp32 mean_cov input DMA.  Measured 2.79 -> 2.35 ms at the
    fine-pass shape (tools/exp_bwd_noipe.py).

    -> (dg (R, 512) f32, dpacked tuple matching `packed`).
    """
    from rsn.kernels.field_pallas import XACTS_COLS

    n = xacts.shape[0]
    assert n % tile == 0, (n, tile)
    assert xacts.shape == (n, XACTS_COLS), (xacts.shape, n)
    n_tiles = n // tile
    inner = max(1, min(inner, n_tiles))
    while n_tiles % inner:
        inner -= 1
    outer = n_tiles // inner
    grid = (outer, inner)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    n_rays = n // samples_per_ray
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))

    def row_map(o, i):
        return (o * inner + i, 0)

    in_specs = [
        pl.BlockSpec((tile, XACTS_COLS), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rays_per_tile, 512), row_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, V3_OUT), row_map, memory_space=pltpu.VMEM),
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
    for w in packed:  # per-outer-group fp32 accumulators
        out_shapes.append(
            jax.ShapeDtypeStruct((outer,) + w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape,
                                      lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))

    # 2x: dgrad + wgrad only (no recompute, no IPE)
    flops_per_row = 2 * 2 * (ENC_PAD * 256 + 7 * 256 * 256 + SKIP_PAD * 256
                             + 256 * OUT_DIM + 256 * 128 + 128 * 128)
    res = pl.pallas_call(
        functools.partial(_bwd_kernel_noipe, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (V3_OUT + XACTS_COLS) * 2 + n_rays * 4096,
            transcendentals=0),
    )(xacts, g_bands.astype(jnp.float32), d_out, f_out, E, *packed)
    return res[0], tuple(jnp.sum(a, axis=0) for a in res[1:])


# ---- custom-VJP wrapper -------------------------------------------------
# Takes the fp32 params PYTREE as the differentiable argument so weight
# gradients stay fp32 end-to-end (the kernel's accumulators are fp32);
# dpacked (padded layout) is unpadded back into the tree here.

from rsn.core.encodings import IPE_OUT_DIM as _IPE_DIM


def _unpack_grads(params, dpacked):
    """Map fp32 grads of the FUSED packed operands (pack_params_v3f)
    back onto the params tree.

    The w_hc/b_hc gradients are UNFOLDED into bottleneck / mid_mlp
    gradients by exact chain rule through w_comb = W_bneck @ W_emb and
    b_comb = b_bneck @ W_emb + b_mid:
      dW_bneck = dW_comb @ W_emb^T     db_bneck = db_comb @ W_emb^T
      dW_emb   = W_bneck^T @ dW_comb + b_bneck (outer) db_comb
      db_mid   = db_comb
    Two parameter-shaped fp32 matmuls, done once per step in XLA —
    the 256-wide bottleneck never exists inside the backward kernel.
    Values equal the unfused accumulation up to fp32 reassociation."""
    zeros_like = lambda p: jax.tree.map(jnp.zeros_like, p)
    g: Dict[str, Any] = {"low": zeros_like(params["low"])}
    trunk = []
    for i in range(TRUNK_LAYERS):
        dw = dpacked[i]
        if i == SKIP_AT:
            dw = jnp.concatenate([dw[:_IPE_DIM], dw[ENC_PAD:]], axis=0)
        elif i == 0:
            dw = dw[:_IPE_DIM]
        trunk.append({"w": dw, "b": dpacked[8 + i][0]})
    g["trunk"] = trunk
    dw_hc, db_hc = dpacked[16], dpacked[17][0]  # (256, 256), (256,)
    cols = {"density": (0, 1), "diff": (1, 4), "tint": (4, 7),
            "roughness": (7, 8), "normals": (8, 11)}  # FH_* layout
    for name, (lo, hi) in cols.items():
        g[name] = {"w": dw_hc[:, lo:hi], "b": db_hc[lo:hi]}
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    dw_comb = dw_hc[:, 128:256]
    db_comb = db_hc[128:256]
    wb = params["bottleneck"]["w"].astype(f32)
    bb = params["bottleneck"]["b"].astype(f32)
    w_emb = params["mid_mlp"]["w"][34:].astype(f32)
    g["bottleneck"] = {
        "w": jnp.matmul(dw_comb, w_emb.T, precision=hi),
        "b": jnp.matmul(db_comb, w_emb.T, precision=hi),
    }
    dw_emb = (jnp.matmul(wb.T, dw_comb, precision=hi)
              + bb[:, None] * db_comb[None, :])
    # mid_mlp: encoder rows (0:34) get their grads via the dg chain
    # (mid_g_bands is differentiable XLA code); emb rows unfolded above
    g["mid_mlp"] = {
        "w": jnp.concatenate([
            jnp.zeros((34, dw_emb.shape[1]), f32), dw_emb], axis=0),
        "b": db_comb,
    }
    g["mid"] = {"w": dpacked[18][:, 0:3], "b": dpacked[19][0, 0:3]}
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_field_train(params, mean_cov, g_bands, samples_per_ray,
                      tile=DEFAULT_TILE, want_normals=False,
                      save_acts=False, want_dmc=True):
    """Fused field forward with a recompute (or spill) backward.

    want_normals=True runs the v4 forward (cols V4_DPDM carry
    d density_preact/d mean for the analytic-normals target; that chain
    is stop_gradient by construction — the backward ignores those
    cotangent columns, matching the reference where normals are a
    detached regularization target, model.py:250-251).  Cols V3_MIDVAL
    (the stored per-sample mid value consumed by the out-fed backward)
    are equally auxiliary: their cotangents are ignored — callers must
    not route live gradients through cols [14:20).

    save_acts=True (differentiated path only) runs the v6 forward,
    which spills the trunk activations to HBM, and the recompute-free
    field_backward_v5 — trading ~1 GB/step of double-buffered HBM
    traffic for 1/3 of the backward's FLOPs.  Values and gradients are
    identical either way (the spilled bf16 activations equal the
    recomputed ones bit for bit).

    want_dmc=False is a CALLER CONTRACT that the mean_cov cotangent is
    dead (primary passes with the camera optimizer off: sample
    positions are detached PDF bins over leaf rays).  The backward then
    returns zeros for dmc, and with save_acts the no-IPE kernel runs
    (field_backward_v6: x spilled by the forward, no transcendental
    recompute, no dmc matmuls — measured -15% at the fine shape).
    Passing False while mean_cov is live silently zeroes those
    gradients — thread it only from rsn.models.model's rays_live logic.
    """
    from rsn.kernels.field_pallas import (field_forward_v4,
                                          pack_params_v3f, pack_params_v4f)

    if want_normals:
        # tile stays >= 8*samples_per_ray: the per-ray g_bands block
        # needs >= 8 sublanes (Mosaic tiling constraint)
        return field_forward_v4(pack_params_v4f(params), mean_cov, g_bands,
                                samples_per_ray, tile)
    return field_forward_v3(pack_params_v3f(params), mean_cov, g_bands,
                            samples_per_ray, tile)


def _fwd(params, mean_cov, g_bands, samples_per_ray, tile, want_normals,
         save_acts, want_dmc):
    if save_acts:
        from rsn.kernels.field_pallas import (pack_params_v3f,
                                              pack_params_v4f)
        packed = (pack_params_v4f(params) if want_normals
                  else pack_params_v3f(params))
        out, acts = field_forward_v6(packed, mean_cov, g_bands,
                                     samples_per_ray, tile, want_normals,
                                     spill_x=not want_dmc)
        return out, (params, mean_cov, g_bands, acts, out)
    out = fused_field_train(params, mean_cov, g_bands, samples_per_ray,
                            tile, want_normals, save_acts, want_dmc)
    return out, (params, mean_cov, g_bands, None, out)


def bwd_rays_per_tile(tile, samples_per_ray):
    """Rays per backward tile, given the FORWARD tile (rows).

    r5: the FOLDED backward's live set is small enough that 2048-row
    tiles win (tile=2048/inner=8: 2.10 ms vs 1024/16: 2.17 ms at the
    fine train shape, tools/exp_r5_sweep.py min-of-3; the pre-fold
    kernel regressed at 2048 from VMEM pressure).  Constraints: the
    per-ray dg block needs >=8 sublanes (8 rays/tile), and the backward
    tile must DIVIDE the row count — which the caller pads to a
    multiple of the forward tile — so pick the largest divisor of the
    forward rays-per-tile that fits the ~2048-row budget (falling back
    to the forward tile itself, e.g. samples_per_ray 96 where no
    divisor of 21 is >= 8).
    """
    rays_fwd = tile // samples_per_ray
    target = max(1, min(tile, 2048) // samples_per_ray)
    return next((d for d in range(min(rays_fwd, target), 0, -1)
                 if rays_fwd % d == 0 and d >= 8), rays_fwd)


def _bwd(samples_per_ray, tile, want_normals, save_acts, want_dmc, res,
         d_out):
    params, mean_cov, g_bands, acts, f_out = res
    packed = pack_params_v3f(params)
    rays_per_tile_bwd = bwd_rays_per_tile(tile, samples_per_ray)
    tile_bwd = samples_per_ray * rays_per_tile_bwd
    if acts is not None and not want_dmc:
        dg, dpacked = field_backward_v6(
            packed, g_bands, acts, d_out.astype(jnp.bfloat16), f_out,
            samples_per_ray, tile_bwd)
        dmc = jnp.zeros_like(mean_cov)  # dead by caller contract
    elif acts is not None:
        dmc, dg, dpacked = field_backward_v5(
            packed, mean_cov, g_bands, acts, d_out.astype(jnp.bfloat16),
            f_out, samples_per_ray, tile_bwd)
    else:
        dmc, dg, dpacked = field_backward_v4(
            packed, mean_cov, g_bands, d_out.astype(jnp.bfloat16), f_out,
            samples_per_ray, tile_bwd)
    return _unpack_grads(params, dpacked), dmc, dg


fused_field_train.defvjp(_fwd, _bwd)
