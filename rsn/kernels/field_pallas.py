"""Fused field-forward Pallas TPU kernel: trunk (8x256, skip@4) + ALL
heads in one pass, activations resident in VMEM.

Why: the XLA trunk is HBM-bandwidth-bound — 8 layers round-trip a
(N, 256) activation through HBM per layer (~17 GB at 4M samples,
~25 ms), while the MXU work is only ~6 ms.  Fusing the whole field
forward keeps every intermediate in VMEM; HBM traffic drops to one read
of the (N, 128) padded IPE encoding plus one write of the (N, 384)
combined output (bottleneck ++ raw head pre-activations).

Layout of the combined output (bf16), see OUT_* constants:
  [0:256)   bottleneck embedding (raw linear, feeds the mid-MLP)
  [256]     density pre-activation
  [257:260) diff head (pre-sigmoid)
  [260:263) tint head (pre-sigmoid)
  [263]     roughness head (raw)
  [264:267) pred-normals head (raw linear; negate+normalize outside)
  [267:384) zero padding (lane alignment)

Head semantics mirror rsn.models.field (reference field.py:54-86); the
`low` head is excluded (dead code, kept only in the checkpoint tree).

Training uses a custom VJP whose backward re-derives gradients via the
XLA path (recompute); the forward (eval/render hot path) runs here.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.core.encodings import IPE_OUT_DIM  # 99
from rsn.models.field import SKIP_AT, TRUNK_LAYERS, TRUNK_WIDTH

ENC_PAD = 128  # 99 -> 128 lanes
SKIP_PAD = ENC_PAD + TRUNK_WIDTH  # 384
OUT_DIM = 384  # 267 useful columns -> 384 lanes
OUT_BOTTLENECK = slice(0, 256)
OUT_DENSITY = 256
OUT_DIFF = slice(257, 260)
OUT_TINT = slice(260, 263)
OUT_ROUGH = 263
OUT_NORMALS = slice(264, 267)
N_HEAD_COLS = 267

DEFAULT_TILE = 2048


def pack_params(params: Dict[str, Any]):
    """Pad + cast the field params into the kernel's operand list.

    Weights bf16 (zero-padded), biases fp32 rows of shape (1, width).
    Returns a flat tuple (w0..w7, b0..b7, wh, bh).
    """
    def pad_to(x, rows, cols):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    ws, bs = [], []
    for i, layer in enumerate(params["trunk"]):
        w = layer["w"]
        rows = ENC_PAD if i == 0 else (SKIP_PAD if i == SKIP_AT
                                       else TRUNK_WIDTH)
        if i == SKIP_AT:
            # our skip concat order is [enc, h] (nerfstudio MLP order);
            # rows of w: first IPE_OUT_DIM for enc, then TRUNK_WIDTH for h.
            w_enc = w[:IPE_OUT_DIM]
            w_h = w[IPE_OUT_DIM:]
            w = jnp.concatenate([
                jnp.pad(w_enc, ((0, ENC_PAD - IPE_OUT_DIM), (0, 0))), w_h],
                axis=0)
        ws.append(pad_to(w, rows, TRUNK_WIDTH).astype(jnp.bfloat16))
        bs.append(layer["b"].reshape(1, -1).astype(jnp.float32))

    head_ws = [params["bottleneck"]["w"], params["density"]["w"],
               params["diff"]["w"], params["tint"]["w"],
               params["roughness"]["w"], params["normals"]["w"]]
    head_bs = [params["bottleneck"]["b"], params["density"]["b"],
               params["diff"]["b"], params["tint"]["b"],
               params["roughness"]["b"], params["normals"]["b"]]
    wh = jnp.concatenate(head_ws, axis=1)  # (256, 267)
    bh = jnp.concatenate(head_bs, axis=0)  # (267,)
    wh = pad_to(wh, TRUNK_WIDTH, OUT_DIM).astype(jnp.bfloat16)
    bh = jnp.pad(bh, (0, OUT_DIM - N_HEAD_COLS)).reshape(1, -1).astype(
        jnp.float32)
    return tuple(ws) + tuple(bs) + (wh, bh)


def _kernel(enc_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)

    x = enc_ref[:]  # (T, 128) bf16
    h = x
    for i in range(TRUNK_LAYERS):
        if i == SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)  # (T, 384)
        acc = jnp.dot(h, ws[i][:], preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(jnp.bfloat16)
    out = jnp.dot(h, wh[:], preferred_element_type=jnp.float32) + bh[:]
    out_ref[:] = out.astype(jnp.bfloat16)


# ---- v2: IPE fused into the kernel -------------------------------------
# Input is the raw (mean, cov_diag) pair packed as (N, 16) fp32 — the
# (N, 99) fp32 IPE encoding never touches HBM (measured: the XLA-side
# IPE materialization + pad-to-128 cast cost as much as the whole
# trunk).  The integrated positional encoding (sin + variance damping)
# runs on the VPU in VMEM.

IN_COLS = 16  # [mean(3) | cov_diag(3) | zero pad]


def ipe_matrices():
    """Constant operands that turn the in-kernel IPE into two small
    matmuls + wide VPU ops (narrow (T,1)x(1,16) column broadcasts were
    measured to halve kernel throughput).

    A  (16, 128): mc @ A = sin arguments — cols [d*16+k] and
                  [48+d*16+k] get 2*pi*f_k*mean_d; cols 96..98 get
                  mean_d (identity pass-through).
    bA (1, 128):  +pi/2 on the cos half [48:96).
    V  (16, 128): mc @ V = f_k^2-scaled variances on the two halves.
    M  (1, 128):  1.0 where expected-sin applies ([0:96)), 0 on the
                  identity/pad tail.
    Output layout matches rsn.core.encodings.ipe_encode:
    [sin(48) | cos(48) | mean(3) | pad(29)] (variance intentionally not
    (2*pi)^2-scaled — nerfstudio quirk).
    """
    import numpy as np
    freqs = (2.0 ** np.linspace(0.0, 16.0, 16)).astype(np.float64)
    A = np.zeros((IN_COLS, 128), np.float32)
    V = np.zeros((IN_COLS, 128), np.float32)
    bA = np.zeros((1, 128), np.float32)
    M = np.zeros((1, 128), np.float32)
    for d in range(3):
        for k in range(16):
            c = d * 16 + k
            A[d, c] = 2.0 * np.pi * freqs[k]
            A[d, 48 + c] = 2.0 * np.pi * freqs[k]
            V[3 + d, c] = freqs[k] ** 2
            V[3 + d, 48 + c] = freqs[k] ** 2
        A[d, 96 + d] = 1.0
    bA[0, 48:96] = np.pi / 2.0
    M[0, 0:96] = 1.0
    return (jnp.asarray(A), jnp.asarray(bA), jnp.asarray(V),
            jnp.asarray(M))


def _ipe_in_kernel(mc, A, bA, V, M):
    """(T, 16) fp32 [mean|cov_diag] -> (T, 128) bf16 padded encoding."""
    pre = jnp.dot(mc, A, preferred_element_type=jnp.float32) + bA
    var = jnp.dot(mc, V, preferred_element_type=jnp.float32)
    sin_part = jnp.exp(-0.5 * var) * jnp.sin(pre)
    enc = M * sin_part + (1.0 - M) * pre
    return enc.astype(jnp.bfloat16)


def _kernel_v2(mc_ref, A_ref, bA_ref, V_ref, M_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)

    x = _ipe_in_kernel(mc_ref[:], A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    h = x
    for i in range(TRUNK_LAYERS):
        if i == SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)  # (T, 384)
        acc = jnp.dot(h, ws[i][:], preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(jnp.bfloat16)
    out = jnp.dot(h, wh[:], preferred_element_type=jnp.float32) + bh[:]
    out_ref[:] = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("tile",))
def field_forward_v2(packed, mean_cov: jax.Array,
                     tile: int = DEFAULT_TILE):
    """mean_cov: (N, 16) fp32 [mean(3)|cov_diag(3)|pad] -> (N, 384) bf16
    combined field output (same layout as `field_forward`)."""
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    ipe_ops = ipe_matrices()
    in_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops_per_row = 2 * (ENC_PAD * 256 + 3 * 256 * 256 + SKIP_PAD * 256
                         + 3 * 256 * 256 + 256 * OUT_DIM)
    return pl.pallas_call(
        _kernel_v2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, OUT_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUT_DIM), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + OUT_DIM * 2),
            transcendentals=n * 192),
    )(mean_cov, *ipe_ops, *packed)


@functools.partial(jax.jit, static_argnames=("tile",))
def field_forward(packed, enc: jax.Array, tile: int = DEFAULT_TILE):
    """enc: (N, 128) bf16 padded IPE encoding -> (N, 384) bf16 combined
    field output (see module docstring for the column layout)."""
    n = enc.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    in_specs = [pl.BlockSpec((tile, ENC_PAD), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops_per_row = 2 * (ENC_PAD * 256 + 3 * 256 * 256 + SKIP_PAD * 256
                         + 3 * 256 * 256 + 256 * OUT_DIM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, OUT_DIM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUT_DIM), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (ENC_PAD + OUT_DIM) * 2,
            transcendentals=0),
    )(enc, *packed)


# ---- v3: full field + directional (mid) branch in one kernel -----------
# Adds the factored mid-MLP (see rsn.models.field.get_mid_factored): the
# per-ray SH-band partial products G = basis_band @ W_enc_band enter as a
# small (R, 4*128) operand; roughness attenuation exp(-softplus(r)*k) and
# the whole mid branch run in VMEM.  The bottleneck embedding never
# touches HBM.  Output shrinks to (N, 128) bf16:
#   [0:3) mid_out = diff + tint*mid   [3:6) diff   [6:9) tint
#   [9:12) pred-normals raw           [12] density pre-activation
#   [13] roughness raw                [14:128) zero pad

V3_OUT = 128
# narrow store for the eval/render path: only cols [0, 14) carry data,
# so the kernel emits 16 columns (sublane-even) instead of the padded
# 128 — 8x less HBM write traffic, identical values (field_forward_v3's
# out_cols).  Train-path kernels keep V3_OUT (dmc cols + acts layout).
V3_EVAL_COLS = 16
V3_MID = slice(0, 3)
V3_DIFF = slice(3, 6)
V3_TINT = slice(6, 9)
V3_NORMALS = slice(9, 12)
V3_DENSITY = 12
V3_ROUGH = 13
_BAND_KS = (1.0, 3.0, 10.0, 36.0)


def pack_params_v3(params: Dict[str, Any]):
    """v2 operands + mid-MLP emb-half and mid head (bf16-padded).

    This is the UNFUSED packing — the recompute-backward kernel needs
    the bottleneck head separate (its wgrad and the w_emb wgrad are
    distinct outputs).  The forward kernels use pack_params_v3f.
    """
    base = pack_params(params)
    w_emb = params["mid_mlp"]["w"][34:]  # (256, 128), ISH rows excluded
    b_mid = params["mid_mlp"]["b"].reshape(1, -1).astype(jnp.float32)
    w_out = jnp.pad(params["mid"]["w"], ((0, 0), (0, 125))).astype(
        jnp.bfloat16)  # (128, 3) -> (128, 128)
    b_out = jnp.pad(params["mid"]["b"], (0, 125)).reshape(1, -1).astype(
        jnp.float32)
    return base + (w_emb.astype(jnp.bfloat16), b_mid, w_out, b_out)


# fused-forward head column layout (pack_params_v3f 11-col heads matmul)
FH_DENSITY = 0
FH_DIFF = slice(1, 4)
FH_TINT = slice(4, 7)
FH_ROUGH = 7
FH_NORMALS = slice(8, 11)
FH_COLS = 11


def pack_params_v3f(params: Dict[str, Any]):
    """Fused-FORWARD packing: the bottleneck head is folded into the
    mid-MLP embedding half (w_comb = W_bneck @ W_emb, folded in fp32),
    so the 256-wide bottleneck never materializes in the kernel and the
    heads matmul shrinks from 384 to 128 columns (11 useful: density,
    diff, tint, roughness, normals) — ~10% fewer forward FLOPs.  The
    heads block and w_comb share the trunk output h, so they ship as
    ONE (256, 256) operand w_hc = [whs | w_comb]: a single full-width
    MXU matmul replaces two 128-wide ones (one less serial link, better
    MXU tiling; VERDICT r4 "pack heads into fewer, wider ops").

    Returns ws(8) + bs(8) + (w_hc, b_hc, w_out, b_out); in-kernel
    heads = (h @ w_hc)[:, 0:128] (FH_* layout), mid_pre seed =
    (h @ w_hc)[:, 128:256].
    """
    f32 = jnp.float32
    base = pack_params(params)
    ws, bs = base[:8], base[8:16]
    head_ws = [params["density"]["w"], params["diff"]["w"],
               params["tint"]["w"], params["roughness"]["w"],
               params["normals"]["w"]]
    head_bs = [params["density"]["b"], params["diff"]["b"],
               params["tint"]["b"], params["roughness"]["b"],
               params["normals"]["b"]]
    whs = jnp.concatenate(head_ws, axis=1)  # (256, 11)
    bhs = jnp.concatenate(head_bs, axis=0)  # (11,)
    whs = jnp.pad(whs, ((0, 0), (0, 128 - FH_COLS))).astype(jnp.bfloat16)
    bhs = jnp.pad(bhs, (0, 128 - FH_COLS)).reshape(1, -1).astype(f32)
    wb = params["bottleneck"]["w"].astype(f32)  # (256, 256)
    bb = params["bottleneck"]["b"].astype(f32)  # (256,)
    w_emb = params["mid_mlp"]["w"][34:].astype(f32)  # (256, 128)
    b_mid = params["mid_mlp"]["b"].astype(f32)  # (128,)
    w_comb = (wb @ w_emb).astype(jnp.bfloat16)  # (256, 128)
    b_comb = (bb @ w_emb + b_mid).reshape(1, -1).astype(f32)
    w_hc = jnp.concatenate([whs, w_comb], axis=1)  # (256, 256)
    b_hc = jnp.concatenate([bhs, b_comb], axis=1)  # (1, 256)
    w_out = jnp.pad(params["mid"]["w"], ((0, 0), (0, 125))).astype(
        jnp.bfloat16)
    b_out = jnp.pad(params["mid"]["b"], (0, 125)).reshape(1, -1).astype(f32)
    return ws + bs + (w_hc, b_hc, w_out, b_out)


N_HALVES = 2  # half-tile body: BOTH halves' IPE front-ends (the VPU
# transcendentals — the single largest non-matmul cost, ~0.4ms/131k
# samples) are issued upfront so Mosaic overlaps them with the first
# half's MXU trunk (measured 1.19 -> 0.97 ms at tile 2048); the small
# per-half live set also lets the recompute-backward fit VMEM at
# larger tiles.


_INV_2PI = 0.15915494309189535
_HALF_LOG2E = 0.7213475204444817  # 0.5 / ln 2


def _sin2pi(u):
    """sin(2*pi*u) for wrapped u in [-1/2, 1/2]: odd poly, fp32-exact
    (max err 4.5e-7).  XLA's exact sin pays Payne-Hanek range reduction
    on the huge 2^j-scaled IPE arguments (~2x slower, and the fp32
    argument itself already carries >2*pi of rounding error at the top
    octaves, so the "exact" phase is equally meaningless there)."""
    w = u * u
    p = -12.2688402
    for c in (41.2037313, -76.5796851, 81.5961385, -41.3414194,
              6.28318279):
        p = p * w + c
    return p * u


def _cos2pi(u):
    """cos(2*pi*u) for wrapped u in [-1/2, 1/2]: even poly, fp32-exact
    (max err 3.3e-7)."""
    w = u * u
    p = 6.52864918
    for c in (-25.9675931, 60.1676294, -85.4501393, 64.9391175,
              -19.7392045, 0.999999989):
        p = p * w + c
    return p


def _ipe_parts(mc, ipe):
    """In-kernel IPE -> (x bf16, pre_enc f32, damp f32, u f32) where u
    is the wrapped phase in turns (pre_enc/2pi mod 1) — the backward /
    v4 dgrad chains evaluate sin/cos from it via the cheap polys."""
    f32 = jnp.float32
    A, bA, V, M = ipe
    pre_enc = jnp.dot(mc, A, preferred_element_type=f32) + bA
    var = jnp.dot(mc, V, preferred_element_type=f32)
    damp = jnp.exp2(-_HALF_LOG2E * var)  # = exp(-var/2), cheaper
    u = pre_enc * _INV_2PI
    u = u - jnp.round(u)
    x = (M * (damp * _sin2pi(u))
         + (1.0 - M) * pre_enc).astype(jnp.bfloat16)
    return x, pre_enc, damp, u


def _field_half(parts, g_rep, ipe, ws, bs, w_hc, b_hc,
                w_out, b_out, wd_row=None, want_acts=False,
                out_width: int = V3_OUT):
    """Forward body for one half-tile -> (T/2, out_width) fp32 columns.

    parts: the half's precomputed IPE (x, pre_enc, damp).  Operands use
    the fused pack_params_v3f layout: the bottleneck head is folded into
    the mid-MLP, and the heads + mid seed ship as one (256, 256) matmul
    w_hc (cols [0:128) = FH_* heads, [128:256) = mid_pre seed).  With
    wd_row (v4), also runs the in-VMEM analytic-normals dgrad chain and
    fills cols V4_DPDM with d density_preact/d mean.  With want_acts
    (v6), additionally returns the post-relu trunk activations hs (list
    of 8 (T/2, 256) bf16) so the caller can spill them to HBM for a
    recompute-free backward.
    """
    f32, bf16 = jnp.float32, jnp.bfloat16
    A, bA, V, M = ipe
    x, pre_enc, damp, u = parts

    hs = []
    h = x
    for i in range(TRUNK_LAYERS):
        if i == SKIP_AT:
            h = jnp.concatenate([x, h], axis=-1)
        acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
        if wd_row is not None or want_acts:
            hs.append(h)
    hc = jnp.dot(h, w_hc[:], preferred_element_type=f32) + b_hc[:]
    heads = hc[:, 0:128]
    density_pre = heads[:, 0:1]
    diff = jax.nn.sigmoid(heads[:, 1:4])
    tint = jax.nn.sigmoid(heads[:, 4:7])
    rough_raw = heads[:, 7:8]
    normals_raw = heads[:, 8:11]

    rough_sp = jax.nn.softplus(rough_raw)
    mid_pre = hc[:, 128:256]
    for bi, k in enumerate(_BAND_KS):
        band_rep = g_rep[:, bi * 128:(bi + 1) * 128]
        mid_pre = mid_pre + jnp.exp(-rough_sp * k) * band_rep
    hmid = jnp.maximum(mid_pre, 0.0).astype(bf16)
    mid = jax.nn.sigmoid(
        jnp.dot(hmid, w_out[:], preferred_element_type=f32)
        + b_out[:])[:, 0:3]
    mid_out = diff + tint * mid

    if wd_row is None:
        if out_width >= 24:
            # train-width store: mid at V3_MIDVAL so the OUT-FED
            # backward can skip the tail recompute (r5); cols 14:17
            # (dpdm) stay zero in the no-normals variant
            zeros3 = jnp.zeros((x.shape[0], 3), f32)
            zeros = jnp.zeros((x.shape[0], out_width - 20), f32)
            out = jnp.concatenate([mid_out, diff, tint, normals_raw,
                                   density_pre, rough_raw, zeros3, mid,
                                   zeros], axis=1)
        else:
            zeros = jnp.zeros((x.shape[0], out_width - 14), f32)
            out = jnp.concatenate([mid_out, diff, tint, normals_raw,
                                   density_pre, rough_raw, zeros], axis=1)
        return (out, hs) if want_acts else out

    # fused analytic-normals dgrad: d density_pre / d mean
    dh = jnp.broadcast_to(wd_row[:], hs[-1].shape).astype(f32)
    dx_extra = None
    for i in range(TRUNK_LAYERS - 1, -1, -1):
        mask = hs[i].astype(f32) > 0.0  # bf16 cmp unsupported in Mosaic
        dpre = (dh * mask).astype(bf16)
        dinp = jax.lax.dot_general(
            dpre, ws[i][:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        if i == SKIP_AT:
            dx_extra = dinp[:, 0:ENC_PAD]
            dh = dinp[:, ENC_PAD:]
        else:
            dh = dinp
    dx = dh + dx_extra
    dpre_enc = dx * (M * damp * _cos2pi(u) + (1.0 - M))
    dmc = jax.lax.dot_general(dpre_enc, A, (((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    zeros = jnp.zeros((x.shape[0], out_width - 20), f32)
    out = jnp.concatenate([mid_out, diff, tint, normals_raw, density_pre,
                           rough_raw, dmc[:, 0:3], mid, zeros], axis=1)
    return (out, hs) if want_acts else out


def _field_kernel_halved(want_normals, n_halves, mc_ref, g_ref, A_ref,
                         bA_ref, V_ref, M_ref, E_ref, *refs):
    if want_normals:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, wd_row, out_ref) = refs
    else:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, out_ref) = refs
        wd_row = None
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])

    # per-ray G bands broadcast to samples via the one-hot expansion
    # matmul E (narrow repeats are VPU-hostile)
    g_rep = jnp.dot(E_ref[:], g_ref[:],
                    preferred_element_type=jnp.float32)  # (T, 512)
    T = mc_ref.shape[0]
    H = T // n_halves
    # all halves' VPU-heavy IPE upfront: overlaps half 0's MXU trunk
    parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
             for p in range(n_halves)]
    for p in range(n_halves):
        out = _field_half(parts[p],
                          g_rep[p * H:(p + 1) * H, :], ipe, ws, bs,
                          w_hc, b_hc, w_out, b_out, wd_row,
                          out_width=out_ref.shape[1])
        out_ref[p * H:(p + 1) * H, :] = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "interpret", "out_cols",
                                               "n_halves"))
def field_forward_v3(packed, mean_cov: jax.Array, g_bands: jax.Array,
                     samples_per_ray: int, tile: int = DEFAULT_TILE,
                     interpret: bool = False, out_cols: int = V3_OUT,
                     n_halves: int = N_HALVES):
    """Full fused field+mid forward.

    packed: pack_params_v3f operands (fused bottleneck/mid tail).
    mean_cov: (N, 16) fp32; g_bands: (R, 512) fp32 per-ray SH partials
    (4 bands x 128); N = R * samples_per_ray.  -> (N, out_cols) bf16.

    out_cols: width of the emitted output (>= 14; default the padded
    V3_OUT).  The eval/render path passes V3_EVAL_COLS: only cols
    [0, 14) carry data (V3_MID..V3_ROUGH), so a narrow store cuts the
    kernel's HBM write (and the composites' read) 8x — ~1 GB per 16k-ray
    render chunk at S=128.  Identical values in the kept columns.
    """
    n = mean_cov.shape[0]
    # >= 14 so every live column (V3_MID..V3_ROUGH) fits; multiple of 8
    # to honor TPU lane tiling on the bf16 store (ADVICE r3: an invalid
    # width used to surface as an opaque negative-dim error in-kernel)
    assert out_cols >= 14 and out_cols % 8 == 0, out_cols
    assert n % tile == 0, (n, tile)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    import numpy as np
    ipe_ops = ipe_matrices()
    # one-hot sample-expansion matrix: E[t, r] = 1 iff sample t belongs
    # to in-tile ray r
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
                         + 3 * 256 * 256 + 2 * 256 * 128 + 128 * 128)
    return pl.pallas_call(
        functools.partial(_field_kernel_halved, False, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=pl.BlockSpec((tile, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_cols), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + out_cols * 2) + 512 * 4 * (
                n // samples_per_ray),
            transcendentals=n * 200),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


# ---- density-only eval forward -----------------------------------------
# The parity eval coarse pass feeds ONLY the PDF resampler (plus
# accumulation/depth, both functions of density) when the caller does
# not consume mid_rgb_coarse — product-image renders (rsn-render
# orbit/path/video, the viewer) never do (VERDICT r4 #2: output-aware
# coarse kernel).  This kernel runs IPE + trunk + the density column
# alone: no heads matmul, no mid branch, no g_bands expansion, no
# sigmoid/softplus/exp tail — ~13% fewer FLOPs than v3 and a far
# shorter serial tail, at an 8-column store.

DENS_COLS = 8  # col 0 = density pre-activation; 8 for sublane tiling


def pack_params_density(params: Dict[str, Any]):
    """Trunk operands + the density head as a padded (256, 8) matmul."""
    base = pack_params(params)
    ws, bs = base[:8], base[8:16]
    wd = jnp.pad(params["density"]["w"],
                 ((0, 0), (0, DENS_COLS - 1))).astype(jnp.bfloat16)
    bd = jnp.pad(params["density"]["b"],
                 (0, DENS_COLS - 1)).reshape(1, -1).astype(jnp.float32)
    return ws + bs + (wd, bd)


def _density_kernel(mc_ref, A_ref, bA_ref, V_ref, M_ref, *refs):
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wd, bd, out_ref) = refs
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    f32, bf16 = jnp.float32, jnp.bfloat16

    T = mc_ref.shape[0]
    H = T // N_HALVES
    parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
             for p in range(N_HALVES)]
    for p in range(N_HALVES):
        x = parts[p][0]
        h = x
        for i in range(TRUNK_LAYERS):
            if i == SKIP_AT:
                h = jnp.concatenate([x, h], axis=-1)
            acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
            h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
        out = jnp.dot(h, wd[:], preferred_element_type=f32) + bd[:]
        out_ref[p * H:(p + 1) * H, :] = out.astype(bf16)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def field_forward_density(packed, mean_cov: jax.Array,
                          tile: int = DEFAULT_TILE,
                          interpret: bool = False):
    """mean_cov (N, 16) fp32 -> (N, DENS_COLS) bf16, col 0 = density
    pre-activation (bit-identical to field_forward_v3's V3_DENSITY
    column — same IPE, trunk, and head-column accumulation)."""
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    ipe_ops = ipe_matrices()
    in_specs = [pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops_per_row = 2 * (ENC_PAD * 256 + 3 * 256 * 256 + SKIP_PAD * 256
                         + 3 * 256 * 256 + 256 * DENS_COLS)
    return pl.pallas_call(
        _density_kernel,
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=pl.BlockSpec((tile, DENS_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, DENS_COLS), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + DENS_COLS * 2),
            transcendentals=n * 200),
    )(mean_cov, *ipe_ops, *packed)


# ---- v4: v3 + fused analytic-normals gradient --------------------------
# Training needs the analytic normals target -normalize(d preact / d mean)
# (reference field.py:125-147).  The XLA path computes it as a separate
# jax.grad = one more forward + one dgrad backward through the trunk,
# round-tripping activations through HBM.  Here the dgrad chain runs in
# the SAME kernel invocation on the VMEM-resident activations: cotangent
# seeded with the density head row, backprop through the 8 relu/matmul
# layers and the IPE, emit d preact/d mean in out cols [14:17).
# Costs ~1x extra forward FLOPs; saves the entire separate XLA pass.

V4_DPDM = slice(14, 17)
# per-sample mid (directional rgb BEFORE the diff + tint*mid composite),
# stored at train widths (out_cols >= 24) so the out-fed backward can
# skip its tail recompute entirely (r5); zeros at eval widths
V3_MIDVAL = slice(17, 20)


def pack_params_v4f(params: Dict[str, Any]):
    """v3f operands + the density head row as a (1, 256) fp32 operand
    (slicing a lane column + transposing inside the kernel is
    Mosaic-hostile; precomputing it is free)."""
    wd_row = params["density"]["w"].reshape(1, TRUNK_WIDTH).astype(
        jnp.float32)
    return pack_params_v3f(params) + (wd_row,)


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "interpret", "n_halves"))
def field_forward_v4(packed, mean_cov: jax.Array, g_bands: jax.Array,
                     samples_per_ray: int, tile: int = DEFAULT_TILE,
                     interpret: bool = False, n_halves: int = N_HALVES):
    """v3 forward + fused analytic-normals gradient.

    packed: pack_params_v4f operands.  -> (N, 128) bf16 with the v3
    layout plus d density_preact/d mean in cols V4_DPDM.
    """
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    import numpy as np
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
    # forward + one dgrad chain ~= 2x the v3 flops
    flops_per_row = 2 * 2 * (ENC_PAD * 256 + 3 * 256 * 256 + SKIP_PAD * 256
                             + 3 * 256 * 256 + 2 * 256 * 128 + 128 * 128)
    return pl.pallas_call(
        functools.partial(_field_kernel_halved, True, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2) + 512 * 4 * (
                n // samples_per_ray),
            transcendentals=n * 300),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


# ---- v6: v3/v4 forward + trunk-activation spill -------------------------
# The recompute-backward (field_train) re-runs the trunk forward per
# tile — 1x of its 3x FLOPs.  v6 instead writes the post-relu trunk
# activations (8 x 256 bf16 = 512 B/sample) to HBM as a second output;
# the paired backward (field_backward_v5) loads them and skips the
# recompute entirely.  The activations are already live in VMEM here, so
# the forward pays only the output DMA (~8 MB/tile at tile 2048,
# double-buffered under the MXU chain); the trade is ~1.1 GB/step of
# extra HBM traffic for ~1/3 of the backward's serial MXU chain.

ACTS_COLS = TRUNK_LAYERS * TRUNK_WIDTH  # 2048
# spill_x layout: the padded IPE encoding x appended after the 8 layers
# (consumed by the no-IPE backward, field_train.field_backward_v6)
XACTS_COLS = ACTS_COLS + ENC_PAD  # 2176


def _field_kernel_halved_acts(want_normals, spill_x, n_halves, mc_ref,
                              g_ref, A_ref, bA_ref, V_ref, M_ref, E_ref,
                              *refs):
    if want_normals:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, wd_row, out_ref, acts_ref) = refs
    else:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, out_ref, acts_ref) = refs
        wd_row = None
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])

    g_rep = jnp.dot(E_ref[:], g_ref[:],
                    preferred_element_type=jnp.float32)  # (T, 512)
    T = mc_ref.shape[0]
    H = T // n_halves
    parts = [_ipe_parts(mc_ref[p * H:(p + 1) * H, :], ipe)
             for p in range(n_halves)]
    for p in range(n_halves):
        sl = slice(p * H, (p + 1) * H)
        out, hs = _field_half(parts[p], g_rep[sl, :], ipe, ws, bs,
                              w_hc, b_hc, w_out, b_out, wd_row,
                              want_acts=True)
        out_ref[sl, :] = out.astype(jnp.bfloat16)
        cols = hs + [parts[p][0]] if spill_x else hs
        acts_ref[sl, :] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                             "want_normals", "interpret",
                                             "spill_x", "n_halves"))
def field_forward_v6(packed, mean_cov: jax.Array, g_bands: jax.Array,
                     samples_per_ray: int, tile: int = DEFAULT_TILE,
                     want_normals: bool = False, interpret: bool = False,
                     spill_x: bool = False, n_halves: int = N_HALVES):
    """v3/v4 forward that additionally spills the trunk activations.

    packed: pack_params_v3f (want_normals=False) or pack_params_v4f
    (True).  -> (out (N, 128) bf16 — identical to v3/v4 — and
    acts (N, 2048) bf16: the 8 post-relu trunk layers concatenated,
    consumed by field_train.field_backward_v5).  With spill_x, the
    padded IPE encoding x is appended (acts (N, 2176)) so the no-IPE
    backward (field_backward_v6, used when dmc is dead) needs no
    transcendental recompute at all.
    """
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    import numpy as np
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
    mult = 2 if want_normals else 1
    acts_cols = XACTS_COLS if spill_x else ACTS_COLS
    flops_per_row = mult * 2 * (ENC_PAD * 256 + 3 * 256 * 256
                                + SKIP_PAD * 256 + 3 * 256 * 256
                                + 2 * 256 * 128 + 128 * 128)
    return pl.pallas_call(
        functools.partial(_field_kernel_halved_acts, want_normals,
                          spill_x, n_halves),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=[
            pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, acts_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, acts_cols), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + (V3_OUT + acts_cols) * 2)
            + 512 * 4 * (n // samples_per_ray),
            transcendentals=n * (300 if want_normals else 200)),
    )(mean_cov, g_bands, *ipe_ops, E, *packed)


# ---- v5: cross-grid-step software pipelining ---------------------------
# v3/v4 still serialize HALF the IPE front-end per tile: both halves'
# VPU transcendentals are issued upfront, so half 1's polys hide under
# half 0's MXU trunk, but half 0's polys have nothing to hide under
# (measured ~0.2 ms/pass of 1.07 ms, BASELINE.md).  v5 removes that by
# computing tile i+1's ENTIRE IPE while tile i's trunk occupies the
# MXU, carrying the result in a 2-slot VMEM scratch across grid steps
# (grid execution is sequential on a TensorCore, so scratch persists).
# Even/odd grid parity is unrolled with pl.when so the scratch slots
# are STATIC indices — Mosaic cannot alias-analyze dynamic slot
# arithmetic and would serialize the slot write against the slot read.
# The only serialized front-end left is tile 0's (grid prologue).
#
# mean_cov must be padded by one extra (zeroed) tile: the index_map
# i+1 reads one block past the end on the last step (garbage IPE into
# the dead slot — never consumed).


def _kernel_v5(want_normals, order, mc_cur_ref, mc_next_ref, g_ref, A_ref,
               bA_ref, V_ref, M_ref, E_ref, *refs):
    if want_normals:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, wd_row, out_ref,
         x_s, damp_s, u_s) = refs
    else:
        (w0, w1, w2, w3, w4, w5, w6, w7,
         b0, b1, b2, b3, b4, b5, b6, b7,
         w_hc, b_hc, w_out, b_out, out_ref, x_s) = refs
        wd_row = damp_s = u_s = None
    ws = (w0, w1, w2, w3, w4, w5, w6, w7)
    bs = (b0, b1, b2, b3, b4, b5, b6, b7)
    ipe = (A_ref[:], bA_ref[:], V_ref[:], M_ref[:])
    i = pl.program_id(0)

    def ipe_into(mc, dst: int):
        x, _, damp, u = _ipe_parts(mc, ipe)
        x_s[dst] = x
        if damp_s is not None:
            damp_s[dst] = damp
            u_s[dst] = u

    @pl.when(i == 0)
    def _prologue():
        ipe_into(mc_cur_ref[:], 0)

    g_rep = jnp.dot(E_ref[:], g_ref[:],
                    preferred_element_type=jnp.float32)  # (T, 512)
    T = mc_cur_ref.shape[0]
    H = T // N_HALVES

    def run(slot: int, dst: int):
        # tile i+1's whole IPE front-end (VPU + two 16-wide matmuls):
        # no data dependency on this tile's trunk — `order` controls
        # where in the block it is issued ("pre"/"mid"/"post"; "skip"
        # is a perf-probe that consumes stale scratch without refilling)
        if order == "pre":
            ipe_into(mc_next_ref[:], dst)
        for p in range(N_HALVES):
            lo, hi = p * H, (p + 1) * H
            parts = (x_s[slot, lo:hi, :], None,
                     None if damp_s is None else damp_s[slot, lo:hi, :],
                     None if u_s is None else u_s[slot, lo:hi, :])
            out = _field_half(parts, g_rep[lo:hi, :], ipe, ws, bs,
                              w_hc, b_hc, w_out, b_out, wd_row)
            out_ref[lo:hi, :] = out.astype(jnp.bfloat16)
            if order == "mid" and p == 0:
                ipe_into(mc_next_ref[:], dst)
        if order == "post":
            ipe_into(mc_next_ref[:], dst)

    @pl.when(jax.lax.rem(i, 2) == 0)
    def _even():
        run(0, 1)

    @pl.when(jax.lax.rem(i, 2) == 1)
    def _odd():
        run(1, 0)


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                             "want_normals", "interpret",
                                             "order"))
def field_forward_v5(packed, mean_cov: jax.Array, g_bands: jax.Array,
                     samples_per_ray: int, tile: int = DEFAULT_TILE,
                     want_normals: bool = False, interpret: bool = False,
                     order: str = "pre"):
    """Pipelined fused field+mid forward (v3/v4 math, v5 schedule).

    packed: pack_params_v3f operands (want_normals=False) or
    pack_params_v4f (True, adds the fused analytic-normals dgrad and
    the V4_DPDM output columns).  Same I/O contract as v3/v4.
    """
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    assert tile % samples_per_ray == 0, (tile, samples_per_ray)
    rays_per_tile = tile // samples_per_ray
    grid = (n // tile,)
    import numpy as np
    ipe_ops = ipe_matrices()
    E = jnp.asarray(np.kron(np.eye(rays_per_tile, dtype=np.float32),
                            np.ones((samples_per_ray, 1), np.float32)))
    mc_pad = jnp.pad(mean_cov, ((0, tile), (0, 0)))  # i+1 read past end
    in_specs = [
        pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, IN_COLS), lambda i: (i + 1, 0),
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
    scratch = [pltpu.VMEM((2, tile, ENC_PAD), jnp.bfloat16)]
    if want_normals:
        scratch += [pltpu.VMEM((2, tile, ENC_PAD), jnp.float32),
                    pltpu.VMEM((2, tile, ENC_PAD), jnp.float32)]
    mult = 2 if want_normals else 1
    flops_per_row = mult * 2 * (ENC_PAD * 256 + 3 * 256 * 256
                                + SKIP_PAD * 256 + 3 * 256 * 256
                                + 2 * 256 * 128 + 128 * 128)
    return pl.pallas_call(
        functools.partial(_kernel_v5, want_normals, order),
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=pl.BlockSpec((tile, V3_OUT), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, V3_OUT), jnp.bfloat16),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2) + 512 * 4 * (
                n // samples_per_ray),
            transcendentals=n * (300 if want_normals else 200)),
    )(mc_pad, mc_pad, g_bands, *ipe_ops, E, *packed)


def mid_g_bands(params: Dict[str, Any], ray_dirs: jax.Array,
                sh_l8_m7_2x: bool = True) -> jax.Array:
    """Per-ray SH-band partial products for the v3 kernel: (R, 512)."""
    from rsn.core.encodings import sh_basis, _BAND_SLICES

    basis = sh_basis(ray_dirs, sh_l8_m7_2x)  # (R, 34)
    w_enc = params["mid_mlp"]["w"][:34]  # (34, 128)
    parts = [basis[..., lo:hi] @ w_enc[lo:hi] for lo, hi, _ in _BAND_SLICES]
    return jnp.concatenate(parts, axis=-1).astype(jnp.float32)  # (R, 512)


def unpack_outputs(out: jax.Array) -> Dict[str, jax.Array]:
    """Split the combined (.., 384) output into fp32 head tensors."""
    return {
        "bottleneck": out[..., OUT_BOTTLENECK],  # bf16, feeds mid-MLP
        "density_preact": out[..., OUT_DENSITY:OUT_DENSITY + 1].astype(
            jnp.float32),
        "diff_raw": out[..., OUT_DIFF].astype(jnp.float32),
        "tint_raw": out[..., OUT_TINT].astype(jnp.float32),
        "rough_raw": out[..., OUT_ROUGH:OUT_ROUGH + 1].astype(jnp.float32),
        "normals_raw": out[..., OUT_NORMALS].astype(jnp.float32),
    }
