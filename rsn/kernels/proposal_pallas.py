"""Fused proposal-field forward Pallas kernel (r4).

The preset render budget (tools/exp_render_budget.py --preset) charges
~4.7 of 37.8 ms to the proposal pass — not to its matmuls (the 4x64
trunk is ~33 kFLOP/sample, trivial on the MXU) but to the unfused XLA
pipeline around them: the (R, S, 3) blob/contract geometry, the (N, 51)
fp32 IPE materialization, and four (N, 64) activation round-trips
through HBM.  This kernel mirrors the main field's v2 design
(field_pallas.py): the caller supplies the packed (N, 16)
[mean|cov_diag] planes (packed_contract_planes — already plane-layout
fast), and the 8-octave IPE + 4x64 trunk + density head all run in
VMEM; HBM traffic drops to one 64 B/sample read + one 8 B/sample write.

Used on the eval/render path only (training keeps the XLA composition
for autodiff — the proposal's train-side backward is small).  Like the
main-field kernels, activations are bf16 with fp32 accumulation; the
tiny rounding difference only nudges PDF bin placement.

Reference context: the proposal subsystem itself is rsn's optional
TPU-native accelerator (rsn/models/proposal.py) — the reference binds
no proposal parameters (reflect_sampling_nerf_config.py:44-48).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.kernels.field_pallas import IN_COLS
from rsn.models.proposal import (PROP_DENSITY_BIAS, PROP_IN_DIM,
                                 PROP_LAYERS, PROP_MAX_FREQ_EXP,
                                 PROP_NUM_FREQS, PROP_WIDTH)

ENC_PAD = 64  # 51 -> 64 lanes
OUT_COLS = 8  # density preact in col 0, rest zero (sublane-even store)
DEFAULT_TILE = 4096


def prop_ipe_matrices():
    """Constant operands for the in-kernel 8-octave IPE (the proposal's
    ipe_encode: sin args 2*pi*f_k*mean, cos via +pi/2, variance damping
    exp(-f_k^2 var/2) — same unscaled-variance quirk as the main field;
    layout [sin(24) | cos(24) | mean(3) | pad(13)])."""
    import numpy as np
    freqs = (2.0 ** np.linspace(0.0, PROP_MAX_FREQ_EXP,
                                PROP_NUM_FREQS)).astype(np.float64)
    n = PROP_NUM_FREQS
    A = np.zeros((IN_COLS, ENC_PAD), np.float32)
    V = np.zeros((IN_COLS, ENC_PAD), np.float32)
    bA = np.zeros((1, ENC_PAD), np.float32)
    M = np.zeros((1, ENC_PAD), np.float32)
    for d in range(3):
        for k in range(n):
            c = d * n + k
            A[d, c] = 2.0 * np.pi * freqs[k]
            A[d, 3 * n + c] = 2.0 * np.pi * freqs[k]
            V[3 + d, c] = freqs[k] ** 2
            V[3 + d, 3 * n + c] = freqs[k] ** 2
        A[d, 6 * n + d] = 1.0
    bA[0, 3 * n:6 * n] = np.pi / 2.0
    M[0, 0:6 * n] = 1.0
    return (jnp.asarray(A), jnp.asarray(bA), jnp.asarray(V),
            jnp.asarray(M))


def pack_prop_params(params: Dict[str, Any]):
    """Pad + cast the proposal params into kernel operands: trunk
    weights bf16 (layer 0 rows padded 51 -> 64), biases fp32 rows,
    density head folded into an (PROP_WIDTH, OUT_COLS) matmul."""
    ws, bs = [], []
    for i, layer in enumerate(params["trunk"]):
        w = layer["w"]
        if i == 0:
            w = jnp.pad(w, ((0, ENC_PAD - PROP_IN_DIM), (0, 0)))
        ws.append(w.astype(jnp.bfloat16))
        bs.append(layer["b"].reshape(1, -1).astype(jnp.float32))
    wd = jnp.pad(params["density"]["w"], ((0, 0), (0, OUT_COLS - 1)))
    bd = jnp.pad(params["density"]["b"], (0, OUT_COLS - 1))
    return tuple(ws) + tuple(bs) + (wd.astype(jnp.bfloat16),
                                    bd.reshape(1, -1).astype(jnp.float32))


def _prop_kernel(mc_ref, A_ref, bA_ref, V_ref, M_ref, *refs):
    ws = refs[:PROP_LAYERS]
    bs = refs[PROP_LAYERS:2 * PROP_LAYERS]
    wd, bd, out_ref = refs[2 * PROP_LAYERS:]
    f32, bf16 = jnp.float32, jnp.bfloat16

    mc = mc_ref[:]  # (T, 16) fp32
    pre = jnp.dot(mc, A_ref[:], preferred_element_type=f32) + bA_ref[:]
    var = jnp.dot(mc, V_ref[:], preferred_element_type=f32)
    enc = (M_ref[:] * (jnp.exp(-0.5 * var) * jnp.sin(pre))
           + (1.0 - M_ref[:]) * pre)
    h = enc.astype(bf16)
    for i in range(PROP_LAYERS):
        acc = jnp.dot(h, ws[i][:], preferred_element_type=f32)
        h = jnp.maximum(acc + bs[i][:], 0.0).astype(bf16)
    out = jnp.dot(h, wd[:], preferred_element_type=f32) + bd[:]
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def prop_forward(packed, mean_cov: jax.Array, tile: int = DEFAULT_TILE,
                 interpret: bool = False) -> jax.Array:
    """mean_cov: (N, 16) fp32 [mean|cov_diag|pad] -> (N,) fp32 density
    pre-activation (softplus+bias applied by the caller)."""
    n = mean_cov.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    ipe_ops = prop_ipe_matrices()
    in_specs = [pl.BlockSpec((tile, IN_COLS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for m in ipe_ops:
        in_specs.append(pl.BlockSpec(m.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for w in packed:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    flops_per_row = 2 * (ENC_PAD * PROP_WIDTH
                         + (PROP_LAYERS - 1) * PROP_WIDTH * PROP_WIDTH
                         + PROP_WIDTH * OUT_COLS + 2 * IN_COLS * ENC_PAD)
    out = pl.pallas_call(
        _prop_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, OUT_COLS), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_row * n,
            bytes_accessed=n * (IN_COLS * 4 + OUT_COLS * 4),
            transcendentals=n * (6 * PROP_NUM_FREQS + ENC_PAD)),
    )(mean_cov, *ipe_ops, *packed)
    return out[:, 0]


def proposal_density_kernel(params: Dict[str, Any], ray_samples,
                            interpret: bool = False) -> jax.Array:
    """Drop-in fused equivalent of proposal.proposal_density for the
    eval/render path: packed_contract_planes prep + prop_forward +
    softplus(+bias), returns (R, S, 1)."""
    from rsn.core.contract import packed_contract_planes

    R, S = ray_samples.starts.shape[0], ray_samples.starts.shape[1]
    tile = 64 if interpret else DEFAULT_TILE
    n = R * S
    n_pad = -(-n // tile) * tile
    mc = jnp.pad(packed_contract_planes(ray_samples, IN_COLS),
                 ((0, n_pad - n), (0, 0)))
    preact = prop_forward(pack_prop_params(params), mc, tile=tile,
                          interpret=interpret)[:n]
    density = jax.nn.softplus(preact + PROP_DENSITY_BIAS)
    return density.reshape(R, S, 1)
