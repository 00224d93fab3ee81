"""Probe: recompute-backward with ONE whole-tile chain vs the halved
body inherited from the forward kernel.

The forward halves each tile so both halves' IPE front-ends issue
upfront (VPU/MXU overlap).  The backward recomputes the forward too,
but its wgrad matmuls contract over the row axis — halving doubles the
number of (256, H) x (H, 256) wgrads at half the contraction depth and
doubles the 22 fp32 accumulator adds.  This probe runs the identical
math as one full-tile chain to see if the MXU prefers it.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_whole.py
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

from rsn.kernels.field_train import (N_PACKED, _bwd_half, field_backward_v4)
from rsn.kernels.field_pallas import (IN_COLS, V3_OUT, _ipe_parts,
                                      ipe_matrices, pack_params_v3)
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel as time_fn

FL = 1.343e6


def _bwd_kernel_whole(mc_ref, g_ref, dout_ref, A_ref, bA_ref, V_ref,
                      M_ref, E_ref, *refs):
    packed = refs[:N_PACKED]
    (w0, w1, w2, w3, w4, w5, w6, w7,
     b0, b1, b2, b3, b4, b5, b6, b7, wh, bh,
     w_emb, b_mid, w_out, b_out) = packed
    outs = refs[N_PACKED:]
    (dmc_ref, dg_ref) = outs[:2]
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
    g_rep = jnp.dot(E_ref[:], g_ref[:],
                    preferred_element_type=jnp.float32)
    parts = _ipe_parts(mc_ref[:, :], ipe)
    dmc, dg_all, contribs = _bwd_half(
        parts, g_rep, dout_ref[:, :], ipe, ws, bs,
        wh, bh, w_emb, b_mid, w_out, b_out)
    dmc_ref[:, :] = dmc
    dg_ref[:, :] = jax.lax.dot_general(
        E_ref[:], dg_all, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for j, c in enumerate(contribs):
        dpacked[j][:] += c


@functools.partial(jax.jit, static_argnames=("tile", "samples_per_ray",
                                               "inner", "interpret"))
def field_backward_whole(packed, mean_cov, g_bands, d_out,
                         samples_per_ray, tile=1024, inner=16,
                         interpret=False):
    n = mean_cov.shape[0]
    n_tiles = n // tile
    inner = max(1, min(inner, n_tiles))
    while n_tiles % inner:
        inner -= 1
    outer = n_tiles // inner
    grid = (outer, inner)
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
    for w in packed:
        out_shapes.append(
            jax.ShapeDtypeStruct((outer,) + w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec((1,) + w.shape,
                                      lambda o, i: (o, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        _bwd_kernel_whole,
        grid=grid,
        in_specs=in_specs,
        interpret=interpret,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(3 * FL * n),
            bytes_accessed=n * (IN_COLS * 4 + V3_OUT * 2)
            + n_rays * 4096, transcendentals=n * 300),
    )(mean_cov, g_bands.astype(jnp.float32), d_out, *ipe_ops, E, *packed)
    dmc, dg = res[0], res[1]
    dpacked = tuple(jnp.sum(a, axis=0) for a in res[2:])
    return dmc, dg, dpacked


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    packed = pack_params_v3(params)
    n, S = 131072, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    from rsn.kernels.field_pallas import mid_g_bands
    d = jax.random.normal(key, (n // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = mid_g_bands(params, d)
    dout = jax.random.normal(jax.random.PRNGKey(2), (n, V3_OUT)).astype(
        jnp.bfloat16)

    # numerical equivalence vs the halved production kernel
    ref = field_backward_v4(packed, mc, g, dout, S, 1024, 16)
    for tile in (1024, 2048):  # tile 512 -> 4 rays/tile < 8-sublane min
        got = field_backward_whole(packed, mc, g, dout, S, tile, 16)
        errs = [float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got))]
        rel = max(errs)
        ts = [time_fn(lambda *a: field_backward_whole(
            packed, a[0], a[1], a[2], S, tile, 16)[0], mc, g, dout)
            for _ in range(3)]
        t = min(ts)
        print(f"whole tile={tile}: {t*1e3:5.2f} ms "
              f"({3*n*FL/t/1e12:5.1f} TF/s of 3x)  max|diff vs halved|="
              f"{rel:.3e}")
    ts = [time_fn(lambda *a: field_backward_v4(
        packed, a[0], a[1], a[2], S, 1024, 16)[0], mc, g, dout)
        for _ in range(3)]
    t = min(ts)
    print(f"halved tile=1024  : {t*1e3:5.2f} ms ({3*n*FL/t/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()
