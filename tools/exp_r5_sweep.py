"""r5 kernel schedule sweep: tile x n_halves x inner at the train/render
hot shapes, after the wide-head-matmul change.  Min-of-3 time_kernel.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_r5_sweep.py
  [fwd|bwd|eval|dens|all]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from rsn.kernels import field_pallas as fp
from rsn.kernels import field_train as ft
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel

N, S = 131072, 128
UNIT_FL = 2 * (128 * 256 + 3 * 256 * 256 + 384 * 256 + 3 * 256 * 256
               + 2 * 256 * 128 + 128 * 128)  # one fused fwd pass/sample


def data():
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (N, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (N, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (N // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    return mc, d


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    mc, d = data()
    g = fp.mid_g_bands(params, d)
    p3f = fp.pack_params_v3f(params)
    p4f = fp.pack_params_v4f(params)
    p3 = fp.pack_params_v3f(params)

    if which in ("fwd", "all"):
        print("== v6 fwd (normals + spill_x), train fine shape ==")
        for tile in (1024, 2048, 4096):
            for nh in (2, 4):
                fn = jax.jit(lambda mc, g, t=tile, h=nh: fp.field_forward_v6(
                    p4f, mc, g, S, t, want_normals=True, spill_x=True,
                    n_halves=h)[0])
                t = min(time_kernel(fn, mc, g) for _ in range(3))
                print(f"  tile={tile} halves={nh}: {t*1e3:5.2f} ms "
                      f"({2*N*UNIT_FL/t/1e12:5.1f} TF/s of 2x)")

    if which in ("bwd", "all"):
        print("== bwd v6 (no-IPE, acts, out-fed), train fine shape ==")
        fout, xacts = jax.jit(lambda mc, g: fp.field_forward_v6(
            p4f, mc, g, S, 2048, want_normals=True, spill_x=True))(mc, g)
        fout = fout[:, :fp.V3_OUT]
        dout = jax.random.normal(jax.random.PRNGKey(2),
                                 (N, fp.V3_OUT)).astype(jnp.bfloat16)
        for tile in (1024, 2048, 4096):
            for inner in (4, 8, 16, 32):
                for nh in (1, 2, 4):
                    if tile // S < 8:  # per-ray g block needs >=8 sublanes
                        continue
                    fn = jax.jit(
                        lambda g, xa, do, fo, t=tile, i=inner, h=nh:
                        ft.field_backward_v6(p3, g, xa, do, fo, S, t, i,
                                             n_halves=h)[0])
                    t = min(time_kernel(fn, g, xacts, dout, fout)
                            for _ in range(3))
                    print(f"  tile={tile} inner={inner:2d} halves={nh}: "
                          f"{t*1e3:5.2f} ms "
                          f"({2*N*UNIT_FL/t/1e12:5.1f} TF/s of 2x)")

    if which in ("eval", "all"):
        print("== v3 eval fwd (narrow store), render fine shape ==")
        for tile in (2048, 4096, 8192):
            for nh in (2, 4):
                fn = jax.jit(lambda mc, g, t=tile, h=nh: fp.field_forward_v3(
                    p3f, mc, g, S, t, out_cols=fp.V3_EVAL_COLS,
                    n_halves=h))
                t = min(time_kernel(fn, mc, g) for _ in range(3))
                print(f"  tile={tile} halves={nh}: {t*1e3:5.2f} ms "
                      f"({N*UNIT_FL/t/1e12:5.1f} TF/s)")

    if which in ("dens", "all"):
        print("== density-only fwd, render coarse shape ==")
        pd = fp.pack_params_density(params)
        for tile in (2048, 4096, 8192):
            fn = jax.jit(lambda mc, t=tile: fp.field_forward_density(
                pd, mc, t))
            t = min(time_kernel(fn, mc) for _ in range(3))
            print(f"  tile={tile}: {t*1e3:5.2f} ms")


if __name__ == "__main__":
    main()
