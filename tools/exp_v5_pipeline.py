"""A/B timing: v3/v4 (upfront-halves IPE) vs v5 (cross-grid-step
pipelined IPE carry) at production shapes.

Run on TPU (default env):
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_v5_pipeline.py [reps]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

import rsn.kernels.field_pallas as fp
from rsn.models import field as field_lib
from rsn.utils.timing import time_kernel

FL = 1.343e6  # v3 flops/row


def main():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    p3 = fp.pack_params_v3f(params)
    p4 = fp.pack_params_v4f(params)
    n, S = 131072, 128
    key = jax.random.PRNGKey(1)
    mean = jax.random.normal(key, (n, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (n, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, 10))).astype(jnp.float32)
    d = jax.random.normal(key, (n // S, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    g = fp.mid_g_bands(params, d)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # schedule-order sweep at the best tile ("skip" = stale-scratch
    # perf probe: isolates scratch-read cost from IPE scheduling)
    for order in ("pre", "mid", "post", "skip"):
        f5 = jax.jit(lambda mc, g, o=order: fp.field_forward_v5(
            p3, mc, g, S, 2048, order=o))
        f5n = jax.jit(lambda mc, g, o=order: fp.field_forward_v5(
            p4, mc, g, S, 2048, want_normals=True, order=o))
        t5 = min(time_kernel(f5, mc, g) for _ in range(reps))
        t5n = min(time_kernel(f5n, mc, g) for _ in range(reps))
        print(f"order={order:>4}: v5 {t5*1e3:5.2f} ms "
              f"({n*FL/t5/1e12:5.1f} TF/s) | v5n {t5n*1e3:5.2f} ms "
              f"({2*n*FL/t5n/1e12:5.1f})", flush=True)
    for tile in (2048, 4096):
        f3 = jax.jit(lambda mc, g, t=tile: fp.field_forward_v3(
            p3, mc, g, S, t))
        f5 = jax.jit(lambda mc, g, t=tile: fp.field_forward_v5(
            p3, mc, g, S, t))
        f4 = jax.jit(lambda mc, g, t=tile: fp.field_forward_v4(
            p4, mc, g, S, t))
        f5n = jax.jit(lambda mc, g, t=tile: fp.field_forward_v5(
            p4, mc, g, S, t, want_normals=True))
        t3 = min(time_kernel(f3, mc, g) for _ in range(reps))
        t5 = min(time_kernel(f5, mc, g) for _ in range(reps))
        t4 = min(time_kernel(f4, mc, g) for _ in range(reps))
        t5n = min(time_kernel(f5n, mc, g) for _ in range(reps))
        print(f"tile={tile}: v3 {t3*1e3:5.2f} ms ({n*FL/t3/1e12:5.1f} TF/s)"
              f" | v5 {t5*1e3:5.2f} ms ({n*FL/t5/1e12:5.1f})"
              f" | v4 {t4*1e3:5.2f} ms ({2*n*FL/t4/1e12:5.1f})"
              f" | v5n {t5n*1e3:5.2f} ms ({2*n*FL/t5n/1e12:5.1f})",
              flush=True)
        # hardware equivalence spot check
        o3 = f3(mc, g)
        o5 = f5(mc, g)
        diff = float(jnp.max(jnp.abs(o3.astype(jnp.float32)
                                     - o5.astype(jnp.float32))))
        print(f"  max |v3-v5| = {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
