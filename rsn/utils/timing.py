"""Honest device timing under the axon remote runtime.

`block_until_ready` on this tunneled backend returns before execution
completes for short computations (measured: a 274-GFLOP matmul "takes"
31 us => 8.8 PFLOP/s), and any host transfer pays a ~90 ms tunnel round
trip.  The only reliable measurement is differential: enqueue k
back-to-back calls, force ONE tiny host transfer, and difference two
values of k so both the round trip and the sync overhead cancel:

    t_per_call = (T(k2) - T(k1)) / (k2 - k1)
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _run(fn: Callable, args, k: int) -> float:
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # one real host sync
    return time.perf_counter() - t0


def time_fn(fn: Callable, *args, k1: int = 2, k2: int = 12,
            warmup: int = 2, repeats: int = 1) -> float:
    """Seconds per call of `fn(*args)`, tunnel-RTT-corrected.

    repeats > 1 takes the median of several differential measurements —
    required for sub-2ms kernels where single-shot tunnel jitter (a few
    ms per sync) swamps the k2-k1 work difference.
    """
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    vals = []
    for _ in range(repeats):
        t1 = _run(fn, args, k1)
        t2 = _run(fn, args, k2)
        vals.append(max((t2 - t1) / (k2 - k1), 1e-9))
    vals.sort()
    return vals[len(vals) // 2]


def time_kernel(fn: Callable, *args) -> float:
    """time_fn tuned for ~0.5-5 ms kernels: 40-call difference,
    median of 5."""
    return time_fn(fn, *args, k1=5, k2=45, warmup=3, repeats=5)
