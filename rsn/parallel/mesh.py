"""Device mesh + shard_map data parallelism.

Replaces the reference's DDP/NCCL path (reflect_sampling_nerf_pipeline.py:
73-77: DDP wrap, find_unused_parameters=True, dist.barrier) with the
TPU-native design from SURVEY.md §2.4/§2.5:

- one `data` mesh axis over all chips (ICI within a slice)
- `shard_map` over the train step: the ray batch is sharded on the
  batch axis, params are replicated, and gradients are `pmean`-ed over
  `data` — exactly DDP's average-gradients semantics (each reference
  rank trains on its own 1024-ray batch; ours is per-device too)
- the `find_unused_parameters` problem vanishes: fixed-shape masking
  keeps every parameter in the graph on every step (SURVEY.md §5.3)
- barrier == blocking on a tiny psum (`barrier()` below)

Eval renders are psum-free: rays shard over `data`, results gather on
the host (SURVEY.md §5.8).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0) -> Mesh:
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return jax.make_mesh((len(devices),), (DATA_AXIS,),
                         devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def barrier(mesh: Mesh) -> None:
    """Block until all devices reach this point (== a tiny psum)."""
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(), out_specs=P())
    def _psum_one():
        return jax.lax.psum(jnp.ones(()), DATA_AXIS)

    _psum_one().block_until_ready()


def shard_train_step(train_step: Callable, mesh: Mesh,
                     donate_state: bool = True) -> Callable:
    """Wrap a per-device train step for data parallelism.

    `train_step(state, batch, key) -> (state, metrics)` must return
    gradients already applied; gradient averaging happens inside via the
    `axis_name` argument it receives (the step calls
    `jax.lax.pmean(grads, axis_name)` when axis_name is not None).

    Returns a jitted function taking (state, global_batch, key) where
    global_batch's leading axis is sharded over `data`.
    """
    num = mesh.devices.size

    def per_device(state, batch, key):
        # distinct stratified/pixel rng per device shard
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return train_step(state, batch, key, axis_name=DATA_AXIS)

    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)
    donate = (0,) if donate_state else ()
    return jax.jit(mapped, donate_argnums=donate), num


