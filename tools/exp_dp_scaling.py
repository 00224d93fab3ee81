"""DP scaling shape on fake CPU devices (VERDICT r1 #8).

For D in 1,2,4,8: build a D-device `data` mesh
(--xla_force_host_platform_device_count), run the shard_map train step
(per-device batch fixed => global batch scales with D, the reference's
per-GPU-batch DDP semantics), and report step time + global rays/s.

NOTE on interpretation: all fake devices share one host's cores, so
this measures FUNCTIONAL scaling + collective/partitioning overhead,
not hardware speedup — per-step time should stay roughly flat as D
grows (each fake device handles the same per-device batch; the host
does D x the math on the same silicon, so wall time grows sublinearly
only insofar as cores were idle).  The interesting signals are (a) it
runs at every D, (b) no pathological overhead cliff.

Run: python tools/exp_dp_scaling.py          (re-execs per D)
     python tools/exp_dp_scaling.py <D>      (one measurement)
"""
from __future__ import annotations

import os
import subprocess
import sys


def measure(d: int) -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from rsn.configs import (DataManagerConfig, ModelConfig,
                             PipelineConfig, TrainerConfig)
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.trainer import TrainState, make_train_step
    from rsn.models import field as field_lib
    from rsn.parallel import mesh as mesh_lib
    from rsn.utils.timing import time_fn

    batch = 256  # per device
    cfg = TrainerConfig(pipeline=PipelineConfig(
        datamanager=DataManagerConfig(dataparser="synthetic",
                                      train_num_rays_per_batch=batch),
        model=ModelConfig(num_coarse_samples=32, num_importance_samples=32,
                          num_reflect_coarse_samples=16,
                          num_reflect_importance_samples=16)),
        num_devices=d)
    mesh = mesh_lib.make_mesh(d)
    train_step, optimizer = make_train_step(cfg)
    ds = make_synthetic_dataset(num_cameras=4, H=32, W=32)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0))

    def body(state, images, cameras, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(
            mesh_lib.DATA_AXIS))
        return train_step(state, images, cameras, key,
                          axis_name=mesh_lib.DATA_AXIS)

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False))
    fn = lambda s, k: step(s, images, ds.cameras, k)[1]["total_loss"]
    dt = time_fn(fn, state, jax.random.PRNGKey(1))
    print(f"D={d}: {dt*1e3:8.2f} ms/step  global {d*batch/dt:10,.0f} "
          f"rays/s  per-device {batch/dt:10,.0f} rays/s", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        measure(int(sys.argv[1]))
        return
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here) if here not in sys.path else None
    from rsn.utils.env import force_cpu_env

    for d in (1, 2, 4, 8):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(d)], env=force_cpu_env(d, repo_root=here),
                       check=True)


if __name__ == "__main__":
    main()
