"""Process-environment helpers for spawning CPU-forced JAX subprocesses.

Single source of truth for the env recipe used by the driver hook
(`__graft_entry__.dryrun_multichip`) and by the fake-device scaling
experiment (`tools/exp_dp_scaling.py`) — keeping them in one place so
the next tunnel-variable rule cannot silently diverge between callers
(round-2 review finding).
"""
from __future__ import annotations

import os
from typing import Dict, Optional


def force_cpu_env(n_devices: int,
                  repo_root: Optional[str] = None) -> Dict[str, str]:
    """Environment for a subprocess that must run JAX on `n_devices`
    fake CPU devices, regardless of the calling process's jax state:

    - JAX_PLATFORMS=cpu (never touch a live TPU/axon backend),
    - XLA_FLAGS += --xla_force_host_platform_device_count=N (any prior
      setting of that flag stripped),
    - PALLAS_AXON_POOL_IPS removed (the axon tunnel allows only one
      client; grabbing it from a side process killed the round-1
      multi-chip record, see VERDICT.md #1),
    - repo_root (default: this package's parent) prepended to
      PYTHONPATH — APPENDED to the existing value, which this machine
      presets (CLAUDE.md environment rules).
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={int(n_devices)}")
    env["XLA_FLAGS"] = " ".join(flags)
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env
