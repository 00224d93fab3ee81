"""Driver entry points must work in a hostile environment.

Round-1 failure of record: the driver invoked `dryrun_multichip` in the
default TPU env, the in-process jax grabbed the axon backend, and the
multi-chip record went `ok=false` (MULTICHIP_r01.json, VERDICT.md #1).
The fix re-execs the check in a subprocess that forces JAX_PLATFORMS=cpu
with N fake devices.  This test pins that behavior by poisoning the
environment the way the driver's env looked.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_survives_poisoned_env():
    env = dict(os.environ)
    # simulate the driver's default TPU env: axon pool var present,
    # no CPU forcing, no fake-device flag
    env["PALLAS_AXON_POOL_IPS"] = "10.255.255.1"  # unreachable on purpose
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "4"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    # r4: the dryrun certifies BOTH shipped configs (parity + preset)
    assert "dryrun_multichip(4)[parity]: OK" in res.stdout
    assert "dryrun_multichip(4)[preset]: OK" in res.stdout


def test_force_cpu_env_recipe():
    """The shared env helper (single source of truth for the driver
    hook and tools/exp_dp_scaling.py) strips the axon tunnel var,
    forces the CPU platform, and replaces any pre-existing fake-device
    flag instead of appending a duplicate."""
    from rsn.utils.env import force_cpu_env

    os.environ.setdefault("XLA_FLAGS", "")
    old = dict(os.environ)
    try:
        os.environ["PALLAS_AXON_POOL_IPS"] = "10.0.0.1"
        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=2 --xla_foo=bar")
        env = force_cpu_env(8, repo_root=REPO)
        assert "PALLAS_AXON_POOL_IPS" not in env
        assert env["JAX_PLATFORMS"] == "cpu"
        flags = env["XLA_FLAGS"].split()
        assert "--xla_force_host_platform_device_count=8" in flags
        assert "--xla_force_host_platform_device_count=2" not in flags
        assert "--xla_foo=bar" in flags
        assert env["PYTHONPATH"].startswith(REPO + os.pathsep)
        # caller's env is untouched
        assert os.environ["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"
    finally:
        os.environ.clear()
        os.environ.update(old)
