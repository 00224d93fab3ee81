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
    assert "dryrun_multichip(4): OK" in res.stdout
