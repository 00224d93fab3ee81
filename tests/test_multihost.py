"""Multi-host (multi-process) data parallelism smoke test.

The reference's multi-GPU path is torch DDP launched one process per
device (reflect_sampling_nerf_pipeline.py:73-77); rsn's equivalent is
`rsn-train --multihost`, which calls jax.distributed.initialize() and
runs the same shard_map train step over the GLOBAL device mesh
(SURVEY.md §2.5).  This test exercises the real cross-process path —
2 CPU processes x 2 fake devices each = a 4-device global mesh with
Gloo collectives — and asserts it converges IDENTICALLY (up to
collective reduction order) to a single-process run over the same
4-device mesh: DP semantics must not depend on how the mesh is split
across processes.
"""
from __future__ import annotations

import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel from tests
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{local_devices}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _train_args(out_dir: str, steps: int) -> list:
    return [
        sys.executable, "-m", "rsn.cli.train", "reflect-sampling-nerf",
        "--pipeline.datamanager.dataparser", "synthetic",
        "--pipeline.datamanager.train-num-rays-per-batch", "64",
        "--pipeline.model.num-coarse-samples", "16",
        "--pipeline.model.num-importance-samples", "16",
        "--pipeline.model.num-reflect-coarse-samples", "8",
        "--pipeline.model.num-reflect-importance-samples", "8",
        "--max-num-iterations", str(steps),
        "--steps-per-save", str(steps),
        "--steps-per-log", str(steps),
        "--steps-per-dispatch", "2",
        "--steps-per-eval-batch", "0",
        "--steps-per-eval-image", "0",
        "--adaptive-reflect-fraction", "False",
        "--output-dir", out_dir,
    ]


def _final_params(out_dir: str, steps: int) -> dict:
    from rsn.engine import checkpoints as ckpt_lib
    pats = glob.glob(os.path.join(
        out_dir, "*", "*", "*", "checkpoints", f"step-{steps:09d}"))
    assert len(pats) == 1, f"expected one checkpoint, got {pats}"
    return ckpt_lib.load_checkpoint(pats[0])["params"]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    steps = 6
    port = _free_port()
    mh_dir = str(tmp_path / "mh")
    procs = []
    for pid in range(2):
        args = _train_args(mh_dir, steps) + [
            "--multihost",
            "--coordinator-address", f"localhost:{port}",
            "--num-processes", "2", "--process-id", str(pid)]
        procs.append(subprocess.Popen(
            args, env=_env(local_devices=2), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
    assert "4 device(s)" in outs[0], outs[0][-2000:]

    # single-process reference over the SAME 4-device mesh
    sp_dir = str(tmp_path / "sp")
    r = subprocess.run(
        _train_args(sp_dir, steps), env=_env(local_devices=4), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900)
    assert r.returncode == 0, r.stdout[-4000:]

    got = _final_params(mh_dir, steps)
    want = _final_params(sp_dir, steps)
    import jax
    devs = []
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        devs.append(float(np.max(np.abs(
            np.asarray(a, np.float64) - np.asarray(b, np.float64)))))
    # identical math; only the grad-allreduce summation order may
    # differ between Gloo (cross-process) and XLA (single-process)
    assert max(devs) < 1e-5, f"max param deviation {max(devs)}"
