"""Bisect the proposal-mode NaN collapse (steps 15k-16k of a 30k run).

Resumes the conv30k-prop run's 10000-step checkpoint and replays the
exact training stream (keys derive from state.step; chunking-invariant)
in windows, checking every param/grad pytree leaf for non-finite
values after each window.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/debug_prop_nan.py <run_dir>
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from rsn.cli.run_io import load_config
from rsn.engine import checkpoints as ckpt_lib
from rsn.engine.trainer import Trainer


def first_bad_leaf(tree, tag):
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not bool(jnp.isfinite(leaf).all()):
            arr = jnp.asarray(leaf)
            n_nan = int(jnp.isnan(arr).sum())
            n_inf = int(jnp.isinf(arr).sum())
            print(f"  BAD {tag}{jax.tree_util.keystr(path)}: "
                  f"{n_nan} nan / {n_inf} inf of {arr.size}")
            return True
    return False


def main():
    run = sys.argv[1]
    cfg = load_config(run)
    import dataclasses
    cfg = dataclasses.replace(cfg, output_dir="/tmp/nan_bisect",
                              steps_per_eval_batch=10**9,
                              steps_per_eval_image=10**9,
                              steps_per_save=10**9, steps_per_log=10**9)
    tr = Trainer(cfg)
    import os, shutil
    # pin the 10000-step checkpoint (restore() picks the latest)
    tmp_ck = "/tmp/nan_bisect/ck"
    shutil.rmtree(tmp_ck, ignore_errors=True)
    os.makedirs(tmp_ck)
    os.symlink(os.path.abspath(run + "/checkpoints/step-000010000"),
               os.path.join(tmp_ck, "step-000010000"))
    tr.restore(tmp_ck)
    print("resumed at step", int(tr.state.step))

    @jax.jit
    def all_finite(state):
        leaves = jax.tree.leaves((state.params, state.proposal))
        return jnp.all(jnp.asarray(
            [jnp.isfinite(l).all() for l in leaves]))

    window = 100
    while int(tr.state.step) < 19000:
        tr.state, metrics = tr._multi_step_fn(
            tr.state, tr.images, tr.cameras,
            jax.random.PRNGKey(cfg.seed), jnp.int32(window))
        step = int(tr.state.step)
        ok = bool(all_finite(tr.state))
        tl = float(metrics["total_loss"])
        print(f"step {step}: loss={tl:.4f} finite={ok}", flush=True)
        if not ok or tl != tl:
            for tag, tree in (("params", tr.state.params),
                              ("proposal", tr.state.proposal),
                              ("opt", tr.state.opt_state)):
                if tree is not None:
                    first_bad_leaf(tree, tag)
            break


if __name__ == "__main__":
    main()
