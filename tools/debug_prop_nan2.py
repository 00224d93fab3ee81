"""Phase 2: advance the conv30k-prop run to step 15000, then step
singly to the first NaN; at the failing step, recompute the exact batch
(keys derive from state.step) and report which loss term's gradients
go non-finite and which forward outputs are degenerate.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/debug_prop_nan2.py <run_dir>
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from rsn.cli.run_io import load_config
from rsn.engine.trainer import (Trainer, loss_coefficients_traced,
                                sample_pixel_batch)
from rsn.models import model as model_lib


def main():
    run = sys.argv[1]
    cfg = load_config(run)
    cfg = dataclasses.replace(cfg, output_dir="/tmp/nan_bisect2",
                              steps_per_eval_batch=10**9,
                              steps_per_eval_image=10**9,
                              steps_per_save=10**9, steps_per_log=10**9)
    tr = Trainer(cfg)
    import os, shutil
    tmp_ck = "/tmp/nan_bisect2/ck"
    shutil.rmtree(tmp_ck, ignore_errors=True)
    os.makedirs(tmp_ck)
    os.symlink(os.path.abspath(run + "/checkpoints/step-000010000"),
               os.path.join(tmp_ck, "step-000010000"))
    tr.restore(tmp_ck)

    @jax.jit
    def all_finite(state):
        leaves = jax.tree.leaves((state.params, state.proposal))
        return jnp.all(jnp.asarray(
            [jnp.isfinite(l).all() for l in leaves]))

    key = jax.random.PRNGKey(cfg.seed)
    # advance to 15000 in bulk
    tr.state, _ = tr._multi_step_fn(tr.state, tr.images, tr.cameras, key,
                                    jnp.int32(15000 - int(tr.state.step)))
    assert bool(all_finite(tr.state)), "already bad at 15000?!"
    print("at step", int(tr.state.step), flush=True)

    prev_state = tr.state
    while True:
        nxt, metrics = tr._multi_step_fn(tr.state, tr.images, tr.cameras,
                                         key, jnp.int32(1))
        ok = bool(all_finite(nxt))
        if not ok:
            break
        prev_state = tr.state
        tr.state = nxt
    s = int(tr.state.step)
    print(f"first bad step: {s} -> {s+1}", flush=True)
    # save the healthy pre-state for cheap re-analysis
    from rsn.engine import checkpoints as ckpt_lib
    extra = {n: getattr(tr.state, n)
             for n in ("camera", "camera_opt_state", "proposal",
                       "proposal_opt_state")
             if getattr(tr.state, n) is not None}
    ckpt_lib.save_checkpoint("/tmp/nan_state", s, tr.state.params,
                             tr.state.opt_state, extra or None)

    # ---- dissect the failing step on the healthy pre-state ----
    mcfg = cfg.pipeline.model
    state = tr.state
    k_pix, k_render = jax.random.split(jax.random.fold_in(key, state.step))
    num_rays = cfg.pipeline.datamanager.train_num_rays_per_batch
    bundle, gt = sample_pixel_batch(tr.images, tr.cameras, num_rays, k_pix)
    bundle = model_lib.apply_collider(bundle, mcfg)
    coeffs = loss_coefficients_traced(state.step)
    if mcfg.use_proposal:
        coeffs = dict(coeffs, interlevel_loss=jnp.float32(
            mcfg.interlevel_loss_mult))

    outputs = jax.jit(lambda p, prop: model_lib.get_outputs(
        p, bundle, k_render, mcfg, training=True, prop_params=prop))(
            state.params, state.proposal)
    outs_h = jax.device_get({k: v for k, v in outputs.items()
                             if v is not None})
    lines = []
    for k in sorted(outs_h):
        import numpy as np
        v = np.asarray(outs_h[k], np.float32)
        lines.append(f"  out[{k:26}] finite={bool(np.isfinite(v).all())} "
                     f"min={v.min():+.3e} max={v.max():+.3e}")
    report = "\n".join(lines)
    print(report, flush=True)
    open("/tmp/nan_report.txt", "w").write(f"first bad step {s}\n" + report + "\n")

    loss_dict = model_lib.get_loss_dict(outputs, gt, coeffs)
    for name in sorted(loss_dict):
        def one_loss(p, prop, name=name):
            o = model_lib.get_outputs(p, bundle, k_render, mcfg,
                                      training=True, prop_params=prop)
            return sum(v for k, v in model_lib.get_loss_dict(
                o, gt, coeffs).items() if k == name)
        val, (gp, gprop) = jax.jit(jax.value_and_grad(
            one_loss, argnums=(0, 1)))(state.params, state.proposal)
        gp_ok = all(bool(jnp.isfinite(l).all())
                    for l in jax.tree.leaves(gp))
        pr_ok = all(bool(jnp.isfinite(l).all())
                    for l in jax.tree.leaves(gprop))
        print(f"  loss[{name:28}] = {float(val):+.4e} "
              f"grads finite: params={gp_ok} prop={pr_ok}", flush=True)
        if not gp_ok:
            for path, l in jax.tree_util.tree_leaves_with_path(gp):
                if not bool(jnp.isfinite(l).all()):
                    print(f"    bad grad {jax.tree_util.keystr(path)}")


if __name__ == "__main__":
    main()
