"""Camera-opt validation: corrupt the train cameras' poses, train with
and without SO3xR3 refinement, and compare eval PSNR against the
UNCORRUPTED eval split.  This is the feature's actual use case (real
captures with imperfect poses); on exact poses joint refinement is
known to drift slightly (hence the L2 regularizer).

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_camera_opt_recovery.py [steps]
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rsn.configs import (DataManagerConfig, ModelConfig, PipelineConfig,
                         TrainerConfig)
from rsn.data.cameras import Cameras
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_optimizer
from rsn.engine.trainer import TrainState, make_train_step, render_image
from rsn.models import camera_opt as camera_opt_lib
from rsn.models import field as field_lib


def perturb_cameras(cams: Cameras, key, rot_std=0.03, trans_std=0.05):
    """Right-multiply each camera-to-world by a random small se(3)."""
    n = cams.camera_to_worlds.shape[0]
    k1, k2 = jax.random.split(key)
    omega = jax.random.normal(k1, (n, 3)) * rot_std
    t = jax.random.normal(k2, (n, 3)) * trans_std
    c2w = np.asarray(cams.camera_to_worlds)  # (n, 3, 4)
    out = c2w.copy()
    for i in range(n):
        w = np.asarray(omega[i])
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]])
        if th > 1e-12:
            R = (np.eye(3) + np.sin(th) / th * K
                 + (1 - np.cos(th)) / th**2 * K @ K)
        else:
            R = np.eye(3)
        out[i, :, :3] = c2w[i, :, :3] @ R
        out[i, :, 3] = c2w[i, :, 3] + np.asarray(t[i])
    return cams.replace(camera_to_worlds=jnp.asarray(out))


def run(cam_mode: str, steps: int, train_ds, eval_ds, cfg,
        init_params=None, freeze_field=False, return_params=False):
    cfg = dataclasses.replace(cfg, pipeline=dataclasses.replace(
        cfg.pipeline, datamanager=dataclasses.replace(
            cfg.pipeline.datamanager, camera_optimizer=cam_mode)))
    train_step, optimizer = make_train_step(cfg)
    params = (init_params if init_params is not None
              else field_lib.init_field_params(jax.random.PRNGKey(0)))
    camera = camera_opt_lib.init_camera_opt_params(
        train_ds.cameras.num_cameras, cam_mode)
    cam_opt_state = (build_optimizer(cfg.optimizers["camera_opt"])
                     .init(camera) if camera is not None else None)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0), camera=camera,
                       camera_opt_state=cam_opt_state)
    images = jnp.asarray(train_ds.images)

    def multi(state, key, n):
        def body(_, s):
            s2, _m = train_step(s, images, train_ds.cameras, key)
            if freeze_field:
                s2 = s2.replace(params=s.params, opt_state=s.opt_state)
            return s2
        return jax.lax.fori_loop(0, n, body, state)

    state = jax.jit(multi, static_argnames="n")(
        state, jax.random.PRNGKey(3), steps)
    psnrs = []
    for i in range(eval_ds.cameras.num_cameras):
        out = render_image(state.params, eval_ds.cameras, i, cfg)
        gt = np.asarray(eval_ds.images[i])[..., :3]
        mse = np.mean((np.clip(out["mid_reflect_fine"], 0, 1) - gt) ** 2)
        psnrs.append(-10 * np.log10(max(mse, 1e-12)))
    d = None if state.camera is None else np.asarray(
        state.camera["deltas"])
    return float(np.mean(psnrs)), d, state.params


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    cfg = TrainerConfig(pipeline=PipelineConfig(
        datamanager=DataManagerConfig(dataparser="synthetic"),
        model=ModelConfig(compute_dtype=__import__("os").environ.get(
            "DTYPE", "bfloat16"))))
    train_ds = make_synthetic_dataset(split="train", scene="triple")
    eval_ds = make_synthetic_dataset(split="val", scene="triple")
    train_bad = dataclasses.replace(
        train_ds, cameras=perturb_cameras(train_ds.cameras,
                                          jax.random.PRNGKey(9)))

    import pickle, os
    cache = "/tmp/camopt_field.pkl"
    if os.path.exists(cache):
        trained = pickle.load(open(cache, "rb"))
        trained = jax.tree.map(jnp.asarray, trained)
        psnr0 = None
    else:
        psnr0, _, trained = run("off", steps, train_ds, eval_ds, cfg,
                                return_params=True)
        pickle.dump(jax.device_get(trained), open(cache, "wb"))
    if psnr0 is not None:
        print(f"true poses, opt off   : eval PSNR {psnr0:6.2f}",
              flush=True)

    # frozen-field pose-only recovery: train ONLY the deltas against a
    # converged field; success = the learned correction maps corrupted
    # rays back onto the true rays.  Sweep the camera lr.
    import os as _os
    lr = float(_os.environ.get("CAM_LR", "1e-3"))
    if _os.environ.get("NO_NORMAL_LOSSES"):
        import rsn.engine.trainer as _tr
        _tr.LOSS_COEFFICIENTS = {
            k: (0.0 if ("normal" in k or "orientation" in k) else v)
            for k, v in _tr.LOSS_COEFFICIENTS.items()}
        print("normal/orientation losses zeroed", flush=True)
    opts = dict(cfg.optimizers)
    opts["camera_opt"] = dataclasses.replace(
        opts["camera_opt"], lr=lr, lr_final=lr / 10.0)
    cfg = dataclasses.replace(cfg, optimizers=opts)
    print(f"camera lr = {lr}", flush=True)
    if _os.environ.get("FIELD_GT"):
        # self-consistent GT: render the frozen field at the TRUE train
        # poses; the photometric optimum is then exactly the
        # compensating delta (no model-vs-scene bias, no gauge slack)
        imgs = []
        for i in range(train_ds.cameras.num_cameras):
            out = render_image(trained, train_ds.cameras, i, cfg)
            imgs.append(np.clip(out["mid_reflect_fine"], 0, 1))
        train_bad = dataclasses.replace(
            train_bad, images=np.stack(imgs).astype(np.float32))
        print("using field-rendered GT", flush=True)
    _, d, _ = run("SO3xR3", steps, train_bad, eval_ds, cfg,
                  init_params=trained, freeze_field=True,
                  return_params=True)
    print(f"frozen-field SO3xR3 deltas: |rot|max={np.abs(d[:, :3]).max():.4f} "
          f"|trans|max={np.abs(d[:, 3:]).max():.4f}", flush=True)

    from rsn.data.cameras import generate_rays
    n_cam = train_ds.cameras.num_cameras
    H = int(train_ds.images.shape[1]); W = int(train_ds.images.shape[2])
    yy, xx = np.meshgrid(np.arange(0, H, 8), np.arange(0, W, 8),
                         indexing="ij")
    py = jnp.asarray(yy.ravel()); px = jnp.asarray(xx.ravel())
    errs_before, errs_after, oerr_b, oerr_a = [], [], [], []
    for c in range(n_cam):
        ci = jnp.full(py.shape, c, jnp.int32)
        o_true, d_true, _ = generate_rays(train_ds.cameras, ci, py, px)
        o_bad, d_bad, _ = generate_rays(train_bad.cameras, ci, py, px)
        from rsn.core.rays import RayBundle
        rb = RayBundle(origins=o_bad, directions=d_bad,
                       pixel_area=jnp.ones_like(o_bad[..., :1]),
                       nears=jnp.zeros_like(o_bad[..., :1]),
                       fars=jnp.ones_like(o_bad[..., :1]),
                       camera_indices=ci[:, None])
        fixed = camera_opt_lib.apply_to_bundle(
            rb, {"deltas": jnp.asarray(d)}, "SO3xR3")
        def ang(a, b):
            cos = np.clip(np.sum(np.asarray(a) * np.asarray(b), -1), -1, 1)
            return np.degrees(np.arccos(cos))
        errs_before.append(ang(d_bad, d_true).mean())
        errs_after.append(ang(fixed.directions, d_true).mean())
        oerr_b.append(np.linalg.norm(np.asarray(o_bad - o_true), axis=-1).mean())
        oerr_a.append(np.linalg.norm(np.asarray(fixed.origins - o_true), axis=-1).mean())
    print(f"ray direction err (deg): before {np.mean(errs_before):.3f} "
          f"-> after {np.mean(errs_after):.3f}", flush=True)
    print(f"ray origin err:          before {np.mean(oerr_b):.4f} "
          f"-> after {np.mean(oerr_a):.4f}", flush=True)


if __name__ == "__main__":
    main()
