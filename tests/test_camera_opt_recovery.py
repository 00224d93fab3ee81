"""End-to-end camera-opt recovery (VERDICT r1 #7): perturb known
synthetic poses by ~2 deg, optimize ONLY the SO3xR3 deltas against a
frozen field with field-rendered ground truth at the TRUE poses, and
assert the learned correction pulls the corrupted rays back toward the
true rays.

This promotes tools/exp_camera_opt_recovery.py's frozen-field/FIELD_GT
protocol (the bias-free one: the photometric optimum is exactly the
compensating delta) into CI, exercising the trainer's photometric-only
pose-gradient routing (rsn/engine/trainer.py make_train_step).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.configs import (DataManagerConfig, ModelConfig, PipelineConfig,
                         TrainerConfig)
from rsn.core.rays import RayBundle
from rsn.data.cameras import generate_rays
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.optimizers import build_optimizer
from rsn.engine.trainer import TrainState, make_train_step, render_image
from rsn.models import camera_opt as camera_opt_lib
from rsn.models import field as field_lib

ROT_STD = 0.02  # rad, ~1.1 deg per axis => ~2 deg total perturbations
TRANS_STD = 0.02


def _perturb(c2w: np.ndarray, rng) -> np.ndarray:
    out = c2w.copy()
    for i in range(c2w.shape[0]):
        w = rng.normal(0, ROT_STD, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]])
        R = (np.eye(3) + np.sin(th) / th * K
             + (1 - np.cos(th)) / th**2 * K @ K)
        out[i, :, :3] = c2w[i, :, :3] @ R
        out[i, :, 3] = c2w[i, :, 3] + rng.normal(0, TRANS_STD, 3)
    return out


@pytest.mark.slow
def test_pose_only_recovery_reduces_ray_error(tmp_path):
    cfg = TrainerConfig(
        pipeline=PipelineConfig(
            datamanager=DataManagerConfig(
                dataparser="synthetic", train_num_rays_per_batch=256,
                camera_optimizer="SO3xR3",
                # pure-recovery protocol: the gauge regularizer would
                # bias the learned correction below the true delta
                camera_opt_rot_penalty=0.0,
                camera_opt_trans_penalty=0.0),
            model=ModelConfig(num_coarse_samples=16,
                              num_importance_samples=16,
                              num_reflect_coarse_samples=8,
                              num_reflect_importance_samples=8,
                              eval_num_rays_per_chunk=1024)))
    # pose lr from the frozen-field sweep (tools/exp_camera_opt_recovery
    # .py on the full-size protocol): 1e-3 recovers 2.04deg -> 0.71deg;
    # 1e-2 overshoots into a far basin (|trans| ~ 0.77), 3e-3 partially
    opts = dict(cfg.optimizers)
    opts["camera_opt"] = dataclasses.replace(opts["camera_opt"],
                                             lr=1e-3, lr_final=1e-4)
    cfg = dataclasses.replace(cfg, optimizers=opts)

    ds = make_synthetic_dataset(num_cameras=4, H=32, W=32, scene="triple")

    # 1) train the field briefly on TRUE poses (no camera opt: route via
    # a config copy) to give the scene photometric structure
    cfg_field = dataclasses.replace(cfg, pipeline=dataclasses.replace(
        cfg.pipeline, datamanager=dataclasses.replace(
            cfg.pipeline.datamanager, camera_optimizer="off")))
    step_f, opt_f = make_train_step(cfg_field)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    state = TrainState(params=params, opt_state=opt_f.init(params),
                       step=jnp.int32(0))
    images = jnp.asarray(ds.images)

    @jax.jit
    def train_field(state):
        def body(_, s):
            s2, _m = step_f(s, images, ds.cameras, jax.random.PRNGKey(1))
            return s2
        return jax.lax.fori_loop(0, 300, body, state)

    state = train_field(state)
    trained = state.params

    # 2) ground truth = the FROZEN field rendered at the true poses
    # (photometric optimum == exactly the compensating delta)
    gt_imgs = np.stack([
        np.clip(render_image(trained, ds.cameras, i, cfg_field)
                ["mid_reflect_fine"], 0, 1)
        for i in range(4)]).astype(np.float32)

    # 3) corrupt the poses, optimize ONLY the deltas
    rng = np.random.default_rng(7)
    bad_cams = ds.cameras.replace(camera_to_worlds=jnp.asarray(
        _perturb(np.asarray(ds.cameras.camera_to_worlds), rng)))
    step_c, opt_c = make_train_step(cfg)
    camera = camera_opt_lib.init_camera_opt_params(4, "SO3xR3")
    state = TrainState(
        params=trained, opt_state=opt_c.init(trained), step=jnp.int32(0),
        camera=camera,
        camera_opt_state=build_optimizer(cfg.optimizers["camera_opt"])
        .init(camera))
    gt_dev = jnp.asarray(gt_imgs)

    @jax.jit
    def train_pose(state):
        def body(_, s):
            s2, _m = step_c(s, gt_dev, bad_cams, jax.random.PRNGKey(2))
            # freeze the field: pose-only optimization
            return s2.replace(params=s.params, opt_state=s.opt_state)
        # 1200 steps: at 800 the recovery sat at ratio 0.752 vs the
        # 0.75 assertion (VERDICT r3 weak #5) while still above the
        # ~0.85-0.9 deg CI-scale information floor — i.e. marginally
        # under-converged, not mis-routed; more steps restore margin
        return jax.lax.fori_loop(0, 1200, body, state)

    state = train_pose(state)
    deltas = {"deltas": state.camera["deltas"]}

    # 4) ray-space verification against the TRUE rays
    yy, xx = np.meshgrid(np.arange(0, 32, 4), np.arange(0, 32, 4),
                         indexing="ij")
    py, px = jnp.asarray(yy.ravel()), jnp.asarray(xx.ravel())
    before, after = [], []
    for c in range(4):
        ci = jnp.full(py.shape, c, jnp.int32)
        o_true, d_true, _ = generate_rays(ds.cameras, ci, py, px)
        o_bad, d_bad, _ = generate_rays(bad_cams, ci, py, px)
        rb = RayBundle(origins=o_bad, directions=d_bad,
                       pixel_area=jnp.ones_like(o_bad[..., :1]),
                       nears=jnp.zeros_like(o_bad[..., :1]),
                       fars=jnp.ones_like(o_bad[..., :1]),
                       camera_indices=ci[:, None])
        fixed = camera_opt_lib.apply_to_bundle(rb, deltas, "SO3xR3")

        def ang(a, b):
            cos = np.clip(np.sum(np.asarray(a) * np.asarray(b), -1),
                          -1, 1)
            return np.degrees(np.arccos(cos)).mean()

        before.append(ang(d_bad, d_true))
        after.append(ang(fixed.directions, d_true))
    before_m, after_m = np.mean(before), np.mean(after)
    assert before_m > 0.8, f"perturbation too small to test: {before_m}"
    # photometric-only routing + camera-center parameterization must
    # RECOVER.  Regression targets this guards: normal-loss routing
    # divergence (measured 1.4 deg -> 4.4 deg here, 2 -> 31 deg at full
    # scale) and the world-side origin-rotation stall (no change).  The
    # CI-scale floor is ~0.85-0.9 deg (a 300-step 32x32 field has
    # limited photometric information); the full-size protocol recovers
    # 2.04 -> 0.71 deg (tools/exp_camera_opt_recovery.py, TPU).
    assert after_m < 0.75 * before_m, (before_m, after_m)
    # and must not land in a far compensating basin (lr-overshoot
    # pathology: |trans| ~ 0.77 at camera lr 1e-2)
    assert np.abs(np.asarray(deltas["deltas"])[:, 3:]).max() < 0.3
