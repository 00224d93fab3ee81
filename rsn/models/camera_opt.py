"""Optional camera pose refinement (the "camera_opt" optimizer group).

The reference configures an Adam group named "camera_opt"
(reflect_sampling_nerf_config.py:53-57) that binds NO parameters — the
method never instantiates nerfstudio's CameraOptimizer (SURVEY.md B#6).
rsn keeps that default (mode "off"), but also provides a working
TPU-native implementation so the configured group can do its job on
real captures with imperfect poses:

- mode "SO3xR3": one se(3) delta (omega(3), t(3)) per training camera,
  zeros-init, applied about the CAMERA CENTER of each sampled ray:
  origins' = origins + t,  dirs' = R(omega) @ dirs.  All rays of a
  pinhole camera share their origin (the camera center), so this is
  exactly nerfstudio's c2w right-multiply up to a fixed per-camera
  linear reparameterization (t in world axes instead of camera axes;
  omega conjugated by the camera rotation) — same optimization
  geometry, but needing no camera-to-world inside the train step
  (ray correction stays a pure per-ray op).

  An earlier world-side LEFT form (origins' = R @ origins + t,
  rotation about the WORLD origin) spans the same space but is
  ill-conditioned: at camera distance |o| ~ 4 the rotation's leverage
  on the camera center (d(R o)/d omega ~ |o|) swamps its effect on
  the viewing direction, coupling omega and t into a narrow curved
  valley — measured frozen-field recovery STALLED (2.0deg -> 2.1deg
  after 3k steps) where the decoupled form recovers
  (tests/test_camera_opt_recovery.py).

Everything is differentiable and fixed-shape: the per-ray delta lookup
is a (R,)-gather on camera_indices, and the Rodrigues rotation uses
Taylor-guarded coefficients so gradients are exact at omega = 0 (where
every delta starts).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rsn.core.rays import RayBundle

MODES = ("off", "SO3xR3")


def init_camera_opt_params(num_cameras: int, mode: str):
    """-> {"deltas": (N, 6) zeros} for SO3xR3, None for off."""
    if mode == "off":
        return None
    if mode != "SO3xR3":
        raise ValueError(f"unknown camera_optimizer mode {mode!r}")
    return {"deltas": jnp.zeros((num_cameras, 6), jnp.float32)}


def rotate_rodrigues(omega: jax.Array, v: jax.Array) -> jax.Array:
    """R(omega) @ v for axis-angle omega (..., 3) applied to v (..., 3).

    R v = v + sinc(|w|) (w x v) + 0.5 sinc(|w|/2)^2 w x (w x v), with
    series-guarded coefficients (exact value AND gradient at |w| = 0).
    """
    theta2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    small = theta2 < 1e-8
    # double-where: the unsafe branch must see a safe denominator, or
    # its (untaken) derivative is 0/0 = NaN and poisons the VJP
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos t)/t^2 with 2-term Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    wxv = jnp.cross(omega, v)
    wxwxv = jnp.cross(omega, wxv)
    return v + a * wxv + b * wxwxv


def apply_to_bundle(bundle: RayBundle, cam_params,
                    mode: str = "off") -> RayBundle:
    """Apply per-camera pose deltas to a sampled ray bundle."""
    if mode == "off" or cam_params is None:
        return bundle
    assert bundle.camera_indices is not None, (
        "camera optimizer needs camera_indices on the ray bundle")
    deltas = cam_params["deltas"][bundle.camera_indices[..., 0]]  # (R, 6)
    omega, t = deltas[..., 0:3], deltas[..., 3:6]
    # rotation acts about the camera center (= every ray's origin), so
    # it moves directions only; translation moves the center.  See the
    # module docstring for why the origin must NOT be rotated.
    origins = bundle.origins + t
    dirs = rotate_rodrigues(omega, bundle.directions)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return bundle.replace(origins=origins, directions=dirs)


def regularization_loss(cam_params, rot_penalty: float = 1e-3,
                        trans_penalty: float = 1e-2) -> jax.Array:
    """L2 penalty on the pose deltas (nerfstudio CameraOptimizerConfig
    semantics: rot_l2_penalty / trans_l2_penalty).  Without it the
    camera/scene gauge freedom lets poses drift on scenes whose poses
    are already good (measured: |delta| up to 0.55 after a 2k-step
    joint run on exact synthetic poses, PSNR 12.3 vs 19.6 with poses
    frozen)."""
    if cam_params is None:
        return jnp.float32(0.0)
    d = cam_params["deltas"]
    rot = jnp.sum(d[..., 0:3] ** 2)
    trans = jnp.sum(d[..., 3:6] ** 2)
    return rot_penalty * rot + trans_penalty * trans
