"""Pinhole cameras and on-device ray generation.

Rebuilds the nerfstudio ``Cameras.generate_rays`` / ``RayGenerator``
semantics the reference inherits (SURVEY.md §2.2: camera model ->
per-pixel origin/direction/pixel_area; consumed via
reflect_sampling_nerf_datamanager.py:49-58):

- pixel centers at (x + 0.5, y + 0.5)
- OpenGL-style camera space: dir_cam = [(x-cx)/fx, -(y-cy)/fy, -1],
  rotated by camera-to-world, normalized
- pixel_area = |d(x+1,y) - d(x,y)| * |d(x,y+1) - d(x,y)| of the
  *normalized* directions (nerfstudio's finite-difference cone footprint)

Everything is a pure jittable function of a stacked camera pytree, so ray
generation runs on-device inside the train step (no host round trip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Cameras:
    """Stacked cameras. Leading axis = camera index."""
    camera_to_worlds: jax.Array  # (N, 3, 4)
    fx: jax.Array  # (N,)
    fy: jax.Array  # (N,)
    cx: jax.Array  # (N,)
    cy: jax.Array  # (N,)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    # distortion coefficients per camera; None = ideal lens.
    # perspective: OpenCV [k1 k2 k3 k4 p1 p2];
    # fisheye: Kannala-Brandt [k1 k2 k3 k4 0 0] (theta polynomial)
    distortion: jax.Array | None = None  # (N, 6)
    # projection model: "perspective" (pinhole+OpenCV distortion),
    # "fisheye" (OPENCV_FISHEYE equidistant, theta-polynomial), or
    # "equirectangular" (360 panorama; fx = W/2, fy = H)
    camera_model: str = struct.field(pytree_node=False,
                                     default="perspective")

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]


def rescale_cameras(cams: Cameras, factor: float) -> Cameras:
    """Render-resolution override (the ns-render `--downscale-factor`
    semantics): divide the image plane by `factor` — width/height and
    the four intrinsics scale together, so every pixel keeps its world
    ray; poses, distortion coefficients, and the projection model are
    resolution-invariant (Kannala-Brandt / OpenCV polynomials act on
    normalized coordinates)."""
    if factor == 1.0:
        return cams
    if factor <= 0.0:
        raise ValueError(f"downscale factor must be > 0, got {factor}")
    s = 1.0 / float(factor)
    return cams.replace(
        fx=cams.fx * s, fy=cams.fy * s, cx=cams.cx * s, cy=cams.cy * s,
        width=max(1, int(round(cams.width * s))),
        height=max(1, int(round(cams.height * s))))


def undistort_coords(x: jax.Array, y: jax.Array,
                     dist: jax.Array, iters: int = 10):
    """Invert the OpenCV radial(k1..k4)+tangential(p1,p2) model on
    normalized image coords — nerfstudio's
    radial_and_tangential_undistort: Newton iterations on the residual
    distort(xu, yu) - (x, y) with the analytic 2x2 Jacobian (a plain
    fixed-point iteration diverges for strong wide-angle distortion,
    e.g. k1 = -0.28 at the image corner).

    Args: x, y: (...,) distorted normalized coords; dist: (..., 6).
    """
    k1, k2, k3, k4 = (dist[..., 0], dist[..., 1], dist[..., 2],
                      dist[..., 3])
    p1, p2 = dist[..., 4], dist[..., 5]
    eps = 1e-6
    xu, yu = x, y
    for _ in range(iters):
        r = xu * xu + yu * yu
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        fx = d * xu + 2.0 * p1 * xu * yu + p2 * (r + 2.0 * xu * xu) - x
        fy = d * yu + 2.0 * p2 * xu * yu + p1 * (r + 2.0 * yu * yu) - y
        d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + 4.0 * k4 * r))
        d_x = 2.0 * xu * d_r
        d_y = 2.0 * yu * d_r
        fx_x = d + d_x * xu + 2.0 * p1 * yu + 6.0 * p2 * xu
        fx_y = d_y * xu + 2.0 * p1 * xu + 2.0 * p2 * yu
        fy_x = d_x * yu + 2.0 * p2 * yu + 2.0 * p1 * xu
        fy_y = d + d_y * yu + 2.0 * p2 * xu + 6.0 * p1 * yu
        denom = fy_x * fx_y - fx_x * fy_y
        safe = jnp.abs(denom) > eps
        denom_s = jnp.where(safe, denom, 1.0)
        xu = xu + jnp.where(safe, (fx * fy_y - fy * fx_y) / denom_s, 0.0)
        yu = yu + jnp.where(safe, (fy * fx_x - fx * fy_x) / denom_s, 0.0)
    return xu, yu


def distort_coords(x: jax.Array, y: jax.Array, dist: jax.Array):
    """Forward OpenCV distortion (the inverse of undistort_coords)."""
    k1, k2, k3, k4 = (dist[..., 0], dist[..., 1], dist[..., 2],
                      dist[..., 3])
    p1, p2 = dist[..., 4], dist[..., 5]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def fisheye_distort_theta(theta: jax.Array, dist: jax.Array) -> jax.Array:
    """Kannala-Brandt theta polynomial: theta_d = theta (1 + k1 t^2 +
    k2 t^4 + k3 t^6 + k4 t^8)  (OpenCV fisheye forward model)."""
    k1, k2, k3, k4 = (dist[..., 0], dist[..., 1], dist[..., 2],
                      dist[..., 3])
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def fisheye_undistort_theta(theta_d: jax.Array, dist: jax.Array,
                            iters: int = 10) -> jax.Array:
    """Invert the theta polynomial with Newton iterations."""
    k1, k2, k3, k4 = (dist[..., 0], dist[..., 1], dist[..., 2],
                      dist[..., 3])
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) \
            - theta_d
        fp = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (
            7.0 * k3 + 9.0 * k4 * t2)))
        theta = theta - f / jnp.where(jnp.abs(fp) > 1e-6, fp, 1.0)
    return theta


def _camera_space_dirs(x: jax.Array, y: jax.Array, fx, fy, cx, cy,
                       dist=None, camera_model: str = "perspective"):
    """Unnormalized camera-space directions for pixel-center coords."""
    u = (x - cx) / fx
    v = (y - cy) / fy
    if camera_model == "equirectangular":
        # 360 panorama: azimuth theta sweeps +pi..-pi across the width
        # (u in [-1, 1], loaders set fx = W/2), polar phi sweeps
        # 0 (up, image top) .. pi (down) over the height (v in
        # [-1/2, 1/2], fy = H).  Center pixel looks down -z like the
        # perspective model.
        theta = -jnp.pi * u
        phi = jnp.pi * (0.5 + v)
        sin_phi = jnp.sin(phi)
        return jnp.stack([-jnp.sin(theta) * sin_phi,
                          jnp.cos(phi),
                          -jnp.cos(theta) * sin_phi], axis=-1)
    if camera_model == "fisheye":
        # equidistant projection: pixel radius ~ theta_d; undo the
        # theta polynomial, then r = tan(theta) recovers pinhole coords
        theta_d = jnp.sqrt(u * u + v * v)
        if dist is not None:
            theta = fisheye_undistort_theta(theta_d, dist)
        else:
            theta = theta_d
        scale = jnp.where(theta_d > 1e-9, jnp.tan(theta)
                          / jnp.maximum(theta_d, 1e-9), 1.0)
        u = u * scale
        v = v * scale
    elif dist is not None:
        u, v = undistort_coords(u, v, dist)
    return jnp.stack([u, -v, -jnp.ones_like(x)], axis=-1)


def generate_rays(cameras: Cameras, camera_indices: jax.Array,
                  pixel_y: jax.Array, pixel_x: jax.Array):
    """Rays for (camera, y, x) index triples.

    Args:
      camera_indices/pixel_y/pixel_x: (R,) int32
    Returns:
      origins (R,3), directions (R,3) unit, pixel_area (R,1)
    """
    c2w = cameras.camera_to_worlds[camera_indices]  # (R, 3, 4)
    fx = cameras.fx[camera_indices]
    fy = cameras.fy[camera_indices]
    cx = cameras.cx[camera_indices]
    cy = cameras.cy[camera_indices]
    dist = (cameras.distortion[camera_indices]
            if cameras.distortion is not None else None)

    xs = pixel_x.astype(jnp.float32) + 0.5
    ys = pixel_y.astype(jnp.float32) + 0.5

    def world_dir(px, py):
        d_cam = _camera_space_dirs(px, py, fx, fy, cx, cy, dist,
                                   cameras.camera_model)  # (R, 3)
        d = jnp.einsum("rij,rj->ri", c2w[..., :3, :3], d_cam)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    d0 = world_dir(xs, ys)
    dx_dir = world_dir(xs + 1.0, ys)
    dy_dir = world_dir(xs, ys + 1.0)
    dx = jnp.linalg.norm(d0 - dx_dir, axis=-1)
    dy = jnp.linalg.norm(d0 - dy_dir, axis=-1)
    pixel_area = (dx * dy)[..., None]

    origins = c2w[..., :3, 3]
    return origins, d0, pixel_area


def generate_image_rays(cameras: Cameras, camera_index: int):
    """All H*W rays of one camera, row-major. Returns (origins, dirs,
    pixel_area) each with leading dim H*W."""
    H, W = cameras.height, cameras.width
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    idx = jnp.full((H * W,), camera_index, dtype=jnp.int32)
    return generate_rays(cameras, idx, yy.reshape(-1), xx.reshape(-1))
