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
    """Stacked pinhole cameras. Leading axis = camera index."""
    camera_to_worlds: jax.Array  # (N, 3, 4)
    fx: jax.Array  # (N,)
    fy: jax.Array  # (N,)
    cx: jax.Array  # (N,)
    cy: jax.Array  # (N,)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]


def _camera_space_dirs(x: jax.Array, y: jax.Array, fx, fy, cx, cy):
    """Unnormalized camera-space directions for pixel-center coords."""
    return jnp.stack([
        (x - cx) / fx,
        -(y - cy) / fy,
        -jnp.ones_like(x),
    ], axis=-1)


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

    xs = pixel_x.astype(jnp.float32) + 0.5
    ys = pixel_y.astype(jnp.float32) + 0.5

    def world_dir(px, py):
        d_cam = _camera_space_dirs(px, py, fx, fy, cx, cy)  # (R, 3)
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
