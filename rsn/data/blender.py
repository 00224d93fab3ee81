"""Blender-synthetic (NeRF transforms_*.json), nerfstudio-format, and
instant-ngp-format dataset loaders.

Rebuilds the capability of nerfstudio's ``BlenderDataParser`` (reference
config at reflect_sampling_nerf_config.py:36: Blender parser, white alpha
blending) and ``NerfstudioDataParser`` (real captures), returning a
device-resident dataset:

- images: (N, H, W, 3) float32 in [0,1], RGBA alpha-blended to white
  (Blender alpha_color="white", the nerfstudio default used here)
- cameras: stacked pinhole Cameras (fx = 0.5*W / tan(0.5*camera_angle_x)
  for Blender; per-frame intrinsics for nerfstudio format)

Images are loaded on host with PIL and shipped to device once — the
steady-state train loop then samples pixels fully on-device.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from rsn.data.cameras import Cameras


@dataclasses.dataclass
class Dataset:
    images: np.ndarray  # (N, H, W, 3) float32
    cameras: Cameras
    split: str


def _load_image(path: str, downscale: int = 1) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    if downscale > 1:
        img = img.resize((img.width // downscale, img.height // downscale),
                         Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 4:  # alpha-blend to white (BlenderDataParser default)
        arr = arr[..., :3] * arr[..., 3:] + (1.0 - arr[..., 3:])
    return arr[..., :3]


def _load_images_batch(paths: List[str], downscale: int = 1) -> np.ndarray:
    """Decode a list of same-size images -> (N, H, W, 3) float32.

    Uses the native multithreaded C++ PNG decoder (rsn.data.native;
    white-alpha blend applied in C) when available and applicable;
    falls back to PIL per-image otherwise.
    """
    if downscale == 1 and paths and paths[0].lower().endswith(".png"):
        from rsn.data import native
        probed = native.probe_png(paths[0])
        if probed is not None:
            h, w = probed
            out = native.decode_png_batch(paths, h, w, blend_white=True)
            if out is not None:
                return out
    return np.stack([_load_image(p, downscale) for p in paths])


def load_blender(data_dir: str, split: str = "train", downscale: int = 1,
                 scale_factor: float = 1.0,
                 max_images: Optional[int] = None) -> Dataset:
    """Load a NeRF-synthetic scene split from transforms_<split>.json."""
    import jax.numpy as jnp

    with open(os.path.join(data_dir, f"transforms_{split}.json")) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if max_images is not None:
        frames = frames[:max_images]

    paths: List[str] = []
    poses: List[np.ndarray] = []
    for frame in frames:
        fname = os.path.join(data_dir, frame["file_path"].replace("./", ""))
        if not os.path.splitext(fname)[1]:
            fname = fname + ".png"
        paths.append(fname)
        poses.append(np.array(frame["transform_matrix"], dtype=np.float32))

    imgs = _load_images_batch(paths, downscale)  # (N, H, W, 3)
    poses_np = np.stack(poses)  # (N, 4, 4)
    poses_np[:, :3, 3] *= scale_factor
    N, H, W = imgs.shape[:3]

    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

    cameras = Cameras(
        camera_to_worlds=jnp.asarray(poses_np[:, :3, :4]),
        fx=jnp.full((N,), focal, jnp.float32),
        fy=jnp.full((N,), focal, jnp.float32),
        cx=jnp.full((N,), W / 2.0, jnp.float32),
        cy=jnp.full((N,), H / 2.0, jnp.float32),
        width=W, height=H)
    return Dataset(images=imgs, cameras=cameras, split=split)


def _rotation_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit vector a to unit vector b
    (Rodrigues; nerfstudio camera_utils.rotation_matrix semantics)."""
    c = float(np.dot(a, b))
    if c < -1.0 + 1e-6:
        # near anti-parallel: 1/(1+c) is catastrophically cancelled —
        # rotate pi about any axis orthogonal to a
        helper = np.array([1.0, 0.0, 0.0])
        if abs(a[0]) > 0.9:
            helper = np.array([0.0, 1.0, 0.0])
        axis = np.cross(a, helper)
        axis = axis / np.linalg.norm(axis)
        return (2.0 * np.outer(axis, axis) - np.eye(3)).astype(np.float32)
    v = np.cross(a, b)
    if np.linalg.norm(v) < 1e-8:  # parallel
        return np.eye(3, dtype=np.float32)
    vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + vx + vx @ vx * (1.0 / (1.0 + c))


def auto_orient_and_center_poses(poses: np.ndarray,
                                 method: str = "up",
                                 center_method: str = "poses"):
    """nerfstudio camera_utils.auto_orient_and_center_poses defaults:
    center on the mean camera origin, rotate the mean camera up vector
    (+y column of OpenGL c2w) onto world +z.  poses: (N, 3or4, 4) ->
    (N, 3, 4)."""
    poses = np.asarray(poses, np.float32)[:, :3, :4].copy()
    if center_method == "poses":
        center = poses[:, :3, 3].mean(axis=0)
    else:
        center = np.zeros(3, np.float32)
    if method == "up":
        up = poses[:, :3, 1].mean(axis=0)
        up = up / max(np.linalg.norm(up), 1e-8)
        rot = _rotation_between(up, np.array([0.0, 0.0, 1.0]))
    else:
        rot = np.eye(3, dtype=np.float32)
    poses[:, :3, 3] = (poses[:, :3, 3] - center) @ rot.T
    poses[:, :3, :3] = np.einsum("ij,njk->nik", rot, poses[:, :3, :3])
    return poses.astype(np.float32)


def auto_scale_poses(poses: np.ndarray) -> float:
    """nerfstudio auto_scale_poses: 1 / max camera-origin norm."""
    return float(1.0 / max(np.linalg.norm(poses[:, :3, 3], axis=-1).max(),
                           1e-8))


_DIST_KEYS = ("k1", "k2", "k3", "k4", "p1", "p2")


def load_nerfstudio(data_dir: str, split: str = "train", downscale: int = 1,
                    train_fraction: float = 0.9,
                    max_images: Optional[int] = None,
                    scale_factor: float = 1.0) -> Dataset:
    """Load a nerfstudio-format real capture (transforms.json with
    per-frame intrinsics).  Splits by the nerfstudio convention: every
    eval_interval-th image to eval (approximated by train_fraction).
    Applies the NerfstudioDataParser's default pose processing (orient
    up, center on poses, auto-scale to the unit ball) and carries the
    OpenCV distortion coefficients into the Cameras (undistorted at
    ray-generation time, rsn.data.cameras.undistort_coords)."""
    import jax.numpy as jnp

    with open(os.path.join(data_dir, "transforms.json")) as f:
        meta = json.load(f)
    frames = meta["frames"]
    n = len(frames)

    camera_model = meta.get("camera_model", "OPENCV")
    if camera_model in ("OPENCV", "PINHOLE", "SIMPLE_PINHOLE"):
        cam_model = "perspective"
    elif camera_model == "OPENCV_FISHEYE":
        cam_model = "fisheye"  # Kannala-Brandt theta polynomial (k1-k4)
    elif camera_model == "EQUIRECTANGULAR":
        cam_model = "equirectangular"  # intrinsics derived from W/H
    else:
        # unknown projections must fail loudly, not generate wrong rays
        raise NotImplementedError(
            f"camera_model {camera_model!r} is not supported "
            "(OPENCV/PINHOLE perspective, OPENCV_FISHEYE, or "
            "EQUIRECTANGULAR)")

    # pose normalization MUST be computed from ALL frames before the
    # split, or train and eval cameras land in different world frames
    # (nerfstudio computes the transform once over every pose)
    all_poses = np.stack([np.array(f["transform_matrix"], np.float32)
                          for f in frames])
    all_poses = auto_orient_and_center_poses(all_poses)
    all_poses[:, :3, 3] *= auto_scale_poses(all_poses) * scale_factor

    idx = np.arange(n)
    n_train = int(round(n * train_fraction))
    train_idx = np.linspace(0, n - 1, n_train, dtype=int)
    eval_idx = np.setdiff1d(idx, train_idx)
    sel = train_idx if split == "train" else eval_idx
    if max_images is not None:
        sel = sel[:max_images]

    def gkey(frame, key):
        return frame.get(key, meta.get(key))

    images, fx, fy, cx, cy, dist = [], [], [], [], [], []
    for i in sel:
        frame = frames[i]
        fname = os.path.join(data_dir, frame["file_path"])
        images.append(_load_image(fname, downscale))
        if cam_model != "equirectangular":  # panoramas carry no focals
            fx.append(float(gkey(frame, "fl_x")) / downscale)
            fy.append(float(gkey(frame, "fl_y")) / downscale)
            cx.append(float(gkey(frame, "cx")) / downscale)
            cy.append(float(gkey(frame, "cy")) / downscale)
        dist.append([float(gkey(frame, k) or 0.0) for k in _DIST_KEYS])

    imgs = np.stack(images)
    if cam_model == "equirectangular":
        # normalized panorama intrinsics (rsn.data.cameras): azimuth
        # spans +-pi across the width, polar 0..pi over the height
        h_, w_ = imgs.shape[1:3]
        n_sel = len(sel)
        fx = [w_ / 2.0] * n_sel
        fy = [float(h_)] * n_sel
        cx = [w_ / 2.0] * n_sel
        cy = [h_ / 2.0] * n_sel
    poses_np = all_poses[sel]
    dist_np = np.asarray(dist, np.float32)
    N, H, W = imgs.shape[:3]
    cameras = Cameras(
        camera_to_worlds=jnp.asarray(poses_np[:, :3, :4]),
        fx=jnp.asarray(fx, jnp.float32), fy=jnp.asarray(fy, jnp.float32),
        cx=jnp.asarray(cx, jnp.float32), cy=jnp.asarray(cy, jnp.float32),
        width=W, height=H,
        distortion=(jnp.asarray(dist_np)
                    if np.any(dist_np != 0.0) else None),
        camera_model=cam_model)
    return Dataset(images=imgs, cameras=cameras, split=split)


def load_instant_ngp(data_dir: str, split: str = "train",
                     downscale: int = 1, train_fraction: float = 0.9,
                     max_images: Optional[int] = None,
                     scale_factor: float = 1.0) -> Dataset:
    """Load an instant-ngp-format capture (transforms.json with shared
    top-level intrinsics and `aabb_scale`) — the third dataparser of
    nerfstudio's core set (InstantNGPDataParserConfig).

    Format differences from the nerfstudio format handled here:
    - intrinsics usually live at the TOP level (`fl_x`/`fl_y`/`cx`/`cy`
      /`w`/`h`), with `camera_angle_x`/`camera_angle_y` as the fallback
      focal specification; per-frame keys still win when present
    - distortion is OpenCV `k1 k2 p1 p2`
    - `aabb_scale` declares the scene bound (power of two); instant-ngp
      scenes are pre-scaled into the [0, aabb_scale] box
    Deviation (documented): poses are auto-oriented/centered/scaled into
    the unit ball like our nerfstudio loader, because rsn's collider
    (near 2 / far 6) and the mip-360 contraction assume a normalized
    world — nerfstudio's parser instead keeps raw NGP coordinates and
    widens its scene box by aabb_scale.  Values are equivalent up to the
    global similarity transform, which NeRF training is invariant to.
    """
    import jax.numpy as jnp

    with open(os.path.join(data_dir, "transforms.json")) as f:
        meta = json.load(f)
    frames = meta["frames"]
    n = len(frames)

    all_poses = np.stack([np.array(f["transform_matrix"], np.float32)
                          for f in frames])
    all_poses = auto_orient_and_center_poses(all_poses)
    all_poses[:, :3, 3] *= auto_scale_poses(all_poses) * scale_factor

    idx = np.arange(n)
    n_train = int(round(n * train_fraction))
    train_idx = np.linspace(0, n - 1, n_train, dtype=int)
    eval_idx = np.setdiff1d(idx, train_idx)
    sel = train_idx if split == "train" else eval_idx
    if max_images is not None:
        sel = sel[:max_images]

    def gkey(frame, key, default=None):
        v = frame.get(key, meta.get(key))
        return default if v is None else v

    images, fx, fy, cx, cy, dist = [], [], [], [], [], []
    for i in sel:
        frame = frames[i]
        fname = os.path.join(data_dir, frame["file_path"])
        if not os.path.splitext(fname)[1]:
            fname = fname + ".png"
        images.append(_load_image(fname, downscale))
        h_, w_ = images[-1].shape[:2]
        flx = gkey(frame, "fl_x")
        if flx is None:  # camera_angle fallback (instant-ngp synthetic)
            flx = 0.5 * w_ * downscale / np.tan(
                0.5 * float(gkey(frame, "camera_angle_x")))
        fly = gkey(frame, "fl_y")
        if fly is None:
            ay = gkey(frame, "camera_angle_y")
            fly = (0.5 * h_ * downscale / np.tan(0.5 * float(ay))
                   if ay is not None else flx)
        fx.append(float(flx) / downscale)
        fy.append(float(fly) / downscale)
        cx.append(float(gkey(frame, "cx", w_ * downscale / 2.0)) / downscale)
        cy.append(float(gkey(frame, "cy", h_ * downscale / 2.0)) / downscale)
        dist.append([float(gkey(frame, k, 0.0) or 0.0)
                     for k in _DIST_KEYS])

    imgs = np.stack(images)
    poses_np = all_poses[sel]
    dist_np = np.asarray(dist, np.float32)
    N, H, W = imgs.shape[:3]
    cameras = Cameras(
        camera_to_worlds=jnp.asarray(poses_np[:, :3, :4]),
        fx=jnp.asarray(fx, jnp.float32), fy=jnp.asarray(fy, jnp.float32),
        cx=jnp.asarray(cx, jnp.float32), cy=jnp.asarray(cy, jnp.float32),
        width=W, height=H,
        distortion=(jnp.asarray(dist_np)
                    if np.any(dist_np != 0.0) else None))
    return Dataset(images=imgs, cameras=cameras, split=split)


def load_dataset(parser: str, data_dir: str, split: str,
                 downscale: int = 1, scale_factor: float = 1.0,
                 max_images: Optional[int] = None) -> Dataset:
    if parser == "blender":
        return load_blender(data_dir, split, downscale, scale_factor,
                            max_images)
    if parser == "nerfstudio":
        return load_nerfstudio(data_dir, split, downscale,
                               max_images=max_images,
                               scale_factor=scale_factor)
    if parser == "instant-ngp":
        return load_instant_ngp(data_dir, split, downscale,
                                max_images=max_images,
                                scale_factor=scale_factor)
    if parser == "synthetic":
        from rsn.data.synthetic import make_synthetic_dataset
        # data selects the procedural scene ("sphere" | "triple" |
        # "specular" | "glossy" | "shinyfloor"); empty = the default
        # diffuse sphere.
        # Optional
        # :key=value suffixes size the dataset, e.g.
        # "specular:cams=48,res=96" (the defaults, 12 cams at 64^2, are
        # data-starved for geometry-critical benchmarks like the mirror
        # scene — a convex mirror needs many views for consistent
        # normals).
        spec = data_dir or "sphere"
        scene, _, opts = spec.partition(":")
        kw = {}
        for item in filter(None, opts.split(",")):
            k, _, v = item.partition("=")
            if k == "cams":
                kw["num_cameras"] = int(v)
            elif k == "res":
                kw["H"] = kw["W"] = int(v)
            elif k == "extrap":
                # extrapolated-view eval: non-train splits use cameras
                # OUTSIDE the training elevation band ("hi" | "lo",
                # synthetic.EXTRAP_BANDS)
                kw["extrap"] = v
            else:
                raise ValueError(f"unknown synthetic-scene option: {item}")
        return make_synthetic_dataset(split=split, scene=scene or "sphere",
                                      **kw)
    raise ValueError(f"unknown dataparser: {parser}")
