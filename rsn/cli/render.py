"""rsn-render — the `ns-render` equivalent: render eval cameras (or an
orbit path) from a trained run to PNGs, with the reference's eval image
panels (rgb | accumulation colormap | depth colormap; SURVEY.md §3.3).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def apply_colormap(x: np.ndarray) -> np.ndarray:
    """Scalar (H,W,1) -> turbo colormap RGB (nerfstudio default)."""
    import matplotlib
    v = np.clip(x[..., 0], 0.0, 1.0)
    return matplotlib.colormaps["turbo"](v)[..., :3].astype(np.float32)


def apply_depth_colormap(depth: np.ndarray, accumulation: np.ndarray,
                         near: float, far: float) -> np.ndarray:
    """Depth -> turbo, normalized by the collider near/far planes and
    modulated by accumulation (reference model.py:444-455)."""
    v = np.clip((depth - near) / max(far - near, 1e-6), 0.0, 1.0)
    rgb = apply_colormap(v)
    return rgb * accumulation + (1.0 - accumulation)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def save_video(path: str, frames, fps: int = 24) -> str:
    """Write frames (list of float [0,1] HxWx3) as .mp4 via ffmpeg when
    available, else as an animated .gif (PIL, no external deps) —
    ns-render writes videos; this environment has no ffmpeg, so the
    GIF container is the dependency-free fallback.  Returns the path
    actually written (extension may change)."""
    import shutil
    import subprocess
    import tempfile

    from PIL import Image

    imgs = [Image.fromarray((np.clip(f, 0, 1) * 255).astype(np.uint8))
            for f in frames]
    if path.endswith(".mp4") and shutil.which("ffmpeg"):
        with tempfile.TemporaryDirectory() as td:
            for i, im in enumerate(imgs):
                im.save(os.path.join(td, f"{i:05d}.png"))
            subprocess.run(
                ["ffmpeg", "-y", "-framerate", str(fps), "-i",
                 os.path.join(td, "%05d.png"), "-pix_fmt", "yuv420p",
                 path], check=True, capture_output=True)
        return path
    if path.endswith(".mp4"):
        path = path[:-4] + ".gif"
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, round(1000 / fps)), loop=0)
    return path


def render_panels(out: dict, gt: np.ndarray, near: float, far: float):
    """The reference's three eval panels (model.py:457-459)."""
    from rsn.models.model import final_rgb
    rgb = np.concatenate([gt, np.clip(out["mid_rgb_coarse"], 0, 1),
                          np.clip(final_rgb(out), 0, 1)], axis=1)
    acc = np.concatenate([apply_colormap(out["accumulation_coarse"]),
                          apply_colormap(out["accumulation_fine"])], axis=1)
    depth = np.concatenate([
        apply_depth_colormap(out["depth_coarse"],
                             out["accumulation_coarse"], near, far),
        apply_depth_colormap(out["depth_fine"],
                             out["accumulation_fine"], near, far)], axis=1)
    return {"img": rgb, "accumulation": acc, "depth": depth}


def orbit_cameras(reference_cameras, num_frames: int = 60,
                  elevation: float = 0.35):
    """Camera path: an orbit at the train cameras' mean radius looking
    at the origin (the ns-render camera-path equivalent)."""
    import jax.numpy as jnp
    from rsn.data.cameras import Cameras
    from rsn.data.synthetic import _look_at_pose

    c2w = np.asarray(reference_cameras.camera_to_worlds)
    radius = float(np.linalg.norm(c2w[:, :3, 3], axis=-1).mean())
    poses = []
    for i in range(num_frames):
        theta = 2.0 * np.pi * i / num_frames
        eye = np.array([np.cos(theta), np.sin(theta),
                        np.sin(elevation)], np.float32)
        eye *= radius / np.linalg.norm(eye)
        poses.append(_look_at_pose(eye))
    poses_np = np.stack(poses)
    n = num_frames
    return Cameras(
        camera_to_worlds=jnp.asarray(poses_np[:, :3, :4]),
        fx=jnp.full((n,), float(reference_cameras.fx[0])),
        fy=jnp.full((n,), float(reference_cameras.fy[0])),
        cx=jnp.full((n,), float(reference_cameras.cx[0])),
        cy=jnp.full((n,), float(reference_cameras.cy[0])),
        width=reference_cameras.width, height=reference_cameras.height)


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> unit quaternion (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2.0
    q = np.empty(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def _slerp(q0: np.ndarray, q1: np.ndarray, t: float) -> np.ndarray:
    if np.dot(q0, q1) < 0:  # shortest arc
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    if d > 0.9995:  # nearly parallel: lerp
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    theta = np.arccos(d)
    return (np.sin((1 - t) * theta) * q0
            + np.sin(t * theta) * q1) / np.sin(theta)


def interpolate_cameras(reference_cameras, steps_per_transition: int = 10,
                        max_frames: int = 0):
    """ns-render `interpolate` equivalent: a smooth path through the
    dataset's camera poses — rotation slerp + translation/intrinsics
    lerp between consecutive cameras, `steps_per_transition` frames per
    segment.  Keyframes reproduce the dataset cameras exactly
    (projection model and per-camera distortion carry through; between
    keyframes, distortion follows the segment's start camera).
    max_frames > 0 evenly subsamples the path down to that many frames
    (keeping the first and last)."""
    import jax
    import jax.numpy as jnp
    from rsn.data.cameras import Cameras

    ref = reference_cameras
    c2w = np.asarray(ref.camera_to_worlds)
    quats = [_rot_to_quat(m[:3, :3]) for m in c2w]
    intr = np.stack([np.asarray(ref.fx), np.asarray(ref.fy),
                     np.asarray(ref.cx), np.asarray(ref.cy)], axis=-1)
    dist = None if ref.distortion is None else np.asarray(ref.distortion)
    poses, intrs, dists = [], [], []
    for a in range(len(c2w) - 1):
        for s in range(steps_per_transition):
            t = s / steps_per_transition
            m = np.eye(4, dtype=np.float32)[:3, :4].copy()
            m[:3, :3] = _quat_to_rot(_slerp(quats[a], quats[a + 1], t))
            m[:3, 3] = (1 - t) * c2w[a, :3, 3] + t * c2w[a + 1, :3, 3]
            poses.append(m)
            intrs.append((1 - t) * intr[a] + t * intr[a + 1])
            if dist is not None:
                dists.append(dist[a])
    poses.append(c2w[-1, :3, :4])
    intrs.append(intr[-1])
    if dist is not None:
        dists.append(dist[-1])
    intrs = np.stack(intrs).astype(np.float32)
    cams = Cameras(
        camera_to_worlds=jnp.asarray(np.stack(poses)),
        fx=jnp.asarray(intrs[:, 0]), fy=jnp.asarray(intrs[:, 1]),
        cx=jnp.asarray(intrs[:, 2]), cy=jnp.asarray(intrs[:, 3]),
        width=ref.width, height=ref.height,
        distortion=None if dist is None else jnp.asarray(np.stack(dists)),
        camera_model=ref.camera_model)
    n = cams.num_cameras
    if 0 < max_frames < n:
        idx = np.unique(np.linspace(0, n - 1, max_frames).round()
                        .astype(np.int64))
        cams = jax.tree.map(lambda x: x[idx], cams)
    return cams


def spiral_cameras(reference_cameras, num_frames: int = 60,
                   radius_frac: float = 0.1, zrate: float = 0.5,
                   rotations: int = 2):
    """ns-render `spiral` equivalent: a spiral about the first dataset
    camera, offsetting the eye in the camera's local right/up plane
    (radius = radius_frac x its distance to the world origin) with a
    slow oscillation along its view axis, every frame re-aimed at the
    WORLD ORIGIN — the scene center after the loaders' pose
    normalization (auto-center/orient), which is where Blender and
    normalized nerfstudio captures put the subject.  The first
    camera's intrinsics/projection model carry to every frame."""
    import jax.numpy as jnp
    from rsn.data.cameras import Cameras
    from rsn.data.synthetic import _look_at_pose

    ref = reference_cameras
    base = np.asarray(ref.camera_to_worlds)[0]
    eye0 = base[:3, 3]
    right, up = base[:3, 0], base[:3, 1]
    radius = radius_frac * float(np.linalg.norm(eye0))
    poses = []
    for i in range(num_frames):
        theta = 2.0 * np.pi * rotations * i / num_frames
        eye = (eye0 + radius * np.cos(theta) * right
               + radius * np.sin(theta) * up
               + radius * zrate * np.sin(theta * 0.5) * base[:3, 2])
        poses.append(_look_at_pose(eye.astype(np.float32)))
    n = num_frames
    return Cameras(
        camera_to_worlds=jnp.asarray(np.stack(poses)[:, :3, :4]),
        fx=jnp.full((n,), float(ref.fx[0])),
        fy=jnp.full((n,), float(ref.fy[0])),
        cx=jnp.full((n,), float(ref.cx[0])),
        cy=jnp.full((n,), float(ref.cy[0])),
        width=ref.width, height=ref.height,
        distortion=(None if ref.distortion is None
                    else jnp.broadcast_to(ref.distortion[0], (n, 6))),
        camera_model=ref.camera_model)


def path_cameras(path_file: str, reference_cameras):
    """Cameras from a camera-path JSON.

    Two schemas are accepted:
    - rsn viewer export (`e` key), `rsn-export cameras` output, or
      hand-authored: {"frames": [{"camera_to_world" | "transform_matrix":
      3x4 or 4x4, optional per-frame fl_x/fl_y/cx/cy}, ...]} with
      optional top-level fx/fy/cx/cy/width/height (defaults: the
      dataset's first camera);
    - nerfstudio `ns-render --camera-path-filename` format:
      {"camera_path": [{"camera_to_world": 16 flat floats,
      "fov": deg}, ...], "render_height": H, "render_width": W} —
      so paths authored in the nerfstudio viewer render unchanged.
    """
    import json

    import jax.numpy as jnp
    from rsn.data.cameras import Cameras

    with open(path_file) as f:
        doc = json.load(f)
    ref = reference_cameras
    if "camera_path" in doc and "frames" not in doc:
        frames = doc["camera_path"]
        c2w = np.asarray([f["camera_to_world"] for f in frames],
                         np.float32).reshape(len(frames), 4, 4)[:, :3, :4]
        n = c2w.shape[0]
        H = int(doc.get("render_height", ref.height))
        W = int(doc.get("render_width", ref.width))
        # nerfstudio camera_path fov = vertical FOV in degrees
        fovs = np.asarray([float(f.get("fov", 50.0)) for f in frames],
                          np.float32)
        fy = H / (2.0 * np.tan(np.radians(fovs) / 2.0))
        return Cameras(
            camera_to_worlds=jnp.asarray(c2w),
            fx=jnp.asarray(fy), fy=jnp.asarray(fy),
            cx=jnp.full((n,), W / 2.0), cy=jnp.full((n,), H / 2.0),
            width=W, height=H)
    frames = doc["frames"]
    c2w = np.asarray([f.get("camera_to_world", f.get("transform_matrix"))
                      for f in frames], np.float32)[:, :3, :4]
    n = c2w.shape[0]

    def intr(name, frame_key, default):
        # per-frame transforms.json-style keys (rsn-export cameras)
        # win over the top-level value; dataset camera 0 is the fallback
        return jnp.asarray([float(f.get(frame_key,
                                        doc.get(name, default)))
                            for f in frames], jnp.float32)

    w0 = frames[0].get("w", doc.get("width", ref.width))
    h0 = frames[0].get("h", doc.get("height", ref.height))
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=intr("fx", "fl_x", ref.fx[0]), fy=intr("fy", "fl_y", ref.fy[0]),
        cx=intr("cx", "cx", ref.cx[0]), cy=intr("cy", "cy", ref.cy[0]),
        width=int(w0), height=int(h0))


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description="render a trained run")
    p.add_argument("--load-dir", required=True)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--mode", default="split",
                   choices=("split", "orbit", "path", "interpolate",
                            "spiral"),
                   help="split: eval cameras with gt panels; orbit: "
                        "generated orbit rgb frames; path: rgb frames "
                        "along --camera-path; interpolate: smooth path "
                        "through the split's poses (ns-render "
                        "interpolate); spiral: spiral about the first "
                        "camera (ns-render spiral)")
    p.add_argument("--num-frames", type=int, default=60)
    p.add_argument("--camera-path", default=None,
                   help="camera-path JSON for --mode path (export one "
                        "from the viewer with the `e` key)")
    p.add_argument("--video", action="store_true",
                   help="also write the path-mode frames as a video "
                        "(mp4 via ffmpeg when present, else animated "
                        "gif)")
    p.add_argument("--fps", type=int, default=24)
    p.add_argument("--downscale-factor", type=float, default=1.0,
                   help="render the generated camera paths (orbit/path/"
                        "interpolate/spiral) at 1/N resolution "
                        "(ns-render --downscale-factor); split-mode "
                        "panels compare against gt at dataset "
                        "resolution — downscale those with "
                        "--pipeline.datamanager.downscale-factor at "
                        "train time instead")
    ns = p.parse_args(argv)
    if ns.mode == "split" and ns.downscale_factor != 1.0:
        p.error("--downscale-factor applies to generated camera paths; "
                "split renders follow the dataset resolution "
                "(use the datamanager downscale-factor)")

    from rsn.cli.run_io import load_run_full
    from rsn.data.blender import load_dataset
    from rsn.engine.trainer import preferred_eval_chunk, render_image
    from rsn.parallel import mesh as mesh_lib

    params, config, step, extras = load_run_full(ns.load_dir)
    dm = config.pipeline.datamanager
    dataset = load_dataset(dm.dataparser, dm.data or "", ns.split,
                           dm.downscale_factor, dm.scale_factor)
    out_dir = ns.output_dir or os.path.join(
        ns.load_dir,
        f"renders_{ns.split if ns.mode == 'split' else ns.mode}")
    os.makedirs(out_dir, exist_ok=True)
    mesh = mesh_lib.make_mesh(config.num_devices)
    mesh = mesh if mesh.devices.size > 1 else None
    mcfg = config.pipeline.model

    if ns.mode in ("orbit", "path", "interpolate", "spiral"):
        if ns.mode == "path":
            if not ns.camera_path:
                p.error("--mode path requires --camera-path")
            cams = path_cameras(ns.camera_path, dataset.cameras)
        elif ns.mode == "interpolate":
            n_cams = dataset.cameras.num_cameras
            cams = interpolate_cameras(
                dataset.cameras,
                steps_per_transition=max(1, ns.num_frames
                                         // max(1, n_cams - 1)),
                max_frames=ns.num_frames)
        elif ns.mode == "spiral":
            cams = spiral_cameras(dataset.cameras, ns.num_frames)
        else:
            cams = orbit_cameras(dataset.cameras, ns.num_frames)
        if ns.downscale_factor != 1.0:
            from rsn.data.cameras import rescale_cameras
            cams = rescale_cameras(cams, ns.downscale_factor)
        n = cams.num_cameras if not ns.max_images else min(
            cams.num_cameras, ns.max_images)
        frames = []
        for i in range(n):
            # camera-path products consume only final_rgb: density-only
            # coarse pass (output-aware render, VERDICT r4 #2)
            out = render_image(params, cams, i, config, mesh=mesh,
                               prop_params=extras.get("proposal"),
                               rays_per_chunk=preferred_eval_chunk(config),
                               product_only=True)
            from rsn.models.model import final_rgb
            frame = np.clip(final_rgb(out), 0, 1)
            save_png(os.path.join(out_dir, f"frame_{i:05d}.png"), frame)
            if ns.video:
                frames.append(frame)
            print(f"rendered {i+1}/{n}", flush=True)
        if ns.video and frames:
            vid = save_video(os.path.join(out_dir, f"{ns.mode}.mp4"),
                             frames, fps=ns.fps)
            print(f"wrote {vid}")
        print(f"wrote {out_dir}")
        return 0

    n = dataset.cameras.num_cameras
    if ns.max_images:
        n = min(n, ns.max_images)
    for i in range(n):
        out = render_image(params, dataset.cameras, i, config, mesh=mesh,
                           prop_params=extras.get("proposal"),
                           rays_per_chunk=preferred_eval_chunk(config))
        panels = render_panels(out, dataset.images[i],
                               mcfg.collider_near_plane,
                               mcfg.collider_far_plane)
        for name, img in panels.items():
            save_png(os.path.join(out_dir, f"{i:05d}-{name}.png"), img)
        print(f"rendered {i+1}/{n}", flush=True)
    print(f"wrote {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
