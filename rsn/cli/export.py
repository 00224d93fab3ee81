"""rsn-export — the `ns-export` equivalent: geometry from a trained run.

The reference method trains under nerfstudio, whose CLI surface
includes `ns-export pointcloud|poisson|tsdf|marching-cubes|cameras`;
the method's own repo ships no export code, so this is a from-scratch
TPU-native rebuild of the modes that make sense for a density field:

- `pointcloud`: render the dataset cameras (chunked, jitted — the same
  render path as rsn-eval), backproject median depth along each pixel
  ray, keep pixels whose accumulation clears a threshold, and write a
  colored, normal-carrying PLY.
- `mesh`: evaluate the field's density on a dense grid (chunked under
  jit; positions contracted exactly as in training), isosurface it
  with marching tetrahedra (rsn.core.mesh), color vertices with the
  field's view-independent diffuse head, and attach analytic normals
  -normalize(d sigma_preact / d x) through the contraction.
- `tsdf`: render every dataset camera, fuse the median-depth maps into
  a projective truncated signed-distance grid (jitted per-camera
  integration), and isosurface the zero crossing — the ns-export tsdf
  pipeline, with rsn's own renders as the depth source.

Geometry modes write binary PLY (rsn.core.mesh.write_ply); `cameras`
writes a transforms.json-style pose/intrinsics dump (ns-export
cameras equivalent).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def _density_fns(params, mcfg):
    """Jitted (points (N,3) world) -> dict of per-point field queries."""
    import jax
    import jax.numpy as jnp

    from rsn.models import field as field_lib
    from rsn.models.model import _field_cfg

    fcfg = _field_cfg(mcfg)

    def contract_pts(x):
        n2 = jnp.sum(x * x, axis=-1, keepdims=True)
        n = jnp.sqrt(jnp.maximum(n2, 1.0))
        return jnp.where(n2 > 1.0, (2.0 * n - 1.0) / jnp.maximum(n2, 1.0)
                         * x, x)

    def preact_sum(x):
        _, _, preact = field_lib.get_density(params, contract_pts(x),
                                             None, fcfg)
        return jnp.sum(preact), preact

    @jax.jit
    def query(x):
        density, emb, _ = field_lib.get_density(params, contract_pts(x),
                                                None, fcfg)
        return {"density": density[..., 0],
                "diff": field_lib.get_diff(params, emb)}

    @jax.jit
    def normals(x):
        g, _ = jax.grad(preact_sum, has_aux=True)(x)
        return -g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)

    return query, normals


def _chunked(fn, pts: np.ndarray, chunk: int = 65536):
    """Apply a jitted (N,3)->pytree fn over fixed-size chunks (padded)."""
    import jax

    n = pts.shape[0]
    outs = []
    for i in range(0, n, chunk):
        part = pts[i:i + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = np.concatenate([part, np.zeros((pad, 3), np.float32)])
        o = jax.device_get(fn(part))
        if pad:
            o = jax.tree.map(lambda a: a[:chunk - pad], o)
        outs.append(o)
    return jax.tree.map(lambda *a: np.concatenate(a, axis=0), *outs)


def export_mesh(params, config, out_path: str, resolution: int = 256,
                bbox: float = 1.5, density_threshold: float = 15.0,
                with_colors: bool = True) -> dict:
    """Marching-tetrahedra mesh of the density field -> binary PLY."""
    from rsn.core.mesh import marching_tetrahedra, write_ply

    mcfg = config.pipeline.model
    query, normals_fn = _density_fns(params, mcfg)
    ax = np.linspace(-bbox, bbox, resolution, dtype=np.float32)
    # evaluate plane-by-plane to bound host memory at high resolution
    grid = np.empty((resolution,) * 3, np.float32)
    yy, zz = np.meshgrid(ax, ax, indexing="ij")
    for i, x in enumerate(ax):
        pts = np.stack([np.full_like(yy, x), yy, zz],
                       axis=-1).reshape(-1, 3)
        grid[i] = _chunked(query, pts)["density"].reshape(
            resolution, resolution)
    verts_idx, faces = marching_tetrahedra(grid, density_threshold)
    scale = (2.0 * bbox) / (resolution - 1)
    verts = verts_idx * scale - bbox
    colors = normals = None
    if len(verts) and with_colors:
        out = _chunked(query, verts.astype(np.float32))
        colors = out["diff"]
        normals = _chunked(normals_fn, verts.astype(np.float32))
    write_ply(out_path, verts, faces=faces, colors=colors,
              normals=normals)
    return {"vertices": int(len(verts)), "faces": int(len(faces))}


def export_pointcloud(params, config, dataset, out_path: str,
                      num_points: int = 1_000_000,
                      min_accumulation: float = 0.5,
                      max_images: int = 0, extras=None,
                      seed: int = 0) -> dict:
    """Backprojected depth point cloud (rgb + analytic normals) -> PLY."""
    import jax

    from rsn.core.mesh import write_ply
    from rsn.data.cameras import generate_image_rays
    from rsn.engine.trainer import preferred_eval_chunk, render_image
    from rsn.models.model import final_rgb

    extras = extras or {}
    mcfg = config.pipeline.model
    far = mcfg.collider_far_plane
    n = dataset.cameras.num_cameras
    if max_images:
        n = min(n, max_images)
    pts, cols = [], []
    for i in range(n):
        out = render_image(params, dataset.cameras, i, config,
                           prop_params=extras.get("proposal"),
                           rays_per_chunk=preferred_eval_chunk(config))
        o, d, _ = generate_image_rays(dataset.cameras, i)
        o = np.asarray(o)
        d = np.asarray(d)
        depth = out["depth_fine"].reshape(-1)
        acc = out["accumulation_fine"].reshape(-1)
        keep = (acc > min_accumulation) & (depth < 0.99 * far)
        pts.append((o + depth[:, None] * d)[keep])
        cols.append(np.clip(final_rgb(out), 0.0, 1.0)
                    .reshape(-1, 3)[keep])
        print(f"backprojected {i + 1}/{n}", flush=True)
    pts = np.concatenate(pts, axis=0) if pts else np.zeros((0, 3))
    cols = np.concatenate(cols, axis=0) if cols else np.zeros((0, 3))
    if len(pts) > num_points:
        sel = np.random.default_rng(seed).choice(len(pts), num_points,
                                                 replace=False)
        pts, cols = pts[sel], cols[sel]
    normals = None
    if len(pts):
        _, normals_fn = _density_fns(params, mcfg)
        normals = _chunked(normals_fn, pts.astype(np.float32))
    write_ply(out_path, pts, colors=cols, normals=normals)
    return {"points": int(len(pts))}


def fuse_tsdf(depths, accs, rgbs, cameras, resolution: int = 128,
              bbox: float = 1.5, trunc: float = 0.0,
              min_accumulation: float = 0.5):
    """Fuse per-camera depth maps into a truncated signed-distance grid.

    depths/accs: (N, H, W); rgbs: (N, H, W, 3); cameras: rsn Cameras
    (perspective).  Depth is Euclidean distance along the unit pixel
    ray (rsn's median depth), so the SDF approximation is
    depth(px) − ‖X − origin‖ (projective TSDF).  Returns
    (tsdf (res³ grid, +trunc where unobserved), colors (res³, 3)).
    trunc <= 0 picks 4 voxel widths.
    """
    import jax
    import jax.numpy as jnp

    res = resolution
    voxel = (2.0 * bbox) / (res - 1)
    if trunc <= 0.0:
        trunc = 4.0 * voxel
    ax = np.linspace(-bbox, bbox, res, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.asarray(np.stack([x, y, z], axis=-1).reshape(-1, 3))

    H, W = cameras.height, cameras.width

    @jax.jit
    def integrate(state, depth, acc, rgb, c2w, fx, fy, cx, cy):
        tsdf_sum, w_sum, col_sum = state
        R, t = c2w[:, :3], c2w[:, 3]
        x_cam = (pts - t) @ R  # R^T (X - t): columns of c2w are axes
        zc = x_cam[:, 2]
        inv = 1.0 / jnp.maximum(-zc, 1e-9)
        px = cx + fx * x_cam[:, 0] * inv
        py = cy - fy * x_cam[:, 1] * inv
        ix = jnp.clip(jnp.round(px - 0.5).astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(jnp.round(py - 0.5).astype(jnp.int32), 0, H - 1)
        in_view = ((zc < -1e-6) & (px >= 0.0) & (px <= W - 1.0)
                   & (py >= 0.0) & (py <= H - 1.0))
        d_img = depth[iy, ix]
        a_img = acc[iy, ix]
        dist = jnp.linalg.norm(pts - t, axis=-1)
        sdf = d_img - dist
        w = (in_view & (a_img > min_accumulation)
             & (sdf > -trunc)).astype(jnp.float32)
        tsdf_new = jnp.clip(sdf, -trunc, trunc)
        return (tsdf_sum + w * tsdf_new, w_sum + w,
                col_sum + w[:, None] * rgb[iy, ix])

    n_pts = pts.shape[0]
    state = (jnp.zeros((n_pts,), jnp.float32),
             jnp.zeros((n_pts,), jnp.float32),
             jnp.zeros((n_pts, 3), jnp.float32))
    for i in range(depths.shape[0]):
        state = integrate(state,
                          jnp.asarray(depths[i]), jnp.asarray(accs[i]),
                          jnp.asarray(rgbs[i]),
                          cameras.camera_to_worlds[i],
                          cameras.fx[i], cameras.fy[i],
                          cameras.cx[i], cameras.cy[i])
    tsdf_sum, w_sum, col_sum = jax.device_get(state)
    seen = w_sum > 0
    # unobserved = solid (-trunc): deep-interior voxels (beyond the
    # truncation band, never integrated) then continue the negative
    # side instead of flipping to free space — which would put a
    # spurious inner shell one truncation band behind every surface.
    # Crossings AGAINST unobserved space are discarded by the caller
    # via the `seen` mask (drop_unobserved_faces).
    tsdf = np.where(seen, tsdf_sum / np.maximum(w_sum, 1e-9),
                    np.float32(-trunc))
    colors = col_sum / np.maximum(w_sum[:, None], 1e-9)
    return (tsdf.reshape(res, res, res).astype(np.float32),
            colors.astype(np.float32),
            seen.reshape(res, res, res))


def drop_unobserved_faces(verts_idx: np.ndarray, faces: np.ndarray,
                          seen: np.ndarray):
    """Keep only faces whose every vertex lies on an edge between two
    OBSERVED voxels (marching-tetrahedra vertices sit on lattice edges,
    so the edge endpoints are the per-component floor/ceil).  Returns
    (verts_idx, faces) compacted."""
    if len(verts_idx) == 0:
        return verts_idx, faces
    lo = np.floor(verts_idx).astype(np.int64)
    hi = np.ceil(verts_idx).astype(np.int64)
    ok = (seen[lo[:, 0], lo[:, 1], lo[:, 2]]
          & seen[hi[:, 0], hi[:, 1], hi[:, 2]])
    keep_face = ok[faces].all(axis=1)
    faces = faces[keep_face]
    used = np.zeros(len(verts_idx), bool)
    used[faces.reshape(-1)] = True
    remap = np.cumsum(used) - 1
    return verts_idx[used], remap[faces]


def export_tsdf(params, config, dataset, out_path: str,
                resolution: int = 128, bbox: float = 1.5,
                min_accumulation: float = 0.5, max_images: int = 0,
                extras=None) -> dict:
    """`ns-export tsdf` equivalent: render every dataset camera, fuse
    the median-depth maps into a projective TSDF, isosurface the zero
    crossing with marching tetrahedra, and write a colored PLY."""
    from rsn.core.mesh import marching_tetrahedra, write_ply
    from rsn.engine.trainer import preferred_eval_chunk, render_image
    from rsn.models.model import final_rgb

    extras = extras or {}
    cams = dataset.cameras
    n = cams.num_cameras
    if max_images:
        n = min(n, max_images)
    H, W = cams.height, cams.width
    depths = np.empty((n, H, W), np.float32)
    accs = np.empty((n, H, W), np.float32)
    rgbs = np.empty((n, H, W, 3), np.float32)
    for i in range(n):
        out = render_image(params, cams, i, config,
                           prop_params=extras.get("proposal"),
                           rays_per_chunk=preferred_eval_chunk(config))
        depths[i] = out["depth_fine"].reshape(H, W)
        accs[i] = out["accumulation_fine"].reshape(H, W)
        rgbs[i] = np.clip(final_rgb(out), 0.0, 1.0).reshape(H, W, 3)
        print(f"rendered {i + 1}/{n}", flush=True)

    tsdf, colors, seen = fuse_tsdf(depths, accs, rgbs, cams, resolution,
                                   bbox,
                                   min_accumulation=min_accumulation)
    # marching_tetrahedra expects density-like values (larger inside)
    verts_idx, faces = marching_tetrahedra(-tsdf, 0.0)
    verts_idx, faces = drop_unobserved_faces(verts_idx, faces, seen)
    scale = (2.0 * bbox) / (resolution - 1)
    verts = verts_idx * scale - bbox
    vcols = None
    if len(verts):
        nearest = np.clip(np.round(verts_idx).astype(np.int64), 0,
                          resolution - 1)
        flat = (nearest[:, 0] * resolution + nearest[:, 1]) * resolution \
            + nearest[:, 2]
        vcols = colors[flat]
    write_ply(out_path, verts, faces=faces, colors=vcols)
    return {"vertices": int(len(verts)), "faces": int(len(faces))}


def export_cameras(config, dataset, out_path: str) -> dict:
    """`ns-export cameras` equivalent: dump the run's camera poses and
    intrinsics as a transforms.json-style document (consumable by the
    nerfstudio/instant-ngp dataparsers and by rsn-render --mode path)."""
    import json

    cams = dataset.cameras
    n = cams.num_cameras
    c2w = np.asarray(cams.camera_to_worlds, np.float64)
    fx = np.asarray(cams.fx, np.float64)
    fy = np.asarray(cams.fy, np.float64)
    cx = np.asarray(cams.cx, np.float64)
    cy = np.asarray(cams.cy, np.float64)
    frames = []
    bottom = np.array([[0.0, 0.0, 0.0, 1.0]])
    for i in range(n):
        frames.append({
            "camera_index": i,
            "transform_matrix": np.concatenate(
                [c2w[i], bottom], axis=0).tolist(),
            "fl_x": fx[i], "fl_y": fy[i], "cx": cx[i], "cy": cy[i],
            "w": cams.width, "h": cams.height,
        })
    doc = {"camera_model": getattr(cams, "camera_model", "perspective"),
           "frames": frames}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    return {"cameras": n}


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        description="export geometry from a trained run (ns-export "
                    "equivalent)")
    p.add_argument("mode", choices=("pointcloud", "mesh", "tsdf",
                                    "cameras"))
    p.add_argument("--load-dir", required=True)
    p.add_argument("--output-path", default=None,
                   help="output .ply (default <load-dir>/exports/<mode>.ply)")
    p.add_argument("--split", default="train")
    p.add_argument("--max-images", type=int, default=0)
    p.add_argument("--num-points", type=int, default=1_000_000)
    p.add_argument("--min-accumulation", type=float, default=0.5)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--bbox", type=float, default=1.5,
                   help="mesh grid half-extent (world units)")
    p.add_argument("--density-threshold", type=float, default=15.0)
    p.add_argument("--no-colors", action="store_true")
    ns = p.parse_args(argv)

    from rsn.cli.run_io import load_run_full

    params, config, step, extras = load_run_full(ns.load_dir)
    ext = "json" if ns.mode == "cameras" else "ply"
    out_path = ns.output_path or os.path.join(
        ns.load_dir, "exports", f"{ns.mode}.{ext}")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    if ns.mode == "mesh":
        stats = export_mesh(params, config, out_path,
                            resolution=ns.resolution, bbox=ns.bbox,
                            density_threshold=ns.density_threshold,
                            with_colors=not ns.no_colors)
    else:
        from rsn.data.blender import load_dataset
        dm = config.pipeline.datamanager
        dataset = load_dataset(dm.dataparser, dm.data or "", ns.split,
                               dm.downscale_factor, dm.scale_factor)
        if ns.mode == "cameras":
            stats = export_cameras(config, dataset, out_path)
        elif ns.mode == "tsdf":
            stats = export_tsdf(
                params, config, dataset, out_path,
                resolution=ns.resolution, bbox=ns.bbox,
                min_accumulation=ns.min_accumulation,
                max_images=ns.max_images, extras=extras)
        else:
            stats = export_pointcloud(
                params, config, dataset, out_path,
                num_points=ns.num_points,
                min_accumulation=ns.min_accumulation,
                max_images=ns.max_images, extras=extras)
    print(f"wrote {out_path} {stats}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
