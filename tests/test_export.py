"""rsn-export: marching tetrahedra, PLY IO, and the export CLI.

The isosurfacer is validated on an analytic sphere (radius accuracy,
watertightness, outward orientation) — properties a correct
implementation must have regardless of triangulation choices.
"""
import os

import numpy as np
import pytest

from rsn.core.mesh import marching_tetrahedra, read_ply, write_ply


def _sphere_grid(n=40, extent=1.0):
    ax = np.linspace(-extent, extent, n, dtype=np.float32)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return 1.0 - np.sqrt(x**2 + y**2 + z**2)


def _to_world(verts, n, extent=1.0):
    return verts / (n - 1) * (2 * extent) - extent


def test_marching_tetrahedra_sphere_accuracy():
    n = 40
    verts, faces = marching_tetrahedra(_sphere_grid(n), iso=0.4)
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(_to_world(verts, n), axis=1)
    # vertices sit on the radius-0.6 isosurface to well under a cell
    assert abs(r.mean() - 0.6) < 5e-3
    assert np.abs(r - 0.6).max() < 0.03


def test_marching_tetrahedra_watertight_and_oriented():
    n = 32
    verts, faces = marching_tetrahedra(_sphere_grid(n), iso=0.5)
    # watertight: every undirected edge is shared by exactly 2 faces
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]])
    _, cnt = np.unique(np.sort(e, axis=1), axis=0, return_counts=True)
    assert set(np.unique(cnt)) == {2}
    # oriented: normals point away from the center (density decreasing)
    w = _to_world(verts, n)
    c = w[faces].mean(axis=1)
    nrm = np.cross(w[faces[:, 1]] - w[faces[:, 0]],
                   w[faces[:, 2]] - w[faces[:, 0]])
    assert ((nrm * c).sum(axis=1) > 0).all()


def test_marching_tetrahedra_slab_invariance():
    grid = _sphere_grid(24)
    v1, f1 = marching_tetrahedra(grid, iso=0.5, slab=4)
    v2, f2 = marching_tetrahedra(grid, iso=0.5, slab=64)
    assert np.allclose(v1, v2)

    def canon(f):  # triangle emission ORDER may differ across slabbings
        rows = np.sort(f, axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    assert (canon(f1) == canon(f2)).all()


def test_marching_tetrahedra_empty():
    verts, faces = marching_tetrahedra(np.zeros((8, 8, 8)), iso=0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    f = rng.integers(0, 100, size=(50, 3)).astype(np.int32)
    c = rng.uniform(size=(100, 3)).astype(np.float32)
    n = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "m.ply")
    write_ply(path, v, faces=f, colors=c, normals=n)
    v2, f2, c2, n2 = read_ply(path)
    assert np.allclose(v2, v) and (f2 == f).all()
    assert np.abs(c2 - c).max() < 1 / 255 + 1e-6
    assert np.allclose(n2, n)
    # vertices-only (pointcloud) file
    write_ply(path, v, colors=c)
    v3, f3, c3, n3 = read_ply(path)
    assert np.allclose(v3, v) and f3 is None and n3 is None


def test_export_mesh_on_field(tmp_path):
    """export_mesh end-to-end on random field weights (CPU-sized grid)."""
    import jax

    from rsn.cli.export import _chunked, _density_fns, export_mesh
    from rsn.configs import TrainerConfig
    from rsn.models import field as field_lib

    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    config = TrainerConfig()
    # pick an iso that must cross the random field's density range
    query, _ = _density_fns(params, config.pipeline.model)
    pts = np.random.default_rng(0).uniform(-1, 1, (512, 3)).astype(
        np.float32)
    d = _chunked(query, pts, chunk=512)["density"]
    iso = float((d.min() + d.max()) / 2)
    out = str(tmp_path / "mesh.ply")
    stats = export_mesh(params, config, out, resolution=24, bbox=1.0,
                        density_threshold=iso)
    assert stats["vertices"] > 0 and stats["faces"] > 0
    v, f, c, n = read_ply(out)
    assert v.shape[0] == stats["vertices"]
    assert f.shape[0] == stats["faces"]
    assert c.shape == v.shape and n.shape == v.shape
    assert np.abs(np.linalg.norm(n, axis=1) - 1.0).max() < 1e-3
    assert np.abs(v).max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    from rsn.cli import export as export_cli
    from rsn.cli import train as train_cli

    rc = train_cli.main([
        "reflect-sampling-nerf",
        "--pipeline.datamanager.dataparser", "synthetic",
        "--pipeline.datamanager.train-num-rays-per-batch", "64",
        "--pipeline.model.num-coarse-samples", "16",
        "--pipeline.model.num-importance-samples", "16",
        "--pipeline.model.num-reflect-coarse-samples", "8",
        "--pipeline.model.num-reflect-importance-samples", "8",
        "--pipeline.model.eval-num-rays-per-chunk", "256",
        "--max-num-iterations", "10", "--steps-per-save", "10",
        "--output-dir", str(tmp_path)])
    assert rc == 0
    run_dir = None
    for root, dirs, files in os.walk(tmp_path):
        if "config.json" in files:
            run_dir = root
    assert run_dir

    rc = export_cli.main(["pointcloud", "--load-dir", run_dir,
                          "--max-images", "1", "--num-points", "5000",
                          "--min-accumulation", "0.2"])
    assert rc == 0
    pc = os.path.join(run_dir, "exports", "pointcloud.ply")
    v, f, c, n = read_ply(pc)
    assert len(v) > 0 and f is None
    assert c is not None and n is not None

    rc = export_cli.main(["mesh", "--load-dir", run_dir,
                          "--resolution", "24", "--bbox", "1.0",
                          "--density-threshold", "1.0"])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "exports", "mesh.ply"))

    rc = export_cli.main(["tsdf", "--load-dir", run_dir,
                          "--resolution", "24", "--bbox", "1.0",
                          "--max-images", "2",
                          "--min-accumulation", "0.2"])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "exports", "tsdf.ply"))

    rc = export_cli.main(["cameras", "--load-dir", run_dir])
    assert rc == 0
    import json
    with open(os.path.join(run_dir, "exports", "cameras.json")) as f:
        doc = json.load(f)
    assert doc["frames"] and doc["camera_model"] == "perspective"
    fr = doc["frames"][0]
    m = np.asarray(fr["transform_matrix"])
    assert m.shape == (4, 4) and np.allclose(m[3], [0, 0, 0, 1])
    assert fr["fl_x"] > 0 and fr["w"] > 0


def _look_at_c2w(eye, target=(0.0, 0.0, 0.0)):
    """OpenGL c2w (camera looks down -z, y up) from eye toward target."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0], np.float32)
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down_up = np.cross(right, fwd)
    return np.stack([right, down_up, -fwd, eye], axis=1)  # (3, 4)


def test_tsdf_fusion_sphere_accuracy():
    """Analytic sphere depth maps -> fused TSDF -> mesh at the right
    radius, validating the projective-TSDF math against rsn's own
    camera/ray conventions (depths come from generate_image_rays)."""
    import jax.numpy as jnp
    from rsn.cli.export import fuse_tsdf
    from rsn.core.mesh import marching_tetrahedra
    from rsn.data.cameras import Cameras, generate_image_rays

    r_sphere, H, W, n_cam = 0.6, 48, 48, 8
    eyes = []
    for k in range(n_cam):
        th = 2 * np.pi * k / n_cam
        eyes.append([2.5 * np.cos(th), 2.5 * np.sin(th),
                     1.2 if k % 2 else -1.2])
    c2w = np.stack([_look_at_c2w(e) for e in eyes])
    f = 40.0
    cams = Cameras(camera_to_worlds=jnp.asarray(c2w),
                   fx=jnp.full((n_cam,), f), fy=jnp.full((n_cam,), f),
                   cx=jnp.full((n_cam,), W / 2.0),
                   cy=jnp.full((n_cam,), H / 2.0), width=W, height=H)

    depths = np.zeros((n_cam, H, W), np.float32)
    accs = np.zeros((n_cam, H, W), np.float32)
    rgbs = np.full((n_cam, H, W, 3), 0.5, np.float32)
    for i in range(n_cam):
        o, d, _ = generate_image_rays(cams, i)
        o, d = np.asarray(o), np.asarray(d)
        # |o + t d| = r: t^2 + 2 t o.d + |o|^2 - r^2 = 0
        b = np.sum(o * d, axis=-1)
        c = np.sum(o * o, axis=-1) - r_sphere**2
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        depths[i] = np.where(hit, t, 1e3).reshape(H, W)
        accs[i] = hit.astype(np.float32).reshape(H, W)

    from rsn.cli.export import drop_unobserved_faces

    res, bbox = 64, 1.0
    tsdf, colors, seen = fuse_tsdf(depths, accs, rgbs, cams,
                                   resolution=res, bbox=bbox,
                                   min_accumulation=0.5)
    verts_idx, faces = marching_tetrahedra(-tsdf, 0.0)
    verts_idx, faces = drop_unobserved_faces(verts_idx, faces, seen)
    assert len(verts_idx) > 300 and len(faces) > 600
    assert faces.max() < len(verts_idx)  # remap compacted correctly
    verts = verts_idx * (2.0 * bbox / (res - 1)) - bbox
    rad = np.linalg.norm(verts, axis=1)
    voxel = 2.0 * bbox / (res - 1)
    # surface sits on the sphere to within a voxel (projective TSDF
    # bends slightly at grazing angles; the mean must be much tighter)
    assert abs(rad.mean() - r_sphere) < 0.3 * voxel, rad.mean()
    assert np.abs(rad - r_sphere).max() < 2.0 * voxel

    # colors fused where observed
    flat = (verts_idx.round().astype(int).clip(0, res - 1))
    idx = (flat[:, 0] * res + flat[:, 1]) * res + flat[:, 2]
    assert np.allclose(colors[idx], 0.5, atol=1e-3)
