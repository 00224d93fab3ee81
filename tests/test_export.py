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
