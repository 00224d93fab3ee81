"""Viewer camera-path export <-> render --mode path round trip."""
import json
import os

import numpy as np

import jax.numpy as jnp

from rsn.cli import viewer as viewer_lib
from rsn.cli.render import path_cameras
from rsn.data.cameras import Cameras


def _cams(n=2, w=32, h=24):
    eye = jnp.eye(3, 4)
    return Cameras(camera_to_worlds=jnp.broadcast_to(eye, (n, 3, 4)),
                   fx=jnp.full((n,), 30.0), fy=jnp.full((n,), 30.0),
                   cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
                   width=w, height=h)


def test_export_then_load_round_trip(tmp_path):
    cams = _cams()
    viewer_lib._State.cameras = cams
    viewer_lib._State.radius = 4.0
    poses = [{"theta": 0.0, "phi": 0.3, "r": 1.0},
             {"theta": 1.0, "phi": -0.2, "r": 1.5}]
    fname = viewer_lib.export_camera_path(poses, str(tmp_path), cams)
    assert os.path.exists(fname)
    with open(fname) as f:
        doc = json.load(f)
    assert len(doc["frames"]) == 2
    assert doc["width"] == 32 and doc["height"] == 24

    loaded = path_cameras(fname, cams)
    assert loaded.num_cameras == 2
    assert loaded.width == 32
    np.testing.assert_allclose(np.asarray(loaded.fx), 30.0)
    # poses are valid camera-to-worlds: rotation columns orthonormal
    c2w = np.asarray(loaded.camera_to_worlds)
    rtr = np.einsum("nij,nik->njk", c2w[:, :3, :3], c2w[:, :3, :3])
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-5)
    # first pose looks at the origin from radius*r = 4
    np.testing.assert_allclose(np.linalg.norm(c2w[0, :3, 3]), 4.0,
                               rtol=1e-5)


def test_path_cameras_intrinsics_fallback(tmp_path):
    cams = _cams()
    fname = tmp_path / "p.json"
    c2w = np.eye(4)[:3, :4].tolist()
    fname.write_text(json.dumps({"frames": [{"camera_to_world": c2w}]}))
    loaded = path_cameras(str(fname), cams)
    assert loaded.num_cameras == 1
    np.testing.assert_allclose(np.asarray(loaded.fx), 30.0)
    assert loaded.width == 32


def test_path_cameras_nerfstudio_schema(tmp_path):
    """ns-render camera_path.json: flat 4x4 matrices + vertical fov."""
    cams = _cams()
    fname = tmp_path / "camera_path.json"
    m = np.eye(4)
    m[:3, 3] = [1.0, 2.0, 3.0]
    doc = {
        "camera_path": [
            {"camera_to_world": m.flatten().tolist(), "fov": 60.0},
            {"camera_to_world": np.eye(4).flatten().tolist(), "fov": 90.0},
        ],
        "render_height": 100, "render_width": 200,
        "seconds": 4.0, "fps": 24,
    }
    fname.write_text(json.dumps(doc))
    loaded = path_cameras(str(fname), cams)
    assert loaded.num_cameras == 2
    assert (loaded.width, loaded.height) == (200, 100)
    # fy = H / (2 tan(fov/2)): 60deg -> 100/(2*tan30) = 86.60;
    # 90deg -> 50
    np.testing.assert_allclose(np.asarray(loaded.fy),
                               [86.6025, 50.0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(loaded.fx),
                               np.asarray(loaded.fy))
    np.testing.assert_allclose(np.asarray(loaded.cx), 100.0)
    np.testing.assert_allclose(
        np.asarray(loaded.camera_to_worlds)[0, :, 3], [1.0, 2.0, 3.0])


def test_scaled_cameras_quality_levels():
    cams = _cams(w=64, h=48)
    half = viewer_lib._scaled_cameras(cams, 2)
    assert (half.width, half.height) == (32, 24)
    np.testing.assert_allclose(np.asarray(half.fx), 15.0)
    assert viewer_lib._scaled_cameras(cams, 1) is cams

def test_path_cameras_accepts_exported_cameras_json(tmp_path):
    """rsn-export cameras output (transforms.json-style: per-frame
    transform_matrix + fl_x/fl_y/cx/cy/w/h) renders via --mode path."""
    from rsn.cli.export import export_cameras
    from rsn.data.blender import Dataset

    cams = _cams(n=3, w=40, h=30)
    ds = Dataset(images=np.zeros((3, 30, 40, 3), np.float32),
                 cameras=cams, split="train")
    out = tmp_path / "cameras.json"
    stats = export_cameras(None, ds, str(out))
    assert stats == {"cameras": 3}

    loaded = path_cameras(str(out), _cams(n=1, w=8, h=8))  # ref differs
    assert loaded.num_cameras == 3
    assert (loaded.width, loaded.height) == (40, 30)  # from the file
    np.testing.assert_allclose(np.asarray(loaded.fx), 30.0)
    np.testing.assert_allclose(np.asarray(loaded.cx), 20.0)
    np.testing.assert_allclose(np.asarray(loaded.camera_to_worlds),
                               np.asarray(cams.camera_to_worlds),
                               atol=1e-6)
