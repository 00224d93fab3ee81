"""Native C++ PNG dataloader: decode parity vs PIL, alpha blending,
threading, and fallback behavior."""
import os
import time

import numpy as np
import pytest
from PIL import Image

from rsn.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def write_pngs(tmp_path, n=6, H=24, W=32, rgba=False, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    truth = []
    for i in range(n):
        ch = 4 if rgba else 3
        arr = rng.integers(0, 256, (H, W, ch), dtype=np.uint8)
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(arr, "RGBA" if rgba else "RGB").save(p)
        paths.append(p)
        truth.append(arr)
    return paths, truth


def test_probe(lib, tmp_path):
    paths, _ = write_pngs(tmp_path, n=1, H=24, W=32)
    assert native.probe_png(paths[0]) == (24, 32)
    assert native.probe_png(str(tmp_path / "missing.png")) is None


def test_rgb_decode_matches_pil(lib, tmp_path):
    paths, truth = write_pngs(tmp_path, n=6)
    out = native.decode_png_batch(paths, 24, 32)
    assert out is not None and out.shape == (6, 24, 32, 3)
    for i, t in enumerate(truth):
        np.testing.assert_allclose(out[i], t.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_rgba_white_blend_matches_blender_semantics(lib, tmp_path):
    paths, truth = write_pngs(tmp_path, n=3, rgba=True, seed=1)
    out = native.decode_png_batch(paths, 24, 32, blend_white=True)
    assert out is not None
    for i, t in enumerate(truth):
        rgb = t[..., :3].astype(np.float32) / 255.0
        a = t[..., 3:].astype(np.float32) / 255.0
        want = rgb * a + (1.0 - a)  # BlenderDataParser white alpha blend
        np.testing.assert_allclose(out[i], want, atol=2e-3)


def test_wrong_size_fails_cleanly(lib, tmp_path):
    paths, _ = write_pngs(tmp_path, n=2)
    assert native.decode_png_batch(paths, 16, 16) is None


def test_many_images_threaded(lib, tmp_path):
    paths, truth = write_pngs(tmp_path, n=32, H=16, W=16, seed=2)
    out = native.decode_png_batch(paths, 16, 16, num_threads=8)
    assert out is not None
    np.testing.assert_allclose(
        out[31], truth[31].astype(np.float32) / 255.0, atol=1e-6)


def test_blender_loader_uses_native(tmp_path):
    from rsn.data.blender import load_blender
    from rsn.data.synthetic import write_blender_scene
    write_blender_scene(str(tmp_path), num_cameras=3, H=16, W=16)
    ds = load_blender(str(tmp_path), "train")
    assert ds.images.shape == (3, 16, 16, 3)
    assert ds.images.dtype == np.float32
