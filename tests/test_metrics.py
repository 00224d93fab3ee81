"""Metrics tests: PSNR closed form, SSIM vs an independent reference
implementation (scipy-based Wang et al.), LPIPS gating."""
import numpy as np
import pytest

import jax.numpy as jnp

from rsn import metrics as M


def test_psnr_closed_form():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    assert float(M.psnr(a, b)) == pytest.approx(20.0, abs=1e-4)
    assert float(M.psnr(a, a)) > 100.0


def ssim_reference(img1, img2, data_range=1.0, sigma=1.5, k1=0.01,
                   k2=0.03):
    """Independent SSIM: scipy gaussian filtering, channel-averaged,
    truncated to the same 11-tap support as the torchmetrics kernel."""
    from scipy.ndimage import gaussian_filter

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    vals = []
    # truncate=10/3 gives radius 5 => 11 taps at sigma 1.5
    blur = lambda x: gaussian_filter(x, sigma, mode="constant",
                                     truncate=10.0 / 3.0)
    for c in range(img1.shape[-1]):
        x, y = img1[..., c], img2[..., c]
        mx, my = blur(x), blur(y)
        vx = blur(x * x) - mx**2
        vy = blur(y * y) - my**2
        cxy = blur(x * y) - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx**2 + my**2 + c1) * (vx + vy + c2))
        # compare on the interior (our impl uses valid-padding conv)
        vals.append(s[5:-5, 5:-5].mean())
    return float(np.mean(vals))


def test_ssim_identical_is_one():
    img = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(
        np.float32)
    assert float(M.ssim(jnp.asarray(img), jnp.asarray(img))) == \
        pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_reference_impl():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = ssim_reference(a, b)
    assert ours == pytest.approx(ref, abs=0.02)
    assert 0.2 < ours < 0.95  # noisy pair lands strictly between


def test_ssim_orders_degradation():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    slight = np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1).astype(
        np.float32)
    heavy = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(
        np.float32)
    s1 = float(M.ssim(jnp.asarray(a), jnp.asarray(slight)))
    s2 = float(M.ssim(jnp.asarray(a), jnp.asarray(heavy)))
    assert s1 > s2


def test_ssim_bounded_on_flat_regions():
    """SSIM must stay <= 1 even on images dominated by zero-variance
    windows — the case where a low-precision blur's moment error flips
    var_p + var_g + c2 negative and window SSIM explodes (observed
    fine_ssim 2.89 on a TPU eval before the convs were pinned to
    Precision.HIGHEST)."""
    rng = np.random.default_rng(3)
    a = np.full((64, 64, 3), 0.73, np.float32)
    b = a.copy()
    b[30:34, 30:34] += rng.normal(0, 0.05, (4, 4, 3)).astype(np.float32)
    s = float(M.ssim(jnp.asarray(a), jnp.asarray(np.clip(b, 0, 1))))
    assert 0.0 < s <= 1.0 + 1e-6


def test_lpips_gated():
    """No pretrained weights offline: must return a float or None, never
    raise."""
    img = np.random.default_rng(3).uniform(0, 1, (16, 16, 3)).astype(
        np.float32)
    out = M.lpips(img, img)
    assert out is None or isinstance(out, float)


def test_orbit_cameras_geometry():
    from rsn.cli.render import orbit_cameras
    from rsn.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_cameras=4, H=16, W=16)
    cams = orbit_cameras(ds.cameras, num_frames=12)
    assert cams.num_cameras == 12
    pos = np.asarray(cams.camera_to_worlds)[:, :3, 3]
    radii = np.linalg.norm(pos, axis=-1)
    np.testing.assert_allclose(radii, radii[0], rtol=1e-5)  # fixed orbit
    assert abs(radii[0] - 4.0) < 0.2  # train cameras' mean radius


def test_colormaps():
    from rsn.cli.render import apply_colormap, apply_depth_colormap
    x = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4, 1)
    rgb = apply_colormap(x)
    assert rgb.shape == (4, 4, 3) and rgb.min() >= 0 and rgb.max() <= 1
    acc = np.ones((4, 4, 1), np.float32)
    d = apply_depth_colormap(x * 4 + 2, acc, 2.0, 6.0)
    assert d.shape == (4, 4, 3)
    # zero accumulation -> white
    d0 = apply_depth_colormap(x, np.zeros_like(acc), 2.0, 6.0)
    np.testing.assert_allclose(d0, 1.0, atol=1e-6)
