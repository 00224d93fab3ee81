"""Oracle tests for IPE and Integrated-SH encodings (SURVEY.md §4.1, A.2).

The SH oracle is scipy's complex spherical harmonics converted to the
real basis — an implementation fully independent of both our sympy
derivation and the reference's hand-written polynomials.  The
reference's published constants (e.g. 0.48860251190291992 for l=1 and
the 2x-bugged 5.83141328139863895 at l=8 m=+-7; see
reflect_sampling_nerf_components.py:69,112,126 and sh.txt:238) are
asserted directly against our table.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rsn.core import _sh_table
from rsn.core.encodings import (ipe_encode, ish_encode, sh_basis,
                                NUM_FREQUENCIES)

LEVELS = [1, 2, 4, 8]


def scipy_real_sh(l: int, m: int, dirs: np.ndarray) -> np.ndarray:
    """Real SH via scipy, standard (all-positive leading coeff) convention."""
    from scipy.special import sph_harm_y
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    theta = np.arccos(np.clip(z, -1, 1))  # polar
    phi = np.arctan2(y, x)  # azimuth
    Y = sph_harm_y(l, abs(m), theta, phi)  # (theta, phi) order
    if m > 0:
        return np.sqrt(2) * (-1) ** m * Y.real
    if m < 0:
        return np.sqrt(2) * (-1) ** m * Y.imag
    return Y.real


@pytest.fixture(scope="module")
def dirs():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(512, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_sh_basis_matches_scipy(dirs):
    basis = np.asarray(sh_basis(jnp.asarray(dirs), sh_l8_m7_2x=False))
    ci = 0
    for l in LEVELS:
        for m in range(-l, l + 1):
            expected = scipy_real_sh(l, m, dirs.astype(np.float64))
            np.testing.assert_allclose(
                basis[:, ci], expected, rtol=2e-4, atol=2e-5,
                err_msg=f"l={l} m={m} (component {ci})")
            ci += 1
    assert ci == 34


def test_sh_bug_compat_doubles_m7(dirs):
    clean = np.asarray(sh_basis(jnp.asarray(dirs), sh_l8_m7_2x=False))
    bugged = np.asarray(sh_basis(jnp.asarray(dirs), sh_l8_m7_2x=True))
    comps = _sh_table.COMPONENTS
    for ci, (l, m) in enumerate(comps):
        factor = 2.0 if (l == 8 and abs(m) == 7) else 1.0
        np.testing.assert_allclose(bugged[:, ci], factor * clean[:, ci],
                                   rtol=1e-6, atol=1e-7)


def test_sh_reference_constants_present():
    """The grouped-polynomial constants the reference publishes must be
    reproduced by our independently-derived table."""
    coeffs = np.array(_sh_table.COEFFS)
    mono = {m: i for i, m in enumerate(_sh_table.MONOMIALS)}
    # l=1: Y_{1,-1} = 0.48860251190291992 * y
    assert abs(coeffs[mono[(0, 1, 0)], 0] - 0.48860251190291992) < 1e-12
    # l=2: Y_{2,-2} = 1.09254843059207907 * xy
    assert abs(coeffs[mono[(1, 1, 0)], 3] - 1.09254843059207907) < 1e-12
    # l=8, m=-8 leading term x^7 y: 5.83141328139863895 (correct value);
    # the reference uses the same number for m=+-7 — which is 2x the
    # correct 2.91570664... recorded at reference sh.txt:238.
    assert abs(coeffs[mono[(7, 1, 0)], 17] - 5.83141328139863895) < 1e-9
    comps = _sh_table.COMPONENTS
    i_m7 = comps.index((8, -7))
    lead = coeffs[mono[(6, 1, 1)], i_m7]  # x^6 y z term of Y_{8,-7}
    assert abs(lead - 7 * 2.91570664) < 1e-5  # Im((x+iy)^7) z-poly leading


def test_sh_addition_theorem(dirs):
    basis = np.asarray(sh_basis(jnp.asarray(dirs), sh_l8_m7_2x=False))
    lo = 0
    for l in LEVELS:
        n = 2 * l + 1
        s = np.sum(basis[:, lo:lo + n] ** 2, axis=-1)
        np.testing.assert_allclose(s, (2 * l + 1) / (4 * np.pi), rtol=1e-4)
        lo += n


def test_ish_attenuation_bands(dirs):
    rough = np.full((dirs.shape[0], 1), 0.3, np.float32)
    basis = np.asarray(sh_basis(jnp.asarray(dirs)))
    enc = np.asarray(ish_encode(jnp.asarray(dirs), jnp.asarray(rough)))
    for lo, hi, k in ((0, 3, 1), (3, 8, 3), (8, 17, 10), (17, 34, 36)):
        np.testing.assert_allclose(enc[:, lo:hi],
                                   basis[:, lo:hi] * np.exp(-0.3 * k),
                                   rtol=1e-5, atol=1e-7)


def torch_ipe_oracle(mean: torch.Tensor, cov_diag: torch.Tensor):
    """Oracle for nerfstudio NeRFEncoding integrated mode: freqs
    2^linspace(0,16,16), sin args scaled by 2*pi, variance NOT scaled
    (known quirk), expected_sin = exp(-0.5 var) * sin, identity appended."""
    freqs = 2.0 ** torch.linspace(0.0, 16.0, NUM_FREQUENCIES)
    scaled = (2 * torch.pi * mean)[..., None] * freqs
    scaled = scaled.flatten(-2)
    both = torch.cat([scaled, scaled + torch.pi / 2.0], dim=-1)
    var = cov_diag[..., None] * freqs**2
    var = var.flatten(-2)
    var = torch.cat([var, var], dim=-1)
    return torch.cat([torch.exp(-0.5 * var) * torch.sin(both), mean], dim=-1)


def test_ipe_matches_torch_oracle():
    rng = np.random.default_rng(2)
    mean = rng.normal(0, 1, (64, 3)).astype(np.float32)
    cov_diag = rng.uniform(0, 0.1, (64, 3)).astype(np.float32)
    got = np.asarray(ipe_encode(jnp.asarray(mean),
                                cov_diag=jnp.asarray(cov_diag)))
    want = torch_ipe_oracle(torch.from_numpy(mean),
                            torch.from_numpy(cov_diag)).numpy()
    assert got.shape == (64, 99)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ipe_no_cov_is_plain_sin():
    mean = jnp.asarray(np.random.default_rng(3).normal(0, 1, (8, 3)),
                       dtype=jnp.float32)
    a = np.asarray(ipe_encode(mean))
    b = np.asarray(ipe_encode(mean, cov_diag=jnp.zeros((8, 3))))
    np.testing.assert_allclose(a, b, atol=1e-6)
