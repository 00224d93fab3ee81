"""Positional (integrated) and directional (integrated-SH) encodings.

Rebuilds, as pure functions:

- `ipe_encode`: nerfstudio ``NeRFEncoding`` in integrated mode
  (consumed at reference reflect_sampling_nerf_model.py:98-100 and
  reflect_sampling_nerf_field.py:129): 16 frequencies 2^linspace(0,16,16),
  mip-NeRF expected-sin attenuation exp(-0.5 * var), identity appended.
  NOTE (parity quirk): like nerfstudio, the input is scaled by 2*pi for the
  sin args but the variance is NOT scaled by (2*pi)^2.

- `ish_encode`: the reference's hand-rolled IntegratedSHEncoding
  (reflect_sampling_nerf_components.py:38-140): real SH levels {1,2,4,8}
  -> 34 components, attenuated per level band by exp(-roughness * l(l+1)/2)
  (exponents 1/3/10/36).  Implemented TPU-first as one monomial-feature
  matmul against a sympy-derived table (tools/gen_sh_table.py) instead of
  scalar polynomial code.  The reference's l=8 m=+-7 coefficients are 2x
  the correct value (SURVEY.md A.2/B#1); `sh_l8_m7_2x=True` (default)
  replicates that trained-in bug bit-for-bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rsn.core import _sh_table

NUM_FREQUENCIES = 16
MIN_FREQ_EXP = 0.0
MAX_FREQ_EXP = 16.0
IPE_OUT_DIM = 3 * 2 * NUM_FREQUENCIES + 3  # 99
ISH_OUT_DIM = 34

# per-band attenuation exponents l(l+1)/2 for l in {1,2,4,8}
_BAND_SLICES = ((0, 3, 1.0), (3, 8, 3.0), (8, 17, 10.0), (17, 34, 36.0))


def _freqs(dtype=jnp.float32, num: int = NUM_FREQUENCIES,
           max_exp: float = MAX_FREQ_EXP) -> jax.Array:
    return 2.0 ** jnp.linspace(MIN_FREQ_EXP, max_exp, num, dtype=dtype)


def ipe_encode(mean: jax.Array, cov_diag: jax.Array | None = None,
               cov: jax.Array | None = None,
               num_freqs: int = NUM_FREQUENCIES,
               max_freq_exp: float = MAX_FREQ_EXP) -> jax.Array:
    """Integrated positional encoding of a Gaussian.

    Args:
      mean: (..., 3)
      cov_diag: (..., 3) diagonal of covariance (preferred), or
      cov: (..., 3, 3) full covariance (diagonal is extracted).
      num_freqs/max_freq_exp: octave count/range (default = the main
      field's 16; the proposal field uses a smaller encoding).
    Returns:
      (..., 3*2*num_freqs + 3): [sin terms, cos terms, mean], ordered
      dim-major over frequencies like nerfstudio.
    """
    freqs = _freqs(mean.dtype, num_freqs, max_freq_exp)
    scaled = (2.0 * jnp.pi * mean)[..., None] * freqs  # (..., 3, F)
    scaled = scaled.reshape(*scaled.shape[:-2], -1)  # (..., 3F)
    both = jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
    if cov is not None and cov_diag is None:
        cov_diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    if cov_diag is None:
        enc = jnp.sin(both)
    else:
        var = cov_diag[..., None] * freqs**2  # (..., 3, F) — no (2pi)^2, quirk
        var = var.reshape(*var.shape[:-2], -1)
        var = jnp.concatenate([var, var], axis=-1)
        enc = jnp.exp(-0.5 * var) * jnp.sin(both)  # expected_sin
    return jnp.concatenate([enc, mean], axis=-1)


@functools.lru_cache(maxsize=4)
def _sh_tables(sh_l8_m7_2x: bool):
    monomials = np.array(_sh_table.MONOMIALS, dtype=np.int32)  # (M, 3)
    coeffs = np.array(_sh_table.COEFFS, dtype=np.float32)  # (M, 34)
    if sh_l8_m7_2x:
        comps = _sh_table.COMPONENTS
        for ci, (l, m) in enumerate(comps):
            if l == 8 and abs(m) == 7:
                coeffs = coeffs.copy()
                coeffs[:, ci] *= 2.0
    return monomials, coeffs


def sh_basis(directions: jax.Array, sh_l8_m7_2x: bool = True) -> jax.Array:
    """Real SH basis, levels {1,2,4,8}, on unit directions -> (..., 34).

    Evaluates all 69 monomial features x^a y^b z^c then one matmul with the
    derived coefficient table.  No gradient flows to `directions`
    (the reference computes the basis under @torch.no_grad,
    components.py:52).
    """
    monomials, coeffs = _sh_tables(sh_l8_m7_2x)
    d = jax.lax.stop_gradient(directions)
    # features via power products, statically unrolled (indices are
    # compile-time constants -> pure elementwise VPU work, no gathers)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xp = [None] * 9
    yp = [None] * 9
    zp = [None] * 9
    xp[0] = yp[0] = zp[0] = jnp.ones_like(x)
    for k in range(1, 9):
        xp[k] = xp[k - 1] * x
        yp[k] = yp[k - 1] * y
        zp[k] = zp[k - 1] * z
    feats = jnp.stack([xp[a] * yp[b] * zp[c]
                       for a, b, c in monomials.tolist()], axis=-1)
    return feats @ jnp.asarray(coeffs)


def ish_encode(directions: jax.Array, roughness: jax.Array,
               sh_l8_m7_2x: bool = True) -> jax.Array:
    """Integrated (roughness-attenuated) SH directional encoding.

    components[band_l] *= exp(-roughness * l(l+1)/2)  — Ref-NeRF IDE with
    roughness as inverse concentration (reference components.py:134-140).

    Args:
      directions: (..., 3) unit; roughness: (..., 1) nonneg.
    Returns: (..., 34)
    """
    basis = sh_basis(directions, sh_l8_m7_2x)
    return basis * _band_attenuation(roughness, basis.dtype)


def _band_attenuation(roughness: jax.Array, dtype) -> jax.Array:
    """exp(-roughness * k_l) broadcast to the 34 components, (..., 34)."""
    ks = np.zeros((ISH_OUT_DIM,), dtype=np.float32)
    for lo, hi, k in _BAND_SLICES:
        ks[lo:hi] = k
    return jnp.exp(-roughness * jnp.asarray(ks, dtype=dtype))
