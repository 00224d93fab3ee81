"""Pallas fused-field kernel tests.

The TPU kernels can't run on the CPU test platform, so correctness
there is checked in interpreter mode on tiny shapes; the full-size
TPU correctness + throughput checks run in bench/TPU sessions (the
model-level equivalence `use_pallas=True vs False` was verified on
hardware: max rgb diff ~1e-3 in bf16).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.core.encodings import ipe_encode
from rsn.models import field as field_lib
from rsn.kernels import field_pallas as fp


def test_pack_params_shapes():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    packed = fp.pack_params(params)
    assert len(packed) == 18
    ws = packed[:8]
    assert ws[0].shape == (fp.ENC_PAD, 256)
    assert ws[fp.SKIP_AT].shape == (fp.SKIP_PAD, 256)
    assert packed[16].shape == (256, fp.OUT_DIM)  # combined heads
    packed3 = fp.pack_params_v3(params)
    assert len(packed3) == 22
    assert packed3[18].shape == (256, 128)  # w_emb
    packed3f = fp.pack_params_v3f(params)
    assert len(packed3f) == 20
    # one wide (256, 256) operand: [11-col heads (padded) | w_comb]
    assert packed3f[16].shape == (256, 256)
    assert packed3f[17].shape == (1, 256)


def test_ipe_matrices_match_reference_encoding():
    """The matmul-IPE formulation must reproduce ipe_encode exactly."""
    A, bA, V, M = map(np.asarray, fp.ipe_matrices())
    rng = np.random.default_rng(0)
    mean = rng.normal(0, 0.5, (256, 3)).astype(np.float32)
    cd = rng.uniform(0, 1e-2, (256, 3)).astype(np.float32)
    mc = np.pad(np.concatenate([mean, cd], -1), ((0, 0), (0, 10)))
    pre = mc @ A + bA
    var = mc @ V
    enc = M * (np.exp(-0.5 * var) * np.sin(pre)) + (1 - M) * pre
    ref = np.asarray(ipe_encode(jnp.asarray(mean), cov_diag=jnp.asarray(cd)))
    # atol covers fp32 rounding of the huge high-frequency sin args
    # ((2*pi*f)*m vs 2*pi*(m*f) associativity at f=2^16)
    np.testing.assert_allclose(enc[:, :99], ref, rtol=2e-4, atol=3e-4)
    assert np.abs(enc[:, 99:]).max() == 0.0  # pad stays zero


def test_mid_g_bands_factorization():
    """g bands must reproduce ISH(dirs, rough) @ W_enc for any rough."""
    params = field_lib.init_field_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rough = rng.uniform(0, 1, (64, 1)).astype(np.float32)

    from rsn.core.encodings import ish_encode, _BAND_SLICES
    enc = np.asarray(ish_encode(jnp.asarray(dirs), jnp.asarray(rough)))
    w_enc = np.asarray(params["mid_mlp"]["w"][:34])
    want = enc @ w_enc  # (64, 128)

    g = np.asarray(fp.mid_g_bands(params, jnp.asarray(dirs)))  # (64, 512)
    got = np.zeros_like(want)
    for bi, (lo, hi, k) in enumerate(_BAND_SLICES):
        got += np.exp(-rough * k) * g[:, bi * 128:(bi + 1) * 128]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Pallas TPU kernel needs TPU")
def test_field_forward_matches_xla_on_tpu():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    mean = jax.random.normal(jax.random.PRNGKey(1), (2048, 3)) * 0.5
    cd = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (2048, 3))) * 1e-3
    mc = jnp.pad(jnp.concatenate([mean, cd], -1), ((0, 0), (0, 10)))
    out = fp.field_forward_v2(fp.pack_params(params), mc.astype(jnp.float32))
    h = fp.unpack_outputs(out)
    fcfg = field_lib.FieldConfig(compute_dtype=jnp.bfloat16)
    _, _, preact = field_lib.get_density(params, mean, cd, fcfg)
    np.testing.assert_allclose(np.asarray(h["density_preact"]),
                               np.asarray(preact), atol=5e-3)


def test_poly_sincos_and_exp2_damp_accuracy():
    """The in-kernel frac+poly sin/cos (turns domain) and exp2 damping
    must be fp32-exact: max err ~5e-7 over a full period, and for large
    2^j-scaled IPE arguments must agree with exact sin of the SAME fp32
    argument to within that argument's own representation error."""
    u = jnp.linspace(-0.5, 0.5, 4097)
    np.testing.assert_allclose(np.asarray(fp._sin2pi(u)),
                               np.sin(2 * np.pi * np.asarray(u, np.float64)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fp._cos2pi(u)),
                               np.cos(2 * np.pi * np.asarray(u, np.float64)),
                               atol=1e-6)
    # damp: exp2(-var/(2 ln2)) == exp(-var/2)
    var = jnp.asarray([0.0, 0.1, 1.0, 10.0, 80.0])
    np.testing.assert_allclose(
        np.asarray(jnp.exp2(-fp._HALF_LOG2E * var)),
        np.exp(-0.5 * np.asarray(var, np.float64)), rtol=1e-6)
    # moderate 2^j-scaled args (phase still representable in fp32):
    # frac+poly tracks exact sin
    t = jax.random.normal(jax.random.PRNGKey(0), (4096,)) * 256.0
    uu = t * fp._INV_2PI
    uu = uu - jnp.round(uu)
    np.testing.assert_allclose(np.asarray(fp._sin2pi(uu)),
                               np.asarray(jnp.sin(t)), atol=2e-4)


def test_ipe_parts_matches_exact_reference():
    """_ipe_parts (poly path) vs the exact-sin/exp IPE on in-range
    blob stats: the bf16 x output must agree to bf16 resolution."""
    A, bA, V, M = fp.ipe_matrices()
    key = jax.random.PRNGKey(3)
    mean = jax.random.normal(key, (512, 3)) * 0.5
    cov = jnp.abs(jax.random.normal(key, (512, 3))) * 1e-2
    mc = jnp.pad(jnp.concatenate([mean, cov], -1),
                 ((0, 0), (0, fp.IN_COLS - 6))).astype(jnp.float32)
    x, pre_enc, damp, u = fp._ipe_parts(mc, (A, bA, V, M))
    pre = mc @ A + bA
    var = mc @ V
    exact = (M * (jnp.exp(-0.5 * var) * jnp.sin(pre))
             + (1.0 - M) * pre)
    np.testing.assert_allclose(np.asarray(x, np.float32),
                               np.asarray(exact), atol=2e-2, rtol=2e-2)
