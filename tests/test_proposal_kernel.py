"""Fused proposal kernel: interpret-mode equivalence vs the XLA
composition (the repo's kernel-change contract, CLAUDE.md): same
geometry prep, IPE, trunk, and density as proposal.proposal_density,
to bf16-activation tolerance."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.core.rays import RayBundle
from rsn.core.spacing import identity_spacing, reciprocal_spacing, spaced_sample
from rsn.kernels.proposal_pallas import proposal_density_kernel
from rsn.models.proposal import init_proposal_params, proposal_density


def _bundle(R, near=2.0, far=6.0):
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-4),
        nears=jnp.full((R, 1), near), fars=jnp.full((R, 1), far))


@pytest.mark.parametrize("spacing,S", [(identity_spacing(), 16),
                                       (reciprocal_spacing(0.25), 8)])
def test_prop_kernel_matches_xla(spacing, S):
    rb = _bundle(16)
    rs = spaced_sample(rb, spacing, S, key=None)
    params = init_proposal_params(jax.random.PRNGKey(0))
    ref = np.asarray(proposal_density(params, rs))
    got = np.asarray(proposal_density_kernel(params, rs, interpret=True))
    assert got.shape == ref.shape
    # bf16 activations: ~0.4% relative on the preact propagates through
    # softplus; bound both relative and absolute error
    np.testing.assert_allclose(got, ref, rtol=0.03, atol=0.02)
    # density is positive and finite everywhere
    assert np.isfinite(got).all() and (got >= 0).all()


def test_prop_kernel_padding_invariant():
    """Ray counts that don't divide the tile are padded internally;
    padding must not perturb real rows."""
    params = init_proposal_params(jax.random.PRNGKey(1))
    rb = _bundle(24)
    rb16 = jax.tree.map(lambda x: x[:16], rb)
    rs_a = spaced_sample(rb16, identity_spacing(), 16, key=None)
    rs_b = spaced_sample(rb, identity_spacing(), 16, key=None)
    a = np.asarray(proposal_density_kernel(params, rs_a, interpret=True))
    b = np.asarray(proposal_density_kernel(params, rs_b, interpret=True))
    np.testing.assert_allclose(b[:16], a, rtol=1e-5, atol=1e-6)
