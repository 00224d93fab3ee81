"""Sampler parity tests (SURVEY.md §4.2): spacing round-trips, stratified
bounds, reciprocal quartiles (verified numbers from SURVEY.md A.3), and
PDF inverse-CDF resampling properties + a hand-computable mini-case.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.core.rays import RayBundle
from rsn.core.sampling import pdf_sample
from rsn.core.spacing import (identity_spacing, reciprocal_spacing,
                              spaced_sample)


def make_bundle(num_rays=4, near=2.0, far=6.0):
    d = np.zeros((num_rays, 3), np.float32)
    d[:, 2] = 1.0
    return RayBundle(
        origins=jnp.zeros((num_rays, 3)),
        directions=jnp.asarray(d),
        pixel_area=jnp.full((num_rays, 1), 1e-4),
        nears=jnp.full((num_rays, 1), near),
        fars=jnp.full((num_rays, 1), far))


def test_reciprocal_spacing_roundtrip():
    sp = reciprocal_spacing(tan=0.25)
    t = jnp.asarray(np.linspace(0.01, 250.0, 100, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(sp.fn_inv(sp.fn(t))), np.asarray(t),
                               rtol=1e-4)
    # verified constants from SURVEY.md A.3: s(t) = t/(4+t) at tan=0.25
    assert abs(float(sp.fn(jnp.float32(256.0))) - 256.0 / 260.0) < 1e-6


def test_reciprocal_sampler_concentrates_near_origin():
    """Half of the reflected samples land within t<4 over [0, 256]
    (SURVEY.md A.3: uniform-in-s quartiles at t ~= {1.31, 3.88, 11.3})."""
    rb = make_bundle(num_rays=1, near=0.0, far=256.0)
    rs = spaced_sample(rb, reciprocal_spacing(0.25), 64, key=None)
    mids = np.asarray((rs.starts + rs.ends) / 2)[0, :, 0]
    frac_below_4 = float(np.mean(mids < 4.0))
    assert 0.4 < frac_below_4 < 0.6
    q = np.quantile(mids, [0.25, 0.5, 0.75])
    np.testing.assert_allclose(q, [1.31, 3.88, 11.3], rtol=0.12)


def test_uniform_sampler_eval_is_midpointless_linspace():
    """Without a key (eval), bins are exactly linspace(near, far)."""
    rb = make_bundle(num_rays=2)
    rs = spaced_sample(rb, identity_spacing(), 8, key=None)
    starts = np.asarray(rs.starts)[0, :, 0]
    expect = 2.0 + (6.0 - 2.0) * np.arange(8) / 8.0
    np.testing.assert_allclose(starts, expect, rtol=1e-6)
    assert float(rs.ends[0, -1, 0]) == pytest.approx(6.0)


def test_stratified_bins_stay_sorted_and_bounded():
    rb = make_bundle(num_rays=16)
    rs = spaced_sample(rb, identity_spacing(), 32,
                       key=jax.random.PRNGKey(0))
    starts = np.asarray(rs.starts)[..., 0]
    ends = np.asarray(rs.ends)[..., 0]
    assert (ends >= starts).all()
    assert (starts[:, 1:] >= starts[:, :-1] - 1e-6).all()
    assert starts.min() >= 2.0 - 1e-5 and ends.max() <= 6.0 + 1e-5
    # stratification actually jitters
    rs2 = spaced_sample(rb, identity_spacing(), 32,
                        key=jax.random.PRNGKey(1))
    assert not np.allclose(starts, np.asarray(rs2.starts)[..., 0])


def test_pdf_sampler_concentrates_on_high_weight_bins():
    rb = make_bundle(num_rays=1)
    coarse = spaced_sample(rb, identity_spacing(), 64, key=None)
    mids = (np.asarray(coarse.starts) + np.asarray(coarse.ends))[0, :, 0] / 2
    # all weight in t in [3.9, 4.1]; scaled large so the sampler's
    # histogram_padding (0.01/bin, a replicated nerfstudio constant) is
    # negligible relative to the signal
    w = np.exp(-0.5 * ((mids - 4.0) / 0.05) ** 2).astype(np.float32)
    w = 50.0 * w / w.sum()
    fine = pdf_sample(rb, coarse, jnp.asarray(w[None, :, None]),
                      identity_spacing(), 64, key=None)
    fmids = (np.asarray(fine.starts) + np.asarray(fine.ends))[0, :, 0] / 2
    assert float(np.mean(np.abs(fmids - 4.0) < 0.3)) > 0.9


def test_pdf_sampler_uniform_weights_reproduce_uniform_bins():
    """With equal weights the inverse CDF is linear: eval-mode PDF bins
    land (nearly) uniformly across [near, far]."""
    rb = make_bundle(num_rays=1)
    coarse = spaced_sample(rb, identity_spacing(), 16, key=None)
    w = jnp.full((1, 16, 1), 1.0 / 16)
    fine = pdf_sample(rb, coarse, w, identity_spacing(), 16, key=None)
    starts = np.asarray(fine.starts)[0, :, 0]
    # midpoints of 17 uniform u's over a linear CDF
    gaps = np.diff(starts)
    assert gaps.std() < 0.02 * gaps.mean() + 1e-6


def test_pdf_sampler_hand_case_two_bins():
    """2 coarse bins, all weight in the second: every new sample must lie
    in the second bin's t-range [4, 6]."""
    rb = make_bundle(num_rays=1)
    coarse = spaced_sample(rb, identity_spacing(), 2, key=None)  # bins 2-4-6
    w = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))
    fine = pdf_sample(rb, coarse, w, identity_spacing(), 8, key=None)
    starts = np.asarray(fine.starts)[0, :, 0]
    ends = np.asarray(fine.ends)[0, :, 0]
    # histogram_padding leaks a little mass into bin 1; midpoint u's of
    # the first new bin may touch it, but the bulk must be in [4, 6]
    assert starts.min() >= 2.0 - 1e-5
    assert (starts > 3.9).mean() > 0.8
    assert ends.max() <= 6.0 + 1e-5


def test_pdf_sampler_stratified_is_random_but_sorted():
    rb = make_bundle(num_rays=4)
    coarse = spaced_sample(rb, identity_spacing(), 32, key=None)
    w = jnp.full((4, 32, 1), 1.0 / 32)
    f1 = pdf_sample(rb, coarse, w, identity_spacing(), 32,
                    key=jax.random.PRNGKey(0))
    f2 = pdf_sample(rb, coarse, w, identity_spacing(), 32,
                    key=jax.random.PRNGKey(1))
    s1 = np.asarray(f1.starts)[..., 0]
    s2 = np.asarray(f2.starts)[..., 0]
    assert not np.allclose(s1, s2)
    assert (np.diff(s1, axis=-1) >= -1e-6).all()


def test_pdf_sampler_zero_weights_no_nan():
    rb = make_bundle(num_rays=2)
    coarse = spaced_sample(rb, identity_spacing(), 8, key=None)
    w = jnp.zeros((2, 8, 1))
    fine = pdf_sample(rb, coarse, w, identity_spacing(), 8,
                      key=jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(fine.starts).all())
    assert bool(jnp.isfinite(fine.ends).all())


def test_pdf_onehot_formulation_bit_identical():
    """The count + one-hot-matmul searchsorted (tools/exp_pdf_variants.
    pdf_sample_onehot, candidate for the render path) must be
    bit-identical to pdf_sample on adversarial weight histograms:
    duplicate CDF values (zero-weight runs), all-zero weights (eps
    guard), spikes at the first/last bin, and stratified keys."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from exp_pdf_variants import pdf_sample_onehot

    rb = make_bundle(num_rays=5)
    coarse = spaced_sample(rb, identity_spacing(), 16, key=None)
    rng = np.random.default_rng(0)
    cases = [
        jnp.asarray(np.abs(rng.normal(size=(5, 16, 1))).astype(np.float32)),
        jnp.zeros((5, 16, 1)),  # eps guard path
        jnp.asarray(np.eye(16, dtype=np.float32)[[0, 15, 7, 0, 15]]
                    [..., None] * 5.0),  # spikes => long zero runs
        jnp.asarray((rng.random((5, 16, 1)) < 0.3).astype(np.float32)),
    ]
    for w in cases:
        for key in (None, jax.random.PRNGKey(3)):
            a = pdf_sample(rb, coarse, w, identity_spacing(), 12, key=key)
            b = pdf_sample_onehot(rb, coarse, w, identity_spacing(), 12,
                                  key=key)
            np.testing.assert_array_equal(np.asarray(a.starts),
                                          np.asarray(b.starts))
            np.testing.assert_array_equal(np.asarray(a.ends),
                                          np.asarray(b.ends))
