"""Proposal-network sampling (rsn/models/proposal.py).

The interlevel loss is oracle-checked against a numpy searchsorted
implementation of mip-NeRF-360's lossfun_outer; the train-step
integration asserts the proposal field receives gradients through it.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.configs import (DataManagerConfig, ModelConfig, PipelineConfig,
                         TrainerConfig)
from rsn.models import proposal


def _outer_oracle(w_fine, bins_fine, w_prop, bins_prop, eps=1e-7):
    """numpy searchsorted version of lossfun_outer (mip-NeRF-360)."""
    R, Sf = w_fine.shape
    cw = np.concatenate([np.zeros((R, 1)), np.cumsum(w_prop, -1)], -1)
    loss = 0.0
    for r in range(R):
        lo = bins_fine[r, :-1]
        hi = bins_fine[r, 1:]
        # idx of largest prop edge <= lo / smallest >= hi
        ilo = np.searchsorted(bins_prop[r], lo, side="right") - 1
        ihi = np.searchsorted(bins_prop[r], hi, side="left")
        ilo = np.clip(ilo, 0, bins_prop.shape[1] - 1)
        ihi = np.clip(ihi, 0, bins_prop.shape[1] - 1)
        outer = np.maximum(cw[r, ihi] - cw[r, ilo], 0.0)
        excess = np.maximum(w_fine[r] - outer, 0.0)
        loss += np.sum(excess**2 / (w_fine[r] + eps))
    return loss / R


def test_interlevel_loss_matches_searchsorted_oracle():
    rng = np.random.default_rng(0)
    R, Sf, Sp = 6, 9, 5
    bins_fine = np.sort(rng.uniform(size=(R, Sf + 1)), axis=-1)
    bins_prop = np.sort(rng.uniform(size=(R, Sp + 1)), axis=-1)
    bins_fine[:, 0] = bins_prop[:, 0] = 0.0
    bins_fine[:, -1] = bins_prop[:, -1] = 1.0
    w_fine = rng.uniform(size=(R, Sf)).astype(np.float32) * 0.2
    w_prop = rng.uniform(size=(R, Sp)).astype(np.float32) * 0.3

    got = float(proposal.interlevel_loss(
        jnp.asarray(w_fine)[..., None], jnp.asarray(bins_fine),
        jnp.asarray(w_prop)[..., None], jnp.asarray(bins_prop)))
    want = _outer_oracle(w_fine, bins_fine, w_prop, bins_prop)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_interlevel_loss_zero_when_proposal_covers():
    """A proposal histogram that upper-bounds the fine one: loss = 0."""
    bins = jnp.asarray([[0.0, 0.5, 1.0]])
    w_prop = jnp.asarray([[0.6, 0.6]])[..., None]
    bins_fine = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w_fine = jnp.asarray([[0.3, 0.3, 0.3, 0.3]])[..., None]
    loss = float(proposal.interlevel_loss(w_fine, bins_fine, w_prop, bins))
    assert loss == 0.0


def test_interlevel_loss_grad_only_to_proposal():
    key = jax.random.PRNGKey(0)
    bins_f = jnp.sort(jax.random.uniform(key, (4, 8)), axis=-1)
    bins_p = jnp.sort(jax.random.uniform(key, (4, 6)), axis=-1)
    w_f = jax.random.uniform(key, (4, 7, 1)) * 0.3
    w_p = jax.random.uniform(key, (4, 5, 1)) * 0.1  # too small -> loss > 0

    g_p = jax.grad(lambda wp: proposal.interlevel_loss(
        w_f, bins_f, wp, bins_p))(w_p)
    assert float(jnp.sum(jnp.abs(g_p))) > 0.0
    g_f = jax.grad(lambda wf: proposal.interlevel_loss(
        wf, bins_f, w_p, bins_p))(w_f)
    assert float(jnp.sum(jnp.abs(g_f))) == 0.0  # fine side is detached


def test_proposal_density_shape_and_params():
    from rsn.core.rays import RayBundle
    from rsn.core.spacing import identity_spacing, spaced_sample

    params = proposal.init_proposal_params(jax.random.PRNGKey(0))
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    assert n_params < 30_000, n_params  # tiny vs the 0.62M main field

    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ones = jnp.ones((8, 1))
    rb = RayBundle(origins=jnp.zeros((8, 3)), directions=d,
                   pixel_area=ones * 1e-6, nears=ones * 2.0,
                   fars=ones * 6.0)
    rs = spaced_sample(rb, identity_spacing(), 16)
    dens = proposal.proposal_density(params, rs)
    assert dens.shape == (8, 16, 1)
    assert bool(jnp.all(dens >= 0.0))


def _prop_config():
    return TrainerConfig(pipeline=PipelineConfig(
        datamanager=DataManagerConfig(dataparser="synthetic",
                                      train_num_rays_per_batch=32),
        model=ModelConfig(num_coarse_samples=8, num_importance_samples=8,
                          num_reflect_coarse_samples=4,
                          num_reflect_importance_samples=4,
                          use_proposal=True, num_proposal_samples=8)))


def test_train_step_updates_proposal_field():
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.optimizers import build_optimizer
    from rsn.engine.trainer import TrainState, make_train_step
    from rsn.models import field as field_lib

    config = _prop_config()
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(2))
    train_step, optimizer = make_train_step(config)
    prop_opt = build_optimizer(
        config.optimizers["proposal_networks"]).init(prop)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0), proposal=prop,
                       proposal_opt_state=prop_opt)
    fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    new_state, metrics = fn(state, jax.random.PRNGKey(1))
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["total_loss"])
    assert "interlevel_loss" in metrics
    assert "loss_mid_coarse" not in metrics  # no coarse rgb in this mode
    before = np.concatenate([np.ravel(x) for x in
                             jax.tree.leaves(prop)])
    after = np.concatenate([np.ravel(np.asarray(x)) for x in
                            jax.tree.leaves(new_state.proposal)])
    assert np.any(before != after), "proposal field received no update"
    # second step consumes the updated state without recompiling
    new_state2, _ = fn(new_state, jax.random.PRNGKey(2))
    assert int(new_state2.step) == 2


def test_proposal_eval_render_runs():
    from rsn.core.rays import RayBundle
    from rsn.models import field as field_lib
    from rsn.models import model as model_lib

    cfg = _prop_config().pipeline.model
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ones = jnp.ones((16, 1))
    rb = RayBundle(origins=jnp.zeros((16, 3)) + jnp.asarray([0., 0., 4.]),
                   directions=d, pixel_area=ones * 1e-6,
                   nears=ones * 0.0, fars=ones * 1.0)
    rb = model_lib.apply_collider(rb, cfg)
    out = jax.jit(lambda p, pr: model_lib.get_outputs(
        p, rb, key, cfg, training=False, prop_params=pr))(params, prop)
    assert out["mid_rgb_fine"].shape == (16, 3)
    assert np.all(np.isfinite(np.asarray(out["mid_reflect_fine"])))
    # proposal-mode outputs carry the interlevel inputs
    assert "prop_weights" in out and "fine_spacing_bins" in out
