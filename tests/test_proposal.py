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


def test_proposal_weight_anneal_semantics():
    """prop_anneal=0 -> near-uniform fine resampling (w**0 = 1 on
    nonzero bins, zeros preserved); prop_anneal=1 == no anneal; the
    reported coarse outputs and interlevel inputs keep RAW weights."""
    from rsn.core.rays import RayBundle
    from rsn.models import field as field_lib
    from rsn.models import model as M

    cfg = ModelConfig(num_coarse_samples=8, num_importance_samples=8,
                      num_reflect_coarse_samples=4,
                      num_reflect_importance_samples=4,
                      use_proposal=True, num_proposal_samples=8)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(1))
    R = 8
    key = jax.random.PRNGKey(2)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = M.apply_collider(RayBundle(
        origins=jnp.zeros((R, 3)), directions=d,
        pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1))), cfg)

    out = lambda a: jax.jit(lambda p: M.get_outputs(
        p, rb, key, cfg, training=False, prop_params=prop,
        prop_anneal=a))(params)
    o_none = jax.jit(lambda p: M.get_outputs(
        p, rb, key, cfg, training=False, prop_params=prop))(params)
    o1 = out(1.0)
    o0 = out(0.0)

    # anneal=1 is exactly the unannealed program
    np.testing.assert_array_equal(np.asarray(o1["mid_rgb_fine"]),
                                  np.asarray(o_none["mid_rgb_fine"]))
    # raw proposal weights reported regardless of anneal
    np.testing.assert_array_equal(np.asarray(o0["prop_weights"]),
                                  np.asarray(o1["prop_weights"]))
    np.testing.assert_array_equal(np.asarray(o0["weights_coarse"]),
                                  np.asarray(o1["weights_coarse"]))
    # anneal=0 -> flat histogram -> fine bins ~= uniform bins
    bins0 = np.asarray(o0["fine_spacing_bins"])
    uniform = np.linspace(0, 1, bins0.shape[-1])
    np.testing.assert_allclose(bins0, np.broadcast_to(uniform, bins0.shape),
                               atol=0.08)
    assert np.isfinite(np.asarray(o0["mid_rgb_fine"])).all()


def test_distortion_loss_matches_bruteforce_and_behaves():
    """O(S) cumsum form == O(S^2) pairwise definition; compact unimodal
    weights score lower than spread-out ones; gradient is nonzero."""
    rng = np.random.default_rng(3)
    R, S = 5, 16
    bins = np.sort(rng.uniform(0, 1, (R, S + 1)), axis=-1)
    w = rng.uniform(0, 1, (R, S))
    w = w / w.sum(-1, keepdims=True)

    got = np.asarray(proposal.distortion_per_ray(
        jnp.asarray(w)[..., None], jnp.asarray(bins)))
    u = 0.5 * (bins[:, 1:] + bins[:, :-1])
    inter = np.einsum("ri,rj,rij->r", w, w,
                      np.abs(u[:, :, None] - u[:, None, :]))
    intra = np.sum(w**2 * (bins[:, 1:] - bins[:, :-1]), -1) / 3.0
    np.testing.assert_allclose(got, inter + intra, rtol=1e-5, atol=1e-7)

    # concentration: all mass in one bin beats mass spread over all bins
    edges = np.broadcast_to(np.linspace(0, 1, S + 1), (1, S + 1))
    spike = np.zeros((1, S)); spike[0, S // 2] = 1.0
    flat = np.full((1, S), 1.0 / S)
    d_spike = float(proposal.distortion_per_ray(
        jnp.asarray(spike)[..., None], jnp.asarray(edges))[0])
    d_flat = float(proposal.distortion_per_ray(
        jnp.asarray(flat)[..., None], jnp.asarray(edges))[0])
    assert d_spike < d_flat

    g = jax.grad(lambda ww: jnp.sum(proposal.distortion_per_ray(
        ww, jnp.asarray(bins))))(jnp.asarray(w)[..., None])
    assert float(jnp.max(jnp.abs(g))) > 0


def test_distortion_loss_trains_the_main_field():
    """With distortion_loss_mult > 0 the loss key appears and its
    gradient reaches the MAIN field's density params (the whole point:
    outputs['weights_fine'] is detached, the wiring must use the live
    weights)."""
    from rsn.core.rays import RayBundle
    from rsn.models import field as field_lib
    from rsn.models import model as M

    cfg = ModelConfig(num_coarse_samples=8, num_importance_samples=8,
                      num_reflect_coarse_samples=4,
                      num_reflect_importance_samples=4,
                      use_proposal=True, num_proposal_samples=8,
                      distortion_loss_mult=0.002)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(1))
    R = 8
    key = jax.random.PRNGKey(2)
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = M.apply_collider(RayBundle(
        origins=jnp.zeros((R, 3)), directions=d,
        pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1))), cfg)
    gt = jnp.zeros((R, 3))
    coeffs = {k: jnp.float32(1.0) for k in (
        "loss_mid_fine", "loss_reflect_mid_coarse",
        "loss_reflect_mid_fine", "predicted_normal_loss_fine",
        "orientation_loss_fine", "interlevel_loss", "distortion_loss")}

    def distortion_only(p):
        out = M.get_outputs(p, rb, key, cfg, training=True,
                            prop_params=prop)
        ld = M.get_loss_dict(out, gt, coeffs)
        assert "distortion_loss" in ld
        return ld["distortion_loss"]

    g = jax.grad(distortion_only)(params)
    gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0, gmax


def _prop_reflect_config():
    cfg = _prop_config()
    model = dataclasses.replace(cfg.pipeline.model,
                                use_proposal_reflect=True)
    return dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, model=model))


def test_proposal_reflect_drops_pass3_and_trains_proposal():
    """use_proposal_reflect: pass 3 runs the proposal field — no
    reflect-coarse rgb loss, a second interlevel term (reciprocal
    spacing) carries gradient to the proposal params."""
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.trainer import (loss_coefficients_traced,
                                    sample_pixel_batch)
    from rsn.models import field as field_lib
    from rsn.models import model as M

    config = _prop_reflect_config()
    mcfg = config.pipeline.model
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(1)
    bundle, gt = sample_pixel_batch(images, ds.cameras, 32, key)
    bundle = M.apply_collider(bundle, mcfg)
    coeffs = dict(loss_coefficients_traced(jnp.int32(1000)),
                  interlevel_loss=jnp.float32(1.0))

    out = M.get_outputs(params, bundle, key, mcfg, training=True,
                        prop_params=prop)
    assert "reflect_prop_weights" in out
    ld = M.get_loss_dict(out, gt, coeffs)
    assert "loss_reflect_mid_coarse" not in ld
    assert "loss_reflect_mid_fine" in ld
    assert np.isfinite(float(sum(jax.tree.leaves(ld))))

    # the reflected interlevel term is LIVE: zeroing it changes the
    # proposal-parameter gradient
    def il(pp, with_reflect):
        o = M.get_outputs(params, bundle, key, mcfg, training=True,
                          prop_params=pp)
        if not with_reflect:
            o = {k: v for k, v in o.items()
                 if k != "reflect_prop_weights"}
        return M.get_loss_dict(o, gt, coeffs)["interlevel_loss"]

    g_with = jax.grad(lambda pp: il(pp, True))(prop)
    g_without = jax.grad(lambda pp: il(pp, False))(prop)
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(g_with), jax.tree.leaves(g_without)))
    assert np.isfinite(diff) and diff > 0.0, diff

    # invariant (proposal.py:115): the interlevel loss trains ONLY the
    # proposal field.  Its gradient w.r.t. the MAIN field params must be
    # identically zero — rs_recip's pixel_area is live through the
    # roughness head, so without the detach in the proposal-reflect
    # branch (model.py) gradient would leak here (ADVICE r2).
    def il_main(p):
        o = M.get_outputs(p, bundle, key, mcfg, training=True,
                          prop_params=prop)
        return M.get_loss_dict(o, gt, coeffs)["interlevel_loss"]

    g_main = jax.grad(il_main)(params)
    leak = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g_main))
    assert leak == 0.0, leak


def test_proposal_reflect_train_step_and_eval():
    """Full jitted train step in proposal-reflect mode + eval render."""
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.optimizers import build_optimizer
    from rsn.engine.trainer import TrainState, make_train_step
    from rsn.models import field as field_lib
    from rsn.models import model as M

    config = _prop_reflect_config()
    mcfg = config.pipeline.model
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = proposal.init_proposal_params(jax.random.PRNGKey(2))
    train_step, optimizer = make_train_step(config)
    state = TrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.int32(0), proposal=prop,
        proposal_opt_state=build_optimizer(
            config.optimizers["proposal_networks"]).init(prop))
    fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    new_state, metrics = fn(state, jax.random.PRNGKey(1))
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["total_loss"])
    assert "loss_reflect_mid_coarse" not in metrics
    before = np.concatenate([np.ravel(x) for x in jax.tree.leaves(prop)])
    after = np.concatenate([np.ravel(np.asarray(x)) for x in
                            jax.tree.leaves(new_state.proposal)])
    assert np.any(before != after)

    # eval render path (adaptive exact compaction off this tiny batch)
    from rsn.core.rays import RayBundle
    key = jax.random.PRNGKey(3)
    d = jax.random.normal(key, (16, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rb = M.apply_collider(RayBundle(
        origins=jnp.zeros((16, 3)).at[:, 2].set(4.0), directions=d,
        pixel_area=jnp.full((16, 1), 1e-6), nears=jnp.zeros((16, 1)),
        fars=jnp.ones((16, 1))), mcfg)
    out = M.get_outputs(new_state.params, rb, key, mcfg, training=False,
                        prop_params=new_state.proposal)
    img = M.final_rgb(out)
    assert img.shape == (16, 3) and bool(jnp.all(jnp.isfinite(img)))
