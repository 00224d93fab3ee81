"""Primary-only model family (use_reflection=False, the `mipnerf`
method): passes 1-2 only, no reflected passes, mid_rgb_fine is the
product image."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.models import field as field_lib
from rsn.models import model as model_lib

TINY = dict(num_coarse_samples=16, num_importance_samples=16,
            num_reflect_coarse_samples=8, num_reflect_importance_samples=8)


@pytest.fixture(scope="module")
def setup():
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    R = 32
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from rsn.core.rays import RayBundle
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    return params, bundle, key


def _cfg(**kw):
    base = get_method("mipnerf").config_factory().pipeline.model
    return dataclasses.replace(base, **TINY, **kw)


def test_output_keys_exclude_reflection(setup):
    params, bundle, key = setup
    cfg = _cfg()
    bundle = model_lib.apply_collider(bundle, cfg)
    out = jax.jit(lambda p, b, k: model_lib.get_outputs(
        p, b, k, cfg, training=True))(params, bundle, key)
    for k in ("mid_reflect_coarse", "mid_reflect_fine",
              "depth_reflect_fine"):
        assert k not in out
    for k in ("mid_rgb_coarse", "mid_rgb_fine", "mask", "roughness",
              "pred_normals_coarse", "normals_fine", "reflect_overflow"):
        assert k in out
    assert model_lib.final_rgb(out) is out["mid_rgb_fine"]


def test_primary_passes_match_full_model(setup):
    """Same seed: passes 1-2 are identical with and without reflection
    (the rng split and primary math are shared)."""
    params, bundle, key = setup
    cfg_off = _cfg()
    cfg_on = dataclasses.replace(cfg_off, use_reflection=True)
    bundle = model_lib.apply_collider(bundle, cfg_off)
    out_off = jax.jit(lambda p, b, k: model_lib.get_outputs(
        p, b, k, cfg_off, training=True))(params, bundle, key)
    out_on = jax.jit(lambda p, b, k: model_lib.get_outputs(
        p, b, k, cfg_on, training=True))(params, bundle, key)
    for k in ("mid_rgb_coarse", "mid_rgb_fine", "accumulation_fine",
              "depth_fine", "roughness", "mask"):
        np.testing.assert_allclose(np.asarray(out_off[k]),
                                   np.asarray(out_on[k]), atol=0, rtol=0)


def test_loss_dict_and_gradients(setup):
    params, bundle, key = setup
    cfg = _cfg()
    bundle = model_lib.apply_collider(bundle, cfg)
    gt = jnp.ones((32, 3)) * 0.5
    coeffs = {k: jnp.float32(1.0) for k in (
        "loss_mid_coarse", "loss_mid_fine", "predicted_normal_loss_coarse",
        "predicted_normal_loss_fine", "orientation_loss_coarse",
        "orientation_loss_fine")}

    def loss_fn(p):
        out = model_lib.get_outputs(p, bundle, key, cfg, training=True)
        ld = model_lib.get_loss_dict(out, gt, coeffs)
        assert set(ld) == set(coeffs)  # no reflect losses
        return sum(jax.tree.leaves(ld))

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(total))
    gnorm = float(jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)))
    assert np.isfinite(gnorm) and gnorm > 0
    # the dead `low` head gets exactly zero gradient, like the reference
    assert float(jnp.sum(jnp.abs(grads["low"]["w"]))) == 0.0


def test_train_step_and_eval_pipeline(tmp_path):
    """End-to-end: a few mipnerf train steps on the synthetic scene,
    then the chunked render + metrics path (final_rgb fallback)."""
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.trainer import TrainState, make_train_step, render_image
    from rsn.engine.optimizers import build_field_optimizer
    from rsn.cli.render import render_panels

    config = get_method("mipnerf").config_factory()
    mcfg = dataclasses.replace(config.pipeline.model, **TINY)
    dm = dataclasses.replace(config.pipeline.datamanager,
                             train_num_rays_per_batch=64)
    config = dataclasses.replace(
        config, pipeline=dataclasses.replace(config.pipeline, model=mcfg,
                                             datamanager=dm))
    ds = make_synthetic_dataset(num_cameras=2, H=24, W=24)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    train_step, optimizer = make_train_step(config)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0))
    step_fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    for i in range(3):
        state, metrics = step_fn(state, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["total_loss"]))
    assert "loss_reflect_mid_fine" not in metrics

    out = render_image(state.params, ds.cameras, 0, config,
                       rays_per_chunk=256)
    assert out["mid_rgb_fine"].shape == (24, 24, 3)
    assert "mid_reflect_fine" not in out
    panels = render_panels(out, np.asarray(ds.images[0]), 2.0, 6.0)
    assert panels["img"].shape == (24, 72, 3)  # gt | coarse | fine
