"""Engine tests: optimizer schedule parity, checkpoint round-trip,
torch<->rsn weight conversion, traced warmup coefficients, and the
sharded (8 fake devices) train step vs single-device equivalence.
"""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsn.configs import (DataManagerConfig, ModelConfig, PipelineConfig,
                         TrainerConfig, OptimizerGroupConfig)
from rsn.engine import checkpoints as ckpt_lib
from rsn.engine.optimizers import build_optimizer, exponential_decay
from rsn.engine.trainer import (TrainState, loss_coefficients_traced,
                                make_train_step, sample_pixel_batch)
from rsn.models import field as field_lib


def tiny_config(**model_kw):
    return TrainerConfig(
        pipeline=PipelineConfig(
            datamanager=DataManagerConfig(dataparser="synthetic",
                                          train_num_rays_per_batch=16),
            model=ModelConfig(num_coarse_samples=8, num_importance_samples=8,
                              num_reflect_coarse_samples=4,
                              num_reflect_importance_samples=4, **model_kw)))


def test_exponential_decay_matches_reference_schedule():
    """lr = lr_init * (lr_final/lr_init)^(t/T), clamped after T
    (nerfstudio ExponentialDecayScheduler; config.py:50-52)."""
    s = exponential_decay(1e-3, 1e-4, 50000)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(25000)) == pytest.approx(np.sqrt(1e-3 * 1e-4), rel=1e-5)
    assert float(s(50000)) == pytest.approx(1e-4, rel=1e-5)
    assert float(s(99999)) == pytest.approx(1e-4, rel=1e-5)


def test_radam_optimizer_builds_and_steps():
    opt = build_optimizer(OptimizerGroupConfig(optimizer="radam"))
    p = {"w": jnp.ones((4, 4))}
    state = opt.init(p)
    g = {"w": jnp.full((4, 4), 0.1)}
    updates, state = opt.update(g, state, p)
    assert bool(jnp.isfinite(updates["w"]).all())


def test_flattened_optimizer_matches_per_leaf():
    """flatten_optimizer (one raveled-vector update, a single XLA
    fusion instead of ~30) must produce the exact per-leaf RAdam
    trajectory: the update is elementwise, so ravel/unravel commutes
    with it."""
    cfg = OptimizerGroupConfig(optimizer="radam")
    flat = build_optimizer(cfg)               # flatten=True default
    leaf = build_optimizer(cfg, flatten=False)
    p_f = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((4,)) * 0.3}
    p_l = jax.tree.map(jnp.copy, p_f)
    s_f, s_l = flat.init(p_f), leaf.init(p_l)
    key = jax.random.PRNGKey(5)
    import optax
    for i in range(4):
        key, k = jax.random.split(key)
        g = jax.tree.map(
            lambda x: jax.random.normal(jax.random.fold_in(k, x.size),
                                        x.shape), p_f)
        u_f, s_f = flat.update(g, s_f, p_f)
        u_l, s_l = leaf.update(g, s_l, p_l)
        p_f = optax.apply_updates(p_f, u_f)
        p_l = optax.apply_updates(p_l, u_l)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)


def test_legacy_per_leaf_checkpoint_migrates_on_restore(tmp_path):
    """Checkpoints written before flatten_optimizer store per-leaf
    Adam/RAdam moments; Trainer.restore must migrate them to the
    raveled-vector state and continue training with the identical
    trajectory (migrate_opt_state ravels mu/nu in ravel_pytree's own
    leaf order)."""
    from rsn.engine.optimizers import migrate_opt_state
    from rsn.engine.trainer import Trainer

    cfg = _mini_trainer_cfg(tmp_path)
    tr = Trainer(cfg)
    # fabricate a LEGACY checkpoint: same params, per-leaf moments with
    # distinctive values (a few update steps so mu/nu are non-zero)
    leaf_opt = build_optimizer(cfg.optimizers["fields"], flatten=False)
    ls = leaf_opt.init(tr.state.params)
    g = jax.tree.map(lambda x: jnp.full_like(x, 0.01), tr.state.params)
    _, ls = leaf_opt.update(g, ls, tr.state.params)
    ckpt_dir = str(tmp_path / "legacy_ckpts")
    ckpt_lib.save_checkpoint(ckpt_dir, 3, tr.state.params, ls)

    tr.restore(ckpt_dir)
    assert int(tr.state.step) == 3
    # migrated moments == ravel of the legacy per-leaf moments
    expect = migrate_opt_state(ls)
    got_mu = next(s.mu for s in tr.state.opt_state
                  if hasattr(s, "mu"))
    exp_mu = next(s.mu for s in expect if hasattr(s, "mu"))
    np.testing.assert_array_equal(np.asarray(got_mu), np.asarray(exp_mu))
    tr.train()  # continues from the migrated state without error
    assert int(tr.state.step) == cfg.max_num_iterations


def test_find_key_tolerates_string_leaves():
    """checkpoint_is_legacy's metadata walk must not recurse into
    string leaves (iterating a 1-char string yields itself forever);
    orbax metadata trees may grow string leaves across versions
    (ADVICE r4)."""
    from rsn.engine.checkpoints import _find_key
    tree = {"opt_state": ["x", ("y", {"note": "s", "mu": 7}), b"raw"]}
    assert _find_key(tree, "mu") == 7
    assert _find_key({"a": "deadend"}, "mu") is None


def test_warmup_coefficients_traced():
    c0 = loss_coefficients_traced(jnp.int32(0))
    c100 = loss_coefficients_traced(jnp.int32(100))
    assert float(c0["orientation_loss_fine"]) == 0.0
    assert float(c100["orientation_loss_fine"]) == pytest.approx(1e-1)
    assert float(c0["loss_mid_fine"]) == 1.0  # rgb losses never warmed up


def test_checkpoint_roundtrip(tmp_path):
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    from rsn.engine.optimizers import build_field_optimizer
    opt = build_field_optimizer(TrainerConfig().optimizers)
    opt_state = opt.init(params)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 7, params, opt_state)
    assert ckpt_lib.latest_checkpoint(str(tmp_path)) == path
    restored = ckpt_lib.load_checkpoint(
        path, {"params": params, "opt_state": opt_state, "step": 0})
    assert restored["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["diff"]["w"]),
                                  np.asarray(params["diff"]["w"]))


def test_torch_state_dict_roundtrip():
    params = field_lib.init_field_params(jax.random.PRNGKey(1))
    sd = ckpt_lib.export_torch_state_dict(params)
    # keys follow the reference module naming (field.py:54-86)
    assert "field.mlp_base.layers.4.weight" in sd
    assert "field.field_output_low.net.weight" in sd  # dead head kept (B#8)
    assert sd["field.mlp_base.layers.4.weight"].shape == (256, 256 + 99)
    back = ckpt_lib.convert_torch_state_dict(sd)
    np.testing.assert_array_equal(back["trunk"][4]["w"],
                                  np.asarray(params["trunk"][4]["w"]))
    np.testing.assert_array_equal(back["roughness"]["b"],
                                  np.asarray(params["roughness"]["b"]))


def test_sample_pixel_batch_on_device():
    from rsn.data.synthetic import make_synthetic_dataset
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    rb, gt = jax.jit(lambda k: sample_pixel_batch(images, ds.cameras, 32, k)
                     )(jax.random.PRNGKey(0))
    assert rb.origins.shape == (32, 3)
    assert gt.shape == (32, 3)
    assert float(gt.min()) >= 0 and float(gt.max()) <= 1
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0, rtol=1e-5)


def test_train_step_mechanics():
    """Step advances, metrics finite, params actually move.
    (Learning slope is asserted by the slow smoke train in
    tests/test_integration.py — 16-ray RAdam steps are too noisy.)"""
    from rsn.data.synthetic import make_synthetic_dataset
    cfg = tiny_config()
    train_step, optimizer = make_train_step(cfg)
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0))
    fn = jax.jit(lambda s, k: train_step(s, images, ds.cameras, k))
    for i in range(3):
        state, metrics = fn(state, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 3
    moved = np.abs(np.asarray(state.params["trunk"][0]["w"])
                   - np.asarray(params["trunk"][0]["w"])).max()
    assert moved > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharded_step_matches_replicated_semantics():
    """8-device shard_map step runs, loss finite, params stay in sync
    (they are replicated by construction)."""
    from jax.sharding import PartitionSpec as P
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.parallel import mesh as mesh_lib

    cfg = tiny_config()
    train_step, optimizer = make_train_step(cfg)
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.int32(0))
    mesh = mesh_lib.make_mesh(8)

    def body(state, images, cameras, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return train_step(state, images, cameras, key, axis_name="data")

    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(P(), P(), P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    new_state, metrics = fn(state, images, ds.cameras, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(new_state.step) == 1
    # replicated output must be identical on all devices
    shards = [np.asarray(s.data) for s in
              new_state.params["diff"]["w"].addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_mesh_barrier():
    from rsn.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(0)
    mesh_lib.barrier(mesh)  # must not deadlock


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")
def test_sharded_step_with_all_param_groups():
    """All three optimizer groups (fields + camera + proposal) train
    under shard_map: grads pmean'd, every group's replicas in sync."""
    import dataclasses

    from jax.sharding import PartitionSpec as P
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.optimizers import build_optimizer
    from rsn.models import camera_opt as camera_opt_lib
    from rsn.models import proposal as proposal_lib
    from rsn.parallel import mesh as mesh_lib

    cfg = tiny_config()
    dm = dataclasses.replace(cfg.pipeline.datamanager,
                             camera_optimizer="SO3xR3")
    mcfg = dataclasses.replace(cfg.pipeline.model, use_proposal=True,
                               num_proposal_samples=8)
    cfg = dataclasses.replace(cfg, pipeline=dataclasses.replace(
        cfg.pipeline, datamanager=dm, model=mcfg))
    train_step, optimizer = make_train_step(cfg)
    ds = make_synthetic_dataset(num_cameras=2, H=16, W=16)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    camera = camera_opt_lib.init_camera_opt_params(2, "SO3xR3")
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    state = TrainState(
        params=params, opt_state=optimizer.init(params),
        step=jnp.int32(0),
        camera=camera,
        camera_opt_state=build_optimizer(
            cfg.optimizers["camera_opt"]).init(camera),
        proposal=prop,
        proposal_opt_state=build_optimizer(
            cfg.optimizers["proposal_networks"]).init(prop))
    mesh = mesh_lib.make_mesh(8)

    def body(state, images, cameras, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return train_step(state, images, cameras, key, axis_name="data")

    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(P(), P(), P(), P()),
                               out_specs=(P(), P()), check_vma=False))
    new_state, metrics = fn(state, images, ds.cameras,
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "interlevel_loss" in metrics
    for arr, before in (
            (new_state.camera["deltas"], camera["deltas"]),
            (new_state.proposal["density"]["w"], prop["density"]["w"])):
        shards = [np.asarray(s.data) for s in arr.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
        assert np.any(np.asarray(arr) != np.asarray(before)), \
            "group received no update under shard_map"


def _mini_trainer_cfg(tmp_path, **kw):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg, output_dir=str(tmp_path), max_num_iterations=6,
        steps_per_log=3, steps_per_eval_batch=1000,
        steps_per_eval_image=1000, steps_per_save=6, **kw)


def test_adaptive_reflect_fraction_controller(tmp_path):
    """The compaction-cap controller: bumps up when mask+headroom
    crosses the cap (immediately on overflow), relaxes down only after
    3 consecutive under-target reads, never below the configured
    floor."""
    from rsn.engine.trainer import Trainer

    tr = Trainer(_mini_trainer_cfg(tmp_path))
    assert tr._reflect_frac == 0.5  # ModelConfig default
    # mask well under cap: no change
    tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.30,
                                      "reflect_overflow": 0.0})
    assert tr._reflect_frac == 0.5
    # mask + 0.1 headroom crosses 0.5 -> bump to 0.625
    tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.45,
                                      "reflect_overflow": 0.0})
    assert tr._reflect_frac == 0.625
    # overflow forces an immediate bump even if mask reads low
    tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.45,
                                      "reflect_overflow": 0.01})
    assert tr._reflect_frac == 0.75
    # relaxation needs 3 consecutive under-target observations
    for i in range(2):
        tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.30,
                                          "reflect_overflow": 0.0})
        assert tr._reflect_frac == 0.75
    tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.30,
                                      "reflect_overflow": 0.0})
    assert tr._reflect_frac == 0.5
    # never below the configured floor
    for _ in range(5):
        tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.05,
                                          "reflect_overflow": 0.0})
    assert tr._reflect_frac == 0.5


def test_adaptive_controller_runs_with_logging_disabled(tmp_path):
    """steps_per_log=0 must not disable the compaction controller
    (round-2 review finding): the adapt cadence falls back to
    REFLECT_ADAPT_FALLBACK_CADENCE and the chunker stops at it."""
    from rsn.engine import trainer as trainer_lib

    cfg = dataclasses.replace(_mini_trainer_cfg(tmp_path),
                              steps_per_log=0)
    tr = trainer_lib.Trainer(cfg)
    assert tr._adapt_cadence == trainer_lib.REFLECT_ADAPT_FALLBACK_CADENCE
    # the dispatch chunker must stop at the adapt boundary even with
    # every logging/eval cadence disabled
    cfg2 = dataclasses.replace(
        cfg, steps_per_eval_batch=0, steps_per_eval_image=0,
        steps_per_save=0, steps_per_dispatch=10_000)
    tr2 = trainer_lib.Trainer(cfg2)
    assert tr2._next_chunk(tr2._adapt_cadence - 1, 10_000) == 1
    # and the controller is actually invoked at that boundary
    calls = []
    tr2._maybe_adapt_reflect_fraction = lambda m: calls.append(dict(m))
    tr2.train(max_steps=tr2._adapt_cadence)
    assert calls, "controller never ran with steps_per_log=0"


def test_reflect_fraction_survives_resume(tmp_path):
    """The adapted compaction fraction persists through save/restore
    instead of resetting to the floor until the next adapt boundary."""
    from rsn.engine.trainer import Trainer

    cfg = _mini_trainer_cfg(tmp_path)
    tr = Trainer(cfg)
    tr._maybe_adapt_reflect_fraction({"mask_fraction": 0.60,
                                      "reflect_overflow": 0.0})
    assert tr._reflect_frac == 0.75
    tr.train()  # saves at step 6 (steps_per_save=6) + sidecar
    tr2 = Trainer(dataclasses.replace(cfg, output_dir=str(tmp_path / "r")))
    assert tr2._reflect_frac == 0.5
    tr2.restore(tr.ckpt_dir)
    assert tr2._reflect_frac == 0.75
    assert int(tr2.state.step) == 6


def test_multi_step_dispatch_chunking_invariant(tmp_path):
    """Fusing K steps into one dispatch (lax.fori_loop) must produce
    bit-identical params to step-at-a-time dispatch: per-step PRNG keys
    derive from state.step inside the jitted loop."""
    from rsn.engine.trainer import Trainer

    p1 = Trainer(_mini_trainer_cfg(tmp_path / "a", steps_per_dispatch=1))
    p1.train()
    p3 = Trainer(_mini_trainer_cfg(tmp_path / "b", steps_per_dispatch=3))
    p3.train()
    assert int(p1.state.step) == int(p3.state.step) == 6
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(p1.state.params),
            jax.tree.leaves(p3.state.params)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(path))


def test_trainer_multi_device_chunked(tmp_path):
    """Trainer e2e on the 8-fake-device mesh with chunked dispatch
    (fori_loop over shard_map): runs, finite loss, replicas in sync."""
    from rsn.engine.trainer import Trainer

    cfg = _mini_trainer_cfg(tmp_path, steps_per_dispatch=3, num_devices=8)
    tr = Trainer(cfg)
    assert tr.num_devices == 8
    metrics = tr.train()
    assert np.isfinite(metrics["total_loss"])
    assert int(tr.state.step) == 6
    # params replicated => fully-addressable single logical value
    w = tr.state.params["trunk"][0]["w"]
    assert np.isfinite(np.asarray(w)).all()


def test_trainer_multi_device_restore_replicates_and_trains(tmp_path):
    """Save on the 8-fake-device mesh, restore into a FRESH 8-device
    trainer, and train a chunked step (ADVICE r3: the post-restore
    mesh replication of commit 71f5acb had no test — orbax restores
    committed to one device; the shard_map step needs every leaf
    replicated over the mesh)."""
    from rsn.engine.trainer import Trainer

    cfg = _mini_trainer_cfg(tmp_path, steps_per_dispatch=3, num_devices=8)
    tr = Trainer(cfg)
    tr.train()  # saves at step 6 (steps_per_save=6)
    saved_w = np.asarray(tr.state.params["trunk"][0]["w"])

    cfg2 = dataclasses.replace(
        _mini_trainer_cfg(tmp_path / "resume", steps_per_dispatch=3,
                          num_devices=8), max_num_iterations=9)
    tr2 = Trainer(cfg2)
    tr2.restore(tr.ckpt_dir)
    assert int(tr2.state.step) == 6
    np.testing.assert_array_equal(
        np.asarray(tr2.state.params["trunk"][0]["w"]), saved_w)
    # every leaf must be REPLICATED over the mesh, not committed to one
    # device (the regression 71f5acb fixed)
    for leaf in jax.tree.leaves(tr2.state):
        if isinstance(leaf, jax.Array):
            assert len(leaf.sharding.device_set) == 8, leaf.sharding
    metrics = tr2.train()  # 3 more steps through the shard_map path
    assert np.isfinite(metrics["total_loss"])
    assert int(tr2.state.step) == 9
