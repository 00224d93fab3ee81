"""CLI + end-to-end integration: train a few steps via the rsn-train
entry point on the synthetic scene, then eval + render from the run dir
(the reference's ns-train -> ns-eval -> ns-render contract,
SURVEY.md App C).
"""
import json
import os

import numpy as np
import pytest

from rsn.configs import TrainerConfig
from rsn.utils.cli import apply_overrides, parse_config


def test_parse_config_nested_overrides():
    cfg, extras = parse_config(
        TrainerConfig,
        ["--max-num-iterations", "123",
         "--pipeline.model.num-coarse-samples", "32",
         "--pipeline.datamanager.dataparser", "synthetic",
         "--mixed-precision", "false"],
        extra_args={"--data": dict(type=str, default=None)})
    assert cfg.max_num_iterations == 123
    assert cfg.pipeline.model.num_coarse_samples == 32
    assert cfg.pipeline.datamanager.dataparser == "synthetic"
    assert cfg.mixed_precision is False
    assert extras.data is None


def test_registry():
    from rsn.cli.registry import get_method
    spec = get_method("reflect-sampling-nerf")
    cfg = spec.config_factory()
    assert cfg.method_name == "reflect-sampling-nerf"
    with pytest.raises(KeyError):
        get_method("nope")


def test_proposal_preset_ships_quality_parity_defaults():
    """The reflect-sampling-nerf-proposal preset must keep the knobs
    that closed its quality gap (BASELINE.md r2 ladder: 22.1 -> 23.59
    full-split PSNR): weight anneal ON, distortion 0.002.  bench.py's
    headline measures this exact preset."""
    from rsn.cli.registry import get_method
    m = get_method("reflect-sampling-nerf-proposal").config_factory()
    mcfg = m.pipeline.model
    assert mcfg.use_proposal
    assert mcfg.proposal_weights_anneal_max_num_iters > 0
    assert mcfg.distortion_loss_mult == 0.002
    # and the parity default keeps both inert
    base = get_method("reflect-sampling-nerf").config_factory()
    assert not base.pipeline.model.use_proposal
    assert base.pipeline.model.distortion_loss_mult == 0.0


def test_run_io_config_roundtrip(tmp_path):
    from rsn.cli.run_io import load_config
    from rsn.engine.checkpoints import dump_config
    cfg = apply_overrides(TrainerConfig(), {
        "pipeline.model.num_coarse_samples": 16,
        "max_num_iterations": 55})
    dump_config(str(tmp_path), cfg)
    back = load_config(str(tmp_path))
    assert back.pipeline.model.num_coarse_samples == 16
    assert back.max_num_iterations == 55
    assert back.optimizers["fields"].optimizer == "radam"
    assert back.pipeline.model.bug_compat.sh_l8_m7_2x is True


@pytest.mark.slow
def test_eval_metric_keys_match_across_methods():
    """eval.json is key-compatible with the reference metric dict
    (reflect_sampling_nerf_model.py:474-480) for BOTH methods: the
    proposal preset emits coarse_psnr as null (no coarse rgb exists in
    proposal mode) rather than dropping the key."""
    import dataclasses

    import jax

    from rsn.cli.eval import evaluate
    from rsn.cli.registry import get_method
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.models import field as field_lib
    from rsn.models import proposal as proposal_lib

    ds = make_synthetic_dataset(num_cameras=1, H=16, W=16)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))

    def tiny(cfg):
        m = dataclasses.replace(
            cfg.pipeline.model, num_coarse_samples=8,
            num_importance_samples=8, num_reflect_coarse_samples=4,
            num_reflect_importance_samples=4, num_proposal_samples=4,
            eval_num_rays_per_chunk=64)
        return dataclasses.replace(cfg, pipeline=dataclasses.replace(
            cfg.pipeline, model=m))

    base = tiny(get_method("reflect-sampling-nerf").config_factory())
    prop_cfg = tiny(
        get_method("reflect-sampling-nerf-proposal").config_factory())
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(1))

    r_base = evaluate(params, ds, base, max_images=1)
    r_prop = evaluate(params, ds, prop_cfg, max_images=1,
                      prop_params=prop)
    assert set(r_base) == set(r_prop)
    assert r_prop["coarse_psnr"] is None
    assert np.isfinite(r_base["coarse_psnr"])


@pytest.mark.slow
def test_train_eval_render_end_to_end(tmp_path):
    from rsn.cli import eval as eval_cli
    from rsn.cli import render as render_cli
    from rsn.cli import train as train_cli

    rc = train_cli.main([
        "reflect-sampling-nerf",
        "--pipeline.datamanager.dataparser", "synthetic",
        "--pipeline.datamanager.train-num-rays-per-batch", "64",
        "--pipeline.model.num-coarse-samples", "16",
        "--pipeline.model.num-importance-samples", "16",
        "--pipeline.model.num-reflect-coarse-samples", "8",
        "--pipeline.model.num-reflect-importance-samples", "8",
        "--pipeline.model.eval-num-rays-per-chunk", "256",
        "--max-num-iterations", "10", "--steps-per-save", "10",
        "--steps-per-log", "5",
        "--output-dir", str(tmp_path)])
    assert rc == 0
    runs = []
    for root, dirs, files in os.walk(tmp_path):
        if "config.json" in files:
            runs.append(root)
    assert len(runs) == 1
    run_dir = runs[0]
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))
    log = open(os.path.join(run_dir, "train_log.jsonl")).read().strip()
    assert "total_loss" in log

    rc = eval_cli.main(["--load-dir", run_dir, "--max-images", "1"])
    assert rc == 0
    results = json.load(open(os.path.join(run_dir, "eval.json")))
    for k in ("psnr", "coarse_psnr", "fine_psnr", "fine_ssim"):
        assert k in results and np.isfinite(results[k])

    rc = render_cli.main(["--load-dir", run_dir, "--max-images", "1"])
    assert rc == 0
    renders = os.listdir(os.path.join(run_dir, "renders_test"))
    assert {"00000-img.png", "00000-accumulation.png",
            "00000-depth.png"} <= set(renders)
