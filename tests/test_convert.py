"""rsn-convert: torch reference checkpoint <-> rsn run dir round trip."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from rsn.cli import convert as convert_lib
from rsn.cli.run_io import load_run_full
from rsn.engine import checkpoints as ckpt_lib
from rsn.models.field import init_field_params


def _reference_style_ckpt(path, params, step=1234, prefix="_model.field."):
    """A nerfstudio-Trainer-shaped .ckpt from an rsn params tree."""
    state = {prefix + k: torch.from_numpy(np.asarray(v, np.float32))
             for k, v in ckpt_lib.export_torch_state_dict(
                 params, prefix="").items()}
    torch.save({"step": step, "pipeline": state,
                "optimizers": {}, "schedulers": {}}, path)


@pytest.mark.parametrize("prefix", ["_model.field.", "module._model.field."])
def test_import_torch_ckpt_roundtrip(tmp_path, prefix):
    params = init_field_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "step-000001234.ckpt"
    _reference_style_ckpt(str(ckpt), params, step=1234, prefix=prefix)

    run_dir = str(tmp_path / "imported")
    convert_lib.import_torch(str(ckpt), run_dir, "reflect-sampling-nerf")

    got, config, step, extras = load_run_full(run_dir)
    assert step == 1234
    assert config.method_name == "reflect-sampling-nerf"
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(got)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_export_then_reimport(tmp_path):
    params = init_field_params(jax.random.PRNGKey(1))
    run_dir = str(tmp_path / "run")
    from rsn.cli.registry import get_method
    ckpt_lib.dump_config(run_dir, get_method(
        "reflect-sampling-nerf").config_factory())
    ckpt_lib.save_checkpoint(f"{run_dir}/checkpoints", 77, params, {})

    out = str(tmp_path / "weights.ckpt")
    convert_lib.export_torch(run_dir, out)
    raw = torch.load(out, weights_only=False)
    assert raw["step"] == 77
    assert any(k.startswith("_model.field.mlp_base.layers.0.")
               for k in raw["pipeline"])

    # the exported ckpt is itself importable (full round trip)
    run2 = str(tmp_path / "run2")
    convert_lib.import_torch(out, run2, "reflect-sampling-nerf")
    got, _, step, _ = load_run_full(run2)
    assert step == 77
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_imported_run_is_trainer_resumable(tmp_path):
    """Trainer.restore matches the checkpoint against its REAL optax
    tree — an imported run dir must therefore ship an initialized
    opt_state, not an empty placeholder (caught in review: {} made
    `rsn-train --load-dir` crash with an orbax structure mismatch)."""
    params = init_field_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ref.ckpt"
    _reference_style_ckpt(str(ckpt), params, step=9)
    run_dir = str(tmp_path / "imported")
    convert_lib.import_torch(str(ckpt), run_dir, "reflect-sampling-nerf")

    from rsn.cli.registry import get_method
    from rsn.engine.optimizers import build_field_optimizer

    config = get_method("reflect-sampling-nerf").config_factory()
    abstract = {"params": init_field_params(jax.random.PRNGKey(1)),
                "opt_state": build_field_optimizer(
                    config.optimizers).init(params),
                "step": 0}
    restored = ckpt_lib.load_checkpoint(
        ckpt_lib.latest_checkpoint(f"{run_dir}/checkpoints"), abstract)
    assert restored["step"] == 9
    np.testing.assert_allclose(
        np.asarray(restored["params"]["trunk"][0]["w"]),
        np.asarray(params["trunk"][0]["w"]))


def test_import_proposal_method_ships_proposal_group(tmp_path):
    params = init_field_params(jax.random.PRNGKey(0))
    ckpt = tmp_path / "ref.ckpt"
    _reference_style_ckpt(str(ckpt), params)
    run_dir = str(tmp_path / "imported")
    convert_lib.import_torch(str(ckpt), run_dir,
                             "reflect-sampling-nerf-proposal")
    _, config, _, extras = load_run_full(run_dir)
    assert config.pipeline.model.use_proposal
    assert "proposal" in extras  # fresh proposal field for eval/resume


def test_import_rejects_non_dict_checkpoint(tmp_path):
    ckpt = tmp_path / "tensor.ckpt"
    torch.save(torch.zeros(3), str(ckpt))
    with pytest.raises(SystemExit):
        convert_lib.import_torch(str(ckpt), str(tmp_path / "x"),
                                 "reflect-sampling-nerf")


def test_import_rejects_unknown_layout(tmp_path):
    ckpt = tmp_path / "odd.ckpt"
    torch.save({"pipeline": {"something.else": torch.zeros(3)}}, str(ckpt))
    with pytest.raises(SystemExit):
        convert_lib.import_torch(str(ckpt), str(tmp_path / "x"),
                                 "reflect-sampling-nerf")
