"""rsn-convert — move weights between the torch reference and rsn.

Import: take a checkpoint trained by the PyTorch reference (a
nerfstudio Trainer ``.ckpt``: torch.save of {step, pipeline, ...},
SURVEY.md §3.4) and write an rsn run dir (config.json +
orbax checkpoint) that rsn's eval/render/viewer CLIs load directly —
the migration path for users bringing trained reference models over.

Export: take an rsn run dir and write a torch state-dict ``.ckpt``
with the reference's key layout (field.mlp_base.layers.N.*,
field.field_output_*.net.*, engine/checkpoints.py:_HEAD_MAP) for
side-by-side parity evaluation in the original stack.

Usage:
  python -m rsn.cli.convert --torch-ckpt step-000029999.ckpt --output runs/imported
  python -m rsn.cli.convert --load-dir outputs/.../<ts> --to-torch weights.ckpt
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# nerfstudio state-dict prefixes, most-specific first: Trainer saves
# pipeline.state_dict() where the model lives under `_model.` (or
# `module._model.` when DDP-wrapped, reference pipeline.py:73-77)
_MODEL_PREFIXES = ("_model.field.", "module._model.field.",
                   "model.field.", "field.")


def _extract_field_state(raw) -> dict:
    """Pull the field's tensors out of a torch checkpoint dict."""
    if not isinstance(raw, dict):
        raise SystemExit(
            "unrecognized torch checkpoint structure (expected the "
            "nerfstudio Trainer dict {step, pipeline, ...} or a plain "
            f"state dict, got {type(raw).__name__})")
    state = raw.get("pipeline", raw)
    if not isinstance(state, dict):
        raise SystemExit("unrecognized torch checkpoint structure")
    for prefix in _MODEL_PREFIXES:
        sub = {k[len(prefix):]: v for k, v in state.items()
               if k.startswith(prefix)}
        if sub:
            return sub
    raise SystemExit(
        "no field parameters found under any of the known prefixes "
        f"{_MODEL_PREFIXES}; checkpoint keys look like: "
        f"{sorted(state)[:5]} ...")


def import_torch(torch_ckpt: str, output: str, method: str,
                 data: str = "", dataparser: str = "") -> str:
    import dataclasses

    import jax
    import torch

    from rsn.cli.registry import get_method
    from rsn.engine import checkpoints as ckpt_lib

    raw = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
    step = int(raw.get("step", 0)) if isinstance(raw, dict) else 0
    field_state = _extract_field_state(raw)
    field_state = {k: v.detach().cpu().numpy()
                   if hasattr(v, "detach") else np.asarray(v)
                   for k, v in field_state.items()}
    params = ckpt_lib.convert_torch_state_dict(field_state, prefix="")

    config = get_method(method).config_factory()
    if data or dataparser:  # point the imported run at its dataset
        dm = config.pipeline.datamanager
        dm = dataclasses.replace(
            dm, data=data or dm.data,
            dataparser=dataparser or dm.dataparser)
        config = dataclasses.replace(
            config,
            pipeline=dataclasses.replace(config.pipeline, datamanager=dm))
    os.makedirs(output, exist_ok=True)
    ckpt_lib.dump_config(output, config)
    # torch optimizer moments are not importable (Adam/RAdam state
    # layouts differ), so write FRESHLY INITIALIZED optax state instead
    # of omitting it — Trainer.restore matches the checkpoint against
    # its real optimizer tree, so `rsn-train --load-dir` fine-tunes an
    # imported model with reset moments (same effect as a warm restart)
    from rsn.engine.optimizers import build_field_optimizer, build_optimizer

    opt_state = build_field_optimizer(config.optimizers).init(params)
    extra = {}
    if config.pipeline.model.use_proposal:
        # the reference has no proposal field; initialize one fresh so
        # proposal-method run dirs are complete for eval AND resume
        from rsn.models import proposal as proposal_lib

        prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(0))
        extra = {"proposal": prop,
                 "proposal_opt_state": build_optimizer(
                     config.optimizers["proposal_networks"]).init(prop)}
    path = ckpt_lib.save_checkpoint(
        os.path.join(output, "checkpoints"), step, params, opt_state,
        extra=extra)
    print(f"imported step {step}: {torch_ckpt} -> {path}")
    return output


def export_torch(load_dir: str, to_torch: str) -> str:
    import torch

    from rsn.cli.run_io import load_run_full
    from rsn.engine.checkpoints import export_torch_state_dict

    params, _config, step, _extras = load_run_full(load_dir)
    state = {k: torch.from_numpy(np.asarray(v, np.float32))
             for k, v in export_torch_state_dict(params).items()}
    os.makedirs(os.path.dirname(os.path.abspath(to_torch)), exist_ok=True)
    torch.save({"step": step, "pipeline": {"_model." + k: v
                                           for k, v in state.items()}},
               to_torch)
    print(f"exported step {step}: {load_dir} -> {to_torch}")
    return to_torch


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="convert checkpoints between the torch reference "
                    "and rsn run dirs")
    p.add_argument("--torch-ckpt", help="reference .ckpt to import")
    p.add_argument("--output", help="rsn run dir to create on import")
    p.add_argument("--method", default="reflect-sampling-nerf",
                   help="method config written to the imported run dir")
    p.add_argument("--data", default="",
                   help="dataset path for the imported run's config")
    p.add_argument("--dataparser", default="",
                   help="dataparser for the imported run's config "
                        "(blender/nerfstudio/synthetic)")
    p.add_argument("--load-dir", help="rsn run dir to export")
    p.add_argument("--to-torch", help="torch .ckpt path to write on export")
    ns = p.parse_args(argv)

    if ns.torch_ckpt and ns.load_dir:
        p.error("--torch-ckpt (import) and --load-dir (export) are "
                "mutually exclusive; run two invocations")
    if ns.torch_ckpt:
        if not ns.output:
            p.error("--torch-ckpt requires --output")
        import_torch(ns.torch_ckpt, ns.output, ns.method,
                     data=ns.data, dataparser=ns.dataparser)
        return 0
    if ns.load_dir:
        if not ns.to_torch:
            p.error("--load-dir requires --to-torch")
        export_torch(ns.load_dir, ns.to_torch)
        return 0
    p.error("pass --torch-ckpt/--output (import) or "
            "--load-dir/--to-torch (export)")


if __name__ == "__main__":
    sys.exit(main())
