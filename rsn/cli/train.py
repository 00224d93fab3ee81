"""rsn-train — the `ns-train` equivalent.

Usage:
  python -m rsn.cli.train reflect-sampling-nerf --data /path/to/lego \
      [--max-num-iterations 30000] [--pipeline.model.num-coarse-samples 64]
  python -m rsn.cli.train reflect-sampling-nerf --load-dir <run>/checkpoints

Mirrors the reference's CLI contract (README.md:28-31): method discovery
via the registry, every config field overridable, outputs written to
<output-dir>/<experiment>/<method>/<timestamp>/ with config.json,
train_log.jsonl and step-indexed checkpoints.
"""
from __future__ import annotations

import sys

from rsn.configs import TrainerConfig
from rsn.cli.registry import get_method, METHODS
from rsn.utils.cli import parse_config


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        names = "\n  ".join(f"{k}: {v.description}"
                            for k, v in METHODS.items())
        print(f"usage: rsn-train METHOD [flags]\n\nmethods:\n  {names}\n\n"
              "run `rsn-train METHOD --help` for all flags")
        return 0
    method = argv.pop(0)
    base = get_method(method).config_factory()
    cfg, extras = parse_config(
        TrainerConfig, argv, description=f"train {method}",
        extra_args={
            "--data": dict(type=str, default=None,
                           help="dataset path (shortcut for "
                                "--pipeline.datamanager.data)"),
            "--load-dir": dict(type=str, default=None, dest="load_dir",
                               help="resume from checkpoints dir"),
            "--multihost": dict(action="store_true", dest="multihost",
                                help="call jax.distributed.initialize() "
                                     "for multi-host pods (coordinator "
                                     "autodetected on TPU/Slurm/OMPI, or "
                                     "pass the three flags below)"),
            "--coordinator-address": dict(
                type=str, default=None, dest="coordinator_address",
                help="host:port of process 0 (generic launchers)"),
            "--num-processes": dict(type=int, default=None,
                                    dest="num_processes"),
            "--process-id": dict(type=int, default=None,
                                 dest="process_id"),
        }, base=base)
    if extras.multihost:
        import jax
        jax.distributed.initialize(
            coordinator_address=extras.coordinator_address,
            num_processes=extras.num_processes,
            process_id=extras.process_id)
    if extras.data:
        from rsn.utils.cli import apply_overrides
        cfg = apply_overrides(cfg, {"pipeline.datamanager.data": extras.data})

    from rsn.engine.trainer import Trainer
    trainer = Trainer(cfg)
    if extras.load_dir:
        trainer.restore(extras.load_dir)
    print(f"run dir: {trainer.run_dir} "
          f"({trainer.num_devices} device(s))", flush=True)
    trainer.train()
    return 0


if __name__ == "__main__":
    sys.exit(main())
