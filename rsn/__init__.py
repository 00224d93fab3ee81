"""rsn — a TPU-native JAX framework rebuilding `reflect-sampling-nerf`.

A from-scratch reimplementation of the capabilities of the reference
Nerfstudio plugin method ``236088/reflect-sampling-nerf`` (mounted read-only at
/root/reference), designed TPU-first:

- pure-functional pytree data structures (rays, samples, params)
- fixed-shape masked compute instead of data-dependent boolean gathers
- `shard_map` data parallelism over a `jax.sharding.Mesh` instead of DDP/NCCL
- Pallas kernels for the hot fused MLP path

Layer map (mirrors SURVEY.md §1 for the reference):
  cli/       ns-train / ns-eval / ns-render equivalents
  configs    dataclass config tree (reference: reflect_sampling_nerf_config.py)
  engine/    train loop, optimizers, checkpointing (reference: nerfstudio Trainer)
  models/    field + 4-pass model (reference: *_field.py, *_model.py)
  core/      rays, samplers, encodings, contraction, compositing (reference: nerfstudio L0)
  data/      blender/nerfstudio dataparsers, pixel sampler, ray generation
  parallel/  mesh + shard_map train/render
  kernels/   Pallas TPU kernels
"""

__version__ = "0.1.0"
