"""Gradient parity probe: fused Pallas train path vs XLA path on the
SAME batch at real scale (catches Mosaic/tile-boundary bugs that tiny
interpret-mode tests cannot).

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/check_grad_parity.py
Prints per-leaf cosine similarity and norm ratio of d(total_loss)/d(params).

Measured (v5e chip, batch 1024, full 128/128/64/64 model, bf16): worst
cosine 0.985 (trunk layer 0 w — deepest in the recompute chain, pure
bf16 rounding), all other leaves >=0.995, norm ratios within 0.5%;
the `low` head is zero under both paths (dead head, PARITY.md).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rsn.configs import TrainerConfig
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine.trainer import loss_coefficients_traced, sample_pixel_batch
from rsn.models import field as field_lib
from rsn.models import model as model_lib


def grads_for(mcfg, params, bundle, gt, coeffs, key):
    def loss_fn(p):
        outputs = model_lib.get_outputs(p, bundle, key, mcfg,
                                        training=True)
        loss_dict = model_lib.get_loss_dict(outputs, gt, coeffs)
        return sum(jax.tree.leaves(loss_dict))
    return jax.jit(jax.grad(loss_fn))(params)


def main():
    config = TrainerConfig()
    base = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16")
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(7)
    bundle, gt = sample_pixel_batch(images, ds.cameras, 1024, key)
    bundle = model_lib.apply_collider(bundle, base)
    coeffs = loss_coefficients_traced(jnp.int32(1000))

    g_pallas = grads_for(
        dataclasses.replace(base, use_pallas=True, use_pallas_train=True),
        params, bundle, gt, coeffs, key)
    g_xla = grads_for(
        dataclasses.replace(base, use_pallas=False, use_pallas_train=False),
        params, bundle, gt, coeffs, key)

    flat_p = jax.tree_util.tree_leaves_with_path(g_pallas)
    flat_x = jax.tree.leaves(g_xla)
    print(f"{'leaf':40} {'cos':>8} {'|p|/|x|':>9} {'|x|':>10}")
    worst = 1.0
    for (path, p), x in zip(flat_p, flat_x):
        name = jax.tree_util.keystr(path)
        p = p.astype(jnp.float32).ravel()
        x = x.astype(jnp.float32).ravel()
        nx, np_ = jnp.linalg.norm(x), jnp.linalg.norm(p)
        cos = float(jnp.vdot(p, x) / jnp.maximum(np_ * nx, 1e-20))
        ratio = float(np_ / jnp.maximum(nx, 1e-20))
        if float(nx) > 1e-12:
            worst = min(worst, cos)
        print(f"{name:40} {cos:8.5f} {ratio:9.4f} {float(nx):10.3e}")
    print(f"\nworst cosine over non-zero leaves: {worst:.5f}")


if __name__ == "__main__":
    main()
