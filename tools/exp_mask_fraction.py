"""Measure the reflect-mask fraction (model.py:229 semantics) across
training: fresh init + saved checkpoints, over sampled train batches.

Informs the default `reflect_ray_fraction` for fixed-shape compaction
(VERDICT.md next-round item #2).  CPU-runnable:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tools/exp_mask_fraction.py
"""
from __future__ import annotations

import glob
import sys

import jax
import jax.numpy as jnp

from rsn.configs import TrainerConfig
from rsn.data.synthetic import make_synthetic_dataset
from rsn.engine import checkpoints as ckpt_lib
from rsn.engine.trainer import sample_pixel_batch
from rsn.models import field as field_lib
from rsn.models import model as model_lib


def mask_stats(params, images, cameras, mcfg, n_batches=8, batch=1024):
    fracs = []
    fwd = jax.jit(lambda p, b, k: model_lib.get_outputs(
        p, b, k, mcfg, training=True)["mask"])
    for i in range(n_batches):
        k = jax.random.PRNGKey(100 + i)
        kp, kr = jax.random.split(k)
        bundle, _ = sample_pixel_batch(images, cameras, batch, kp)
        bundle = model_lib.apply_collider(bundle, mcfg)
        m = fwd(params, bundle, kr)
        fracs.append(float(jnp.mean(m.astype(jnp.float32))))
    import numpy as np
    a = np.asarray(fracs)
    return a.mean(), a.max()


def main():
    config = TrainerConfig()
    mcfg = config.pipeline.model
    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)

    init = field_lib.init_field_params(jax.random.PRNGKey(42))
    mean, mx = mask_stats(init, images, ds.cameras, mcfg)
    print(f"init            : mean={mean:.3f} max={mx:.3f}", flush=True)

    pats = sys.argv[1:] or [
        "outputs/conv30k/reflect-sampling-nerf/*/checkpoints/step-000010000",
        "outputs/conv100k/reflect-sampling-nerf/*/checkpoints/step-000025000",
        "outputs/conv100k-resume/reflect-sampling-nerf/*/checkpoints/"
        "step-000100000",
    ]
    for pat in pats:
        for path in sorted(glob.glob(pat)):
            restored = ckpt_lib.load_checkpoint(path, None)
            mean, mx = mask_stats(restored["params"], images, ds.cameras,
                                  mcfg)
            print(f"{path.split('/')[-1]:>16}: mean={mean:.3f} "
                  f"max={mx:.3f}  ({path.split('/')[1]})", flush=True)


if __name__ == "__main__":
    main()
