"""rsn-eval — the `ns-eval` equivalent: full test-split metrics -> JSON.

Loads a run dir (config.json + latest checkpoint), renders every eval
image chunked (and sharded over the device mesh when >1 device), and
writes {psnr, coarse_psnr, fine_psnr, fine_ssim[, fine_lpips]} to
--output-path.  Metric names match the reference
(reflect_sampling_nerf_model.py:474-480); note the reference's own
eval-image path crashes on a missing key (SURVEY.md B#3) — here
coarse metrics use mid_rgb_coarse (the documented fix) and `psnr` is
the fine-pass PSNR like the reference intends, computed from
mid_reflect_fine (the full reflection-composited image, replicating the
reference's metric choice at model.py:439).
"""
from __future__ import annotations

import json
import os
import sys
from typing import Dict

import numpy as np

from rsn.cli.run_io import load_run
from rsn import metrics as metrics_lib
from rsn.models import model as model_lib


def evaluate(params, dataset, config, mesh=None,
             max_images=None, prop_params=None) -> Dict[str, float]:
    import jax.numpy as jnp
    from rsn.engine.trainer import preferred_eval_chunk, render_image

    per_image = []
    n = dataset.cameras.num_cameras if max_images is None else min(
        max_images, dataset.cameras.num_cameras)
    # in proposal mode there is no coarse rgb head — mid_rgb_coarse is
    # pure background fill and a "coarse_psnr" would be meaningless.
    # The key is still emitted (as null) so eval.json is key-compatible
    # with the reference metric dict across methods
    # (reflect_sampling_nerf_model.py:474-480).
    report_coarse = not config.pipeline.model.use_proposal
    for i in range(n):
        out = render_image(params, dataset.cameras, i, config, mesh=mesh,
                           prop_params=prop_params,
                           rays_per_chunk=preferred_eval_chunk(config))
        gt = dataset.images[i]
        fine = np.clip(model_lib.final_rgb(out), 0, 1)
        m = {
            "fine_psnr": float(metrics_lib.psnr(jnp.asarray(fine),
                                                jnp.asarray(gt))),
            "fine_ssim": float(metrics_lib.ssim(jnp.asarray(fine),
                                                jnp.asarray(gt))),
        }
        if report_coarse:
            coarse = np.clip(out["mid_rgb_coarse"], 0, 1)
            m["coarse_psnr"] = float(metrics_lib.psnr(jnp.asarray(coarse),
                                                      jnp.asarray(gt)))
        else:
            m["coarse_psnr"] = None  # no coarse rgb in proposal mode
        lp = metrics_lib.lpips(fine, gt)
        if lp is not None:
            m["fine_lpips"] = lp
        m["psnr"] = m["fine_psnr"]
        per_image.append(m)
    keys = per_image[0].keys()
    return {k: (float(np.mean([m[k] for m in per_image]))
                if per_image[0][k] is not None else None)
            for k in keys}


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description="evaluate a trained run")
    p.add_argument("--load-dir", required=True,
                   help="run dir (contains config.json + checkpoints/)")
    p.add_argument("--output-path", default=None)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--split", default=None,
                   help="override eval split (val/test)")
    ns = p.parse_args(argv)

    from rsn.cli.run_io import load_run_full
    params, config, _, extras = load_run_full(ns.load_dir)
    from rsn.data.blender import load_dataset
    dm = config.pipeline.datamanager
    # ns-eval convention: metrics on the test split for every parser
    # (Blender ships train/val/test; nerfstudio/synthetic fall back to
    # the train split inside load_dataset when no eval split exists)
    split = ns.split or "test"
    dataset = load_dataset(dm.dataparser, dm.data or "", split,
                           dm.downscale_factor, dm.scale_factor)
    from rsn.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(config.num_devices)
    results = evaluate(params, dataset, config,
                       mesh=mesh if mesh.devices.size > 1 else None,
                       max_images=ns.max_images,
                       prop_params=extras.get("proposal"))
    out_path = ns.output_path or os.path.join(ns.load_dir, "eval.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
