"""Op-level attribution of the eval/render step via jax.profiler (r4).

The component-wise budget (exp_render_budget.py) leaves an unattributed
remainder; this captures a device trace of the real render program and
aggregates per-op device time from the trace-viewer JSON, printing the
top ops grouped by fusion/op name — the ground truth for what the
render glue actually is.

Run on TPU: PYTHONPATH=/root/repo:$PYTHONPATH \
    python tools/exp_render_profile.py [--preset] [--train]
"""
from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import jax
import jax.numpy as jnp

from rsn.cli.registry import get_method
from rsn.core.rays import RayBundle
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.models import proposal as proposal_lib

R = 16384


def main():
    preset = "--preset" in sys.argv
    train = "--train" in sys.argv
    method = ("reflect-sampling-nerf-proposal" if preset
              else "reflect-sampling-nerf")
    config = get_method(method).config_factory()
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16",
                               adaptive_eval_reflect_fraction=False,
                               eval_reflect_ray_fraction=0.625)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))
    prop = (proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
            if mcfg.use_proposal else None)
    key = jax.random.PRNGKey(0)

    if train:
        from rsn.configs import TrainerConfig
        from rsn.data.synthetic import make_synthetic_dataset
        from rsn.engine.optimizers import build_optimizer
        from rsn.engine.trainer import TrainState, make_train_step
        cfg_t = dataclasses.replace(
            config, pipeline=dataclasses.replace(
                config.pipeline,
                model=dataclasses.replace(mcfg,
                                          reflect_ray_fraction=0.625)))
        ts_fn, opt = make_train_step(cfg_t)
        ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
        images = jnp.asarray(ds.images)
        st = TrainState(
            params=params, opt_state=opt.init(params), step=jnp.int32(0),
            proposal=prop,
            proposal_opt_state=(build_optimizer(
                cfg_t.optimizers["proposal_networks"]).init(prop)
                if prop is not None else None))
        fn = jax.jit(lambda s, k: ts_fn(s, images, ds.cameras,
                                        k)[1]["total_loss"])
        args = (st, key)
    else:
        d = jax.random.normal(key, (R, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        bundle = RayBundle(
            origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
            directions=d, pixel_area=jnp.full((R, 1), 1e-6),
            nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
        bundle = model_lib.apply_collider(bundle, mcfg)
        fn = jax.jit(lambda p, b, k: model_lib.final_rgb(
            model_lib.get_outputs(p, b, k, mcfg, training=False,
                                  prop_params=prop)))
        args = (params, bundle, key)

    # warm up (compile) outside the trace
    jax.block_until_ready(fn(*args))
    fn(*args)

    tmp = tempfile.mkdtemp(prefix="rsn_prof_")
    with jax.profiler.trace(tmp):
        for _ in range(8):
            out = fn(*args)
        jax.block_until_ready(out)
        # tunnel backends under-report readiness; force a host sync
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", tmp)
        return
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # device lanes only (XLA ops); skip host python/runtime rows
            name = ev.get("name", "")
            cat = ev.get("args", {}).get("long_name", "")
            pidname = ev.get("pid")
            dur = float(ev.get("dur", 0.0))
            if not name or dur <= 0:
                continue
            key_ = name.split(".")[0]
            agg[(key_, bool(cat))] += dur
            total += dur
    rows = sorted(((v, k) for k, v in agg.items()), reverse=True)[:40]
    label = ("train" if train else "render") + ("/preset" if preset
                                                else "/parity")
    print(f"=== profile top ops ({label}), 8 iterations ===")
    for v, (name, has_ln) in rows:
        print(f"  {v/8e3:9.3f} ms  {name}")
    print(f"  total traced: {total/8e3:.3f} ms/iter (all lanes, incl. "
          "host rows — use relative ranking, not absolutes)")
    print("trace dir:", tmp)


if __name__ == "__main__":
    main()
