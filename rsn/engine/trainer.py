"""Train loop: on-device pixel sampling -> 4-pass render -> loss ->
RAdam, data-parallel over a `data` mesh.

Rebuilds the reference's inherited Trainer + pipeline + datamanager loop
(SURVEY.md §3.1/§3.2) as one jitted, shard_map-wrapped step:

- pixel sampling + ray generation happen on device inside the step
  (replaces the host-side image-cache dataloader / pixel sampler /
  RayGenerator of reflect_sampling_nerf_datamanager.py:49-58)
- the 50-step loss warmup is a traced function of the step counter
  (replaces the reference's per-step config mutation, pipeline.py:79-91)
- mixed precision = bf16 trunk matmuls (TPU-native; the reference's
  fp16 GradScaler is CUDA-specific and unnecessary with bf16)
- cadences replicate the reference TrainerConfig: eval batch every 100,
  save every 1000 (reflect_sampling_nerf_config.py:30-31)
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rsn.configs import (LOSS_COEFFICIENTS, TrainerConfig, WARMUP_STEPS,
                         WARMUP_ZEROED)
from rsn.core.rays import RayBundle
from rsn.data.blender import load_dataset
from rsn.data.cameras import Cameras, generate_rays
from rsn.engine import checkpoints as ckpt_lib
from rsn.engine.optimizers import build_field_optimizer, build_optimizer
from rsn.models import field as field_lib
from rsn.models import model as model_lib
from rsn.parallel import mesh as mesh_lib

# Adaptive reflect-compaction buckets: the trainer moves the
# reflect_ray_fraction cap through these (up immediately on pressure,
# down slowly), keeping exact reference semantics with REFLECT_HEADROOM
# of slack above the observed mask fraction.
REFLECT_FRACTION_BUCKETS = (0.25, 0.375, 0.5, 0.625, 0.75, 1.0)
REFLECT_HEADROOM = 0.1
# Controller cadence when logging is disabled (steps_per_log <= 0):
# the controller must keep running — a run silenced for speed would
# otherwise train forever at the compaction floor with overflow never
# corrected (round-2 review finding).
REFLECT_ADAPT_FALLBACK_CADENCE = 100


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32
    # camera pose refinement (None when camera_optimizer == "off")
    camera: Any = None
    camera_opt_state: Any = None
    # proposal field (None unless model.use_proposal)
    proposal: Any = None
    proposal_opt_state: Any = None


def loss_coefficients_traced(step: jax.Array) -> Dict[str, jax.Array]:
    """Warmup schedule as a pure traced function (SURVEY.md §5.6)."""
    on = (step >= WARMUP_STEPS).astype(jnp.float32)
    return {k: (v * on if k in WARMUP_ZEROED else jnp.float32(v))
            for k, v in LOSS_COEFFICIENTS.items()}


def sample_pixel_batch(images: jax.Array, cameras: Cameras,
                       num_rays: int, key: jax.Array
                       ) -> Tuple[RayBundle, jax.Array]:
    """Uniform pixel sampling + ray generation, fully on device."""
    n, h, w = images.shape[:3]
    kc, ky, kx = jax.random.split(key, 3)
    ci = jax.random.randint(kc, (num_rays,), 0, n)
    py = jax.random.randint(ky, (num_rays,), 0, h)
    px = jax.random.randint(kx, (num_rays,), 0, w)
    origins, dirs, pixel_area = generate_rays(cameras, ci, py, px)
    gt = images[ci, py, px].astype(jnp.float32)
    if images.dtype == jnp.uint8:  # images may be stored compactly
        gt = gt / 255.0
    zeros = jnp.zeros((num_rays, 1))
    bundle = RayBundle(origins=origins, directions=dirs,
                       pixel_area=pixel_area, nears=zeros, fars=zeros,
                       camera_indices=ci[:, None])
    return bundle, gt


def make_train_step(config: TrainerConfig):
    """Build the per-device train step; gradient pmean over `axis_name`
    replaces DDP's all-reduce (reference pipeline.py:73-77)."""
    from rsn.models import camera_opt as camera_opt_lib

    mcfg = config.pipeline.model
    num_rays = config.pipeline.datamanager.train_num_rays_per_batch
    optimizer = build_field_optimizer(config.optimizers)
    cam_mode = config.pipeline.datamanager.camera_optimizer
    cam_optimizer = (build_optimizer(config.optimizers["camera_opt"])
                     if cam_mode != "off" else None)
    prop_optimizer = (build_optimizer(config.optimizers["proposal_networks"])
                      if mcfg.use_proposal else None)

    def train_step(state: TrainState, images, cameras, key,
                   axis_name: Optional[str] = None,
                   return_grads: bool = False):
        k_pix, k_render = jax.random.split(jax.random.fold_in(
            key, state.step))
        bundle, gt = sample_pixel_batch(images, cameras, num_rays, k_pix)
        bundle = model_lib.apply_collider(bundle, mcfg)
        coeffs = loss_coefficients_traced(state.step)
        if mcfg.use_proposal:
            coeffs = dict(coeffs,
                          interlevel_loss=jnp.float32(
                              mcfg.interlevel_loss_mult))
            if mcfg.distortion_loss_mult:
                coeffs["distortion_loss"] = jnp.float32(
                    mcfg.distortion_loss_mult)

        prop_anneal = None
        if mcfg.use_proposal and mcfg.proposal_weights_anneal_max_num_iters:
            # mip-NeRF-360 weight annealing: uniform-ish fine sampling
            # until the proposal is trained (bias curve, slope s)
            frac = jnp.clip(state.step.astype(jnp.float32)
                            / mcfg.proposal_weights_anneal_max_num_iters,
                            0.0, 1.0)
            s = mcfg.proposal_weights_anneal_slope
            prop_anneal = (s * frac) / ((s - 1.0) * frac + 1.0)

        def forward(params, cam, prop):
            b = camera_opt_lib.apply_to_bundle(bundle, cam, cam_mode)
            # rays are autograd leaves unless the camera optimizer is
            # refining poses — lets the fused kernels skip the primary
            # passes' dead IPE backward (see model.get_outputs)
            outputs = model_lib.get_outputs(params, b, k_render, mcfg,
                                            training=True,
                                            prop_params=prop,
                                            prop_anneal=prop_anneal,
                                            rays_live=cam is not None)
            loss_dict = model_lib.get_loss_dict(outputs, gt, coeffs)
            if cam is not None:
                # gauge-freedom regularizer (nerfstudio camera-opt
                # rot/trans L2 penalties; see camera_opt.py)
                dmcfg = config.pipeline.datamanager
                loss_dict = dict(
                    loss_dict,
                    camera_opt_regularizer=
                    camera_opt_lib.regularization_loss(
                        cam, dmcfg.camera_opt_rot_penalty,
                        dmcfg.camera_opt_trans_penalty))
            aux = {"mask_fraction": jnp.mean(
                outputs["mask"].astype(jnp.float32)),
                "reflect_overflow": outputs["reflect_overflow"]}
            return loss_dict, aux

        if cam_optimizer is None or state.camera is None:
            # disabled groups are None (empty pytrees): their grads come
            # back empty and no update runs — one code path for all combos
            def loss_fn(params, cam, prop):
                loss_dict, aux = forward(params, cam, prop)
                return sum(jax.tree.leaves(loss_dict)), (loss_dict, aux)

            (total, (loss_dict, aux)), (grads, cam_grads, prop_grads) = \
                jax.value_and_grad(loss_fn, argnums=(0, 1, 2),
                                   has_aux=True)(
                    state.params, state.camera, state.proposal)
        else:
            # With pose refinement on, pose gradients must come ONLY
            # from the photometric losses (+ the pose regularizer): in
            # the reference the rays are autograd leaves, so the
            # normal/orientation regularizers never act on geometry —
            # and their Sum(w * residual) form is minimized by steering
            # rays OFF the density, which makes pose-only optimization
            # diverge (ray error 2 deg -> 31 deg measured,
            # tools/exp_camera_opt_recovery.py).  One forward, two VJP
            # cotangent passes (field sees every loss, camera only the
            # photometric subset).
            (loss_dict, aux), vjp = jax.vjp(forward, state.params,
                                            state.camera, state.proposal)
            zero_aux = jax.tree.map(jnp.zeros_like, aux)
            ones = {k: jnp.float32(1.0) for k in loss_dict}
            grads, _, prop_grads = vjp((ones, zero_aux))
            unclassified = (set(loss_dict)
                            - model_lib.PHOTOMETRIC_LOSS_KEYS
                            - model_lib.NON_PHOTOMETRIC_LOSS_KEYS
                            - {"camera_opt_regularizer"})
            assert not unclassified, (
                f"loss keys {unclassified} not classified in "
                "model.PHOTOMETRIC_LOSS_KEYS / NON_PHOTOMETRIC_LOSS_KEYS"
                " — pose-gradient routing would be silently wrong")
            photo = {k: jnp.float32(
                1.0 if (k in model_lib.PHOTOMETRIC_LOSS_KEYS
                        or k == "camera_opt_regularizer") else 0.0)
                for k in loss_dict}
            _, cam_grads, _ = vjp((photo, zero_aux))
            total = sum(jax.tree.leaves(loss_dict))
        if axis_name is not None:
            (grads, cam_grads, prop_grads, total, loss_dict, aux) = \
                jax.lax.pmean((grads, cam_grads, prop_grads, total,
                               loss_dict, aux), axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        camera, camera_opt_state = state.camera, state.camera_opt_state
        if cam_optimizer is not None and camera is not None:
            cam_updates, camera_opt_state = cam_optimizer.update(
                cam_grads, camera_opt_state, camera)
            camera = optax.apply_updates(camera, cam_updates)
        proposal, proposal_opt_state = (state.proposal,
                                        state.proposal_opt_state)
        if prop_optimizer is not None and proposal is not None:
            prop_updates, proposal_opt_state = prop_optimizer.update(
                prop_grads, proposal_opt_state, proposal)
            proposal = optax.apply_updates(proposal, prop_updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, camera=camera,
                               camera_opt_state=camera_opt_state,
                               proposal=proposal,
                               proposal_opt_state=proposal_opt_state)
        metrics = dict(loss_dict, total_loss=total, **aux)
        if return_grads:
            # debug/verification hook (dryrun_multichip's 1-vs-N
            # equivalence check): expose this step's gradients for every
            # live group so a single-device caller can reproduce pmean
            # semantics
            metrics["_grads"] = grads
            metrics["_cam_grads"] = cam_grads
            metrics["_prop_grads"] = prop_grads
        return new_state, metrics

    return train_step, optimizer


def make_eval_batch_step(config: TrainerConfig):
    """Eval-batch loss (no grads) on the eval split — the inherited
    Trainer's steps_per_eval_batch hook (reference config.py:30)."""
    mcfg = config.pipeline.model
    num_rays = config.pipeline.datamanager.eval_num_rays_per_batch

    def eval_step(state: TrainState, images, cameras, key):
        k_pix, k_render = jax.random.split(key)
        bundle, gt = sample_pixel_batch(images, cameras, num_rays, k_pix)
        bundle = model_lib.apply_collider(bundle, mcfg)
        outputs = model_lib.get_outputs(state.params, bundle, k_render,
                                        mcfg, training=False,
                                        prop_params=state.proposal)
        coeffs = loss_coefficients_traced(state.step)
        if mcfg.use_proposal:
            coeffs = dict(coeffs,
                          interlevel_loss=jnp.float32(
                              mcfg.interlevel_loss_mult))
            if mcfg.distortion_loss_mult:
                coeffs["distortion_loss"] = jnp.float32(
                    mcfg.distortion_loss_mult)
        loss_dict = model_lib.get_loss_dict(outputs, gt, coeffs)
        total = sum(jax.tree.leaves(loss_dict))
        psnr = -10.0 * jnp.log10(jnp.maximum(jnp.mean(
            (outputs["mid_rgb_fine"] - gt[..., :3]) ** 2), 1e-12))
        return {"eval_loss": total, "eval_psnr_batch": psnr}

    return eval_step


_RENDER_ALL_CACHE: Dict[Any, Any] = {}
# Adaptive eval-compaction bucket memory: last-known-good
# eval_reflect_ray_fraction per (model config, chunking, mesh) — see
# render_image.  Values only ever produce EXACT results (overflow
# triggers a re-render at a larger bucket), so this is purely a
# throughput memo, safe to share across scenes/checkpoints.
_EVAL_REFLECT_STATE: Dict[Any, float] = {}


def preferred_eval_chunk(config: TrainerConfig) -> int:
    """Rays/chunk for offline eval/render: the reference default (1024,
    config.py:41) is a GPU-viewer memory knob; TPU kernels want >=16k
    rays in flight to fill the MXU pipeline.  Results are chunk-size
    invariant (eval-mode sampling is deterministic per ray; tested in
    test_render_image_sharded_matches_single_device), so this is purely
    a throughput/memory trade."""
    chunk = config.pipeline.model.eval_num_rays_per_chunk
    if jax.default_backend() != "cpu":
        chunk = max(chunk, 16384)
    return chunk


def render_image(params, cameras: Cameras, camera_index: int,
                 config: TrainerConfig, key: Optional[jax.Array] = None,
                 mesh=None, prop_params=None,
                 rays_per_chunk: Optional[int] = None,
                 product_only: bool = False) -> Dict[str, np.ndarray]:
    """Chunked full-image render (inherited get_outputs_for_camera_ray_
    bundle semantics, SURVEY.md §3.3), optionally sharded over a mesh.

    product_only: the caller consumes only the product image (final_rgb
    + accumulation/depth) — rsn-render orbit/path/video and the viewer.
    The coarse pass then runs density-only (output-aware coarse kernel,
    VERDICT r4 #2; bit-identical downstream, mid_rgb_coarse omitted)."""
    from rsn.data.cameras import generate_image_rays

    import dataclasses

    mcfg = config.pipeline.model
    chunk = rays_per_chunk or mcfg.eval_num_rays_per_chunk
    if mesh is not None:
        chunk *= mesh.devices.size
    H, W = cameras.height, cameras.width
    origins, dirs, pixel_area = generate_image_rays(cameras, camera_index)
    total = H * W
    if key is None:
        key = jax.random.PRNGKey(0)

    # the WHOLE image renders in ONE dispatch: chunks iterate inside jit
    # via lax.map (sequential, VMEM-bounded), and only the finished
    # image crosses the host boundary — per-chunk dispatch/transfer
    # costs a full tunnel round trip (~40-90 ms) on remote backends
    params = (params, prop_params)
    n_chunks = -(-total // chunk)
    pad_total = n_chunks * chunk

    def pad_chunked(x):
        p = jnp.pad(x, ((0, pad_total - total),) + ((0, 0),) *
                    (x.ndim - 1))
        return p.reshape((n_chunks, chunk) + p.shape[1:])

    o = pad_chunked(origins)
    d = pad_chunked(dirs)
    pa = pad_chunked(pixel_area)
    # per-chunk keys match the historical fold_in(key, row_offset)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i * chunk))(
        jnp.arange(n_chunks))

    mesh_key = None if mesh is None else (
        tuple(dev.id for dev in mesh.devices.flat), mesh.axis_names)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        params = jax.device_put(params, mesh_lib.replicated(mesh))
        shard = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
        o, d, pa = (jax.device_put(x, shard) for x in (o, d, pa))

    def run_with(mcfg_b):
        """Compile (cached) + run the whole-image program for one model
        config; returns the stacked per-chunk device outputs."""

        def render_chunk(params, batch, key):
            params, prop = params  # (fields, proposal-or-None)
            o, d, pa = batch
            n = o.shape[0]
            zeros = jnp.zeros((n, 1))
            rb = RayBundle(origins=o, directions=d, pixel_area=pa,
                           nears=zeros, fars=zeros)
            rb = model_lib.apply_collider(rb, mcfg_b)
            out = model_lib.get_outputs(params, rb, key, mcfg_b,
                                        training=False, prop_params=prop,
                                        need_coarse_rgb=not product_only)
            if product_only:
                keep = ("mid_rgb_fine", "mid_reflect_fine",
                        "accumulation_fine", "depth_fine")
            else:
                keep = ("mid_rgb_coarse", "mid_rgb_fine",
                        "mid_reflect_coarse", "mid_reflect_fine",
                        "accumulation_coarse", "accumulation_fine",
                        "depth_coarse", "depth_fine", "roughness")
            # mid_reflect_* are absent in primary-only mode
            # (use_reflection False)
            res = {k: out[k] for k in keep if k in out}
            # compaction telemetry, broadcast per-ray so it shards like
            # the image outputs (each device reports its own shard):
            # "_overflow" > 0 anywhere means a masked ray was dropped
            # (triggers the exactness re-render), "_mask" feeds the
            # bucket controller.  Stripped before the image reshape.
            if "mask" in out:
                res["_mask"] = out["mask"][:, None].astype(jnp.float32)
                res["_overflow"] = jnp.broadcast_to(
                    out["reflect_overflow"], (n, 1))
            return res

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            inner = jax.shard_map(
                render_chunk, mesh=mesh,
                in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
                out_specs=P(mesh_lib.DATA_AXIS), check_vma=False)
        else:
            inner = render_chunk

        # cache the jitted whole-image program across calls (a fresh jit
        # wrapper per call would re-trace for every image); keyed on the
        # mesh's device set, not just its presence.  mcfg is a frozen
        # dataclass: hashable with value-based equality over EVERY field
        # (unlike repr, which silently drops repr=False fields)
        cache_key = (mcfg_b, chunk, n_chunks, mesh_key,
                     prop_params is None, product_only)
        render_all = _RENDER_ALL_CACHE.get(cache_key)
        if render_all is None:
            if len(_RENDER_ALL_CACHE) > 16:  # bound compiled programs
                _RENDER_ALL_CACHE.pop(next(iter(_RENDER_ALL_CACHE)))
            @jax.jit
            def render_all(params, o, d, pa, keys, _inner=inner):
                return jax.lax.map(
                    lambda xs: _inner(params, (xs[0], xs[1], xs[2]),
                                      xs[3]),
                    (o, d, pa, keys))
            _RENDER_ALL_CACHE[cache_key] = render_all
        return render_all(params, o, d, pa, keys)

    # Adaptive eval-side compaction: unmasked rays never needed the
    # reflected passes (the reference gathers the masked subset,
    # model.py:267) — render at the remembered fraction bucket and
    # RE-RENDER at a larger bucket if any chunk dropped a masked ray,
    # so the result is always bit-identical to fraction 1.0.  The
    # bucket for the NEXT call tracks the worst per-shard-chunk mask
    # fraction plus headroom.
    adaptive = (mcfg.adaptive_eval_reflect_fraction and mcfg.use_reflection
                and mcfg.eval_reflect_ray_fraction >= 1.0)
    state_key = (mcfg, chunk, mesh_key)
    frac = _EVAL_REFLECT_STATE.get(state_key, 1.0) if adaptive else 1.0

    def fetch(tree):
        """device_get, crossing process boundaries when the mesh spans
        multiple hosts (ray shards live on remote processes there)."""
        if mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return jax.tree.map(
                lambda x: np.asarray(
                    multihost_utils.process_allgather(x, tiled=True)),
                tree)
        return jax.device_get(tree)

    while True:
        mcfg_b = (mcfg if frac >= 1.0 else dataclasses.replace(
            mcfg, eval_reflect_ray_fraction=frac))
        stacked = fetch(run_with(mcfg_b))
        overflow = stacked.pop("_overflow", None)
        mask_arr = stacked.pop("_mask", None)
        if not adaptive:
            break
        # worst mask fraction at the compaction granularity (one top-k
        # per shard per chunk) — valid even from an overflowed render
        # (the mask itself is computed before compaction)
        need = None
        if mask_arr is not None:
            shards = 1 if mesh is None else mesh.devices.size
            per = np.mean(
                np.asarray(mask_arr).reshape(n_chunks * shards, -1),
                axis=1)
            need = min(1.0, float(np.max(per)) + REFLECT_HEADROOM)
        if frac < 1.0 and overflow is not None and \
                float(np.max(overflow)) > 0.0:
            # jump straight to the bucket the observed mask demands
            # (one re-render), not one bucket at a time
            frac = next(b for b in REFLECT_FRACTION_BUCKETS
                        if b > frac and (need is None or b >= need))
            continue
        if need is not None:
            _EVAL_REFLECT_STATE[state_key] = next(
                b for b in REFLECT_FRACTION_BUCKETS if b >= need)
        break

    return {k: np.asarray(v).reshape(pad_total, -1)[:total].reshape(
        H, W, -1) for k, v in stacked.items()}


class Trainer:
    """Orchestrates setup -> train loop -> eval/checkpoint hooks."""

    def __init__(self, config: TrainerConfig, run_dir: Optional[str] = None):
        self.config = config
        dm = config.pipeline.datamanager
        self.train_ds = load_dataset(dm.dataparser, dm.data or "", "train",
                                     dm.downscale_factor, dm.scale_factor)
        try:
            eval_split = ("val" if dm.dataparser == "blender" else "test")
            self.eval_ds = load_dataset(dm.dataparser, dm.data or "",
                                        eval_split, dm.downscale_factor,
                                        dm.scale_factor)
        except FileNotFoundError:
            self.eval_ds = self.train_ds

        # multi-process (multi-host) support: rank 0 owns logging and
        # sidecar files; checkpoint saves are collective (orbax) so all
        # ranks must agree on the run dir (SURVEY §2.5: the reference's
        # DDP launcher plumbs world_size/local_rank the same way,
        # reflect_sampling_nerf_pipeline.py:50-51)
        self._is_primary = jax.process_index() == 0
        if run_dir is None:
            t = time.time()
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                t = float(multihost_utils.broadcast_one_to_all(
                    np.float64(t)))
            ts = time.strftime("%Y-%m-%d_%H%M%S", time.localtime(t))
            run_dir = os.path.join(config.output_dir,
                                   config.experiment_name,
                                   config.method_name, ts)
        self.run_dir = run_dir
        self.ckpt_dir = os.path.join(run_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if self._is_primary:
            ckpt_lib.dump_config(run_dir, config)

        self.mesh = mesh_lib.make_mesh(config.num_devices)
        self.num_devices = self.mesh.devices.size
        _, self.optimizer = make_train_step(config)

        # adaptive reflect-fraction controller state: the dispatched
        # step function is rebuilt (cached per bucket) when the observed
        # mask fraction approaches the compaction cap (see
        # _maybe_adapt_reflect_fraction)
        self._reflect_frac = config.pipeline.model.reflect_ray_fraction
        self._multi_step_cache: Dict[float, Any] = {}
        self._reflect_down_votes = 0
        self._multi_step_fn = self._build_multi_step(self._reflect_frac)
        # controller cadence is independent of logging so that
        # steps_per_log=0 cannot silently disable adaptation
        self._adapt_cadence = (config.steps_per_log
                               if config.steps_per_log > 0
                               else REFLECT_ADAPT_FALLBACK_CADENCE)

        params = field_lib.init_field_params(
            jax.random.PRNGKey(config.seed))
        opt_state = self.optimizer.init(params)
        from rsn.models import camera_opt as camera_opt_lib
        cam_mode = config.pipeline.datamanager.camera_optimizer
        camera = camera_opt_lib.init_camera_opt_params(
            self.train_ds.cameras.num_cameras, cam_mode)
        camera_opt_state = None
        if camera is not None:
            camera_opt_state = build_optimizer(
                config.optimizers["camera_opt"]).init(camera)
        proposal = proposal_opt_state = None
        if config.pipeline.model.use_proposal:
            from rsn.models import proposal as proposal_lib
            proposal = proposal_lib.init_proposal_params(
                jax.random.PRNGKey(config.seed + 2))
            proposal_opt_state = build_optimizer(
                config.optimizers["proposal_networks"]).init(proposal)
        self.state = TrainState(params=params, opt_state=opt_state,
                                step=jnp.int32(0), camera=camera,
                                camera_opt_state=camera_opt_state,
                                proposal=proposal,
                                proposal_opt_state=proposal_opt_state)
        self.images = jnp.asarray(self.train_ds.images)
        self.cameras = self.train_ds.cameras
        self.eval_images = jnp.asarray(self.eval_ds.images)
        self.eval_cameras = self.eval_ds.cameras
        if self.num_devices > 1:
            # a (possibly multi-process) shard_map mesh needs
            # committed-GLOBAL inputs — process-local arrays cannot be
            # auto-resharded across processes.  Replicate once here.
            rep = mesh_lib.replicated(self.mesh)

            def put(tree):
                return jax.tree.map(
                    lambda x: jax.device_put(x, rep)
                    if isinstance(x, jax.Array) else x, tree)

            self.state = put(self.state)
            self.images = put(self.images)
            self.cameras = put(self.cameras)
            self.eval_images = put(self.eval_images)
            self.eval_cameras = put(self.eval_cameras)
        self._eval_step_fn = jax.jit(make_eval_batch_step(config))
        self._log_file = (
            open(os.path.join(run_dir, "train_log.jsonl"), "a")
            if self._is_primary else None)
        self._tb = None
        if config.vis == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                pass
        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self._eval_image_cursor = 0

    def _build_multi_step(self, fraction: float):
        """Jitted n-step dispatch (lax.fori_loop) for a given
        reflect_ray_fraction — cached per bucket so the adaptive
        controller can swap caps without retracing.

        Per-step PRNG keys come from fold_in(key, state.step) inside
        train_step, so the sample stream is IDENTICAL to step-at-a-time
        dispatch (and invariant to the fraction)."""
        fn = self._multi_step_cache.get(fraction)
        if fn is not None:
            return fn
        import dataclasses
        config = self.config
        if fraction != config.pipeline.model.reflect_ray_fraction:
            mcfg = dataclasses.replace(config.pipeline.model,
                                       reflect_ray_fraction=fraction)
            config = dataclasses.replace(
                config,
                pipeline=dataclasses.replace(config.pipeline, model=mcfg))
        train_step, _ = make_train_step(config)

        if self.num_devices > 1:
            # global batch = per-device batch * D (per-rank semantics
            # identical to the reference's per-GPU 1024 rays)
            def per_device(state, data, key, axis_name=None):
                images, cameras = data
                return train_step(state, images, cameras, key,
                                  axis_name=axis_name)
            step_traceable = self._make_sharded(per_device, jit=False)
        else:
            step_traceable = (lambda s, images, cameras, k: train_step(
                s, images, cameras, k))

        def multi(state, images, cameras, key, n):
            m_shapes = jax.eval_shape(
                lambda s: step_traceable(s, images, cameras, key)[1],
                state)
            init_m = jax.tree.map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), m_shapes)

            def body(_, carry):
                s, _m = carry
                return step_traceable(s, images, cameras, key)

            # n is TRACED (dynamic-trip while_loop): chunk sizes vary
            # per call (cap + boundary remainders) and a static n would
            # recompile the whole step per distinct value.  Shapes stay
            # fixed; only the trip count is dynamic — a deliberate
            # exception to the fixed-control-flow convention.
            return jax.lax.fori_loop(0, n, body, (state, init_m))

        fn = jax.jit(multi)
        self._multi_step_cache[fraction] = fn
        return fn

    def _maybe_adapt_reflect_fraction(self,
                                      metrics: Dict[str, float]) -> None:
        """Adaptive compaction cap (VERDICT r1 #2): raise the
        reflect_ray_fraction bucket when the observed mask fraction
        approaches the cap — and IMMEDIATELY when masked rays actually
        overflowed — or relax it back toward the configured floor after
        3 consecutive under-target observations.  Never drops below the
        configured reflect_ray_fraction, so an explicit 1.0 stays exact
        forever.

        Decisions read the LAST logged step's metrics at fixed
        steps_per_log boundaries (never the dispatch-dependent `first`
        log), so the controller — and therefore the training sample
        stream — is invariant to steps_per_dispatch chunking.  Per-step
        mask noise is ~binomial (std ~1.5% at 1024 rays), far inside
        REFLECT_HEADROOM."""
        cfg = self.config
        if not cfg.adaptive_reflect_fraction:
            return
        mf = metrics.get("mask_fraction")
        if mf is None:
            return
        floor = cfg.pipeline.model.reflect_ray_fraction
        cur = self._reflect_frac
        need = min(1.0, mf + REFLECT_HEADROOM)
        target = next(b for b in REFLECT_FRACTION_BUCKETS if b >= need)
        target = max(target, floor)
        if metrics.get("reflect_overflow", 0.0) > 0.0 and cur < 1.0:
            target = max(target, next(
                b for b in REFLECT_FRACTION_BUCKETS if b > cur))
        if target > cur:
            self._reflect_down_votes = 0
            self._set_reflect_fraction(target)
        elif target < cur:
            self._reflect_down_votes += 1
            if self._reflect_down_votes >= 3:
                self._reflect_down_votes = 0
                self._set_reflect_fraction(target)
        else:
            self._reflect_down_votes = 0

    def _set_reflect_fraction(self, frac: float) -> None:
        print(f"reflect compaction: fraction -> {frac:g}", flush=True)
        self._reflect_frac = frac
        self._multi_step_fn = self._build_multi_step(frac)

    def _make_sharded(self, per_device, jit: bool = True):
        from jax.sharding import PartitionSpec as P
        mesh = self.mesh

        def wrapped(state, images, cameras, key):
            def body(state, images, cameras, key):
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(mesh_lib.DATA_AXIS))
                return per_device(state, (images, cameras), key,
                                  axis_name=mesh_lib.DATA_AXIS)
            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P(), P()),
                check_vma=False)(state, images, cameras, key)
        return jax.jit(wrapped) if jit else wrapped

    def restore(self, load_dir: str) -> None:
        path = ckpt_lib.latest_checkpoint(load_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {load_dir}")
        abstract = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": int(self.state.step)}
        for name in ("camera", "camera_opt_state", "proposal",
                     "proposal_opt_state"):
            if getattr(self.state, name) is not None:
                abstract[name] = getattr(self.state, name)
        if not ckpt_lib.checkpoint_is_legacy(path):
            restored = ckpt_lib.load_checkpoint(path, abstract)
        else:
            # legacy checkpoint (detected from saved metadata, not by
            # trial-and-error — ADVICE r3): optimizer moments stored
            # per-leaf (pre flatten_optimizer) — restore against the
            # legacy structure and ravel the moments into vectors
            from rsn.engine.optimizers import (build_optimizer as _bo,
                                               migrate_opt_state)
            legacy = dict(abstract)
            legacy["opt_state"] = _bo(self.config.optimizers["fields"],
                                      flatten=False).init(self.state.params)
            if self.state.camera is not None:
                legacy["camera_opt_state"] = _bo(
                    self.config.optimizers["camera_opt"],
                    flatten=False).init(self.state.camera)
            if self.state.proposal is not None:
                legacy["proposal_opt_state"] = _bo(
                    self.config.optimizers["proposal_networks"],
                    flatten=False).init(self.state.proposal)
            restored = ckpt_lib.load_checkpoint(path, legacy)
            restored["opt_state"] = migrate_opt_state(
                restored["opt_state"])
            for name in ("camera_opt_state", "proposal_opt_state"):
                if restored.get(name) is not None:
                    restored[name] = migrate_opt_state(restored[name])
        self.state = TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.int32(restored["step"]),
            camera=restored.get("camera"),
            camera_opt_state=restored.get("camera_opt_state"),
            proposal=restored.get("proposal"),
            proposal_opt_state=restored.get("proposal_opt_state"))
        if self.num_devices > 1:
            # orbax restores COMMITTED to single devices; the shard_map
            # train step needs the state replicated over the mesh
            rep = mesh_lib.replicated(self.mesh)
            self.state = jax.tree.map(
                lambda x: jax.device_put(x, rep)
                if isinstance(x, jax.Array) else x, self.state)
        self._restore_controller_state(os.path.dirname(path))

    def _log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._log_file is None:  # non-primary rank
            return
        self._log_file.write(json.dumps({"step": step, **metrics}) + "\n")
        self._log_file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def _eval_image(self, step: int) -> Dict[str, float]:
        """Full-image eval + panels (inherited steps_per_eval_image hook;
        the reference's own version crashes on a missing key, SURVEY B#3
        — fixed here by using mid_rgb_coarse)."""
        from rsn import metrics as metrics_lib
        from rsn.cli.render import render_panels, save_png

        idx = self._eval_image_cursor % self.eval_ds.cameras.num_cameras
        self._eval_image_cursor += 1
        out = render_image(self.state.params, self.eval_cameras, idx,
                           self.config,
                           rays_per_chunk=preferred_eval_chunk(self.config),
                           mesh=self.mesh if self.num_devices > 1 else None,
                           prop_params=self.state.proposal)
        gt = self.eval_ds.images[idx]
        mcfg_all = self.config.pipeline.model
        fine = np.clip(model_lib.final_rgb(out), 0, 1)
        coarse = np.clip(out["mid_rgb_coarse"], 0, 1)
        m = {
            "fine_psnr": float(metrics_lib.psnr(jnp.asarray(fine),
                                                jnp.asarray(gt))),
            "fine_ssim": float(metrics_lib.ssim(jnp.asarray(fine),
                                                jnp.asarray(gt))),
        }
        if not mcfg_all.use_proposal:  # no coarse rgb head in prop mode
            m["coarse_psnr"] = float(metrics_lib.psnr(
                jnp.asarray(coarse), jnp.asarray(gt)))
        m["psnr"] = m["fine_psnr"]
        if self._is_primary:
            img_dir = os.path.join(self.run_dir, "eval_images")
            os.makedirs(img_dir, exist_ok=True)
            mcfg = self.config.pipeline.model
            panels = render_panels(out, gt, mcfg.collider_near_plane,
                                   mcfg.collider_far_plane)
            for name, img in panels.items():
                save_png(os.path.join(img_dir, f"{step:09d}-{name}.png"),
                         img)
        return m

    def _next_chunk(self, step: int, max_steps: int) -> int:
        """Steps to fuse into the next dispatch: distance to the nearest
        log/eval/save/profile boundary, capped by steps_per_dispatch
        (1 under debug_nans — jax_debug_nans needs per-step dispatch)."""
        cfg = self.config
        cap = max(1, cfg.steps_per_dispatch)
        if cfg.debug_nans:
            cap = 1
        cadences = [cfg.steps_per_log, cfg.steps_per_eval_batch,
                    cfg.steps_per_eval_image, cfg.steps_per_save]
        if cfg.adaptive_reflect_fraction:
            cadences.append(self._adapt_cadence)
        nxt = max_steps
        for c in cadences:
            if c > 0:
                nxt = min(nxt, (step // c + 1) * c)
        if cfg.profile_dir:
            for boundary in (cfg.profile_start_step,
                             cfg.profile_start_step
                             + cfg.profile_num_steps):
                if boundary > step:
                    nxt = min(nxt, boundary)
        return min(cap, nxt - step)

    def train(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.config
        max_steps = max_steps or cfg.max_num_iterations
        key = jax.random.PRNGKey(cfg.seed)
        eval_key = jax.random.PRNGKey(cfg.seed + 1)
        last_metrics: Dict[str, float] = {}
        t0 = time.time()
        start = int(self.state.step)
        profiling = False
        first = True
        step = start
        while step < max_steps:
            if cfg.profile_dir and step == cfg.profile_start_step:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            chunk = self._next_chunk(step, max_steps)
            # per-step PRNG keys derive from state.step inside the jitted
            # loop — the sample stream is chunking-invariant
            self.state, metrics = self._multi_step_fn(
                self.state, self.images, self.cameras, key,
                jnp.int32(chunk))
            step += chunk
            if profiling and step >= (cfg.profile_start_step
                                      + cfg.profile_num_steps):
                jax.block_until_ready(self.state.params)
                jax.profiler.stop_trace()
                profiling = False
            hit = lambda c: c > 0 and step % c == 0
            adapt_now = (cfg.adaptive_reflect_fraction
                         and hit(self._adapt_cadence))
            if hit(cfg.steps_per_log) or first or adapt_now:
                # one bulk device_get (each float() would pay a full
                # host round trip — ~90 ms on tunneled backends)
                metrics = jax.device_get(metrics)
                metrics = {k: float(v) for k, v in metrics.items()}
            if adapt_now:  # fixed cadence, never the dispatch-dependent
                self._maybe_adapt_reflect_fraction(metrics)  # first log
            if hit(cfg.steps_per_log) or first:
                first = False
                metrics["reflect_fraction"] = self._reflect_frac
                if not cfg.debug_telemetry:
                    metrics.pop("mask_fraction", None)
                    metrics.pop("reflect_overflow", None)
                rays = (step - start) * \
                    cfg.pipeline.datamanager.train_num_rays_per_batch * \
                    max(self.num_devices, 1)
                dt = time.time() - t0
                line = {"rays_per_sec": rays / dt, **metrics}
                self._log(step, line)
                if self._is_primary:
                    print(f"step {step}: loss={metrics['total_loss']:.4f} "
                          f"({rays/dt:,.0f} rays/s)", flush=True)
                last_metrics = metrics
            if hit(cfg.steps_per_eval_batch):
                em = jax.device_get(self._eval_step_fn(
                    self.state, self.eval_images, self.eval_cameras,
                    jax.random.fold_in(eval_key, step)))
                self._log(step, {k: float(v) for k, v in em.items()})
            if hit(cfg.steps_per_eval_image):
                m = self._eval_image(step)
                self._log(step,
                          {f"eval_image_{k}": v for k, v in m.items()})
                if self._is_primary:
                    print(f"step {step}: eval image psnr={m['psnr']:.2f}",
                          flush=True)
            if hit(cfg.steps_per_save) or step == max_steps:
                extra = {
                    name: getattr(self.state, name)
                    for name in ("camera", "camera_opt_state", "proposal",
                                 "proposal_opt_state")
                    if getattr(self.state, name) is not None}
                # collective across processes (every rank participates;
                # the state is fully replicated so any rank holds it all)
                ckpt_lib.save_checkpoint(self.ckpt_dir, step,
                                         self.state.params,
                                         self.state.opt_state,
                                         extra or None)
                if self._is_primary:
                    self._save_controller_state(step)
        return last_metrics

    def _controller_state_path(self, ckpt_dir: str) -> str:
        return os.path.join(ckpt_dir, "trainer_state.json")

    def _save_controller_state(self, step: int) -> None:
        """Sidecar for host-side trainer state (the adaptive
        reflect-compaction fraction): without it a --load-dir resume
        restarts at the compaction floor and silently drops masked
        rays until the next adapt boundary (round-2 review finding)."""
        with open(self._controller_state_path(self.ckpt_dir), "w") as f:
            json.dump({"step": step,
                       "reflect_fraction": self._reflect_frac}, f)

    def _restore_controller_state(self, ckpt_dir: str) -> None:
        path = self._controller_state_path(ckpt_dir)
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                saved = json.load(f)
            frac = float(saved["reflect_fraction"])
        except (ValueError, KeyError, json.JSONDecodeError):
            return
        floor = self.config.pipeline.model.reflect_ray_fraction
        frac = max(frac, floor)
        if frac != self._reflect_frac:
            self._set_reflect_fraction(frac)
