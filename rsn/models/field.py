"""The reflect-sampling NeRF field: trunk MLP + decomposed heads.

Rebuilds the reference ``ReflectSamplingNeRFNerfField``
(reflect_sampling_nerf_field.py:28-207) as pure functions over a params
pytree.  The decomposed per-head API is kept (one trunk evaluation shared
by many heads via the returned embedding — reference field.py:90-207):

  trunk:  MLP 8x256, skip at layer 4 (input re-concatenated), ReLU out
  heads:  density(+0.5 bias, softplus), bottleneck 256->256,
          mid-MLP 1x128 on [ISH(34) || bottleneck(256)] -> RGB sigmoid,
          pred-normals = -normalize(linear), roughness (caller-chosen
          sigmoid/softplus; the declared roughness_bias is never applied —
          replicated quirk, SURVEY.md B#7), diffuse RGB, tint RGB, and the
          dead `low` head kept for checkpoint-shape parity (SURVEY.md B#8).

Parameter init replicates torch.nn.Linear defaults
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b) so training dynamics
match the reference.  Weights are stored (in, out) for x @ W.

TPU notes: all sample batches are flattened to (N, C) before the trunk so
XLA sees one large matmul chain per pass (MXU-shaped: N x 256 x 256);
`compute_dtype=bfloat16` casts matmul operands while keeping params,
accumulation and everything outside the trunk in fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from rsn.core.encodings import (IPE_OUT_DIM, ISH_OUT_DIM, ipe_encode,
                                ish_encode)
from rsn.core.render import normalize

Params = Dict[str, Any]

TRUNK_WIDTH = 256
TRUNK_LAYERS = 8
SKIP_AT = 4
MID_WIDTH = 128
DENSITY_BIAS = 0.5


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    compute_dtype: Any = jnp.float32  # bf16 for the trunk matmuls if set
    sh_l8_m7_2x: bool = True  # replicate reference SH bug (SURVEY.md B#1)
    use_pallas: bool = False  # fused field kernel (forward/eval path)
    use_pallas_train: bool = False  # fused custom-VJP kernel for training
    save_acts: bool = False  # v6 fwd spills trunk acts; v5 bwd skips recompute
    # run the eval kernels in Pallas interpret mode (CPU tests of the
    # kernel-branch model glue; never set in production configs)
    pallas_interpret: bool = False


def _linear_init(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    bound = 1.0 / jnp.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def init_field_params(key: jax.Array) -> Params:
    keys = jax.random.split(key, 16)
    trunk = []
    in_dim = IPE_OUT_DIM
    for i in range(TRUNK_LAYERS):
        d_in = TRUNK_WIDTH if i > 0 else in_dim
        if i == SKIP_AT:
            d_in = TRUNK_WIDTH + in_dim
        trunk.append(_linear_init(keys[i], d_in, TRUNK_WIDTH))
    return {
        "trunk": trunk,
        "density": _linear_init(keys[8], TRUNK_WIDTH, 1),
        "low": _linear_init(keys[9], TRUNK_WIDTH, 3),  # dead head, ckpt parity
        "bottleneck": _linear_init(keys[10], TRUNK_WIDTH, TRUNK_WIDTH),
        "mid_mlp": _linear_init(keys[11], ISH_OUT_DIM + TRUNK_WIDTH,
                                MID_WIDTH),
        "mid": _linear_init(keys[12], MID_WIDTH, 3),
        "normals": _linear_init(keys[13], TRUNK_WIDTH, 3),
        "roughness": _linear_init(keys[14], TRUNK_WIDTH, 1),
        "diff": _linear_init(keys[15], TRUNK_WIDTH, 3),
        "tint": _linear_init(jax.random.fold_in(key, 99), TRUNK_WIDTH, 3),
    }


@jax.custom_vjp
def _matmul_bf16(xb: jax.Array, w: jax.Array) -> jax.Array:
    """bf16 matmul with fp32 accumulation AND a bf16 backward.

    Without this, JAX's dot_general transpose multiplies fp32 cotangents
    against bf16 weights — XLA upcasts and the whole backward runs at
    fp32 MXU rate.  Here dgrad/wgrad cast the cotangent to bf16 first
    (standard mixed-precision training; fp32 accumulation everywhere).

    xb must already be bf16; w is the fp32 parameter (dw stays fp32).
    """
    return jax.lax.dot_general(
        xb, w.astype(jnp.bfloat16),
        (((xb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _matmul_bf16_fwd(xb, w):
    return _matmul_bf16(xb, w), (xb, w.astype(jnp.bfloat16))


def _matmul_bf16_bwd(res, g):
    xb, wb = res
    gb = g.astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gb, wb, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    bdims = tuple(range(g.ndim - 1))  # wgrad contracts all batch dims
    dw = jax.lax.dot_general(
        xb, gb, ((bdims, bdims), ((), ())),
        preferred_element_type=jnp.float32)
    return dx, dw


_matmul_bf16.defvjp(_matmul_bf16_fwd, _matmul_bf16_bwd)


def _dense(p: Params, x: jax.Array, dtype=None, out_dtype=None) -> jax.Array:
    """Linear layer; with dtype=bf16 the matmul operands are bf16 with
    fp32 MXU accumulation (+ fp32 bias) and a bf16 backward.
    out_dtype optionally casts the result (bf16 activations halve HBM
    traffic between fused regions)."""
    if dtype is None and x.dtype in (jnp.bfloat16, jnp.float16):
        dtype = x.dtype  # bf16 embedding -> bf16 head matmul, fp32 out
        # (explicitly NOT for float64: a `!= float32` test silently sent
        # f64 oracle runs through the bf16 kernel path)
    if dtype is not None and dtype != jnp.float32:
        y = _matmul_bf16(x.astype(jnp.bfloat16), p["w"]) + p["b"]
    else:
        y = x @ p["w"] + p["b"]
    return y.astype(out_dtype) if out_dtype is not None else y


def mlp_base(params: Params, x: jax.Array,
             dtype=jnp.float32) -> jax.Array:
    """Trunk: 8 linears, ReLU between + at out, input re-concat at layer 4.

    In bf16 mode, activations between layers (and the returned
    embedding) stay bf16 — matching the reference's AMP training regime
    (mixed_precision=True, config.py:33) with bf16 instead of fp16.
    """
    act_dtype = None if dtype == jnp.float32 else dtype
    h = x if act_dtype is None else x.astype(act_dtype)
    for i, layer in enumerate(params["trunk"]):
        if i == SKIP_AT:
            h = jnp.concatenate([x.astype(h.dtype), h], axis=-1)
        h = _dense(layer, h, dtype, out_dtype=act_dtype)
        h = jax.nn.relu(h)  # inner activation; final layer also ReLU'd
    return h


def get_density(params: Params, mean: jax.Array,
                cov_diag: Optional[jax.Array] = None,
                cfg: FieldConfig = FieldConfig()):
    """-> (density, embedding, density_preact).

    density = softplus(linear(trunk(IPE(mean, diag(cov)))) + 0.5)
    (reference field.py:122-137; the +0.5 density_bias IS applied).
    cov_diag: (..., 3) contracted covariance diagonal — the IPE consumes
    only the diagonal (nerfstudio NeRFEncoding semantics), and the
    factored pipeline (rsn.core.contract.contract_blob) never builds the
    3x3.  A full (..., 3, 3) cov is also accepted for oracle tests.
    """
    if cov_diag is not None and cov_diag.ndim == mean.ndim + 1:
        cov_diag = jnp.diagonal(cov_diag, axis1=-2, axis2=-1)
    enc = ipe_encode(mean, cov_diag=cov_diag)
    emb = mlp_base(params, enc, cfg.compute_dtype)
    preact = _dense(params["density"], emb)
    density = jax.nn.softplus(preact + DENSITY_BIAS)
    return density, emb, preact


def get_analytic_normals(params: Params, mean: jax.Array,
                         cov_diag: jax.Array,
                         cfg: FieldConfig = FieldConfig()) -> jax.Array:
    """normals = -normalize(grad of pre-activation density wrt contracted
    mean), holding cov fixed — matches the reference's autograd path
    (field.py:125-135,146-147 + nerfstudio Field.get_normals: the
    contracted mean is re-leafed by requires_grad, so cov is a constant
    wrt that leaf).

    The result is used only as a (detached) regularization target
    (model.py:250-251), so the whole computation sits under stop_gradient.
    """
    # stop_gradient on ALL inputs (not just the output): the result is a
    # pure regularization target, and without this the outer
    # value_and_grad still linearizes through the inner VJP, saving its
    # residuals — measured +125% backward wall time
    params = jax.lax.stop_gradient(params)
    mean = jax.lax.stop_gradient(mean)
    cov_diag = jax.lax.stop_gradient(cov_diag)

    def preact_sum(m):
        _, _, preact = get_density(params, m, cov_diag, cfg)
        return jnp.sum(preact)

    g = jax.grad(preact_sum)(mean)
    return jax.lax.stop_gradient(-normalize(g))


def get_field_outputs(params: Params, mean: jax.Array, cov_diag: jax.Array,
                      cfg: FieldConfig = FieldConfig(),
                      differentiable: bool = True) -> Dict[str, jax.Array]:
    """One trunk evaluation -> every per-sample head the model consumes.

    Returns {density, density_preact, diff, tint, rough_raw,
    pred_normals, bottleneck}.  With cfg.use_pallas and
    differentiable=False, runs the fused VMEM-resident Pallas kernel
    (rsn.kernels.field_pallas) — the render hot path; otherwise the XLA
    composition (autodiff-friendly, used for training and parity).
    """
    # Flatten to (N, C): 3D (R, S, C) tensors make XLA thrash layouts in
    # the backward (measured: 106 layout copies of 268 MB each in one
    # train-grad HLO — 180 GB of traffic).  2D matmuls keep one
    # canonical layout end-to-end.
    batch_shape = mean.shape[:-1]
    mean = mean.reshape(-1, mean.shape[-1])
    cov_diag = cov_diag.reshape(-1, cov_diag.shape[-1])

    def unflatten(d):
        return {k: v.reshape(*batch_shape, v.shape[-1])
                for k, v in d.items()}

    if cfg.use_pallas and not differentiable:
        from rsn.kernels import field_pallas as fp

        flat = jnp.concatenate([mean, cov_diag], axis=-1).astype(
            jnp.float32)  # (N, 6)
        n = flat.shape[0]
        tile = fp.DEFAULT_TILE
        n_pad = -(-n // tile) * tile
        flat = jnp.pad(flat, ((0, n_pad - n), (0, fp.IN_COLS - 6)))
        out = fp.field_forward_v2(fp.pack_params(params), flat)[:n]
        h = fp.unpack_outputs(out)
        preact = h["density_preact"]
        return unflatten({
            "density": jax.nn.softplus(preact + DENSITY_BIAS),
            "density_preact": preact,
            "diff": jax.nn.sigmoid(h["diff_raw"]),
            "tint": jax.nn.sigmoid(h["tint_raw"]),
            "rough_raw": h["rough_raw"],
            "pred_normals": normalize(-h["normals_raw"]),
            "bottleneck": h["bottleneck"],
        })

    density, emb, preact = get_density(params, mean, cov_diag, cfg)
    act = None if cfg.compute_dtype == jnp.float32 else cfg.compute_dtype
    return unflatten({
        "density": density,
        "density_preact": preact,
        "diff": get_diff(params, emb),
        "tint": get_tint(params, emb),
        "rough_raw": _dense(params["roughness"], emb),
        "pred_normals": get_pred_normals(params, emb),
        "bottleneck": _dense(params["bottleneck"], emb, cfg.compute_dtype,
                             out_dtype=act),
    })


def get_pred_normals(params: Params, embedding: jax.Array) -> jax.Array:
    """-normalize(linear(embedding))  (reference field.py:139-144)."""
    return normalize(-_dense(params["normals"], embedding))


def get_roughness(params: Params, embedding: jax.Array,
                  activation: Callable = jax.nn.sigmoid) -> jax.Array:
    """Roughness head; caller picks sigmoid (ray-level) or softplus
    (per-sample into ISH).  roughness_bias intentionally NOT applied
    (replicates reference field.py:150-155, SURVEY.md B#7)."""
    return activation(_dense(params["roughness"], embedding))


def get_mid(params: Params, directions: jax.Array, roughness: jax.Array,
            embedding: jax.Array, use_bottleneck: bool = True,
            cfg: FieldConfig = FieldConfig()) -> jax.Array:
    """Directional branch: sigmoid(mid(relu(linear([ISH || bottleneck]))))."""
    enc = ish_encode(directions, roughness, cfg.sh_l8_m7_2x)
    act = None if cfg.compute_dtype == jnp.float32 else cfg.compute_dtype
    if use_bottleneck:
        embedding = _dense(params["bottleneck"], embedding,
                           cfg.compute_dtype, out_dtype=act)
    if act is not None:
        enc = enc.astype(act)
        embedding = embedding.astype(act)
    h = jax.nn.relu(_dense(params["mid_mlp"],
                           jnp.concatenate([enc, embedding], axis=-1),
                           cfg.compute_dtype, out_dtype=act))
    return jax.nn.sigmoid(_dense(params["mid"], h))


def get_low(params: Params, embedding: jax.Array,
            use_bottleneck: bool = True,
            cfg: FieldConfig = FieldConfig()) -> jax.Array:
    """Zero-direction readout (dead code in the reference, kept for parity
    with field.py:158-164)."""
    act = None if cfg.compute_dtype == jnp.float32 else cfg.compute_dtype
    if use_bottleneck:
        embedding = _dense(params["bottleneck"], embedding,
                           cfg.compute_dtype, out_dtype=act)
    zeros = jnp.zeros(embedding.shape[:-1] + (ISH_OUT_DIM,),
                      dtype=embedding.dtype)
    h = jax.nn.relu(_dense(params["mid_mlp"],
                           jnp.concatenate([zeros, embedding], axis=-1),
                           cfg.compute_dtype, out_dtype=act))
    return jax.nn.sigmoid(_dense(params["mid"], h))


def get_mid_factored(params: Params, ray_dirs: jax.Array,
                     roughness: jax.Array, bottleneck: jax.Array,
                     cfg: FieldConfig = FieldConfig()) -> jax.Array:
    """`get_mid` for sample batches whose directions are constant along
    the ray (all four render passes: frustum dirs == ray dir broadcast).

    TPU-first factorization: ISH(dirs, rough) = basis(dirs) * atten(rough)
    where basis is per-RAY (S-fold cheaper) and atten takes only 4
    distinct per-sample values (one per SH band).  The mid-MLP input
    matmul therefore splits as
        [ISH || emb] @ W = sum_band atten_b * (basis_b @ W_enc_b) + emb @ W_emb
    with the four (R, band) @ (band, 128) products per ray and only FMAs
    per sample.  Numerically identical up to matmul reassociation.

    Args:
      ray_dirs: (R, 3); roughness: (R, S, 1); bottleneck: (R, S, 256).
    """
    from rsn.core.encodings import sh_basis, _BAND_SLICES

    basis = sh_basis(ray_dirs, cfg.sh_l8_m7_2x)  # (R, 34)
    w = params["mid_mlp"]["w"]  # (290, 128): [enc(34) | emb(256)] rows
    b = params["mid_mlp"]["b"]
    w_enc, w_emb = w[:ISH_OUT_DIM], w[ISH_OUT_DIM:]
    dtype = cfg.compute_dtype
    act = None if dtype == jnp.float32 else dtype

    # flat 2D matmuls (3D batched shapes cause XLA layout copies)
    batch_shape = bottleneck.shape[:-1]
    flat = bottleneck.reshape(-1, bottleneck.shape[-1])
    pre = _dense({"w": w_emb, "b": b}, flat, dtype)  # (N, 128) f32
    pre = pre.reshape(*batch_shape, MID_WIDTH)
    for lo, hi, k in _BAND_SLICES:
        g = basis[..., lo:hi] @ w_enc[lo:hi]  # (R, 128)
        pre = pre + jnp.exp(-roughness * k) * g[..., None, :]
    h = jax.nn.relu(pre)
    if act is not None:
        h = h.astype(act)
    out = jax.nn.sigmoid(_dense(params["mid"], h.reshape(-1, MID_WIDTH)))
    return out.reshape(*batch_shape, 3)


def get_diff(params: Params, embedding: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(_dense(params["diff"], embedding))


def get_tint(params: Params, embedding: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(_dense(params["tint"], embedding))


def get_inf_color(params: Params, directions: jax.Array,
                  sqradius: jax.Array,
                  cfg: FieldConfig = FieldConfig()) -> jax.Array:
    """Far-field radiance read out of the SAME field on the contraction
    boundary sphere: mean = 2*d, cov = 0.6*sqradius*(I - d d^T), zero
    directional encoding (reference field.py:190-201).  Only the cov
    diagonal 0.6*sqradius*(1 - d*d) feeds the IPE (factored layout)."""
    mean = 2.0 * directions
    # relu: normalize() can round |d| to 1 + 1e-7, making 1 - d_i^2
    # slightly NEGATIVE on the dominant axis; a negative variance turns
    # the IPE damping exp(-4^j var/2) into exp(+hundreds) = inf at the
    # top octaves and NaN-poisons the whole optimizer state (observed
    # at train step 15036 of a 30k proposal run).  cov = 0.6 s (I-ddT)
    # is PSD in exact math, so clamping only removes rounding noise —
    # the same ReLU the contraction applies to its cov diagonal
    # (reference field.py:114-115; the reference does NOT clamp HERE,
    # field.py:195-196, and torch.exp overflows identically — latent
    # upstream hazard, see PARITY.md).
    cov_diag = 0.6 * sqradius * jax.nn.relu(1.0 - directions * directions)
    _, emb, _ = get_density(params, mean, cov_diag, cfg)
    return get_low(params, emb, True, cfg)


def get_reflection(directions: jax.Array, normals: jax.Array):
    """Mirror reflection + n.d (reference field.py:203-207)."""
    n_dot_d = jnp.sum(directions * normals, axis=-1, keepdims=True)
    reflections = directions - 2.0 * n_dot_d * normals
    return normalize(reflections), n_dot_d


def num_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
