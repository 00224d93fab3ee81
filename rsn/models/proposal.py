"""Optional proposal-network sampling (the "proposal_networks" group).

The reference configures an Adam group named "proposal_networks"
(reflect_sampling_nerf_config.py:44-48) that binds NO parameters, and
imports the CUDA occupancy-grid library nerfacc without ever using it
(SURVEY.md §2.3).  rsn keeps that default (off), but also provides a
working TPU-native sample-placement accelerator in the spirit of
mip-NeRF-360 / nerfacto proposal sampling:

- a small density-only proposal field (8-octave IPE -> 4x64 MLP,
  ~22k params, ~50x cheaper per sample than the main trunk) replaces
  the main field in the coarse pass; the fine pass PDF-resamples from
  its weights and everything downstream (reflected passes, losses)
  is unchanged;
- the proposal field trains against the mip-NeRF-360 interlevel loss
  (its histogram must upper-bound the fine pass's), computed with the
  same gather-free prefix-max / suffix-min reductions as the PDF
  sampler (rsn/core/sampling.py) — no searchsorted, no take_along_axis.

Enabled with --pipeline.model.use-proposal; a deliberate deviation from
the reference's method (the coarse-pass rgb/normal losses do not exist
in this mode), provided as an acceleration option, not the default.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from rsn.core import rays as rays_lib
from rsn.core.contract import contract_blob
from rsn.core.encodings import ipe_encode
from rsn.models.field import _linear_init

Params = Dict[str, Any]

PROP_NUM_FREQS = 8
PROP_MAX_FREQ_EXP = 8.0
PROP_IN_DIM = 3 * 2 * PROP_NUM_FREQS + 3  # 51
PROP_WIDTH = 64
PROP_LAYERS = 4
PROP_DENSITY_BIAS = 0.5  # same shift as the main field


def init_proposal_params(key: jax.Array) -> Params:
    keys = jax.random.split(key, PROP_LAYERS + 1)
    trunk = []
    for i in range(PROP_LAYERS):
        d_in = PROP_IN_DIM if i == 0 else PROP_WIDTH
        trunk.append(_linear_init(keys[i], d_in, PROP_WIDTH))
    return {"trunk": trunk,
            "density": _linear_init(keys[-1], PROP_WIDTH, 1)}


def proposal_density(params: Params, ray_samples) -> jax.Array:
    """(R, S) frusta -> (R, S, 1) density from the small proposal field.

    Shares the main field's geometry pipeline: factored Gaussian blob ->
    mip-360 contraction -> IPE (8 octaves) -> MLP -> softplus(+bias).
    """
    blob = rays_lib.get_gaussian_blob(ray_samples)
    mean, cov_diag = contract_blob(blob)
    enc = ipe_encode(mean, cov_diag=cov_diag, num_freqs=PROP_NUM_FREQS,
                     max_freq_exp=PROP_MAX_FREQ_EXP)
    batch_shape = enc.shape[:-1]
    h = enc.reshape(-1, enc.shape[-1])  # 2D matmuls (layout, see field.py)
    for layer in params["trunk"]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    preact = h @ params["density"]["w"] + params["density"]["b"]
    density = jax.nn.softplus(preact + PROP_DENSITY_BIAS)
    return density.reshape(*batch_shape, 1)


def distortion_per_ray(w: jax.Array, bins: jax.Array) -> jax.Array:
    """mip-NeRF-360 distortion regularizer, per ray, O(S) via cumsums.

    L(w, s) = sum_ij w_i w_j |u_i - u_j| + (1/3) sum_i w_i^2 (s_{i+1}-s_i)
    with u the spacing-domain bin midpoints — penalizes weight spread
    along the ray (floaters / fog), concentrating mass into one compact
    interval.  The pairwise term folds into exclusive prefix sums:
        sum_ij w_i w_j |u_i-u_j| = 2 sum_i w_i (u_i W_{<i} - (wu)_{<i}).

    Used (opt-in, distortion_loss_mult) with proposal-network sampling,
    where the reference's coarse-pass rgb/normal losses don't exist to
    regularize free space — a deliberate deviation documented in
    PARITY.md; OFF in the parity default.

    Args:
      w: (R, S, 1) LIVE fine-pass weights; bins: (R, S+1) spacing-domain
      edges.  Returns (R,) per-ray loss.
    """
    w = w[..., 0]
    u = 0.5 * (bins[..., 1:] + bins[..., :-1])
    dw = bins[..., 1:] - bins[..., :-1]
    w_before = jnp.cumsum(w, axis=-1) - w          # exclusive prefix
    wu_before = jnp.cumsum(w * u, axis=-1) - w * u
    loss_inter = 2.0 * jnp.sum(w * (u * w_before - wu_before), axis=-1)
    loss_intra = jnp.sum(w**2 * dw, axis=-1) / 3.0
    return loss_inter + loss_intra


def interlevel_loss(w_fine: jax.Array, bins_fine: jax.Array,
                    w_prop: jax.Array, bins_prop: jax.Array,
                    eps: float = 1e-7) -> jax.Array:
    """mip-NeRF-360 proposal loss (lossfun_outer), gather-free.

    For each fine histogram bin [lo, hi) (spacing domain), the proposal
    mass of the smallest envelope covering it is
        outer = cw[min{i: t_i >= hi}] - cw[max{i: t_i <= lo}]
    with cw the inclusive-prefix-sum of proposal weights over its own
    bins.  Both index lookups become reductions over a broadcast
    compare matrix because cw and the bin edges are sorted (the same
    trick as rsn.core.sampling.pdf_sample).  Loss (trains ONLY the
    proposal field — fine inputs are stop-gradient):
        mean_rays sum_j relu(w_fine_j - outer_j)^2 / (w_fine_j + eps)

    Args:
      w_fine: (R, Sf, 1) fine-pass weights; bins_fine: (R, Sf+1)
      spacing-domain edges; w_prop: (R, Sp, 1); bins_prop: (R, Sp+1).
    """
    w_fine = jax.lax.stop_gradient(w_fine[..., 0])  # (R, Sf)
    bins_fine = jax.lax.stop_gradient(bins_fine)
    bins_prop = jax.lax.stop_gradient(bins_prop)
    wp = w_prop[..., 0]  # (R, Sp) — the only live input
    cw = jnp.concatenate([jnp.zeros_like(wp[..., :1]),
                          jnp.cumsum(wp, axis=-1)], axis=-1)  # (R, Sp+1)

    lo = bins_fine[..., :-1]  # (R, Sf)
    hi = bins_fine[..., 1:]
    big = jnp.float32(2.0)  # cw <= ~1 + padding; bins in [0, 1]
    # cw at the largest prop edge <= lo: prefix-max over compare matrix
    le = bins_prop[..., None, :] <= lo[..., :, None]  # (R, Sf, Sp+1)
    cw_lo = jnp.max(jnp.where(le, cw[..., None, :], -big), axis=-1)
    # cw at the smallest prop edge >= hi: suffix-min
    ge = bins_prop[..., None, :] >= hi[..., :, None]
    cw_hi = jnp.min(jnp.where(ge, cw[..., None, :], big), axis=-1)
    # fine bins outside the proposal's range clamp to its end masses
    cw_lo = jnp.maximum(cw_lo, cw[..., :1])
    cw_hi = jnp.minimum(cw_hi, cw[..., -1:])
    outer = jnp.maximum(cw_hi - cw_lo, 0.0)

    excess = jax.nn.relu(w_fine - outer)
    return jnp.mean(jnp.sum(excess**2 / (w_fine + eps), axis=-1))
