"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 variant,
implemented natively in JAX.

Rebuilds the metric the reference consumes via
``torchmetrics...LearnedPerceptualImagePatchSimilarity(normalize=True)``
(reflect_sampling_nerf_model.py:132,471).  The exact formula (Zhang et
al. 2018, as shipped by the `lpips` package / torchmetrics):

  x in [0,1]  --(normalize=True)-->  2x - 1
  scaling layer: (x - shift) / scale          (fixed constants)
  VGG16 features, slices ending at relu1_2, relu2_2, relu3_3,
  relu4_3, relu5_3
  per slice: unit-normalize channels (eps 1e-10), squared difference,
  learned 1x1 "lin" conv (1 output channel, no bias), spatial mean
  LPIPS = sum over the 5 slices

Weights are NOT bundled (zero-egress environment): `load_torch_weights`
reads a torch checkpoint containing torchvision-vgg16 `features.N.*`
conv weights and/or `lpips`-package `linN.model.1.weight` heads (the
torchmetrics state-dict naming `net.sliceN.M.*` / `lin.N.model.1.*` is
also understood).  Architecture correctness is locked by
tests/test_lpips.py against an independent torch transcription with
random weights, so supplying a real weight file is the only remaining
step to full metric parity.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 .features layout: conv indices and the relu indices
# after which LPIPS taps its 5 slices
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG16_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                  512, 512, 512)
# pooling happens before convs 2, 4, 7, 10 (features idx 4, 9, 16, 23)
POOL_BEFORE_CONV = (2, 4, 7, 10)
# slice boundaries: LPIPS taps after relu of convs 1, 3, 6, 9, 12
SLICE_AFTER_CONV = (1, 3, 6, 9, 12)
LIN_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

Params = Dict[str, Any]


def init_lpips_params(key: jax.Array) -> Params:
    """Random-weight init (for architecture tests; NOT a usable metric).

    Shapes match torchvision vgg16 convs ((out, in, 3, 3)) and the
    lpips lin heads ((C,)); lin weights are made positive like the
    trained ones (they act as per-channel importances)."""
    convs: List[Dict[str, jax.Array]] = []
    in_ch = 3
    for i, out_ch in enumerate(VGG16_CHANNELS):
        key, kw, kb = jax.random.split(key, 3)
        convs.append({
            "w": jax.random.normal(kw, (out_ch, in_ch, 3, 3)) * 0.1,
            "b": jax.random.normal(kb, (out_ch,)) * 0.1,
        })
        in_ch = out_ch
    lins = []
    for c in LIN_CHANNELS:
        key, kl = jax.random.split(key)
        lins.append(jnp.abs(jax.random.normal(kl, (c,))) * 0.1)
    return {"convs": convs, "lins": lins}


def _features(params: Params, x: jax.Array) -> List[jax.Array]:
    """x: (N, 3, H, W) already scaled -> list of 5 slice activations."""
    feats = []
    for i, conv in enumerate(params["convs"]):
        if i in POOL_BEFORE_CONV:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + conv["b"][None, :, None, None])
        if i in SLICE_AFTER_CONV:
            feats.append(x)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


def lpips_distance(params: Params, img0: jax.Array, img1: jax.Array,
                   normalize: bool = True) -> jax.Array:
    """LPIPS between two (H, W, 3) images.

    normalize=True: inputs are in [0, 1] (the reference's setting);
    False: already in [-1, 1].
    """
    def prep(im):
        x = jnp.transpose(im, (2, 0, 1))[None].astype(jnp.float32)
        if normalize:
            x = 2.0 * x - 1.0
        return (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)

    f0 = _features(params, prep(img0))
    f1 = _features(params, prep(img1))
    total = jnp.float32(0.0)
    for a, b, lin in zip(f0, f1, params["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # (1,C,H,W)
        val = jnp.sum(d * lin[None, :, None, None], axis=1)  # 1x1 lin conv
        total = total + jnp.mean(val)
    return total


# ------------------------------------------------------------- weights

def load_torch_weights(path: str) -> Optional[Params]:
    """Load LPIPS weights from a torch checkpoint on disk.

    Accepts any of (each optionally nested under one or two ``net.``
    prefixes — the lpips package stores VGG as ``self.net``, and
    torchmetrics wraps the whole lpips module as ``self.net`` again, so
    its keys are ``net.net.sliceS.N.*`` / ``net.linN.model.1.weight``):
    - torchvision vgg16 keys ``features.N.weight/bias`` plus lpips
      heads ``linN.model.1.weight`` / ``lins.N.model.1.weight`` /
      ``linN.weight``;
    - lpips/torchmetrics slice naming ``sliceS.N.weight/bias`` (N is
      the global torchvision feature index — the lpips package keeps
      it when it splits features into slices).
    Returns None if torch or the file is unavailable.
    """
    import os
    if not os.path.exists(path):
        return None
    try:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return None
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def find(*names):
        for n in names:
            for p in ("", "net.", "net.net."):
                if p + n in sd:
                    return sd[p + n]
        return None

    # conv weights: torchvision features.N or torchmetrics net.sliceS.N
    # (slice-local indices restart per slice; rebuild the global order)
    slice_of_conv = []
    for ci in range(len(VGG16_CONV_IDX)):
        slice_of_conv.append(
            sum(1 for b in SLICE_AFTER_CONV if b < ci) + 1)
    convs = []
    for ci, fi in enumerate(VGG16_CONV_IDX):
        s = slice_of_conv[ci]
        w = find(f"features.{fi}.weight", f"slice{s}.{fi}.weight")
        b = find(f"features.{fi}.bias", f"slice{s}.{fi}.bias")
        if w is None or b is None:
            return None
        convs.append({"w": jnp.asarray(w, jnp.float32),
                      "b": jnp.asarray(b, jnp.float32)})
    lins = []
    for li, c in enumerate(LIN_CHANNELS):
        w = find(f"lin{li}.model.1.weight", f"lins.{li}.model.1.weight",
                 f"lin{li}.weight")
        if w is None:
            return None
        w = np.asarray(w, np.float32).reshape(-1)
        if w.shape != (c,):
            return None
        lins.append(jnp.asarray(w))
    return {"convs": convs, "lins": lins}


def export_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of load_torch_weights (torchvision + lpips naming) —
    lets tests round-trip random weights through the loader."""
    out: Dict[str, np.ndarray] = {}
    for ci, fi in enumerate(VGG16_CONV_IDX):
        out[f"features.{fi}.weight"] = np.asarray(params["convs"][ci]["w"])
        out[f"features.{fi}.bias"] = np.asarray(params["convs"][ci]["b"])
    for li, lin in enumerate(params["lins"]):
        out[f"lin{li}.model.1.weight"] = np.asarray(lin).reshape(
            1, -1, 1, 1)
    return out
