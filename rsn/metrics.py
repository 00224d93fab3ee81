"""Image metrics: PSNR / SSIM in JAX, LPIPS gated on weight availability.

Rebuilds the reference's metric stack (reflect_sampling_nerf_model.py:
130-132, 468-480): PSNR(data_range=1), SSIM (gaussian 11x11 sigma 1.5,
k1=.01 k2=.02? — torchmetrics defaults k1=0.01, k2=0.03), LPIPS(VGG16,
normalize=True).  LPIPS requires pretrained VGG weights which cannot be
downloaded in this zero-egress environment; `lpips()` returns None when
unavailable and eval reports omit the key (documented deviation).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio over the whole image batch."""
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def ssim(pred: jax.Array, gt: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Structural similarity, gaussian-windowed, channels averaged.

    pred/gt: (H, W, C) in [0, data_range].  Matches the standard Wang
    et al. formulation used by torchmetrics
    structural_similarity_index_measure (gaussian_kernel=True defaults).
    """
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)

    def blur(img):  # separable gaussian, valid padding, per channel
        x = jnp.transpose(img, (2, 0, 1))[:, None]  # (C,1,H,W)
        kh = kern.reshape(1, 1, -1, 1)
        kw = kern.reshape(1, 1, 1, -1)
        # Precision.HIGHEST: TPU convs default to bf16 passes, whose
        # ~1e-2 moment error swamps c2=9e-4 in the var cancellation
        # mu_pp - mu_p^2 — denominators go negative and window SSIM
        # explodes past 1 (observed fine_ssim 2.89 on a TPU eval).
        hi = jax.lax.Precision.HIGHEST
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                         precision=hi)
        x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                         precision=hi)
        return x[:, 0]  # (C, H', W')

    mu_p = blur(pred)
    mu_g = blur(gt)
    mu_pp = blur(pred * pred)
    mu_gg = blur(gt * gt)
    mu_pg = blur(pred * gt)
    var_p = mu_pp - mu_p**2
    var_g = mu_gg - mu_g**2
    cov = mu_pg - mu_p * mu_g
    num = (2 * mu_p * mu_g + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (var_p + var_g + c2)
    return jnp.mean(num / den)


_LPIPS_CACHE = {"checked": False, "fn": None}


def _lpips_weight_candidates():
    import os
    env = os.environ.get("RSN_LPIPS_WEIGHTS")
    cands = [env] if env else []
    cands += [
        os.path.expanduser("~/.cache/rsn/lpips_vgg.pth"),
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "weights", "lpips_vgg.pth"),
    ]
    return [c for c in cands if c]


def lpips(pred: np.ndarray, gt: np.ndarray) -> Optional[float]:
    """LPIPS(VGG16, normalize=True) — reference model.py:132,471.

    Resolution order:
    1. native JAX implementation (rsn.lpips) with weights from
       $RSN_LPIPS_WEIGHTS, ~/.cache/rsn/lpips_vgg.pth, or
       <repo>/weights/lpips_vgg.pth (torchvision vgg16 features +
       lpips lin heads in one torch checkpoint);
    2. host torch with a locally cached torchvision vgg16 (UNWEIGHTED
       feature distance — not true LPIPS, kept as a last resort);
    3. None (metric omitted) — nothing can be downloaded here.

    pred/gt: (H, W, 3) float in [0,1] (normalize=True semantics).
    """
    if not _LPIPS_CACHE["checked"]:
        _LPIPS_CACHE["checked"] = True
        from rsn import lpips as lpips_lib
        for cand in _lpips_weight_candidates():
            params = lpips_lib.load_torch_weights(cand)
            if params is not None:
                dist = jax.jit(lambda a, b: lpips_lib.lpips_distance(
                    params, a, b, normalize=True))
                _LPIPS_CACHE["fn"] = lambda a, b: float(
                    dist(jnp.asarray(a), jnp.asarray(b)))
                break
    if _LPIPS_CACHE["fn"] is None and not _LPIPS_CACHE.get("torch_checked"):
        _LPIPS_CACHE["torch_checked"] = True
        try:
            import torch
            from torchvision.models import vgg16
            net = vgg16(weights="IMAGENET1K_V1").features.eval()

            def fn(a, b):
                layers = {3, 8, 15, 22, 29}  # relu1_2..relu5_3 boundaries
                mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
                std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

                def feats(x):
                    x = (x - mean) / std
                    out = []
                    for i, m in enumerate(net):
                        x = m(x)
                        if i in layers:
                            out.append(x / (x.norm(dim=1, keepdim=True)
                                            + 1e-10))
                    return out

                ta = torch.from_numpy(a).permute(2, 0, 1)[None].float()
                tb = torch.from_numpy(b).permute(2, 0, 1)[None].float()
                with torch.no_grad():
                    d = sum(((fa - fb) ** 2).mean().item()
                            for fa, fb in zip(feats(ta), feats(tb)))
                return d

            _LPIPS_CACHE["fn"] = fn
        except Exception:
            _LPIPS_CACHE["fn"] = None
    f = _LPIPS_CACHE["fn"]
    return None if f is None else f(pred, gt)
