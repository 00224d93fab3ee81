"""LPIPS weight-file tooling for rsn.

The reference computes LPIPS-VGG at eval through torchmetrics
(reflect_sampling_nerf_model.py:132,471-479).  rsn's native JAX LPIPS
(rsn/lpips.py) loads the same weights from a single torch checkpoint at
$RSN_LPIPS_WEIGHTS / ~/.cache/rsn/lpips_vgg.pth / <repo>/weights/.
This environment has zero egress, so two subcommands:

  fixture  — write a DETERMINISTIC random-weights checkpoint (seeded
             init_lpips_params) in the exact torchvision+lpips naming
             the loader accepts.  Used by tests to drive the real
             weights-loading path end to end (rsn-eval ->
             eval.json["fine_lpips"]); NOT a perceptual metric.

  export   — the real recipe, for a machine WITH network: download
             torchvision VGG16 IMAGENET1K_V1 features and the lpips
             package's vgg lin heads, and merge them into one
             checkpoint.  Run:
                 python tools/lpips_weights.py export \
                     --out ~/.cache/rsn/lpips_vgg.pth

Usage:
    python tools/lpips_weights.py fixture --out /tmp/lpips_fixture.pth
    python tools/lpips_weights.py export --out ~/.cache/rsn/lpips_vgg.pth
"""
from __future__ import annotations

import argparse
import os
import sys


def write_fixture(out: str, seed: int = 0) -> str:
    import jax
    import torch

    from rsn import lpips as lpips_lib

    params = lpips_lib.init_lpips_params(jax.random.PRNGKey(seed))
    sd = {k: torch.from_numpy(v)
          for k, v in lpips_lib.export_torch_state_dict(params).items()}
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save(sd, out)
    return out


def write_export(out: str) -> str:
    """Real LPIPS-VGG weights (needs network: torchvision download +
    `pip install lpips`).  Merges:
    - vgg16(weights="IMAGENET1K_V1").features  -> features.N.weight/bias
    - lpips.LPIPS(net="vgg").linN.model.1.weight -> lin heads
    which is exactly what rsn.lpips.load_torch_weights consumes."""
    import torch
    from torchvision.models import vgg16

    sd = {}
    feats = vgg16(weights="IMAGENET1K_V1").features.state_dict()
    for k, v in feats.items():
        sd[f"features.{k}"] = v
    import lpips as lpips_pkg  # pip install lpips
    net = lpips_pkg.LPIPS(net="vgg")
    for li in range(5):
        sd[f"lin{li}.model.1.weight"] = net.lins[li].model[1].weight.data
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save(sd, out)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    f = sub.add_parser("fixture")
    f.add_argument("--out", required=True)
    f.add_argument("--seed", type=int, default=0)
    e = sub.add_parser("export")
    e.add_argument("--out", required=True)
    ns = p.parse_args(argv)
    if ns.cmd == "fixture":
        path = write_fixture(ns.out, ns.seed)
    else:
        path = write_export(ns.out)
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
