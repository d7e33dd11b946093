#!/usr/bin/env python
"""
Export LPIPS (AlexNet, v0.1) weights to the .npz format consumed by
textocvp_tpu.train.metrics (TEXTOCVP_LPIPS_WEIGHTS).

The reference computes LPIPS through piqa's pretrained AlexNet
(reference src/lib/metrics.py:259-298); for parity our JAX LPIPS needs the
same weights. This environment has no network egress and no lpips/torchvision
checkpoints on disk, so this tool is the artifact pipeline to run wherever the
weights ARE obtainable (any machine with torchvision/lpips cache or the .pth
files):

  # easiest: the `lpips` pip package bundles the linear heads and pulls the
  # torchvision AlexNet backbone
  python scripts/export_lpips_weights.py --out lpips_alex.npz

  # offline: from explicit .pth files
  python scripts/export_lpips_weights.py --out lpips_alex.npz \
      --alexnet-pth alexnet-owt-7be5be79.pth --lin-pth alex.pth

Then point the eval at it:

  TEXTOCVP_LPIPS_WEIGHTS=lpips_alex.npz python src/05_evaluate_predictor.py ...

results.json carries "lpips": {"comparable": true} once real weights load.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision alexnet.features conv layer indices feeding the 5 LPIPS taps
_ALEX_FEATURE_IDXS = (0, 3, 6, 8, 10)


def _convert(alex_sd: dict, lin_sd: dict) -> dict:
    """torch state dicts -> our flat npz layout (conv{i}_kernel HWIO,
    conv{i}_bias, lin{i} 1-D), matching metrics._ALEX_LAYERS."""
    out = {}
    for i, idx in enumerate(_ALEX_FEATURE_IDXS):
        w = np.asarray(alex_sd[f"features.{idx}.weight"])  # OIHW
        b = np.asarray(alex_sd[f"features.{idx}.bias"])
        out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"conv{i}_bias"] = b.astype(np.float32)

    for i in range(5):
        # lpips>=0.1 names: lins.{i}.model.1.weight; older: lin{i}.model.1.weight
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if key in lin_sd:
                w = np.asarray(lin_sd[key])  # (1, C, 1, 1)
                out[f"lin{i}"] = w.reshape(-1).astype(np.float32)
                break
        else:
            raise KeyError(f"linear head {i} not found in lin state dict "
                           f"(keys: {sorted(lin_sd)[:8]}...)")
    return out


def _from_lpips_package() -> tuple[dict, dict]:
    import lpips  # type: ignore
    import torch

    model = lpips.LPIPS(net="alex", version="0.1")
    sd = {k: v.detach().cpu() for k, v in model.state_dict().items()}
    # backbone keys look like net.slice1.0.weight ... remap to features.{idx}
    alex_sd = {}
    slice_base = {1: 0, 2: 3, 3: 6, 4: 8, 5: 10}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            s = int(k[len("net.slice")])
            local_idx = int(k.split(".")[2])
            kind = k.split(".")[-1]
            alex_sd[f"features.{slice_base[s] + local_idx}.{kind}"] = v
    lin_sd = {k: v for k, v in sd.items() if "lin" in k}
    del torch
    return alex_sd, lin_sd


def _from_pth(alexnet_pth: str, lin_pth: str) -> tuple[dict, dict]:
    import torch

    alex_sd = torch.load(alexnet_pth, map_location="cpu", weights_only=False)
    lin_sd = torch.load(lin_pth, map_location="cpu", weights_only=False)
    if hasattr(alex_sd, "state_dict"):
        alex_sd = alex_sd.state_dict()
    if hasattr(lin_sd, "state_dict"):
        lin_sd = lin_sd.state_dict()
    return alex_sd, lin_sd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--alexnet-pth", help="torchvision AlexNet state dict .pth")
    ap.add_argument("--lin-pth", help="LPIPS v0.1 linear-head state dict .pth")
    args = ap.parse_args(argv)

    if args.alexnet_pth and args.lin_pth:
        alex_sd, lin_sd = _from_pth(args.alexnet_pth, args.lin_pth)
    else:
        try:
            alex_sd, lin_sd = _from_lpips_package()
        except Exception as e:  # pragma: no cover - depends on environment
            print(f"Could not load via the lpips package ({e!r}).\n"
                  "Provide --alexnet-pth and --lin-pth instead.", file=sys.stderr)
            return 1

    np.savez(args.out, **_convert(alex_sd, lin_sd))
    print(f"Wrote {args.out}. Use it via TEXTOCVP_LPIPS_WEIGHTS={args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
