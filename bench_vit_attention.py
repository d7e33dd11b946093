"""A/B probe: XLA einsum attention vs Pallas TPU flash attention inside the
frozen ViT-B/14 encode at the CLIPort protocol shape (16 frames, 336px,
577 tokens, bf16).

Motivation (docs/PERFORMANCE.md "CLIPort eval step breakdown"): the ViT
encode sustains ~67 TFLOPS — the attention matrices (B*h*577^2 bf16 = 128 MB
per block, written+read twice through 12 blocks ~ 6 GB of HBM traffic per
step) are the structural gap the MXU can't hide. Flash attention keeps the
score tiles in VMEM and never materializes them.

577 is not lane-aligned, so the flash arm pads tokens to 640 and masks the
pad via SegmentIds (pad keys get a segment of their own -> softmax over the
real 577 keys only; padded query rows are sliced off). Both arms run in ONE
process, interleaved windows (tunnel drift).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

from bench_common import time_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=336)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tuned", action="store_true",
                    help="add a flash arm with full-row block sizes "
                         "(block_q=block_k=640 at the 577-token shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from textocvp_tpu.nn.vit import VIT_CONFIGS, ViTEncoder

    print(f"devices: {jax.devices()}", file=sys.stderr)
    dtype = jnp.dtype(args.dtype)
    cfg = VIT_CONFIGS["vit_base_patch14_dinov2"]
    model = ViTEncoder(img_size=args.img, dtype=dtype, **cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.batch, args.img, args.img, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)

    import textocvp_tpu.nn.vit as vit_mod

    results = {}
    numeric = {}
    params = jax.device_put(params)
    x = jax.device_put(x)
    arms = ("xla", "flash", "flash_tuned") if args.tuned else ("xla", "flash")
    for arm in arms:
        vit_mod._ATTENTION_IMPL = arm
        # params stay jit ARGUMENTS: baking 86M fp32 constants into the HLO
        # overflows the remote-compile request body (HTTP 413)
        fn = jax.jit(lambda p, xx: model.apply(p, xx))
        out = fn(params, x)
        numeric[arm] = jax.device_get(out).astype("float32")
        dt = time_windows(lambda i: fn(params, x), lambda o: float(o[0, 0, 0]),
                          args.iters, windows=args.windows)
        ms = 1000 * dt / args.iters
        results[arm] = round(ms, 2)
        print(f"{arm:>6}: {ms:8.2f} ms", file=sys.stderr)
    vit_mod._ATTENTION_IMPL = "auto"

    import numpy as np

    diff = float(np.max(np.abs(numeric["xla"] - numeric["flash"])))
    scale = float(np.max(np.abs(numeric["xla"])))
    print(json.dumps({
        "metric": f"vit_encode_attention_ab (B={args.batch}, {args.img}px, "
                  f"{args.dtype})",
        "ms": results, "max_abs_diff": diff, "out_scale": scale,
        "unit": "ms/encode",
    }))


if __name__ == "__main__":
    main()
