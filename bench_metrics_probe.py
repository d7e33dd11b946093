"""Per-metric timing probe at the CLIPort eval metric shape.

The round-4 stage breakdown (docs/PERFORMANCE.md "CLIPort eval step
breakdown") put the fused PSNR+SSIM+LPIPS stage at 59.1 ms for 144 frames of
336x336x3 — single-digit sustained TFLOPS, the worst utilization of any
stage. This probe times each metric standalone (and the fused trio) with the
shared best-of-N-windows methodology so the dominant term is measured, not
guessed, before any optimization (reference formulation:
/root/reference/src/lib/metrics.py:145-306).

Usage: python bench_metrics_probe.py [--batch 16 --preds 9 --img 336]
"""

from __future__ import annotations

import argparse
import json
import sys

from bench_common import time_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--preds", type=int, default=9)
    ap.add_argument("--img", type=int, default=336)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train import metrics as M

    print(f"devices: {jax.devices()}", file=sys.stderr)
    b, f, s = args.batch, args.preds, args.img
    key = jax.random.PRNGKey(0)
    preds = jax.random.uniform(key, (b, f, s, s, 3), jnp.float32)
    targets = jax.random.uniform(jax.random.fold_in(key, 1),
                                 (b, f, s, s, 3), jnp.float32)
    lpips_fn = M.make_lpips_fn()

    # A-arms: the pre-round-4 formulations (depthwise-conv blur, two
    # half-batch AlexNet passes), inlined here so old-vs-new runs in ONE
    # process — cross-run comparisons drift ~2x on the tunneled runtime.
    def _filter2d_conv(x, kernel1d):
        c = x.shape[-1]
        kh = jnp.broadcast_to(kernel1d.reshape(-1, 1, 1, 1),
                              (kernel1d.shape[0], 1, 1, c))
        kw = jnp.broadcast_to(kernel1d.reshape(1, -1, 1, 1),
                              (1, kernel1d.shape[0], 1, c))
        dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1),
                                            ("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                         dimension_numbers=dn,
                                         feature_group_count=c)
        return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                            dimension_numbers=dn,
                                            feature_group_count=c)

    def ssim_conv(p, t):
        # the round-3 formulation: five separate depthwise blur pairs
        bb, ff = p.shape[:2]
        x = p.reshape((bb * ff,) + p.shape[2:]).astype(jnp.float32)
        y = t.reshape((bb * ff,) + t.shape[2:]).astype(jnp.float32)
        kernel = jnp.asarray(M._gaussian_kernel(11, 1.5))
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        mu_x = _filter2d_conv(x, kernel)
        mu_y = _filter2d_conv(y, kernel)
        mu_xx = _filter2d_conv(x * x, kernel)
        mu_yy = _filter2d_conv(y * y, kernel)
        mu_xy = _filter2d_conv(x * y, kernel)
        var_x = mu_xx - mu_x ** 2
        var_y = mu_yy - mu_y ** 2
        cov_xy = mu_xy - mu_x * mu_y
        ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
        return jnp.mean(ssim_map, axis=(1, 2, 3)).reshape(bb, ff)

    weights, _ = M.load_lpips_weights()

    def lpips_twopass(p, t):
        bb, ff = p.shape[:2]
        x = p.reshape((bb * ff,) + p.shape[2:]).astype(jnp.float32)
        y = t.reshape((bb * ff,) + t.shape[2:]).astype(jnp.float32)
        x = (2 * x - 1 - M._LPIPS_SHIFT) / M._LPIPS_SCALE
        y = (2 * y - 1 - M._LPIPS_SHIFT) / M._LPIPS_SCALE
        fx = M._alexnet_features(x, weights)
        fy = M._alexnet_features(y, weights)
        total = 0.0
        for i, (a, b_) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b_ = b_ / jnp.sqrt(jnp.sum(b_ * b_, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(a - b_)
            w = jnp.asarray(weights[f"lin{i}"])
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total.reshape(bb, ff)

    cases = {
        "psnr": jax.jit(M.psnr),
        "ssim_conv(old)": jax.jit(ssim_conv),
        "ssim": jax.jit(M.ssim),
        "lpips_2pass(old)": jax.jit(lpips_twopass),
        "lpips": jax.jit(lpips_fn),
        "fused_all3": jax.jit(lambda p, t: (M.psnr(p, t), M.ssim(p, t),
                                            lpips_fn(p, t))),
    }
    rows = {}
    for name, fn in cases.items():
        def run(i, fn=fn):
            return fn(preds, targets)

        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(leaf.sum())

        dt = time_windows(run, sync, args.iters, windows=args.windows)
        ms = 1000 * dt / args.iters
        rows[name] = round(ms, 2)
        print(f"{name:>12}: {ms:8.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": f"metrics_stage_probe (B={b}, p={f}, {s}px, fp32)",
        "ms": rows, "unit": "ms/call (144 frames)",
    }))


if __name__ == "__main__":
    main()
