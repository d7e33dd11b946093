"""
Evaluation metrics in JAX: PSNR, SSIM and LPIPS, computed on-device inside the
jitted eval program (reference src/lib/metrics.py:145-306 via piqa).

All metric kernels take NHWC video tensors (B, F, H, W, C) in [0, 1] and
return framewise values (B, F); the host-side :class:`MetricTracker`
accumulates and aggregates mean + per-frame results and persists them in the
reference's results.json format.

Parity notes:
* PSNR: -10*log10(mse) over (C, H, W) per frame, value range 1 (piqa.psnr).
* SSIM: Gaussian window 11, sigma 1.5, k1=0.01, k2=0.03, VALID padding,
  per-channel maps averaged over space then channels (piqa.ssim defaults).
* LPIPS: AlexNet-feature metric (official LPIPS v0.1 formulation: input
  scaling layer, unit-normalized channel activations at the 5 ReLU taps,
  learned 1x1 weights, spatial mean, layer sum). Pretrained weights load from
  a local file (``TEXTOCVP_LPIPS_WEIGHTS``, .npz) — without it a deterministic
  random projection is used and results are marked non-comparable.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- PSNR


def psnr(preds: jax.Array, targets: jax.Array, value_range: float = 1.0) -> jax.Array:
    """Framewise PSNR: (B, F, H, W, C) -> (B, F)."""
    mse = jnp.mean(
        jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32)), axis=(-3, -2, -1)
    )
    return 10.0 * jnp.log10(value_range ** 2 / jnp.maximum(mse, 1e-10))


# --------------------------------------------------------------------------- SSIM


def _gaussian_kernel(window_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_valid(x: jax.Array, kernel1d: jax.Array) -> jax.Array:
    """Separable 2D valid-padding filter over (N, H, W, C)."""
    c = x.shape[-1]
    kh = kernel1d.reshape(-1, 1, 1, 1)
    kw = kernel1d.reshape(1, -1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.broadcast_to(kh, (kh.shape[0], 1, 1, c))
    kw = jnp.broadcast_to(kw, (1, kw.shape[1], 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x


def ssim(
    preds: jax.Array,
    targets: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    value_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Framewise SSIM: (B, F, H, W, C) -> (B, F)."""
    b, f = preds.shape[:2]
    x = preds.reshape((b * f,) + preds.shape[2:]).astype(jnp.float32)
    y = targets.reshape((b * f,) + targets.shape[2:]).astype(jnp.float32)
    kernel = jnp.asarray(_gaussian_kernel(window_size, sigma))

    c1 = (k1 * value_range) ** 2
    c2 = (k2 * value_range) ** 2
    # One 5C-group blur over [x, y, x^2, y^2, xy] stacked on the channel
    # axis instead of five separate blurs: same taps per channel (grouped
    # conv), a fifth of the conv dispatches and a wider innermost tile.
    z = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    mu = _filter2d_valid(z, kernel)
    c = x.shape[-1]
    mu_x, mu_y, mu_xx, mu_yy, mu_xy = (
        mu[..., i * c:(i + 1) * c] for i in range(5))

    var_x = mu_xx - mu_x ** 2
    var_y = mu_yy - mu_y ** 2
    cov_xy = mu_xy - mu_x * mu_y

    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3)).reshape(b, f)


# --------------------------------------------------------------------------- LPIPS

# Official LPIPS input scaling (lpips.ScalingLayer)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# AlexNet feature extractor: (out_channels, kernel, stride, padding, pre_pool)
_ALEX_LAYERS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def _default_lpips_weights(seed: int = 14) -> dict:
    """Deterministic random AlexNet + linear head. NOT pretrained — used only
    to keep the pipeline runnable without weight files."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _, _) in enumerate(_ALEX_LAYERS):
        fan_in = in_ch * k * k
        params[f"conv{i}_kernel"] = (
            rng.standard_normal((k, k, in_ch, out_ch)) / np.sqrt(fan_in)
        ).astype(np.float32)
        params[f"conv{i}_bias"] = np.zeros((out_ch,), dtype=np.float32)
        params[f"lin{i}"] = np.abs(
            rng.standard_normal((out_ch,)).astype(np.float32)
        ) / out_ch
        in_ch = out_ch
    return params


def load_lpips_weights(path: Optional[str] = None) -> tuple[dict, bool]:
    """Load LPIPS weights from an .npz file; fall back to the deterministic
    random head. Returns (params, pretrained)."""
    path = path or os.environ.get("TEXTOCVP_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        data = np.load(path)
        return {k: data[k] for k in data.files}, True
    return _default_lpips_weights(), False


def _alexnet_features(x: jax.Array, params: dict) -> list[jax.Array]:
    feats = []
    dn = ("NHWC", "HWIO", "NHWC")
    for i, (_, _, stride, pad, pre_pool) in enumerate(_ALEX_LAYERS):
        if pre_pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
        kernel = jnp.asarray(params[f"conv{i}_kernel"])
        dnums = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, dn)
        x = jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=dnums
        )
        x = x + jnp.asarray(params[f"conv{i}_bias"])
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def make_lpips_fn(weights: Optional[dict] = None) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Build a framewise LPIPS function (B, F, H, W, C) -> (B, F)."""
    if weights is None:
        weights, _ = load_lpips_weights()

    def lpips_fn(preds, targets):
        b, f = preds.shape[:2]
        x = preds.reshape((b * f,) + preds.shape[2:]).astype(jnp.float32)
        y = targets.reshape((b * f,) + targets.shape[2:]).astype(jnp.float32)
        # AlexNet's stride-4 + pooling stack needs >=32px of spatial extent;
        # smaller inputs collapse to empty feature maps (NaN means). Upsample
        # degenerate sizes — real datasets (64/336px) are unaffected.
        if x.shape[1] < 32 or x.shape[2] < 32:
            h = max(32, x.shape[1])
            w = max(32, x.shape[2])
            x = jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")
            y = jax.image.resize(y, (y.shape[0], h, w, y.shape[3]), "bilinear")
        # [0,1] -> [-1,1] -> scaling layer
        x = (2 * x - 1 - _LPIPS_SHIFT) / _LPIPS_SCALE
        y = (2 * y - 1 - _LPIPS_SHIFT) / _LPIPS_SCALE
        # Two half-batch AlexNet passes, NOT one concatenated pass: the A/B
        # (bench_metrics_probe.py) measured the batched variant neutral to
        # slightly worse — the concat materializes an extra 2x190 MB HBM
        # copy and the convs were already MXU-tiled at half batch.
        fx = _alexnet_features(x, weights)
        fy = _alexnet_features(y, weights)
        total = 0.0
        for i, (a, b_) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b_ = b_ / jnp.sqrt(jnp.sum(b_ * b_, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(a - b_)
            w = jnp.asarray(weights[f"lin{i}"])
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total.reshape(b, f)

    return lpips_fn


# ---------------------------------------------------------------- MetricTracker


class MetricTracker:
    """Accumulate framewise metric values and aggregate mean + per-frame
    results (reference metrics.py:15-144)."""

    METRICS = ("psnr", "ssim", "lpips")

    def __init__(self, metrics=("psnr", "ssim", "lpips"), lpips_weights: Optional[dict] = None,
                 lpips_pretrained: Optional[bool] = None):
        for m in metrics:
            if m not in self.METRICS:
                raise NameError(f"Unknown metric {m!r}. Use one of {self.METRICS}")
        self.metrics = tuple(metrics)
        self._lpips = None
        self.lpips_comparable = None
        if "lpips" in metrics:
            if lpips_weights is None:
                lpips_weights, pretrained = load_lpips_weights()
            else:
                # explicit weights are trusted unless the caller says otherwise
                pretrained = True if lpips_pretrained is None else lpips_pretrained
            self.lpips_comparable = bool(pretrained)
            self._lpips = make_lpips_fn(lpips_weights)
            if not self.lpips_comparable:
                import warnings

                warnings.warn(
                    "LPIPS is using the deterministic RANDOM AlexNet fallback — "
                    "values are NOT comparable to the reference (piqa/AlexNet "
                    "pretrained). Export real weights with "
                    "scripts/export_lpips_weights.py and point "
                    "TEXTOCVP_LPIPS_WEIGHTS at the .npz. results.json will carry "
                    "'lpips_comparable': false.",
                    stacklevel=2,
                )
        self.reset()

    def reset(self):
        self.values = {m: [] for m in self.metrics}
        self.results = {}

    def compute(self, preds, targets) -> dict:
        """Framewise metrics for one batch; jit-safe (pure function of inputs)."""
        out = {}
        if "psnr" in self.metrics:
            out["psnr"] = psnr(preds, targets)
        if "ssim" in self.metrics:
            out["ssim"] = ssim(preds, targets)
        if "lpips" in self.metrics:
            out["lpips"] = self._lpips(preds, targets)
        return out

    def accumulate(self, preds=None, targets=None, precomputed: Optional[dict] = None):
        vals = precomputed if precomputed is not None else self.compute(preds, targets)
        for m in self.metrics:
            self.values[m].append(np.asarray(vals[m]))

    def aggregate(self) -> dict:
        for m in self.metrics:
            if not self.values[m]:
                continue
            all_vals = np.concatenate(self.values[m], axis=0)  # (N, F)
            self.results[m] = {
                "mean": float(all_vals.mean()),
                "framewise": [float(v) for v in all_vals.mean(axis=0)],
            }
        return self.results

    def summary(self) -> dict:
        if not self.results:
            self.aggregate()
        return self.results

    def to_json(self) -> dict:
        res = {}
        for m, v in self.summary().items():
            res[m] = {
                "mean": round(v["mean"], 5),
                "framewise": [round(x, 5) for x in v["framewise"]],
            }
        if "lpips" in res and self.lpips_comparable is not None:
            # honest marker: a random-AlexNet fallback produces lpips values
            # that LOOK real; downstream must be able to tell them apart
            res["lpips"]["comparable"] = self.lpips_comparable
        return res
