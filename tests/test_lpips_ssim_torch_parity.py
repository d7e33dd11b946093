"""Torch A/B proofs for the two metric paths the 1% parity budget rests on
(VERDICT r3 weak #5/#6):

* LPIPS — a hand-built torch module with torchvision's exact
  ``alexnet.features`` layout (the injected-module pattern proven for the ViT
  importer in test_reference_parity.py) runs the official LPIPS v0.1
  computation (reference src/lib/metrics.py:259-298 via piqa/lpips); its
  state_dict flows through scripts/export_lpips_weights.py::_convert and the
  JAX side (train/metrics.py::_alexnet_features / make_lpips_fn) must match
  the five ReLU tap outputs AND the final distances at random weights. This
  makes real-weight export layout-safe by construction: the conversion and
  every compute stage are execution-proven, only the weight values differ.

* SSIM — piqa's documented formulation (gaussian window 11 sigma 1.5, VALID
  padding, per-channel maps, per-image mean; reference
  src/lib/metrics.py:216-255) re-implemented in torch and pinned against
  train/metrics.py::ssim. piqa itself is uninstallable offline; this pins the
  intended-equivalence argument as an executable contract.
"""

import importlib.util
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from textocvp_tpu.train.metrics import (
    _LPIPS_SCALE,
    _LPIPS_SHIFT,
    _alexnet_features,
    _gaussian_kernel,
    make_lpips_fn,
    ssim,
)


def _load_export_tool():
    spec = importlib.util.spec_from_file_location(
        "export_lpips_weights",
        Path(__file__).resolve().parents[1] / "scripts" / "export_lpips_weights.py")
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    return tool


def _torchvision_alexnet_features() -> torch.nn.Sequential:
    """torchvision.models.alexnet().features, layer for layer (torchvision
    is absent in this image; the layout is the published AlexNet-OWT stack
    the LPIPS v0.1 backbone state dict is keyed by)."""
    return torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),    # 0
        torch.nn.ReLU(inplace=False),                                   # 1 tap
        torch.nn.MaxPool2d(kernel_size=3, stride=2),                    # 2
        torch.nn.Conv2d(64, 192, kernel_size=5, padding=2),             # 3
        torch.nn.ReLU(inplace=False),                                   # 4 tap
        torch.nn.MaxPool2d(kernel_size=3, stride=2),                    # 5
        torch.nn.Conv2d(192, 384, kernel_size=3, padding=1),            # 6
        torch.nn.ReLU(inplace=False),                                   # 7 tap
        torch.nn.Conv2d(384, 256, kernel_size=3, padding=1),            # 8
        torch.nn.ReLU(inplace=False),                                   # 9 tap
        torch.nn.Conv2d(256, 256, kernel_size=3, padding=1),            # 10
        torch.nn.ReLU(inplace=False),                                   # 11 tap
        torch.nn.MaxPool2d(kernel_size=3, stride=2),                    # 12
    )


_TAP_IDXS = (1, 4, 7, 9, 11)  # the five ReLU outputs LPIPS v0.1 taps


def _torch_taps(features: torch.nn.Sequential, x: torch.Tensor):
    taps = []
    for i, layer in enumerate(features):
        x = layer(x)
        if i in _TAP_IDXS:
            taps.append(x)
    return taps


def _scaling_layer(x01: torch.Tensor) -> torch.Tensor:
    """Official lpips.ScalingLayer on a [0,1] NCHW batch."""
    shift = torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1)
    return (2.0 * x01 - 1.0 - shift) / scale


@pytest.fixture(scope="module")
def alex_and_weights():
    torch.manual_seed(14)
    features = _torchvision_alexnet_features()
    # random but non-degenerate weights: scaled down so five stacked convs
    # keep activations O(1)
    with torch.no_grad():
        for m in features:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.2)
                m.bias.normal_(0, 0.05)
    alex_sd = {f"features.{k}": v for k, v in features.state_dict().items()}
    rng = np.random.default_rng(7)
    lin_sd = {
        f"lins.{i}.model.1.weight": np.abs(
            rng.standard_normal((1, c, 1, 1))).astype(np.float32) / c
        for i, c in enumerate((64, 192, 384, 256, 256))
    }
    tool = _load_export_tool()
    weights = tool._convert(alex_sd, lin_sd)
    return features, lin_sd, weights


def test_alexnet_feature_taps_match_torch(alex_and_weights):
    """_alexnet_features (JAX, NHWC, converted weights) == the torch stack's
    five ReLU tap outputs at <=1e-4, including the ScalingLayer transform."""
    features, _, weights = alex_and_weights
    rng = np.random.default_rng(3)
    x01 = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        xt = _scaling_layer(torch.from_numpy(x01).permute(0, 3, 1, 2))
        torch_taps = _torch_taps(features, xt)

    xj = (2.0 * jnp.asarray(x01) - 1.0 - _LPIPS_SHIFT) / _LPIPS_SCALE
    jax_taps = _alexnet_features(xj, weights)

    assert len(torch_taps) == len(jax_taps) == 5
    for i, (tt, jt) in enumerate(zip(torch_taps, jax_taps)):
        tt = tt.permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC
        assert tt.shape == jt.shape, f"tap {i}: {tt.shape} vs {jt.shape}"
        np.testing.assert_allclose(np.asarray(jt), tt, atol=1e-4, rtol=1e-4,
                                   err_msg=f"tap {i}")


def _torch_lpips(features, lin_sd, x01, y01):
    """The official LPIPS v0.1 distance (lpips.LPIPS.forward): scaling layer,
    unit-normalized channel activations (eps added to the norm), learned 1x1
    weights, spatial mean, layer sum."""
    def norm(t, eps=1e-10):
        n = torch.sqrt(torch.sum(t ** 2, dim=1, keepdim=True))
        return t / (n + eps)

    with torch.no_grad():
        fx = _torch_taps(features, _scaling_layer(x01))
        fy = _torch_taps(features, _scaling_layer(y01))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (norm(a) - norm(b)) ** 2
            w = torch.from_numpy(lin_sd[f"lins.{i}.model.1.weight"])
            total = total + F.conv2d(d, w).mean(dim=(2, 3)).squeeze(1)
    return total.numpy()


def test_lpips_distance_matches_torch(alex_and_weights):
    """make_lpips_fn over converted weights == the official torch LPIPS v0.1
    computation end to end at <=1e-4."""
    features, lin_sd, weights = alex_and_weights
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 3, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    ours = np.asarray(make_lpips_fn(weights)(jnp.asarray(x), jnp.asarray(y)))

    xt = torch.from_numpy(x.reshape(6, 64, 64, 3)).permute(0, 3, 1, 2)
    yt = torch.from_numpy(y.reshape(6, 64, 64, 3)).permute(0, 3, 1, 2)
    ref = _torch_lpips(features, lin_sd, xt, yt).reshape(2, 3)

    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)
    assert (ref > 0).all()  # non-degenerate comparison


# ----------------------------------------------------------------------- SSIM


def _torch_piqa_ssim(x01, y01, window_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """piqa's documented SSIM (reference src/lib/metrics.py:216-255 uses
    piqa.SSIM(window_size=11, sigma=1.5, value_range=1)): separable gaussian
    window, VALID padding, per-channel maps, mean over space and channels per
    image. Written against piqa's docs/source conventions — torch NCHW,
    grouped conv2d."""
    g = torch.from_numpy(_gaussian_kernel(window_size, sigma))
    c = x01.shape[1]
    kh = g.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
    kw = g.view(1, 1, 1, -1).repeat(c, 1, 1, 1)

    def filt(t):
        t = F.conv2d(t, kh, groups=c)
        return F.conv2d(t, kw, groups=c)

    c1, c2 = k1 ** 2, k2 ** 2
    mu_x, mu_y = filt(x01), filt(y01)
    sxx = filt(x01 * x01) - mu_x ** 2
    syy = filt(y01 * y01) - mu_y ** 2
    sxy = filt(x01 * y01) - mu_x * mu_y
    ss = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2))
    return ss.mean(dim=(1, 2, 3)).numpy()


def test_ssim_matches_piqa_formulation_torch():
    """train/metrics.py::ssim == the torch re-implementation of piqa's
    documented formulation at <=1e-5 (pins the SSIM convention risk out of
    the 1% parity budget — window shape, padding, averaging order)."""
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (2, 3, 32, 48, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.08, x.shape), 0, 1).astype(np.float32)

    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))

    with torch.no_grad():
        xt = torch.from_numpy(x.reshape(6, 32, 48, 3)).permute(0, 3, 1, 2)
        yt = torch.from_numpy(y.reshape(6, 32, 48, 3)).permute(0, 3, 1, 2)
        ref = _torch_piqa_ssim(xt, yt).reshape(2, 3)

    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)
    # identical images: exactly 1 under both conventions
    ones = np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))
    with torch.no_grad():
        ref1 = _torch_piqa_ssim(xt, xt).reshape(2, 3)
    np.testing.assert_allclose(ones, 1.0, atol=1e-5)
    np.testing.assert_allclose(ref1, 1.0, atol=1e-5)
