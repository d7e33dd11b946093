"""Native C++ image IO (textocvp_tpu/native): bit-exactness vs the PIL path.

The native resize reimplements PIL's fixed-point BILINEAR resample
(Pillow src/libImaging/Resample.c), so enabling the extension must not change
a single byte of what the loaders produce.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from textocvp_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native imgio extension not buildable here"
)


def _png_bytes(arr: np.ndarray, mode: str) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def _cases(rng):
    yield rng.integers(0, 256, (48, 64, 3), dtype=np.uint8), "RGB"
    yield rng.integers(0, 256, (65, 33, 3), dtype=np.uint8), "RGB"
    yield rng.integers(0, 256, (31, 31, 4), dtype=np.uint8), "RGBA"
    yield rng.integers(0, 256, (40, 56), dtype=np.uint8), "L"


def test_decode_matches_pil():
    rng = np.random.default_rng(0)
    for arr, mode in _cases(rng):
        data = _png_bytes(arr, mode)
        got = native.decode_png_rgb(data)
        want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert got is not None
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("out_hw", [(24, 24), (336, 336), (17, 91), (48, 64)])
def test_resize_bit_exact_with_pil_bilinear(out_hw):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    got = native.resize_bilinear_rgb(img, *out_hw)
    want = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    )
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_fused_decode_resize_bit_exact(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (50, 70, 3), dtype=np.uint8)
    data = _png_bytes(img, "RGB")
    got = native.decode_png_rgb_resized(data, 33, 21)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")
                      .resize((21, 33), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)
    assert native.png_size(data) == (50, 70)


def test_loader_path_identical_with_and_without_native(tmp_path, monkeypatch):
    """_load_image_resized must produce identical float arrays either way."""
    from textocvp_tpu.data import datasets

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)
    p = tmp_path / "frame.png"
    Image.fromarray(img).save(p)

    via_native = datasets._load_image_resized(str(p), (24, 32))
    monkeypatch.setenv("TEXTOCVP_NATIVE_IMGIO", "0")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    via_pil = datasets._load_image_resized(str(p), (24, 32))
    np.testing.assert_array_equal(via_native, via_pil)
    # int size = shorter-side semantics, both paths
    via_native_s = datasets._load_image_resized(str(p), 24)
    assert via_native_s.shape == (24, 32, 3)


def test_corrupt_png_returns_none():
    assert native.decode_png_rgb(b"not a png") is None
    assert native.png_size(b"\x89PNG\r\n\x1a\njunk") is None


def test_16bit_png_falls_back_to_pil(tmp_path):
    """PNGs that libpng would color-convert (16-bit, non-sRGB) must NOT take
    the native path — it returns None and the loader falls back to PIL,
    preserving the bit-exact invariant."""
    arr16 = (np.random.default_rng(9).integers(0, 65536, (20, 24))
             ).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr16, mode="I;16").save(buf, format="PNG")
    data = buf.getvalue()
    assert native.decode_png_rgb(data) is None
    assert native.decode_png_rgb_resized(data, 10, 12) is None

    # the loader still serves the file through the PIL fallback
    from textocvp_tpu.data import datasets

    p = tmp_path / "deep.png"
    p.write_bytes(data)
    out = datasets._load_image_resized(str(p), (10, 12))
    assert out.shape == (10, 12, 3)
