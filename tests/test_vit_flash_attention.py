"""ViT flash-attention path vs the XLA einsum path (interpret mode on CPU).

The ViTBlock attention core (`nn/vit.py::_attention`) dispatches to the
Pallas TPU flash kernel on TPU ("auto"). The kernel never materializes the
(n, n) score matrix, and non-lane-aligned token counts (577 at the CLIPort
336px/patch-14 shape) are padded to a multiple of 128 with the pad tokens
masked off via SegmentIds — these tests pin that the masked-pad softmax
equals the unpadded XLA softmax, in interpret mode so they run on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import textocvp_tpu.nn.vit as vit_mod
from textocvp_tpu.nn.vit import ViTEncoder, _attention


@pytest.fixture(autouse=True)
def _restore_impl():
    prev = vit_mod._ATTENTION_IMPL
    yield
    vit_mod._ATTENTION_IMPL = prev


def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("n_tokens", [128, 150])
def test_flash_attention_matches_xla(n_tokens):
    # n=150 exercises the pad-to-lane + SegmentIds masking branch
    key = jax.random.PRNGKey(0)
    b, h, dh = 2, 4, 64
    q, k, v = (
        jax.random.normal(kk, (b, h, n_tokens, dh), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    vit_mod._ATTENTION_IMPL = "xla"
    ref = _attention(q, k, v, dh ** -0.5, jnp.float32)
    vit_mod._ATTENTION_IMPL = "flash"
    with _interpret_mode():
        out = _attention(q, k, v, dh ** -0.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_vit_encoder_flash_matches_xla_end_to_end():
    model = ViTEncoder(img_size=56, patch_size=14, embed_dim=64, depth=2,
                       num_heads=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    vit_mod._ATTENTION_IMPL = "xla"
    ref = model.apply(params, x)
    vit_mod._ATTENTION_IMPL = "flash"
    with _interpret_mode():
        out = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_auto_falls_back_to_xla_off_tpu():
    # on the CPU test platform "auto" must not touch the Pallas kernel
    assert jax.devices()[0].platform == "cpu"
    model = ViTEncoder(img_size=28, patch_size=14, embed_dim=32, depth=1,
                       num_heads=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    vit_mod._ATTENTION_IMPL = "auto"
    out = model.apply(params, x)
    assert np.all(np.isfinite(np.asarray(out)))
