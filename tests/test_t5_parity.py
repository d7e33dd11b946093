"""T5 encoder parity: our flax T5 stack vs a HuggingFace T5EncoderModel
constructed from config (random weights — no network needed), weights imported
via import_hf_t5_encoder."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from textocvp_tpu.nn.t5 import T5Config, T5EncoderStack, import_hf_t5_encoder


@pytest.fixture(scope="module")
def hf_and_flax():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="relu",
    )
    torch.manual_seed(14)
    hf_model = T5EncoderModel(hf_cfg).eval()

    cfg = T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                   num_layers=3, num_heads=4)
    flax_model = T5EncoderStack(config=cfg)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    params = {"params": import_hf_t5_encoder(sd, cfg)}
    return hf_model, flax_model, params


def test_t5_encoder_matches_hf(hf_and_flax, rng):
    hf_model, flax_model, params = hf_and_flax
    ids = rng.integers(2, 500, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()
    out = flax_model.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_t5_relative_bias_buckets():
    from textocvp_tpu.nn.t5 import relative_position_bucket

    rel = jnp.arange(-130, 131)
    buckets = np.asarray(relative_position_bucket(rel))
    assert buckets.min() >= 0 and buckets.max() < 32
    # symmetric structure: positive offsets land in the upper half
    assert (buckets[rel > 0] >= 16).all()
    assert (buckets[rel <= 0] < 16).all()
