"""Fast broadcast decode: ConvDecoder.decode_broadcast must match the naive
tile-and-convolve path exactly (up to float reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.config import build_exp_params
from textocvp_tpu.models import setup_model
from textocvp_tpu.nn.decoders import ConvDecoder


@pytest.mark.parametrize("kernel_size,upsample,res", [(5, 1, (16, 16)), (3, 2, (12, 12))])
def test_decode_broadcast_matches_naive(kernel_size, upsample, res):
    dec = ConvDecoder(hidden_dims=(8, 8), kernel_size=kernel_size, upsample=upsample,
                      out_channels=4)
    h, w = res
    d = 12
    slots = jax.random.normal(jax.random.PRNGKey(0), (6, d))
    pos_map = jax.random.normal(jax.random.PRNGKey(1), (h, w, d))
    x_naive = jnp.broadcast_to(slots[:, None, None, :], (6, h, w, d)) + pos_map[None]
    params = dec.init(jax.random.PRNGKey(2), x_naive)

    ref = dec.apply(params, x_naive)
    fast = dec.apply(params, slots, pos_map, res, method="decode_broadcast")
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_savi_fast_decode_matches_naive():
    exp_params = build_exp_params("SAVi", "CATER_Easy")
    mp = exp_params["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    model_fast = setup_model(exp_params)
    exp_params_slow = {**exp_params, "tpu": {**exp_params["tpu"], "fast_decode": False}}
    model_slow = setup_model(exp_params_slow)

    videos = jax.random.uniform(jax.random.PRNGKey(3), (2, 2, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    params = model_fast.init(rngs, videos)

    out_f = model_fast.apply(params, videos, rngs={"slots": jax.random.PRNGKey(2)})
    out_s = model_slow.apply(params, videos, rngs={"slots": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(out_f["recons_imgs"]),
                               np.asarray(out_s["recons_imgs"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["masks"]),
                               np.asarray(out_s["masks"]), rtol=1e-5, atol=1e-5)
