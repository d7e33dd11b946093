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


# --------------------------------------------------------- subpixel upconv


def test_subpixel_upconv_matches_upsample_then_conv():
    """subpixel_upconv3x3 == conv3x3_same(upsample_nearest(x, 2)) exactly
    (up to float reassociation), including the zero-padded borders."""
    from flax import linen as nn

    from textocvp_tpu.nn.blocks import upsample_nearest
    from textocvp_tpu.nn.decoders import subpixel_upconv3x3

    for h, w, cin, cout, seed in [(7, 7, 5, 4, 0), (12, 9, 16, 8, 1),
                                  (24, 24, 32, 16, 2)]:
        conv = nn.Conv(cout, (3, 3), padding=1)
        x = jax.random.normal(jax.random.PRNGKey(seed), (2, h, w, cin))
        v = conv.init(jax.random.PRNGKey(seed + 10), x)
        ref = conv.apply(v, upsample_nearest(x, 2))
        out = subpixel_upconv3x3(x, v["params"]["kernel"],
                                 v["params"]["bias"], jnp.float32)
        assert out.shape == ref.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_mlp_patch_decoder_subpixel_equivalence():
    """The full MLPPatchDecoder with subpixel_upconv: identical params,
    identical outputs (feats/masks/images), identical BN-stat updates in
    train mode, identical gradients."""
    from textocvp_tpu.nn.decoders import MLPPatchDecoder

    cfg = dict(num_patches=36, in_dim=8, hidden_dim=32, out_dim=17,
               num_layers=3, initial_layer_norm=True, patch_size=14,
               num_layers_cnn=4, reconstruct_images=True, img_size=84)
    plain = MLPPatchDecoder(**cfg)
    fast = MLPPatchDecoder(**cfg, subpixel_upconv=True)
    slots = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8))
    v = plain.init({"params": jax.random.PRNGKey(1)}, slots, train=False)

    o1 = plain.apply(v, slots, train=False)
    o2 = fast.apply(v, slots, train=False)
    for k in ("recons_feats", "masks", "recons_imgs"):
        np.testing.assert_allclose(np.asarray(o2[k]), np.asarray(o1[k]),
                                   atol=2e-5, rtol=2e-5, err_msg=k)

    o1t, m1 = plain.apply(v, slots, train=True, mutable=["batch_stats"])
    o2t, m2 = fast.apply(v, slots, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o2t["recons_imgs"]),
                               np.asarray(o1t["recons_imgs"]),
                               atol=2e-5, rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5), m1, m2)

    def loss(params, mod):
        return jnp.sum(mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            slots, train=False)["recons_imgs"] ** 2)

    g1 = jax.grad(loss)(v["params"], plain)
    g2 = jax.grad(loss)(v["params"], fast)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4), g1, g2)


def test_mlp_patch_decoder_fused_slot_mix_equivalence():
    """fused_slot_mix: the final feature dense runs on slot-REDUCED rows
    (linearity of the softmax mix; same trick as decode_broadcast) —
    outputs and gradients must match the plain order, alone and composed
    with subpixel_upconv."""
    from textocvp_tpu.nn.decoders import MLPPatchDecoder

    cfg = dict(num_patches=36, in_dim=8, hidden_dim=32, out_dim=17,
               num_layers=3, initial_layer_norm=True, patch_size=14,
               num_layers_cnn=4, reconstruct_images=True, img_size=84)
    plain = MLPPatchDecoder(**cfg)
    slots = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8))
    v = plain.init({"params": jax.random.PRNGKey(1)}, slots, train=False)
    o1 = plain.apply(v, slots, train=False)

    for kw in ({"fused_slot_mix": True},
               {"fused_slot_mix": True, "subpixel_upconv": True}):
        mod = MLPPatchDecoder(**cfg, **kw)
        o2 = mod.apply(v, slots, train=False)
        for k in ("recons_feats", "masks", "recons_imgs"):
            np.testing.assert_allclose(
                np.asarray(o2[k]), np.asarray(o1[k]), atol=3e-5, rtol=3e-5,
                err_msg=f"{kw}:{k}")

    def loss(params, mod):
        return jnp.sum(mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            slots, train=False)["recons_imgs"] ** 2)

    both = MLPPatchDecoder(**cfg, fused_slot_mix=True, subpixel_upconv=True)
    g1 = jax.grad(loss)(v["params"], plain)
    g2 = jax.grad(loss)(v["params"], both)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4), g1, g2)
