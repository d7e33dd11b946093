"""
Checkpoint-importer structural round-trip: synthetic state dicts with the
reference's exact parameter names/shapes convert into trees that match our
models' init trees leaf-for-leaf (names, shapes). This pins the importer
against both naming schemes without needing the released checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.config import add_predictor_params, build_exp_params
from textocvp_tpu.models import setup_model, setup_predictor
from textocvp_tpu.train.torch_import import convert_predictor, convert_savi


def _tree_structure(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {tuple(k.key for k in path): tuple(np.shape(v)) for path, v in flat}


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _ln_sd(rng, d):
    return {"weight": _rand(rng, d), "bias": _rand(rng, d)}


def _lin_sd(rng, o, i, bias=True):
    sd = {"weight": _rand(rng, o, i)}
    if bias:
        sd["bias"] = _rand(rng, o)
    return sd


def _prefix(prefix, tree):
    return {f"{prefix}.{k}": v for k, v in tree.items()}


def _mhsa_sd(rng, d):
    sd = {}
    for n in ("q", "k", "v"):
        sd.update(_prefix(n, _lin_sd(rng, d, d, bias=False)))
    sd.update(_prefix("out_projection.0", _lin_sd(rng, d, d, bias=False)))
    return sd


def _tblock_sd(rng, d, mlp):
    sd = {}
    sd.update(_prefix("attn", _mhsa_sd(rng, d)))
    sd.update(_prefix("mlp.0", _lin_sd(rng, mlp, d)))
    sd.update(_prefix("mlp.2", _lin_sd(rng, d, mlp)))
    sd.update(_prefix("layernorm_query", _ln_sd(rng, d)))
    sd.update(_prefix("layernorm_mlp", _ln_sd(rng, d)))
    return sd


def _sa_sd(rng, d_feats, d_slots, mlp):
    sd = {}
    sd.update(_prefix("norm_input", _ln_sd(rng, d_feats)))
    sd.update(_prefix("norm_slot", _ln_sd(rng, d_slots)))
    sd.update(_prefix("norm_mlp", _ln_sd(rng, d_slots)))
    sd.update(_prefix("to_q", _lin_sd(rng, d_slots, d_slots)))
    sd.update(_prefix("to_k", _lin_sd(rng, d_slots, d_feats)))
    sd.update(_prefix("to_v", _lin_sd(rng, d_slots, d_feats)))
    sd.update({
        "gru.weight_ih": _rand(rng, 3 * d_slots, d_slots),
        "gru.weight_hh": _rand(rng, 3 * d_slots, d_slots),
        "gru.bias_ih": _rand(rng, 3 * d_slots),
        "gru.bias_hh": _rand(rng, 3 * d_slots),
    })
    sd.update(_prefix("mlp.0", _lin_sd(rng, mlp, d_slots)))
    sd.update(_prefix("mlp.2", _lin_sd(rng, d_slots, mlp)))
    return sd


def tiny_savi_exp():
    params = build_exp_params("SAVi", "CATER_Easy")
    mp = params["model"]["model_params"]
    mp.update(num_slots=4, slot_dim=32, mlp_hidden=24, mlp_encoder_dim=32)
    mp["encoder"]["encoder_params"].update(num_channels=[16, 16], resolution=[32, 32],
                                           kernel_size=5)
    mp["decoder"]["decoder_params"].update(num_channels=[16, 16], resolution=[32, 32],
                                           kernel_size=5, upsample=1)
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 24}
    return params


def test_savi_import_structure(rng):
    exp_params = tiny_savi_exp()
    model = setup_model(exp_params)
    videos = jnp.zeros((1, 2, 32, 32, 3))
    init = model.init({"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
                      videos)

    sd = {}
    sd["initializer.slots_mu"] = _rand(rng, 1, 1, 32)
    sd["initializer.slots_sigma"] = _rand(rng, 1, 1, 32)
    sd.update(_prefix("transition_module", _tblock_sd(rng, 32, 24)))
    # conv encoder: 2 blocks 3->16->16, k5
    sd["encoder.encoder.0.block.0.weight"] = _rand(rng, 16, 3, 5, 5)
    sd["encoder.encoder.0.block.0.bias"] = _rand(rng, 16)
    sd["encoder.encoder.1.block.0.weight"] = _rand(rng, 16, 16, 5, 5)
    sd["encoder.encoder.1.block.0.bias"] = _rand(rng, 16)
    sd["encoder_pos_embedding.projection.weight"] = _rand(rng, 16, 4, 1, 1)
    sd["encoder_pos_embedding.projection.bias"] = _rand(rng, 16)
    sd.update(_prefix("encoder_mlp.0", _ln_sd(rng, 16)))
    sd.update(_prefix("encoder_mlp.1", _lin_sd(rng, 32, 16)))
    sd.update(_prefix("encoder_mlp.3", _lin_sd(rng, 32, 32)))
    sd["decoder_pos_embedding.projection.weight"] = _rand(rng, 32, 4, 1, 1)
    sd["decoder_pos_embedding.projection.bias"] = _rand(rng, 32)
    # conv decoder: blocks reversed (in 32 -> 16 -> 16), final conv 16->4 k3
    sd["decoder.decoder.0.block.0.weight"] = _rand(rng, 16, 32, 5, 5)
    sd["decoder.decoder.0.block.0.bias"] = _rand(rng, 16)
    sd["decoder.decoder.1.block.0.weight"] = _rand(rng, 16, 16, 5, 5)
    sd["decoder.decoder.1.block.0.bias"] = _rand(rng, 16)
    sd["decoder.decoder.2.weight"] = _rand(rng, 4, 16, 3, 3)
    sd["decoder.decoder.2.bias"] = _rand(rng, 4)
    sd.update(_prefix("slot_attention", _sa_sd(rng, 32, 32, 24)))

    converted = convert_savi(sd, exp_params["model"]["model_params"])
    assert _tree_structure(converted["params"]) == _tree_structure(init["params"])

    # converted params must run
    out = model.apply({"params": converted["params"]}, videos,
                      rngs={"slots": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["recons_imgs"])).all()


def _torch_encoder_layer_sd(rng, d, ff):
    sd = {}
    sd["self_attn.in_proj_weight"] = _rand(rng, 3 * d, d)
    sd["self_attn.in_proj_bias"] = _rand(rng, 3 * d)
    sd.update(_prefix("self_attn.out_proj", _lin_sd(rng, d, d)))
    sd.update(_prefix("linear1", _lin_sd(rng, ff, d)))
    sd.update(_prefix("linear2", _lin_sd(rng, d, ff)))
    sd.update(_prefix("norm1", _ln_sd(rng, d)))
    sd.update(_prefix("norm2", _ln_sd(rng, d)))
    return sd


def test_textocvp_customtf_import_structure(rng):
    exp_params = tiny_savi_exp()
    exp_params = add_predictor_params(exp_params, "TextOCVP_CustomTF")
    pp = exp_params["predictor"]["predictor_params"]
    pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=48, num_layers=2)
    pp["fusion_params"].update(num_heads=2, head_dim=8, mlp_size=48)
    pp["text_encoder_params"].update(input_dim=16, num_layers=1, num_heads=2,
                                     vocab_size=30)
    exp_params["prediction_params"].update(input_buffer_size=3)
    wrapper = setup_predictor(exp_params)

    hist = jnp.zeros((1, 1, 4, 32))
    text = jnp.ones((1, 5), jnp.int32)
    lengths = jnp.full((1,), 5, jnp.int32)
    init = wrapper.init(jax.random.PRNGKey(0), hist, caption_tokens=text,
                        caption_lengths=lengths)

    d, ff, head = 32, 48, 8
    sd = {}
    sd.update(_prefix("predictor.mlp_in", _lin_sd(rng, d, 32)))
    sd.update(_prefix("predictor.mlp_out", _lin_sd(rng, 32, d)))
    sd["predictor.pe.pe"] = _rand(rng, 1, 4, 1, d)  # (1, buffer+1, 1, d)
    for i in range(2):
        pre = f"predictor.predictor.{i}"
        sd.update(_prefix(f"{pre}.attn", _mhsa_sd(rng, d)))
        sd.update(_prefix(f"{pre}.mlp.0", _lin_sd(rng, ff, d)))
        sd.update(_prefix(f"{pre}.mlp.2", _lin_sd(rng, d, ff)))
        sd.update(_prefix(f"{pre}.layernorm_query", _ln_sd(rng, d)))
        sd.update(_prefix(f"{pre}.layernorm_mlp", _ln_sd(rng, d)))
        ca = f"{pre}.cross_attention"
        sd.update(_prefix(f"{ca}.ln_cross_att_q", _ln_sd(rng, d)))
        sd.update(_prefix(f"{ca}.ln_cross_att_kv", _ln_sd(rng, d)))
        sd.update(_prefix(f"{ca}.ln_mlp", _ln_sd(rng, d)))
        inner = head * 2
        sd.update(_prefix(f"{ca}.cross_attn.q", _lin_sd(rng, inner, d, bias=False)))
        sd.update(_prefix(f"{ca}.cross_attn.k", _lin_sd(rng, inner, d, bias=False)))
        sd.update(_prefix(f"{ca}.cross_attn.v", _lin_sd(rng, inner, d, bias=False)))
        sd.update(_prefix(f"{ca}.cross_attn.out_projection", _lin_sd(rng, d, inner)))
        sd.update(_prefix(f"{ca}.mlp.0", _lin_sd(rng, 48, d)))
        sd.update(_prefix(f"{ca}.mlp.2", _lin_sd(rng, d, 48)))
    te = "predictor.text_encoder"
    sd[f"{te}.token_embedding.weight"] = _rand(rng, 30, 16)
    sd[f"{te}.position_embedding.weight"] = _rand(rng, 50, 16)
    sd.update(_prefix(f"{te}.layer_norm", _ln_sd(rng, 16)))
    sd.update(_prefix(f"{te}.transformer.layers.0", _torch_encoder_layer_sd(rng, 16, 64)))
    sd.update(_prefix(f"{te}.text_out_projection.0", _ln_sd(rng, 16)))
    sd.update(_prefix(f"{te}.text_out_projection.1", _lin_sd(rng, d, 16)))

    converted = convert_predictor(sd, exp_params)
    assert _tree_structure(converted["params"]) == _tree_structure(init["params"])

    out = wrapper.apply({"params": converted["params"]}, hist, caption_tokens=text,
                        caption_lengths=lengths)
    assert np.isfinite(np.asarray(out)).all()


def test_vanilla_import_structure(rng):
    exp_params = tiny_savi_exp()
    exp_params = add_predictor_params(exp_params, "VanillaTransformer")
    exp_params["predictor"]["predictor_params"].update(
        token_dim=16, hidden_dim=32, num_layers=2, n_heads=2)
    exp_params["prediction_params"].update(input_buffer_size=3)
    wrapper = setup_predictor(exp_params)
    hist = jnp.zeros((1, 1, 4, 32))
    init = wrapper.init(jax.random.PRNGKey(0), hist)

    sd = {}
    sd.update(_prefix("predictor.mlp_in", _lin_sd(rng, 16, 32)))
    sd.update(_prefix("predictor.mlp_out", _lin_sd(rng, 32, 16)))
    for i in range(2):
        sd.update(_prefix(f"predictor.transformer_encoders.{i}",
                          _torch_encoder_layer_sd(rng, 16, 32)))
    converted = convert_predictor(sd, exp_params)
    assert _tree_structure(converted["params"]) == _tree_structure(init["params"])
