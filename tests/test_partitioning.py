"""Tensor-parallel partitioning tests on the (4, 2) CPU mesh: sharded
predictor forward matches the replicated forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.models.predictors import PredictorWrapper, TextOCVP
from textocvp_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding
from textocvp_tpu.parallel.partitioning import (
    predictor_param_specs,
    shard_predictor_params,
)

B, S, D = 4, 4, 16


def _predictor():
    return TextOCVP(
        num_slots=S, slot_dim=D, token_dim=32, n_heads=2, hidden_dim=64,
        num_layers=2, residual=True, input_buffer_size=3,
        fusion_num_heads=2, fusion_head_dim=16, fusion_mlp_size=64,
        text_encoder_type="custom_tf",
        text_encoder_params={"input_dim": 16, "num_layers": 1, "num_heads": 2,
                             "vocab_size": 30},
    )


def test_specs_target_large_matmuls():
    pred = _predictor()
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=2,
                               teacher_force=False, input_buffer_size=3)
    hist = jnp.zeros((B, 1, S, D))
    text = jnp.ones((B, 5), jnp.int32)
    lengths = jnp.full((B,), 5, jnp.int32)
    params = wrapper.init(jax.random.PRNGKey(0), hist, caption_tokens=text,
                          caption_lengths=lengths)["params"]
    specs = predictor_param_specs(params)
    blk = specs["predictor"]["block_0"]
    assert tuple(blk["attn"]["q"]["kernel"]) == (None, "model")
    assert tuple(blk["attn"]["out"]["kernel"]) == ("model", None)
    assert tuple(blk["mlp"]["Dense_0"]["kernel"]) == (None, "model")
    assert tuple(blk["mlp"]["Dense_1"]["kernel"]) == ("model", None)
    # norms stay replicated
    assert tuple(blk["ln_query"]["scale"]) == ()


def test_tp_sharded_rollout_matches_replicated():
    mesh = get_mesh(data=4, model=2)
    pred = _predictor()
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=4,
                               teacher_force=False, input_buffer_size=3)
    hist = jax.random.normal(jax.random.PRNGKey(1), (B, 1, S, D))
    text = jnp.ones((B, 5), jnp.int32)
    lengths = jnp.full((B,), 5, jnp.int32)
    variables = wrapper.init(jax.random.PRNGKey(0), hist, caption_tokens=text,
                             caption_lengths=lengths)

    fn = jax.jit(lambda v, h, t, l: wrapper.apply(v, h, caption_tokens=t,
                                                  caption_lengths=l))
    ref = fn(variables, hist, text, lengths)

    sharded_params = {"params": shard_predictor_params(variables["params"], mesh)}
    hist_s = jax.device_put(hist, batch_sharding(mesh))
    text_s = jax.device_put(text, batch_sharding(mesh))
    lengths_s = jax.device_put(lengths, batch_sharding(mesh))
    with mesh:
        out = fn(sharded_params, hist_s, text_s, lengths_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_t5_tp_sharded_rollout_matches_replicated():
    """The flagship T5 path under TP: Megatron-sharded predictor AND T5
    encoder kernels (q/k/v col, o row, wi col, wo row) on a (4, 2) mesh must
    reproduce the replicated rollout."""
    mesh = get_mesh(data=4, model=2)
    pred = TextOCVP(
        num_slots=S, slot_dim=D, token_dim=32, n_heads=2, hidden_dim=64,
        num_layers=2, residual=True, input_buffer_size=3,
        fusion_num_heads=2, fusion_head_dim=16, fusion_mlp_size=64,
        text_encoder_type="t5",
        text_encoder_params={"vocab_size": 64, "d_model": 32, "d_kv": 16,
                             "d_ff": 64, "num_layers": 2, "num_heads": 2},
    )
    wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=3,
                               teacher_force=False, input_buffer_size=3)
    hist = jax.random.normal(jax.random.PRNGKey(0), (B, 2, S, D))
    text = jnp.ones((B, 6), jnp.int32)
    masks = jnp.ones((B, 6), jnp.int32)
    params = wrapper.init(jax.random.PRNGKey(1), hist, caption_tokens=text,
                          attn_masks=masks)["params"]

    # T5 kernels must actually receive TP specs
    specs = predictor_param_specs(params)
    t5_layer = specs["predictor"]["text_encoder"]["layer_0"]
    assert tuple(t5_layer["attn"]["q"]["kernel"]) == (None, "model")
    assert tuple(t5_layer["attn"]["o"]["kernel"]) == ("model", None)
    assert tuple(t5_layer["wi"]["kernel"]) == (None, "model")
    assert tuple(t5_layer["wo"]["kernel"]) == ("model", None)

    rep = jax.device_put(params, replicated_sharding(mesh))
    with mesh:
        ref = jax.jit(lambda v: wrapper.apply(
            {"params": v}, hist, caption_tokens=text, attn_masks=masks))(rep)
    tp = shard_predictor_params(
        jax.device_put(params, replicated_sharding(mesh)), mesh)
    hist_s = jax.device_put(hist, batch_sharding(mesh))
    with mesh:
        out = jax.jit(lambda v, h: wrapper.apply(
            {"params": v}, h, caption_tokens=text, attn_masks=masks))(tp, hist_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pad_batch_keeps_metrics_exact():
    """Ragged batches pad to the data-axis multiple (staying sharded) and
    per-sample metric rows slice back exactly — no contamination from the
    repeated padding rows."""
    from textocvp_tpu.parallel.mesh import pad_batch, shard_batch
    from textocvp_tpu.train.metrics import psnr

    mesh = get_mesh(data=8, model=1)
    rng = np.random.default_rng(3)
    videos = rng.uniform(0, 1, (5, 2, 8, 8, 3)).astype(np.float32)
    text = {"caption_tokens": np.ones((5, 4), np.int32)}

    (videos_p, text_p), b = pad_batch((videos, text), mesh)
    assert b == 5 and videos_p.shape[0] == 8
    assert text_p["caption_tokens"].shape[0] == 8
    np.testing.assert_array_equal(videos_p[5], videos[4])  # edge repeat

    sharded = shard_batch(jnp.asarray(videos_p), mesh)
    # padded rows divide evenly -> actually sharded, not replicated
    assert not sharded.sharding.is_fully_replicated

    targets = np.clip(videos_p + 0.01, 0, 1)
    vals = np.asarray(psnr(sharded, jnp.asarray(targets)))[:b]
    ref = np.asarray(psnr(jnp.asarray(videos), jnp.asarray(targets[:5])))
    np.testing.assert_allclose(vals, ref, rtol=1e-6)


def _tiny_dinosaur_params():
    """Tiny ExtendedDINOSAUR exp params (ViT-small 1-block at 28px -> 4
    patches) — the smallest config that exercises every TP-sharded module."""
    from textocvp_tpu.core.config import build_exp_params

    params = build_exp_params("ExtendedDINOSAUR", "Synthetic")
    mp = params["model"]["model_params"]
    mp.update(img_size=28, num_slots=3, slot_dim=16, mlp_hidden=16,
              mlp_encoder_dim=384)
    mp["encoder"] = {
        "encoder_name": "vit_small_patch14_dinov2",
        "encoder_params": {"encoder_num_blocks": 1},
    }
    mp["decoder"]["decoder_params"].update(
        num_patches=4, in_dim=16, hidden_dim=32, out_dim=385, num_layers=2,
        patch_size=14, num_layers_cnn=2, reconstruct_images=True,
    )
    mp["transition_module"] = {"model_name": "TransformerBlock",
                               "num_heads": 2, "mlp_size": 16}
    params["dataset"].update(img_size=[28, 28], num_frames=2)
    return params


def test_dinosaur_decomp_tp_matches_replicated():
    """ViT encoder + patch-decoder MLP sharded over the model axis (the
    DINOSAUR-path TP extension) reproduce the replicated forward."""
    from textocvp_tpu.models import setup_model
    from textocvp_tpu.parallel.partitioning import (
        decomp_tp_enabled,
        predictor_param_specs,
        shard_decomp_variables,
    )

    exp_params = _tiny_dinosaur_params()
    assert decomp_tp_enabled(exp_params)
    # SAVi-style configs must NOT opt in
    assert not decomp_tp_enabled(
        {"model": {"model_params": {"encoder": {"encoder_name": "ConvEncoder"}}}})

    model = setup_model(exp_params)
    videos = jax.random.uniform(jax.random.PRNGKey(0), (4, 2, 28, 28, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "slots": jax.random.PRNGKey(2)},
        videos, decode=True, train=False)

    # the new spec rules actually hit the ViT block and patch-decoder MLP
    specs = predictor_param_specs(variables["params"])
    blk = specs["image_encoder"]["block_0"]
    assert tuple(blk["qkv"]["kernel"]) == (None, "model")
    assert tuple(blk["proj"]["kernel"]) == ("model", None)
    assert tuple(blk["fc1"]["kernel"]) == (None, "model")
    assert tuple(blk["fc2"]["kernel"]) == ("model", None)
    dec = specs["patch_decoder"]
    assert tuple(dec["mlp_0"]["kernel"]) == (None, "model")
    assert tuple(dec["mlp_1"]["kernel"]) == ("model", None)
    # conv kernels and norms stay replicated
    assert tuple(specs["image_encoder"]["patch_embed"]["kernel"]) == ()

    mesh = get_mesh(data=2, model=4)
    fixed_rng = {"slots": jax.random.PRNGKey(3)}
    fn = jax.jit(lambda v, x: model.apply(v, x, decode=True, train=False,
                                          rngs=fixed_rng)["recons_imgs"])
    ref = fn(variables, videos)

    sharded = shard_decomp_variables(
        jax.device_put(variables, replicated_sharding(mesh)), mesh)
    # the big kernels must actually be sharded, not silently replicated
    qkv = sharded["params"]["image_encoder"]["block_0"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    videos_s = jax.device_put(videos, batch_sharding(mesh))
    with mesh:
        out = fn(sharded, videos_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
