"""SAVi / ExtendedDINOSAUR model-level tests: shapes, decode consistency, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.config import build_exp_params
from textocvp_tpu.models import setup_model

B, T, H, W = 2, 3, 64, 64


def tiny_savi_params():
    """A scaled-down SAVi config (same architecture shape) for fast tests."""
    params = build_exp_params("SAVi", "CATER_Easy")
    mp = params["model"]["model_params"]
    mp["num_slots"] = 4
    mp["slot_dim"] = 32
    mp["mlp_hidden"] = 32
    mp["mlp_encoder_dim"] = 32
    mp["encoder"]["encoder_params"]["num_channels"] = [16, 16]
    mp["decoder"]["decoder_params"]["num_channels"] = [16, 16]
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2, "mlp_size": 32}
    return params


def tiny_dinosaur_params():
    params = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    mp = params["model"]["model_params"]
    mp["img_size"] = 56
    mp["num_slots"] = 4
    mp["slot_dim"] = 32
    mp["mlp_hidden"] = 32
    mp["mlp_encoder_dim"] = 48
    mp["encoder"] = {
        "encoder_name": "vit_small_patch14_dinov2",
        "encoder_params": {"encoder_num_blocks": 2},
    }
    # 56/14 = 4 -> 16 patches
    mp["decoder"]["decoder_params"].update(
        num_patches=16, in_dim=32, hidden_dim=64, out_dim=49, num_layers=2,
        patch_size=14, num_layers_cnn=2, reconstruct_images=True,
    )
    return params


class TestSAVi:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        exp_params = tiny_savi_params()
        model = setup_model(exp_params)
        video = jnp.zeros((B, T, H, W, 3))
        params = model.init({"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
                            video)
        return model, params

    def test_decompose_shapes(self, model_and_params):
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))
        out = model.apply(params, video, rngs={"slots": jax.random.PRNGKey(2)})
        assert out["slot_history"].shape == (B, T, 4, 32)
        assert out["recons_imgs"].shape == (B, T, H, W, 3)
        assert out["recons_objs"].shape == (B, T, 4, H, W, 3)
        assert out["masks"].shape == (B, T, 4, H, W, 1)
        assert out["attn_masks"].shape == (B, T, 4, H * W)

    def test_masks_sum_to_one(self, model_and_params):
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))
        out = model.apply(params, video, rngs={"slots": jax.random.PRNGKey(2)})
        sums = np.asarray(out["masks"]).sum(axis=2)
        np.testing.assert_allclose(sums, np.ones_like(sums), rtol=1e-5, atol=1e-5)

    def test_decode_matches_decompose(self, model_and_params):
        """decode(slot_history) must reproduce decompose's reconstructions —
        the predictor training path depends on this consistency."""
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))
        out = model.apply(params, video, rngs={"slots": jax.random.PRNGKey(2)})
        slots = out["slot_history"].reshape(B * T, 4, 32)
        dec = model.apply(params, slots, method="decode")
        np.testing.assert_allclose(
            np.asarray(dec["recons_imgs"].reshape(B, T, H, W, 3)),
            np.asarray(out["recons_imgs"]), rtol=1e-5, atol=1e-5,
        )

    def test_no_decode_skips_decoder(self, model_and_params):
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))
        out = model.apply(params, video, decode=False, rngs={"slots": jax.random.PRNGKey(2)})
        assert "recons_imgs" not in out
        assert out["slot_history"].shape == (B, T, 4, 32)

    def test_jit_forward(self, model_and_params):
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))

        @jax.jit
        def fwd(p, v, key):
            return model.apply(p, v, rngs={"slots": key})["recons_imgs"]

        y = fwd(params, video, jax.random.PRNGKey(2))
        assert y.shape == (B, T, H, W, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_fixed_rng_is_deterministic(self, model_and_params):
        model, params = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, H, W, 3))
        o1 = model.apply(params, video, decode=False, rngs={"slots": jax.random.PRNGKey(7)})
        o2 = model.apply(params, video, decode=False, rngs={"slots": jax.random.PRNGKey(7)})
        np.testing.assert_array_equal(np.asarray(o1["slot_history"]),
                                      np.asarray(o2["slot_history"]))


class TestExtendedDINOSAUR:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        exp_params = tiny_dinosaur_params()
        model = setup_model(exp_params)
        video = jnp.zeros((B, T, 56, 56, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}, video
        )
        return model, variables

    def test_decompose_shapes(self, model_and_params):
        model, variables = model_and_params
        video = jax.random.uniform(jax.random.PRNGKey(3), (B, T, 56, 56, 3))
        out, _ = model.apply(
            variables, video, rngs={"slots": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert out["slot_history"].shape == (B, T, 4, 32)
        assert out["encoded_img_feats"].shape == (B, T, 16, 384)
        assert out["recons_feats"].shape == (B, T, 16, 48)
        assert out["masks"].shape == (B, T, 4, 1, 4, 4)
        assert out["recons_imgs"].shape == (B, T, 56, 56, 3)
        assert np.isfinite(np.asarray(out["recons_imgs"])).all()


def test_savi_with_resnet_encoder():
    """The 'ResNet' (ResNet34-SAVi) encoder works INSIDE SAVi: the config's
    encoder resolution is the /8 feature resolution (8x8 for 64px inputs),
    which sizes the position embedding (nn/encoders.py::ResNet34SAVi)."""
    params = tiny_savi_params()
    mp = params["model"]["model_params"]
    mp["encoder"] = {"encoder_name": "ResNet",
                     "encoder_params": {"resolution": [8, 8], "num_groups": 8}}
    model = setup_model(params)
    videos = jnp.zeros((1, 2, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        videos, decode=True, train=False)
    out = model.apply(variables, videos, decode=True,
                      rngs={"slots": jax.random.PRNGKey(2)})
    assert out["slot_history"].shape == (1, 2, mp["num_slots"], mp["slot_dim"])
    assert out["recons_imgs"].shape == (1, 2, 64, 64, 3)


@pytest.mark.parametrize("family", ["savi", "dinosaur"])
def test_seed_only_encode_matches_full_sequence_prefix(family):
    """Pinned contract for the evaluator's documented deviation
    (train/evaluator.py:6-11): the slot recurrence is CAUSAL, so encoding
    only the ``c`` seed frames yields exactly the slots the reference gets
    by encoding seed+future and slicing
    (/root/reference/src/05_evaluate_predictor.py:82-89):

        decompose(videos[:, :c])["slot_history"]
            == decompose(videos[:, :c+p])["slot_history"][:, :c]

    under the same ``slots`` RNG (the stochastic LearnedRandom initializer
    samples per batch, not per frame, so both calls draw identical initial
    slots). Holds for both model families."""
    c, p = 2, 3
    if family == "savi":
        exp_params, hw = tiny_savi_params(), H
    else:
        exp_params, hw = tiny_dinosaur_params(), 56
    model = setup_model(exp_params)
    video = jax.random.uniform(jax.random.PRNGKey(11), (B, c + p, hw, hw, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        video[:, :1])
    rngs = {"slots": jax.random.PRNGKey(5)}
    seed_only = model.apply(variables, video[:, :c], decode=False, rngs=rngs)
    full = model.apply(variables, video, decode=False, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(seed_only["slot_history"]),
        np.asarray(full["slot_history"][:, :c]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(seed_only["attn_masks"]),
        np.asarray(full["attn_masks"][:, :c]), rtol=1e-6, atol=1e-6)
