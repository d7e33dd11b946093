"""
END-TO-END numerical parity against the actual reference implementation.

The reference torch code at /root/reference/src is importable offline (torch-cpu
and transformers are in the environment; timm is stubbed — it is only touched at
import time unless a ViT encoder is constructed). These tests instantiate the
*real* reference modules (SAVi from models/SAVi.py:60-293, the predictors from
models/Predictors/, PredictorWrapper from predictor_wrapper.py:17-169), run them
forward, export their ``state_dict()``, convert it through our checkpoint
importer (textocvp_tpu/train/torch_import.py), and assert our flax models
produce the same slots / predictions / frames. This is the proof behind the
"checkpoint-compatible outputs" claim: any semantic drift in either direction
fails these tests.

Determinism notes:
* The decomposition tests use the ``Learned`` initializer (reference
  initializers.py:39-61) — ``LearnedRandom`` samples a fresh gaussian at every
  call (initializers.py:87-94) and cannot be matched across frameworks.
* All torch modules run under ``.eval()`` + ``no_grad()`` (dropout off), and
  our side runs with ``deterministic=True``.
"""

import copy
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from textocvp_tpu.core.config import add_predictor_params, build_exp_params  # noqa: E402
from textocvp_tpu.models import setup_model, setup_predictor  # noqa: E402
from textocvp_tpu.train.torch_import import convert_predictor, convert_savi  # noqa: E402

REF_SRC = "/root/reference/src"


def _install_import_stubs():
    """timm is not installed; the reference imports it at module scope but only
    calls into it when constructing ViT encoders (which these tests never do).
    nltk/decord are likewise only needed for tokenization / video IO."""
    if "timm" not in sys.modules:
        import importlib.machinery

        timm = types.ModuleType("timm")
        models_mod = types.ModuleType("timm.models")
        layers_mod = types.ModuleType("timm.models.layers")
        resnet_mod = types.ModuleType("timm.models.resnet")
        vt_mod = types.ModuleType("timm.models.vision_transformer")

        class VisionTransformer:  # only used in isinstance checks / annotations
            pass

        def _unavailable(*args, **kwargs):
            raise RuntimeError("timm is stubbed in this environment")

        vt_mod.VisionTransformer = VisionTransformer
        vt_mod._create_vision_transformer = _unavailable
        layers_mod.GroupNorm = _unavailable
        resnet_mod.BasicBlock = object
        resnet_mod._create_resnet = _unavailable
        models_mod.layers = layers_mod
        models_mod.resnet = resnet_mod
        models_mod.vision_transformer = vt_mod
        timm.models = models_mod
        timm.create_model = _unavailable
        mods = {
            "timm": timm,
            "timm.models": models_mod,
            "timm.models.layers": layers_mod,
            "timm.models.resnet": resnet_mod,
            "timm.models.vision_transformer": vt_mod,
        }
        for name, mod in mods.items():
            # transformers probes importlib.util.find_spec("timm"), which
            # raises on modules whose __spec__ is None
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules.update(mods)


@pytest.fixture(scope="module")
def ref():
    """Namespace with the reference torch classes, imported from /root/reference."""
    _install_import_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from models.SAVi import SAVi as RefSAVi
    from models.Predictors.OCVP import (
        OCVPPar as RefOCVPPar,
        OCVPSeq as RefOCVPSeq,
        VanillaTransformerPredictor as RefVanilla,
    )
    from models.Predictors.predictor_wrapper import PredictorWrapper as RefWrapper
    from models.Predictors.text_cond_OCVP import (
        TextOCVP_CustomTF as RefTextOCVP_CustomTF,
        TextOCVP_T5 as RefTextOCVP_T5,
    )

    ns = types.SimpleNamespace(
        SAVi=RefSAVi,
        Vanilla=RefVanilla,
        OCVPSeq=RefOCVPSeq,
        OCVPPar=RefOCVPPar,
        Wrapper=RefWrapper,
        TextOCVP_CustomTF=RefTextOCVP_CustomTF,
        TextOCVP_T5=RefTextOCVP_T5,
    )
    return ns


# --------------------------------------------------------------------------- helpers
def _tiny_savi_exp():
    params = build_exp_params("SAVi", "CATER_Easy")
    mp = params["model"]["model_params"]
    mp.update(num_slots=4, slot_dim=32, mlp_hidden=24, mlp_encoder_dim=32,
              num_iterations=1, num_iterations_first=2, initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[16, 16], resolution=[32, 32],
                                           kernel_size=5)
    mp["decoder"]["decoder_params"].update(num_channels=[16, 16], resolution=[32, 32],
                                           kernel_size=5, upsample=1)
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 24}
    return params


def _torch_savi(ref, exp_params):
    torch.manual_seed(14)
    mp = copy.deepcopy(exp_params["model"]["model_params"])
    model = ref.SAVi(**mp)  # reference setup_model.py:22-53 does SAVi(**model_params)
    model.eval()
    return model


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _rollout_inputs(rng, b=2, t_ctx=2, t_total=7, s=4, d=32):
    """slot history long enough for teacher forcing; (B, T, S, D)."""
    return rng.standard_normal((b, t_total, s, d)).astype(np.float32)


def _prediction_params(exp_params, num_context=2, num_preds=4, buffer=3):
    exp_params["prediction_params"].update(
        num_context=num_context, num_preds=num_preds, teacher_force=False,
        input_buffer_size=buffer,
    )
    return exp_params


# --------------------------------------------------------------------------- SAVi
def test_savi_end_to_end_matches_reference(ref, rng):
    exp_params = _tiny_savi_exp()
    torch_model = _torch_savi(ref, exp_params)

    b, t, hw = 2, 4, 32
    videos = rng.uniform(0.0, 1.0, size=(b, t, 3, hw, hw)).astype(np.float32)
    with torch.no_grad():
        out_t = torch_model(mode="decomp", x=torch.from_numpy(videos), num_imgs=t)
    ref_slots = out_t["slot_history"].numpy()          # (B, T, S, D)
    ref_recons = out_t["recons_imgs"].numpy()          # (B, T, C, H, W)

    converted = convert_savi(_sd(torch_model), exp_params["model"]["model_params"])
    videos_nhwc = jnp.asarray(videos.transpose(0, 1, 3, 4, 2))

    # strict parity on the reassociation-free decode path
    exp_params.setdefault("tpu", {})["fast_decode"] = False
    model = setup_model(exp_params)
    out_j = model.apply({"params": converted["params"]}, videos_nhwc,
                        rngs={"slots": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out_j["slot_history"]), ref_slots,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["recons_imgs"]).transpose(0, 1, 4, 2, 3), ref_recons,
        rtol=1e-4, atol=1e-4)

    # production fast-broadcast decode path: exact up to float reassociation
    exp_params["tpu"]["fast_decode"] = True
    model_fast = setup_model(exp_params)
    out_f = model_fast.apply({"params": converted["params"]}, videos_nhwc,
                             rngs={"slots": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(
        np.asarray(out_f["recons_imgs"]).transpose(0, 1, 4, 2, 3), ref_recons,
        rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------------- OCVP
def _run_ref_wrapper(ref, exp_params, predictor, slot_history, **text_kwargs):
    torch_wrapper = ref.Wrapper(exp_params=exp_params, predictor=predictor)
    torch_wrapper.eval()
    kwargs = dict(text_kwargs)
    # the reference demands caption_tokens even for unconditioned predictors
    # (predictor_wrapper.py:100-102)
    kwargs.setdefault("caption_tokens", torch.ones(slot_history.shape[0], 5,
                                                   dtype=torch.long))
    with torch.no_grad():
        preds = torch_wrapper(torch.from_numpy(slot_history), **kwargs)
    return torch_wrapper, preds.numpy()


@pytest.mark.parametrize("name", ["VanillaTransformer", "OCVPSeq", "OCVPPar"])
def test_unconditioned_rollout_matches_reference(ref, rng, name):
    exp_params = _prediction_params(add_predictor_params(_tiny_savi_exp(), name))
    pp = exp_params["predictor"]["predictor_params"]
    pp.update(token_dim=16, hidden_dim=32, num_layers=2, n_heads=2, residual=True)

    torch.manual_seed(14)
    cls = {"VanillaTransformer": ref.Vanilla, "OCVPSeq": ref.OCVPSeq,
           "OCVPPar": ref.OCVPPar}[name]
    predictor = cls(
        num_slots=4, slot_dim=32,
        input_buffer_size=exp_params["prediction_params"]["input_buffer_size"],
        **{k: v for k, v in pp.items() if k != "predictor_name"},
    )  # mirrors reference setup_model.py:84-99

    hist = _rollout_inputs(rng)
    _, ref_preds = _run_ref_wrapper(ref, exp_params, predictor, hist)

    converted = convert_predictor(_sd(ref.Wrapper(exp_params=exp_params,
                                                  predictor=predictor)), exp_params)
    wrapper = setup_predictor(exp_params)
    out = wrapper.apply({"params": converted["params"]}, jnp.asarray(hist))
    np.testing.assert_allclose(np.asarray(out), ref_preds, rtol=1e-4, atol=1e-4)


def test_unconditioned_teacher_forced_matches_reference(ref, rng):
    exp_params = _prediction_params(add_predictor_params(_tiny_savi_exp(),
                                                         "VanillaTransformer"))
    exp_params["prediction_params"]["teacher_force"] = True
    pp = exp_params["predictor"]["predictor_params"]
    pp.update(token_dim=16, hidden_dim=32, num_layers=2, n_heads=2, residual=True)

    torch.manual_seed(7)
    predictor = ref.Vanilla(num_slots=4, slot_dim=32, input_buffer_size=3,
                            **{k: v for k, v in pp.items() if k != "predictor_name"})
    hist = _rollout_inputs(rng)

    # the reference's _is_teacher_force quirk (predictor_wrapper.py:130-140):
    # `self.predictor.train is False` compares a bound method -> never False,
    # so teacher forcing always follows the config, even in eval mode.
    torch_wrapper = ref.Wrapper(exp_params=exp_params, predictor=predictor)
    torch_wrapper.eval()
    with torch.no_grad():
        ref_preds = torch_wrapper(
            torch.from_numpy(hist),
            caption_tokens=torch.ones(hist.shape[0], 5, dtype=torch.long),
        ).numpy()

    converted = convert_predictor(_sd(torch_wrapper), exp_params)
    wrapper = setup_predictor(exp_params)
    out = wrapper.apply({"params": converted["params"]}, jnp.asarray(hist))
    np.testing.assert_allclose(np.asarray(out), ref_preds, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- TextOCVP
def _tiny_textocvp_exp(variant="TextOCVP_CustomTF", token_dim=32):
    exp_params = _prediction_params(add_predictor_params(_tiny_savi_exp(), variant))
    pp = exp_params["predictor"]["predictor_params"]
    pp["predictor_params"].update(token_dim=token_dim, n_heads=2, hidden_dim=48,
                                  num_layers=2, residual=True)
    pp["fusion_params"].update(num_heads=2, head_dim=8, mlp_size=48)
    if variant == "TextOCVP_CustomTF":
        pp["text_encoder_params"].update(input_dim=16, num_layers=2, num_heads=2,
                                         vocab_size=30)
    return exp_params


def _ref_textocvp_kwargs(exp_params):
    """Reproduce reference setup_model.py:101-120: inject input_buffer_size into
    the inner predictor params, pass the three sub-dicts."""
    pp = copy.deepcopy(exp_params["predictor"]["predictor_params"])
    pp["predictor_params"]["input_buffer_size"] = \
        exp_params["prediction_params"]["input_buffer_size"]
    return dict(
        slot_dim=exp_params["model"]["model_params"]["slot_dim"],
        predictor_params=pp["predictor_params"],
        fusion_params=pp["fusion_params"],
        text_encoder_params=pp["text_encoder_params"],
    )


def test_textocvp_customtf_rollout_matches_reference(ref, rng):
    exp_params = _tiny_textocvp_exp("TextOCVP_CustomTF")
    torch.manual_seed(14)
    predictor = ref.TextOCVP_CustomTF(**_ref_textocvp_kwargs(exp_params))

    hist = _rollout_inputs(rng)
    tokens = rng.integers(1, 30, size=(2, 6)).astype(np.int64)
    lengths = np.array([6, 4], dtype=np.int64)
    torch_wrapper, ref_preds = _run_ref_wrapper(
        ref, exp_params, predictor, hist,
        caption_tokens=torch.from_numpy(tokens),
        caption_lengths=torch.from_numpy(lengths),
    )

    converted = convert_predictor(_sd(torch_wrapper), exp_params)
    wrapper = setup_predictor(exp_params)
    out = wrapper.apply({"params": converted["params"]}, jnp.asarray(hist),
                        caption_tokens=jnp.asarray(tokens),
                        caption_lengths=jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), ref_preds, rtol=1e-4, atol=1e-4)


def test_textocvp_t5_rollout_matches_reference(ref, rng, monkeypatch):
    """Full T5 path: the reference hardcodes `T5EncoderModel.from_pretrained
    ("t5-small")` (text_cond_OCVP.py:148); with zero egress we substitute a
    randomly initialized T5EncoderModel with the exact t5-small geometry, which
    exercises the identical code path and weight conversion."""
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=32128, d_model=512, d_kv=64, d_ff=2048, num_layers=6,
        num_heads=8, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="relu",
    )
    torch.manual_seed(14)
    stub_t5 = T5EncoderModel(hf_cfg)
    monkeypatch.setattr(T5EncoderModel, "from_pretrained",
                        classmethod(lambda cls, *a, **k: stub_t5))

    exp_params = _tiny_textocvp_exp("TextOCVP_T5", token_dim=512)
    torch.manual_seed(3)
    predictor = ref.TextOCVP_T5(**_ref_textocvp_kwargs(exp_params))

    hist = _rollout_inputs(rng, b=1, t_total=7, s=4, d=32)
    tokens = rng.integers(2, 32000, size=(1, 8)).astype(np.int64)
    attn = np.ones((1, 8), dtype=np.int64)
    attn[0, 6:] = 0
    torch_wrapper, ref_preds = _run_ref_wrapper(
        ref, exp_params, predictor, hist,
        caption_tokens=torch.from_numpy(tokens),
        attn_masks=torch.from_numpy(attn),
    )

    converted = convert_predictor(_sd(torch_wrapper), exp_params)
    wrapper = setup_predictor(exp_params)
    out = wrapper.apply({"params": converted["params"]}, jnp.asarray(hist),
                        caption_tokens=jnp.asarray(tokens),
                        attn_masks=jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(out), ref_preds, rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------------- full chain
def test_full_eval_chain_matches_reference(ref, rng):
    """The 05_evaluate_predictor path: seed-encode -> rollout -> decode
    (reference 05_evaluate_predictor.py:53-104), both frameworks end to end."""
    exp_params = _tiny_textocvp_exp("TextOCVP_CustomTF")
    exp_params["prediction_params"].update(num_context=2, num_preds=3)

    torch_savi = _torch_savi(ref, exp_params)
    torch.manual_seed(5)
    predictor = ref.TextOCVP_CustomTF(**_ref_textocvp_kwargs(exp_params))
    torch_wrapper = ref.Wrapper(exp_params=exp_params, predictor=predictor)
    torch_wrapper.eval()

    b, t, hw = 1, 5, 32  # num_context + num_preds frames
    videos = rng.uniform(0.0, 1.0, size=(b, t, 3, hw, hw)).astype(np.float32)
    tokens = rng.integers(1, 30, size=(b, 6)).astype(np.int64)
    lengths = np.array([6], dtype=np.int64)

    with torch.no_grad():
        decomp = torch_savi(mode="decomp", x=torch.from_numpy(videos), num_imgs=2,
                            decode=False)
        pred_slots = torch_wrapper(decomp["slot_history"],
                                   caption_tokens=torch.from_numpy(tokens),
                                   caption_lengths=torch.from_numpy(lengths))
        flat = pred_slots.reshape(b * 3, 4, 32)
        dec = torch_savi(mode="decode", slots=flat)
        ref_frames = dec["recons_imgs"].reshape(b, 3, 3, hw, hw).numpy()

    conv_savi = convert_savi(_sd(torch_savi), exp_params["model"]["model_params"])
    conv_pred = convert_predictor(_sd(torch_wrapper), exp_params)
    exp_params.setdefault("tpu", {})["fast_decode"] = False
    model = setup_model(exp_params)
    wrapper = setup_predictor(exp_params)

    videos_nhwc = jnp.asarray(videos.transpose(0, 1, 3, 4, 2))
    out = model.apply({"params": conv_savi["params"]}, videos_nhwc[:, :2],
                      decode=False, rngs={"slots": jax.random.PRNGKey(0)})
    preds = wrapper.apply({"params": conv_pred["params"]}, out["slot_history"],
                          caption_tokens=jnp.asarray(tokens),
                          caption_lengths=jnp.asarray(lengths))
    dec_j = model.apply({"params": conv_savi["params"]}, preds.reshape(b * 3, 4, 32),
                        method="decode")
    frames = np.asarray(dec_j["recons_imgs"]).reshape(b, 3, hw, hw, 3)
    np.testing.assert_allclose(frames.transpose(0, 1, 4, 2, 3), ref_frames,
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- CLI import
def test_import_cli_round_trips_reference_pth(ref, rng, tmp_path, monkeypatch):
    """File-level loop: a reference-format .pth (model_state_dict blob, like
    reference setup_model.py:178-184 writes) imported through the
    import_torch_checkpoint CLI yields a msgpack checkpoint whose restored
    params reproduce the torch model's outputs."""
    monkeypatch.setenv("TEXTOCVP_EXPERIMENTS", str(tmp_path))
    exp_params = _tiny_savi_exp()
    torch_model = _torch_savi(ref, exp_params)

    from textocvp_tpu.core.experiment import Experiment

    exp = Experiment.create(tmp_path / "imp", "SAVi", "CATER_Easy")
    params = exp.params
    params["model"] = exp_params["model"]
    exp.save_params(params)

    pth = tmp_path / "SAVi_ref.pth"
    torch.save({"model_state_dict": torch_model.state_dict(), "epoch": 123}, pth)

    from textocvp_tpu.cli.import_torch_checkpoint import main as import_main

    out_path = import_main(["-d", str(tmp_path / "imp"), "--torch_ckpt", str(pth),
                            "--kind", "decomp"])
    assert str(out_path).endswith("SAVi_ref.msgpack")

    from textocvp_tpu.models import setup_model
    from textocvp_tpu.train.checkpoints import load_checkpoint

    restored = load_checkpoint(out_path)
    exp_params.setdefault("tpu", {})["fast_decode"] = False
    model = setup_model(exp_params)

    videos = rng.uniform(0, 1, size=(1, 3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_model(mode="decomp", x=torch.from_numpy(videos), num_imgs=3)
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                        restored["params"])},
                      jnp.asarray(videos.transpose(0, 1, 3, 4, 2)),
                      rngs={"slots": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out["slot_history"]),
                               ref_out["slot_history"].numpy(),
                               rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- MLPPatchDecoder
def test_mlp_patch_decoder_matches_reference(ref, rng):
    """The DINOSAUR decode side vs the actual torch reference
    (decoders.py:264-365 incl. the CNN image head + bilinear resize),
    converted through the production importer (convert_patch_decoder).
    The ViT encoder side needs timm (absent offline), so this pins the
    largest torch-testable piece of ExtendedDINOSAUR."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from models.EncodersDecoders.decoders import MLPPatchDecoder as RefMLPPatch

    from textocvp_tpu.nn.decoders import MLPPatchDecoder
    from textocvp_tpu.train.torch_import import convert_patch_decoder

    dp = dict(num_patches=16, in_dim=24, hidden_dim=32, out_dim=20,
              num_layers=3, initial_layer_norm=True, reconstruct_images=True,
              patch_size=4, img_size=16, num_layers_cnn=2)
    torch.manual_seed(14)
    ref_dec = RefMLPPatch(**dp)
    ref_dec.eval()

    b, s = 2, 4
    slots = rng.standard_normal((b, s, dp["in_dim"])).astype(np.float32)
    with torch.no_grad():
        out_t = ref_dec(torch.from_numpy(slots))

    sd = {"decoder." + k: v.detach().numpy()
          for k, v in ref_dec.state_dict().items()}
    params, batch_stats = convert_patch_decoder(sd, dp, dp["img_size"])

    ours = MLPPatchDecoder(
        num_patches=dp["num_patches"], in_dim=dp["in_dim"],
        hidden_dim=dp["hidden_dim"], out_dim=dp["out_dim"],
        num_layers=dp["num_layers"], initial_layer_norm=True,
        reconstruct_images=True, patch_size=dp["patch_size"],
        img_size=dp["img_size"], num_layers_cnn=dp["num_layers_cnn"])
    variables = {"params": params,
                 "batch_stats": batch_stats["patch_decoder"]}
    out_j = ours.apply(variables, jnp.asarray(slots), train=False)

    np.testing.assert_allclose(np.asarray(out_j["recons_feats"]),
                               out_t["recons_feats"].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["masks"]),
                               out_t["masks"].numpy(), rtol=1e-4, atol=1e-4)
    # ours is NHWC; reference NCHW
    np.testing.assert_allclose(
        np.asarray(out_j["recons_imgs"]).transpose(0, 3, 1, 2),
        out_t["recons_imgs"].numpy(), rtol=1e-4, atol=1e-4)


# ----------------------------------------------------- ExtendedDINOSAUR + ViT
# The torch ViT below reproduces timm's VisionTransformer attribute and
# state_dict naming (patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,
# attn.qkv,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2}) with timm Block forward
# semantics, so the REAL reference ExtendedDINOSAUR
# (/root/reference/src/models/ExtendedDINOSAUR.py:87-111) runs end-to-end on
# torch and its state_dict flows through the production importer
# (convert_extended_dinosaur -> nn/vit.py import_timm_state_dict). This closes
# the one importer leg that structure tests alone could not execute.


class _TimmLayerScale(torch.nn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = torch.nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class _TimmAttention(torch.nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.qkv = torch.nn.Linear(dim, 3 * dim, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        self.num_heads = num_heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = self.qkv(x).reshape(b, n, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * dh ** -0.5
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(x)


class _TimmMlp(torch.nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = torch.nn.Linear(dim, hidden)
        self.fc2 = torch.nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class _TimmBlock(torch.nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, ls_init=None):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, num_heads)
        self.ls1 = _TimmLayerScale(dim, ls_init) if ls_init else torch.nn.Identity()
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TimmMlp(dim, int(dim * mlp_ratio))
        self.ls2 = _TimmLayerScale(dim, ls_init) if ls_init else torch.nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _TimmPatchEmbed(torch.nn.Module):
    def __init__(self, dim, patch_size):
        super().__init__()
        self.proj = torch.nn.Conv2d(3, dim, kernel_size=patch_size, stride=patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


def _make_torch_vit(img_size, patch_size, embed_dim, depth, num_heads,
                    mlp_ratio=4.0, ls_init=None, **_):
    """timm-lookalike VisionTransformer; subclasses the stubbed timm class so
    the reference wrapper's isinstance check (timm_encoders.py:33) passes."""
    vt_base = sys.modules["timm.models.vision_transformer"].VisionTransformer

    class _TorchViT(torch.nn.Module, vt_base):
        # the reference normalization quirk reads default_cfg["mean"] for both
        # mean AND std (timm_encoders.py:51-56)
        default_cfg = {"mean": (0.485, 0.456, 0.406), "std": (0.229, 0.224, 0.225)}

        def __init__(self):
            torch.nn.Module.__init__(self)
            grid = img_size // patch_size
            self.patch_embed = _TimmPatchEmbed(embed_dim, patch_size)
            self.cls_token = torch.nn.Parameter(torch.zeros(1, 1, embed_dim))
            self.pos_embed = torch.nn.Parameter(
                0.02 * torch.randn(1, grid * grid + 1, embed_dim))
            self.patch_drop = torch.nn.Identity()
            self.norm_pre = torch.nn.Identity()
            self.blocks = torch.nn.Sequential(*[
                _TimmBlock(embed_dim, num_heads, mlp_ratio, ls_init)
                for _ in range(depth)])

        def _pos_embed(self, x):
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            return torch.cat([cls, x], dim=1) + self.pos_embed

    return _TorchViT()


def _inject_torch_vit_factories():
    """Point the reference's timm entry points at _make_torch_vit. The dino
    factories go through _create_vision_transformer (bound at import time in
    timm_encoders), the dinov2 ones through timm.create_model; dinov2 models
    carry layerscale (init_values=1e-5 in timm's registered config)."""
    import models.EncodersDecoders.timm_encoders as ref_timm

    def _create(variant, pretrained=True, **kw):
        kw.pop("qkv_bias", None), kw.pop("norm_layer", None), kw.pop("num_classes", None)
        ls = 1e-5 if "dinov2" in variant else None
        return _make_torch_vit(ls_init=ls, **kw)

    ref_timm._create_vision_transformer = _create
    ref_timm.timm.create_model = _create


def _tiny_dinosaur_exp(encoder_name, img_size, patch_size, embed_dim):
    grid = img_size // patch_size
    params = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    mp = params["model"]["model_params"]
    mp.update(
        img_size=img_size, num_slots=4, slot_dim=32, num_iterations_first=2,
        num_iterations=1, mlp_hidden=32, mlp_encoder_dim=embed_dim,
        initializer="Learned",
        transition_module={"model_name": "TransformerBlock", "num_heads": 2,
                           "mlp_size": 32},
        encoder={"encoder_name": encoder_name, "encoder_params": {}},
        decoder={"decoder_name": "MLPPatchDecoder", "decoder_params": dict(
            patch_size=patch_size, num_patches=grid * grid, in_dim=32,
            hidden_dim=64, out_dim=embed_dim + 1, num_layers=2,
            initial_layer_norm=True, reconstruct_images=True,
            num_layers_cnn=4)},
    )
    params["dataset"]["img_size"] = [img_size, img_size]
    return params


@pytest.mark.parametrize("encoder_name,img_size,patch,dim,heads,depth", [
    ("vit_small_patch14_dinov2", 112, 14, 384, 6, 12),   # layerscale leg
    ("vit_small_patch16_224_dino", 64, 16, 384, 6, 12),  # no-layerscale leg
])
def test_extended_dinosaur_vit_end_to_end_matches_reference(
        ref, rng, encoder_name, img_size, patch, dim, heads, depth):
    """The FULL reference ExtendedDINOSAUR — frozen torch ViT (timm naming),
    feature projection, slot attention, transition, MLP patch decoder + CNN
    image head — against our flax model with weights converted through
    convert_extended_dinosaur. Covers the std:=mean normalization quirk, the
    OIHW->HWIO patch-embed transposition, qkv/proj/mlp transposes and (dinov2)
    layerscale import."""
    del ref  # fixture installs the import stubs + sys.path
    _inject_torch_vit_factories()
    from models.ExtendedDINOSAUR import ExtendedDINOSAUR as RefED

    exp_params = _tiny_dinosaur_exp(encoder_name, img_size, patch, dim)
    mp = copy.deepcopy(exp_params["model"]["model_params"])
    torch.manual_seed(14)
    ref_model = RefED(**mp)
    ref_model.eval()

    b, t = 1, 2
    videos = rng.uniform(0.0, 1.0, size=(b, t, 3, img_size, img_size)).astype(np.float32)
    with torch.no_grad():
        out_t = ref_model(mode="decomp", x=torch.from_numpy(videos), num_imgs=t)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    from textocvp_tpu.train.torch_import import convert_extended_dinosaur

    converted = convert_extended_dinosaur(sd, exp_params["model"]["model_params"])
    model = setup_model(exp_params)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, converted["params"])}
    if "batch_stats" in converted:
        variables["batch_stats"] = jax.tree_util.tree_map(
            jnp.asarray, converted["batch_stats"])
    out_j = model.apply(variables, jnp.asarray(videos.transpose(0, 1, 3, 4, 2)),
                        train=False, rngs={"slots": jax.random.PRNGKey(0)})

    np.testing.assert_allclose(np.asarray(out_j["encoded_img_feats"]),
                               out_t["encoded_img_feats"].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["slot_history"]),
                               out_t["slot_history"].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["recons_feats"]),
                               out_t["recons_feats"].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["masks"]),
                               out_t["masks"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["recons_imgs"]).transpose(0, 1, 4, 2, 3),
        out_t["recons_imgs"].numpy(), rtol=1e-4, atol=1e-4)


def test_pos_embed_interpolation_matches_timm_resample(rng):
    """interpolate_pos_embed vs timm's resample_abs_pos_embed formulation
    (F.interpolate bicubic, antialias=True, cls position kept). The 37->24
    downsample is exactly the DINOv2 518px -> 336px (patch 14) import the
    CLIPort bootstrap performs on raw timm checkpoints."""
    import torch.nn.functional as F

    from textocvp_tpu.nn.vit import interpolate_pos_embed

    d = 16
    for old_grid, new_grid in [(37, 24), (14, 24)]:
        pos = 0.02 * rng.standard_normal(
            (1, old_grid * old_grid + 1, d)).astype(np.float32)
        ours = interpolate_pos_embed(pos, new_grid)
        pt = torch.from_numpy(pos[:, 1:]).reshape(
            1, old_grid, old_grid, d).permute(0, 3, 1, 2)
        ref = F.interpolate(pt, size=(new_grid, new_grid), mode="bicubic",
                            antialias=True)
        ref = ref.permute(0, 2, 3, 1).reshape(1, new_grid * new_grid, d).numpy()
        np.testing.assert_allclose(ours[:, 1:], ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(ours[:, :1], pos[:, :1])  # cls kept
