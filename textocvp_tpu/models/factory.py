"""
Model and predictor factories (reference src/lib/setup_model.py:22-132).
"""

from __future__ import annotations

import jax.numpy as jnp

from textocvp_tpu.models.extended_dinosaur import ExtendedDINOSAUR
from textocvp_tpu.models.predictors import (
    OCVPPar,
    OCVPSeq,
    PredictorWrapper,
    TextOCVP,
    VanillaTransformerPredictor,
)
from textocvp_tpu.models.savi import SAVi

MODELS = ["SAVi", "ExtendedDINOSAUR"]
PREDICTORS = ["VanillaTransformer", "OCVPSeq", "OCVPPar", "TextOCVP_CustomTF", "TextOCVP_T5"]


def _dtype_of(exp_params: dict):
    name = (exp_params.get("tpu") or {}).get("compute_dtype", "float32")
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _use_pallas(exp_params: dict) -> bool:
    return bool((exp_params.get("tpu") or {}).get("use_pallas", False))


def check_image_reconstruction(exp_params: dict, purpose: str = "evaluate"):
    """Fail fast when an ExtendedDINOSAUR experiment cannot produce RGB frames.

    An MLPPatchDecoder with ``reconstruct_images: false`` decodes ViT patch
    features only, so prediction eval/fig-gen/serving (which compare or render
    frames) have nothing to work with — raise a clear error instead of an
    opaque reshape failure downstream."""
    dp = exp_params["model"]["model_params"].get("decoder", {})
    if (dp.get("decoder_name") == "MLPPatchDecoder"
            and not dp.get("decoder_params", {}).get("reconstruct_images")):
        raise ValueError(
            "this experiment's MLPPatchDecoder has reconstruct_images "
            "disabled — it decodes ViT patch features, not RGB frames, so "
            f"there is nothing to {purpose}; retrain with reconstruct_images "
            "or use a SAVi-decoder experiment")


def setup_model(exp_params: dict):
    """Build the decomposition model module from experiment params
    (reference setup_model.py:22-53)."""
    model_name = exp_params["model"]["model_name"]
    model_params = dict(exp_params["model"]["model_params"])
    dtype = _dtype_of(exp_params)
    use_pallas = _use_pallas(exp_params)
    if model_name == "SAVi":
        return SAVi(
            num_slots=model_params["num_slots"],
            slot_dim=model_params["slot_dim"],
            num_iterations=model_params.get("num_iterations", 1),
            num_iterations_first=model_params.get("num_iterations_first", 3),
            in_channels=model_params.get("in_channels", 3),
            mlp_hidden=model_params.get("mlp_hidden", 128),
            mlp_encoder_dim=model_params.get("mlp_encoder_dim", 128),
            initializer=model_params.get("initializer", "LearnedRandom"),
            encoder=model_params["encoder"],
            decoder=model_params["decoder"],
            transition_module=model_params.get("transition_module"),
            use_pallas=use_pallas,
            fast_decode=bool((exp_params.get("tpu") or {}).get("fast_decode", True)),
            fast_decode_expand=(exp_params.get("tpu") or {}).get(
                "fast_decode_expand", "concat"),
            dtype=dtype,
        )
    if model_name == "ExtendedDINOSAUR":
        return ExtendedDINOSAUR(
            img_size=model_params["img_size"],
            num_slots=model_params["num_slots"],
            slot_dim=model_params["slot_dim"],
            num_iterations=model_params.get("num_iterations", 1),
            num_iterations_first=model_params.get("num_iterations_first", 3),
            in_channels=model_params.get("in_channels", 3),
            mlp_hidden=model_params.get("mlp_hidden", 128),
            mlp_encoder_dim=model_params.get("mlp_encoder_dim", 768),
            initializer=model_params.get("initializer", "LearnedRandom"),
            encoder=model_params["encoder"],
            decoder=model_params["decoder"],
            transition_module=model_params.get("transition_module"),
            use_pallas=use_pallas,
            subpixel_upconv=bool((exp_params.get("tpu") or {}).get(
                "subpixel_upconv", True)),
            fused_slot_mix=bool((exp_params.get("tpu") or {}).get(
                "fused_slot_mix", True)),
            dtype=dtype,
        )
    raise NameError(f"Model '{model_name}' not in {MODELS}")


def setup_predictor(exp_params: dict, train: bool = False) -> PredictorWrapper:
    """Build the predictor wrapped in the autoregressive rollout driver
    (reference setup_model.py:58-132).

    ``train`` is accepted so profile-dependent defaults can diverge; today
    every measured default is shared (see ``rollout_unroll`` below)."""
    model_params = exp_params["model"]["model_params"]
    prediction_params = exp_params["prediction_params"]
    predictor_name = exp_params["predictor"]["predictor_name"]
    predictor_params = dict(exp_params["predictor"]["predictor_params"])
    dtype = _dtype_of(exp_params)
    common = dict(
        num_slots=model_params["num_slots"],
        slot_dim=model_params["slot_dim"],
        input_buffer_size=prediction_params["input_buffer_size"],
        dtype=dtype,
    )

    if predictor_name == "VanillaTransformer":
        predictor = VanillaTransformerPredictor(**common, **predictor_params)
    elif predictor_name == "OCVPSeq":
        predictor = OCVPSeq(**common, **predictor_params)
    elif predictor_name == "OCVPPar":
        predictor = OCVPPar(**common, **predictor_params)
    elif predictor_name in ("TextOCVP_CustomTF", "TextOCVP_T5"):
        pp = predictor_params.get("predictor_params", {})
        fusion = predictor_params.get("fusion_params", {})
        predictor = TextOCVP(
            num_slots=model_params["num_slots"],
            slot_dim=model_params["slot_dim"],
            token_dim=pp.get("token_dim", 512),
            n_heads=pp.get("n_heads", 8),
            hidden_dim=pp.get("hidden_dim", 2048),
            num_layers=pp.get("num_layers", 8),
            residual=pp.get("residual", True),
            input_buffer_size=prediction_params["input_buffer_size"],
            fusion_num_heads=fusion.get("num_heads", 8),
            fusion_head_dim=fusion.get("head_dim", 64),
            fusion_mlp_size=fusion.get("mlp_size", 2048),
            text_encoder_type="t5" if predictor_name == "TextOCVP_T5" else "custom_tf",
            text_encoder_params=predictor_params.get("text_encoder_params"),
            dtype=dtype,
        )
    else:
        raise NameError(f"Predictor '{predictor_name}' not in {PREDICTORS}")

    return PredictorWrapper(
        predictor=predictor,
        num_context=prediction_params["num_context"],
        num_preds=prediction_params["num_preds"],
        teacher_force=prediction_params.get("teacher_force", False),
        input_buffer_size=prediction_params.get("input_buffer_size"),
        # scan-unroll of the rollout loop — a measured NEGATIVE, default 1
        # (docs/PERFORMANCE.md "Rollout scan-unroll probe"). Standalone, the
        # eval predict stage reads 162 ms rolled vs 72 ms at unroll=2
        # (bench_rollout_probe.py), but that is a stage-isolation artifact:
        # the end-to-end flagship step is IDENTICAL (274.0 vs 275.0 ms,
        # same-session A/B) because the pipelined two-program dispatch
        # already overlaps what the unroll saves. Training regresses
        # outright (194.8 -> 224.7 ms/step, compile 56 -> 196 s). The knob
        # stays for future shapes; tpu.rollout_unroll overrides.
        rollout_unroll=int((exp_params.get("tpu") or {}).get(
            "rollout_unroll", 1)),
    )
