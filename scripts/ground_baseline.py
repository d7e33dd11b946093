#!/usr/bin/env python
"""
Ground the relative-throughput claim on identical hardware (CPU).

bench.py's ``vs_baseline`` divides the measured TPU throughput by
``REF_GPU_FPS`` — an estimate, because the reference publishes no numbers and
no GPU is available here (BASELINE.md). What CAN be measured in this
environment is both implementations running the IDENTICAL protocol on the
IDENTICAL silicon: the reference torch modules (imported from
/root/reference/src, T5 random-init at exact t5-small geometry) vs our JAX
build with the converted weights, CPU both sides, at the real CATER flagship
config (SAVi 8 slots x 128, TextOCVP_T5 token 512 x 8 layers,
seed-encode -> num_preds rollout -> decode).

``--protocol cliport`` grounds the SECOND headline the same way: the real
reference ExtendedDINOSAUR (frozen ViT-B/14 @336px via the injected
timm-lookalike torch ViT proven in tests/test_reference_parity.py) +
TextOCVP_T5 at the CLIPort eval protocol
(/root/reference/scripts/05_evaluate_TextOCVP_CLIPort.sh: num_seed 1,
num_preds 9; batch scaled down for CPU feasibility, throughput reported
per frame).

Prints one JSON line:
  {"torch_cpu_fps": ..., "jax_cpu_fps": ..., "jax_over_torch_cpu": ...,
   "protocol": ...}

This does not replace a GPU measurement of the reference — it pins down the
implementation-efficiency ratio with hardware held constant, which is the
sanity check behind bench.py's "baseline_estimated": true.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REPO = "/root/repo"
REF_SRC = "/root/reference/src"
sys.path.insert(0, REPO)
sys.path.insert(0, REF_SRC)


def _install_stubs():
    sys.path.insert(0, f"{REPO}/tests")
    from test_reference_parity import _install_import_stubs

    _install_import_stubs()


def _build_torch_wrapper(exp_params):
    """Reference TextOCVP_T5 + PredictorWrapper with the HF T5 encoder built
    at exact t5-small geometry from random init (no network)."""
    import copy

    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from models.Predictors.predictor_wrapper import PredictorWrapper
    from models.Predictors.text_cond_OCVP import TextOCVP_T5

    hf_cfg = HFT5Config(vocab_size=32128, d_model=512, d_kv=64, d_ff=2048,
                        num_layers=6, num_heads=8, feed_forward_proj="relu")
    stub = T5EncoderModel(hf_cfg)
    orig = T5EncoderModel.from_pretrained
    T5EncoderModel.from_pretrained = classmethod(lambda cls, *a, **k: stub)
    try:
        pp = copy.deepcopy(exp_params["predictor"]["predictor_params"])
        pp["predictor_params"]["input_buffer_size"] = \
            exp_params["prediction_params"]["input_buffer_size"]
        pred = TextOCVP_T5(
            slot_dim=exp_params["model"]["model_params"]["slot_dim"],
            predictor_params=pp["predictor_params"],
            fusion_params=pp["fusion_params"],
            text_encoder_params=pp.get("text_encoder_params") or {},
        )
        wrapper = PredictorWrapper(exp_params=exp_params, predictor=pred).eval()
    finally:
        T5EncoderModel.from_pretrained = orig
    return wrapper


def build_torch(exp_params, batch_size, num_preds, protocol="cater"):
    import copy

    import torch

    torch.manual_seed(14)
    mp = copy.deepcopy(exp_params["model"]["model_params"])
    mp["initializer"] = "Learned"
    if protocol == "cater":
        from models.SAVi import SAVi

        decomp = SAVi(**mp).eval()
        img = 64
    else:  # cliport: the real reference ExtendedDINOSAUR with the injected
        # timm-lookalike torch ViT (tests/test_reference_parity.py)
        sys.path.insert(0, f"{REPO}/tests")
        from test_reference_parity import _inject_torch_vit_factories

        _inject_torch_vit_factories()
        from models.ExtendedDINOSAUR import ExtendedDINOSAUR

        decomp = ExtendedDINOSAUR(**mp).eval()
        img = mp["img_size"]
    wrapper = _build_torch_wrapper(exp_params)

    c = exp_params["prediction_params"]["num_context"]
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    slot_dim = exp_params["model"]["model_params"]["slot_dim"]
    videos = torch.rand(batch_size, c, 3, img, img)
    tokens = torch.randint(2, 30000, (batch_size, 20))
    masks = torch.ones(batch_size, 20, dtype=torch.long)

    def step():
        with torch.no_grad():
            out = decomp(mode="decomp", x=videos, num_imgs=c, decode=False)
            pred_slots = wrapper(out["slot_history"], num_preds=num_preds,
                                 caption_tokens=tokens, attn_masks=masks)
            dec = decomp(mode="decode",
                         slots=pred_slots.reshape(batch_size * num_preds,
                                                  num_slots, slot_dim))
            return float(dec["recons_imgs"].sum())

    return step, decomp, wrapper


def build_jax(exp_params, decomp_t, wrapper_t, batch_size, num_preds,
              protocol="cater"):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.models import setup_model, setup_predictor
    from textocvp_tpu.train.torch_import import (
        convert_extended_dinosaur,
        convert_predictor,
        convert_savi,
    )

    exp_params = dict(exp_params)
    exp_params["model"]["model_params"]["initializer"] = "Learned"
    exp_params.setdefault("tpu", {})["fast_decode_expand"] = "gather"
    model = setup_model(exp_params)
    predictor = setup_predictor(exp_params)

    sd_decomp = {k: v.detach().numpy() for k, v in decomp_t.state_dict().items()}
    sd_pred = {k: v.detach().numpy() for k, v in wrapper_t.state_dict().items()}
    if protocol == "cater":
        converted = convert_savi(sd_decomp, exp_params["model"]["model_params"])
        img = 64
    else:
        converted = convert_extended_dinosaur(
            sd_decomp, exp_params["model"]["model_params"])
        img = exp_params["model"]["model_params"]["img_size"]
    model_vars = {"params": converted["params"]}
    if "batch_stats" in converted:
        model_vars["batch_stats"] = converted["batch_stats"]
    pred_params = convert_predictor(sd_pred, exp_params)["params"]

    c = exp_params["prediction_params"]["num_context"]
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    slot_dim = exp_params["model"]["model_params"]["slot_dim"]
    videos = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch_size, c, img, img, 3))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch_size, 20), 2, 30000)
    masks = jnp.ones((batch_size, 20), jnp.int32)

    @jax.jit
    def full(mv, pp, videos, tokens, masks):
        out = model.apply(mv, videos, decode=False,
                          rngs={"slots": jax.random.PRNGKey(2)})
        pred_slots = predictor.apply({"params": pp}, out["slot_history"],
                                     num_preds=num_preds, teacher_force=False,
                                     caption_tokens=tokens, attn_masks=masks)
        dec = model.apply(mv,
                          pred_slots.reshape(batch_size * num_preds, num_slots,
                                             slot_dim), method="decode")
        return jnp.sum(dec["recons_imgs"])

    def step():
        return float(full(model_vars, pred_params, videos, tokens, masks))

    return step


def timeit(step, iters):
    step()  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--protocol", choices=["cater", "cliport"], default="cater")
    ap.add_argument("--batch_size", type=int, default=None,
                    help="default: 4 (cater), 1 (cliport — ViT-B/14 @336px "
                         "is heavy on CPU; throughput is per frame anyway)")
    ap.add_argument("--num_preds", type=int, default=None,
                    help="default: 19 (cater), 9 (cliport) — the reference "
                         "eval scripts' settings")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)
    if args.batch_size is None:
        args.batch_size = 4 if args.protocol == "cater" else 1
    if args.num_preds is None:
        args.num_preds = 19 if args.protocol == "cater" else 9

    import os

    # This tool grounds the comparison on CPU BOTH sides by definition —
    # force it (setdefault is not enough: this machine's profile exports
    # JAX_PLATFORMS=axon, and the round-4 first attempt silently timed the
    # jax leg over the TPU tunnel, paying a full weights H2D per call).
    os.environ["JAX_PLATFORMS"] = "cpu"
    _install_stubs()

    from textocvp_tpu.core.config import add_predictor_params, build_exp_params

    decomp_name, dataset = (("SAVi", "CATER_Easy") if args.protocol == "cater"
                            else ("ExtendedDINOSAUR", "CLIPort"))
    exp_params = build_exp_params(decomp_name, dataset)
    exp_params = add_predictor_params(exp_params, "TextOCVP_T5")
    exp_params["prediction_params"]["num_preds"] = args.num_preds

    torch_step, decomp_t, wrapper_t = build_torch(
        exp_params, args.batch_size, args.num_preds, protocol=args.protocol)
    t_torch = timeit(torch_step, args.iters)
    print(f"torch-cpu: {t_torch * 1000:.1f} ms/step", file=sys.stderr)

    jax_step = build_jax(exp_params, decomp_t, wrapper_t, args.batch_size,
                         args.num_preds, protocol=args.protocol)
    t_jax = timeit(jax_step, args.iters)
    print(f"jax-cpu:   {t_jax * 1000:.1f} ms/step", file=sys.stderr)

    frames = args.batch_size * args.num_preds
    name = ("CATER flagship" if args.protocol == "cater"
            else "CLIPort ExtendedDINOSAUR+TextOCVP_T5 (ViT-B/14 @336px)")
    print(json.dumps({
        "torch_cpu_fps": round(frames / t_torch, 1),
        "jax_cpu_fps": round(frames / t_jax, 1),
        "jax_over_torch_cpu": round(t_torch / t_jax, 2),
        "protocol": f"{name} seed-encode->rollout({args.num_preds})->decode, "
                    f"batch {args.batch_size}, CPU both sides, identical weights",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
