#!/usr/bin/env python
"""
ExtendedDINOSAUR + TextOCVP_T5 prediction-eval probe at the CLIPort protocol
shape (reference scripts/05_evaluate_TextOCVP_CLIPort.sh: batch 16, num_seed
1, num_preds 9, 336px) — the SECOND headline benchmark next to bench.py's
CATER flagship. Builds the evaluator's exact two-stage structure (ViT
seed-encode + rollout; patch-decode + CNN head + PSNR/SSIM/LPIPS fused in one
program, weights as ARGUMENTS — the 344 MB ViT exceeds the const-bake limit)
with random weights, and times it end-to-end.

Prints one JSON line like bench.py. Round-2 measured ~127 ms/step at B=8
(~550 pred-frames/s/chip) via an ad-hoc version of this; this script makes
the measurement repeatable and covers the protocol batch size.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_preds", type=int, default=9)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--decode_quant", default=None, choices=["int8"],
                    help="opt-in int8 patch-MLP + BN-folded CNN head "
                         "(changes outputs; docs/PERFORMANCE.md 'int8 "
                         "decode') — NOT the default headline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.config import add_predictor_params, build_exp_params
    from textocvp_tpu.models import setup_model, setup_predictor
    from textocvp_tpu.train.metrics import MetricTracker

    exp_params = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    exp_params = add_predictor_params(exp_params, "TextOCVP_T5")
    exp_params["prediction_params"]["num_preds"] = args.num_preds
    exp_params["tpu"] = {"compute_dtype": args.dtype,
                         "mesh_axes": {"data": -1, "model": 1}}

    model = setup_model(exp_params)
    predictor = setup_predictor(exp_params)
    tracker = MetricTracker(("psnr", "ssim", "lpips"))
    c = exp_params["prediction_params"]["num_context"]
    p = args.num_preds
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    slot_dim = exp_params["model"]["model_params"]["slot_dim"]
    img = exp_params["model"]["model_params"]["img_size"]
    b = args.batch_size

    rng = jax.random.PRNGKey(14)
    videos = jax.random.uniform(rng, (b, c + p, img, img, 3), dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, 20), 2, 30000)
    attn_masks = jnp.ones((b, 20), dtype=jnp.int32)

    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    t0 = time.perf_counter()
    model_vars = jax.jit(
        lambda r, x: model.init(r, x, decode=True, train=False)
    )(init_rngs, videos[:1, :2])
    slot_sample = jax.jit(
        lambda mv, x, key: model.apply(mv, x, decode=False, rngs={"slots": key})
    )(model_vars, videos[:1, :c], jax.random.PRNGKey(2))["slot_history"]
    pred_vars = jax.jit(
        lambda r, s, t, m: predictor.init(r, s, caption_tokens=t, attn_masks=m)
    )({"params": jax.random.PRNGKey(3)}, slot_sample, tokens[:1], attn_masks[:1])
    print(f"build+init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # the evaluator's two-stage structure; ViT-scale weights stay ARGUMENTS
    # (oversized jit constants are rejected by the remote compile service)
    @jax.jit
    def predict_stage(mv, pv, videos, tokens, attn_masks, key):
        out = model.apply(mv, videos[:, :c], decode=False, rngs={"slots": key})
        return predictor.apply(pv, out["slot_history"], num_preds=p,
                               teacher_force=False, caption_tokens=tokens,
                               attn_masks=attn_masks)

    quant_scales = None
    if args.decode_quant == "int8":
        from textocvp_tpu.models.quant import calibrate_decode_scales

        quant_scales = jnp.asarray(calibrate_decode_scales(
            model, model_vars, slot_sample.reshape(-1, num_slots, slot_dim)))
        print(f"int8 scales: {quant_scales}", file=sys.stderr)

    @jax.jit
    def decode_metrics_stage(mv, pred_slots, videos):
        dec = model.apply(mv, pred_slots.reshape(b * p, num_slots, slot_dim),
                          method="decode", quant_scales=quant_scales)
        targets = jnp.clip(videos[:, c:c + p], 0, 1)
        pred_imgs = jnp.clip(dec["recons_imgs"].reshape(targets.shape), 0, 1)
        vals = tracker.compute(pred_imgs, targets)
        return vals, jnp.sum(pred_imgs)

    def eval_step(videos, tokens, attn_masks, key):
        ps = predict_stage(model_vars, pred_vars, videos, tokens, attn_masks, key)
        return decode_metrics_stage(model_vars, ps, videos)

    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    _, s = eval_step(videos, tokens, attn_masks, key)
    float(s)
    print(f"compile+first-step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # shared warmup-sync + best-of-N-windows methodology (bench_common.py)
    from bench_common import time_windows

    best = time_windows(
        lambda i: eval_step(videos, tokens, attn_masks,
                            jax.random.fold_in(key, i)),
        lambda out: float(out[1]), args.iters, windows=args.windows)

    n_chips = jax.local_device_count()
    fps = b * p * args.iters / best / n_chips
    suffix = f", decode_quant={args.decode_quant}" if args.decode_quant else ""
    print(json.dumps({
        "metric": f"dinosaur_eval_pred_frames_per_sec_per_chip "
                  f"(CLIPort ExtendedDINOSAUR+TextOCVP_T5, B={b}, p={p}, "
                  f"336px, {args.dtype}{suffix})",
        "value": round(fps, 2), "unit": "frames/s/chip",
        "step_ms": round(1000 * best / args.iters, 2),
    }))


if __name__ == "__main__":
    main()
