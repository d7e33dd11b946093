#!/usr/bin/env python
"""
Structured probe of the remaining decode scheduling gap (VERDICT r2 weak #6):
the flagship decode's chunked tail sustains ~120 TFLOPS vs the ~152 TFLOPS
isolated-conv ceiling measured on the same chip. Candidates probed here, each
as the EXACT production decode program (fast-broadcast first conv + expand,
scanned tail, const-baked weights — bench.py decode_stage):

  chunks x unroll grid   lax.scan unroll>1 lets XLA software-pipeline
                         consecutive chunk bodies (TEXTOCVP_TAIL_UNROLL knob
                         in ConvDecoder._tail_scanned).
  flat                   the no-chunk baseline for reference.

Each variant is compiled once and timed over --iters dispatches chained on
the device FIFO with a single trailing scalar fetch (the only reliable sync
on the remote-attached runtime). Prints one JSON line per variant plus a
"best" summary line.

Run on the real chip:  python bench_decode_probe.py --iters 10
"""

import argparse
import itertools
import json
import os
import sys
import time


def build_decode(model, model_vars, num_slots, slot_dim, n_rows, tail_chunks,
                 quant_scales=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def decode_stage(pred_slots):
        dec = model.apply(model_vars, pred_slots, method="decode",
                          tail_chunks=tail_chunks, quant_scales=quant_scales)
        imgs = jnp.clip(dec["recons_imgs"], 0, 1)
        return jnp.sum(imgs)

    return decode_stage


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_preds", type=int, default=19)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--chunks", default="2,4,8")
    parser.add_argument("--unrolls", default="1,2,4")
    parser.add_argument("--flat", action="store_true", default=False,
                        help="also time the flat (chunks=1) decode")
    parser.add_argument("--decode_quant", default=None, choices=["int8"],
                        help="probe the grid under the int8 decoder tail")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model

    print(f"devices: {jax.devices()}", file=sys.stderr)

    exp_params = build_exp_params("SAVi", "CATER_Easy")
    exp_params["tpu"] = {"compute_dtype": args.dtype,
                         "fast_decode_expand": "gather"}
    model = setup_model(exp_params)
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    slot_dim = exp_params["model"]["model_params"]["slot_dim"]

    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = jax.random.uniform(jax.random.PRNGKey(14), (2, 1, 64, 64, 3))
    model_vars = jax.jit(
        lambda r, x: model.init(r, x, decode=True, train=False)
    )(init_rngs, videos)

    n_rows = args.batch_size * args.num_preds
    pred_slots = jax.random.normal(
        jax.random.PRNGKey(3), (n_rows, num_slots, slot_dim), dtype=jnp.float32)

    # per-frame decoder FLOPs for the TFLOPS readout (4-layer 64ch + final):
    # conv flops = 2 * H*W*K*K*Cin*Cout per frame per layer
    dp = exp_params["model"]["model_params"]["decoder"]["decoder_params"]
    chans = dp["num_channels"]
    k = dp["kernel_size"]
    h, w = 64, 64
    flops_frame = 0
    cin = slot_dim
    for cout in chans:
        flops_frame += 2 * h * w * k * k * cin * cout
        cin = cout
    flops_frame += 2 * h * w * 3 * 3 * cin * 4  # final 3x3 conv -> RGBA
    total_flops = flops_frame * n_rows * num_slots

    def time_variant(decode_stage):
        s = decode_stage(pred_slots)
        float(s)  # compile + first
        for _ in range(2):
            float(decode_stage(pred_slots))
        t0 = time.perf_counter()
        outs = [decode_stage(pred_slots) for _ in range(args.iters)]
        for s in outs:
            float(s)
        return 1000 * (time.perf_counter() - t0) / args.iters

    chunk_list = [int(c) for c in args.chunks.split(",")]
    unroll_list = [int(u) for u in args.unrolls.split(",")]
    results = []

    quant_scales = None
    if args.decode_quant == "int8":
        from textocvp_tpu.models.quant import calibrate_decode_scales

        quant_scales = jnp.asarray(calibrate_decode_scales(
            model, model_vars,
            pred_slots.reshape(-1, num_slots, slot_dim)[:256]))
        print(f"int8 scales: {quant_scales}", file=sys.stderr)

    if args.flat:
        ms = time_variant(build_decode(model, model_vars, num_slots, slot_dim,
                                       n_rows, 1, quant_scales))
        r = {"variant": "flat", "ms": round(ms, 1),
             "tflops": round(total_flops / (ms / 1000) / 1e12, 1)}
        results.append(r)
        print(json.dumps(r))

    for chunks, unroll in itertools.product(chunk_list, unroll_list):
        if n_rows % chunks:
            continue
        os.environ["TEXTOCVP_TAIL_UNROLL"] = str(unroll)
        ms = time_variant(build_decode(model, model_vars, num_slots, slot_dim,
                                       n_rows, chunks, quant_scales))
        r = {"variant": f"chunks={chunks} unroll={unroll}", "ms": round(ms, 1),
             "tflops": round(total_flops / (ms / 1000) / 1e12, 1)}
        results.append(r)
        print(json.dumps(r))
    os.environ.pop("TEXTOCVP_TAIL_UNROLL", None)

    if not results:
        sys.exit(f"no measurable variant: none of --chunks divides "
                 f"n_rows={n_rows} (pass --flat or a dividing chunk count)")
    best = min(results, key=lambda r: r["ms"])
    print(json.dumps({"best": best["variant"], "ms": best["ms"],
                      "tflops": best["tflops"],
                      "conv_frames": n_rows * num_slots}))


if __name__ == "__main__":
    main()
