#!/usr/bin/env python
"""
int8-vs-bf16 probe of the decoder-tail conv (the flagship hot op).

v5e's MXU has a 2x int8 peak over bf16 (~394 vs ~197 TOPS), and the decode
tail — 4x [5x5 conv, 64->64ch, 64x64] over B*P*num_slots slot-frames — is
~68% of the flagship eval step at ~60% of bf16 peak. If XLA lowers an
int8xint8->int32 conv onto the int8 MXU path, a quantized decode could
roughly double the dominant stage; if it upcasts (vector-unit fallback),
this probe documents the negative and the idea dies here, before any
production plumbing (quantization scales, quality-delta guards).

Measures, at the production chunk shape (rows = B*P*slots / chunks):
  conv_bf16      the baseline: bf16 x bf16 -> bf16, 5x5, 64->64ch
  conv_int8      int8 x int8 -> int32 (preferred_element_type), same shape
  conv_int8_deq  int8 conv + per-channel dequant multiply + bf16 cast
                 (what a real quantized layer pays per conv)

Timing protocol matches bench_decode_probe.py: compile once, chain --iters
dispatches on the device FIFO, one trailing scalar fetch as the sync point,
best of --windows windows. Run on the real chip: python bench_int8_conv.py
"""

import argparse
import json
import sys
import time


def time_fn(fn, x, iters, windows):
    import jax

    y = fn(x)
    float(y.sum() if hasattr(y, "sum") else y)  # sync compile+warmup through
    best = None
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(x)
        float(out.sum() if hasattr(out, "sum") else out)  # FIFO drain
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best * 1e3  # ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=2432,
                        help="conv batch (flagship chunk: 64*19*8/4)")
    parser.add_argument("--res", type=int, default=64)
    parser.add_argument("--ch", type=int, default=64)
    parser.add_argument("--ch_out", type=int, default=None,
                        help="output channels (default: same as --ch; the "
                             "DINOSAUR CNN-head convs halve channels)")
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--windows", type=int, default=2)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", file=sys.stderr)
    r, c, k = args.res, args.ch, args.k
    co = args.ch_out or c
    dn = jax.lax.conv_dimension_numbers((1, r, r, c), (k, k, c, co),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = [(k // 2, k // 2)] * 2
    flops = 2 * args.rows * r * r * k * k * c * co

    key = jax.random.PRNGKey(0)
    x_f = jax.random.normal(key, (args.rows, r, r, c), jnp.bfloat16)
    w_f = jax.random.normal(jax.random.PRNGKey(1), (k, k, c, co), jnp.bfloat16)
    x_i = jnp.clip(jnp.round(x_f.astype(jnp.float32) * 32), -127, 127).astype(jnp.int8)
    w_i = jnp.clip(jnp.round(w_f.astype(jnp.float32) * 32), -127, 127).astype(jnp.int8)
    scales = jax.random.uniform(jax.random.PRNGKey(2), (co,), jnp.float32,
                                0.001, 0.01)

    @jax.jit
    def conv_bf16(x):
        return jax.lax.conv_general_dilated(
            x, w_f, (1, 1), pad, dimension_numbers=dn)

    @jax.jit
    def conv_int8(x):
        return jax.lax.conv_general_dilated(
            x, w_i, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_int8_deq(x):
        y = jax.lax.conv_general_dilated(
            x, w_i, (1, 1), pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * scales).astype(jnp.bfloat16)

    results = {}
    for name, fn, x in (("conv_bf16", conv_bf16, x_f),
                        ("conv_int8", conv_int8, x_i),
                        ("conv_int8_deq", conv_int8_deq, x_i)):
        try:
            ms = time_fn(fn, x, args.iters, args.windows)
            results[name] = ms
            print(json.dumps({
                "metric": name, "value": round(ms, 2), "unit": "ms",
                "tflops": round(flops / (ms * 1e-3) / 1e12, 1),
                "rows": args.rows,
            }))
        except Exception as e:  # lowering rejection is itself a result
            results[name] = None
            print(json.dumps({"metric": name, "error": f"{type(e).__name__}: {e}"[:300]}))

    if results.get("conv_bf16") and results.get("conv_int8_deq"):
        print(json.dumps({
            "metric": "int8_deq_speedup_vs_bf16",
            "value": round(results["conv_bf16"] / results["conv_int8_deq"], 3),
            "unit": "x",
        }))


if __name__ == "__main__":
    main()
