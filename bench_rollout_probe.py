#!/usr/bin/env python
"""
Rollout-stage probe: scan-unroll sweep over the 19-step autoregressive
predictor rollout (seed-encode + rollout = bench.py's predict_stage, 21% of
the flagship step and latency-bound — docs/PERFORMANCE.md "Flagship step
breakdown").

`lax.scan` unrolling is semantics-preserving; the question is whether letting
XLA schedule across step boundaries buys anything on the sequentially-
dependent small-matmul chain, the way it did for the (independent-iteration)
decode tail. Sweeps TEXTOCVP_ROLLOUT_UNROLL (read at trace time by
PredictorWrapper) over the flagship config.
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--num_preds", type=int, default=19)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--unrolls", default="1,2,4,19")
    ap.add_argument("--decode", action="store_true",
                    help="also time the decode stage standalone per build")
    args = ap.parse_args()

    import jax

    from bench import build_flagship

    for unroll in [int(u) for u in args.unrolls.split(",")]:
        os.environ["TEXTOCVP_ROLLOUT_UNROLL"] = str(unroll)
        t0 = time.perf_counter()
        eval_step, (videos, tokens, attn_masks) = build_flagship(
            args.batch_size, args.num_preds, "bfloat16", False)
        build_s = time.perf_counter() - t0

        # time the predict stage alone (decode dominates the full step and
        # would bury a rollout-stage delta)
        predict = eval_step.predict_stage
        import jax.numpy as jnp

        key = jax.random.PRNGKey(7)
        t0 = time.perf_counter()
        ps = predict(videos, tokens, attn_masks, key)
        float(jnp.sum(ps))
        compile_s = time.perf_counter() - t0

        for _ in range(2):  # warmup
            float(jnp.sum(predict(videos, tokens, attn_masks, key)))

        t0 = time.perf_counter()
        scalars = []
        for i in range(args.iters):
            scalars.append(jnp.sum(predict(videos, tokens, attn_masks,
                                           jax.random.fold_in(key, i))))
        for s in scalars:
            float(s)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"unroll={unroll:2d}: predict stage {dt * 1e3:7.2f} ms "
              f"(build {build_s:.0f}s compile {compile_s:.0f}s)",
              flush=True)

        if args.decode:
            decode = eval_step.decode_stage
            imgs, s = decode(ps)
            float(s)
            for _ in range(2):
                _, s = decode(ps)
                float(s)
            t0 = time.perf_counter()
            scalars = [decode(ps)[1] for _ in range(args.iters)]
            for s in scalars:
                float(s)
            ddt = (time.perf_counter() - t0) / args.iters
            print(f"           decode stage  {ddt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
