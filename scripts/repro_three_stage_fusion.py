#!/usr/bin/env python
"""Minimal reproducer for the three-stage fusion pathology (PERFORMANCE.md §4).

In the flagship pipeline, compiling encoder-convs + rollout-scan + decoder-convs
as ONE XLA program produces a schedule ~7x slower than the sum of its parts,
while every PAIR of stages fuses fine. This script strips the model away and
reproduces the shape with three toy stages:

    A: conv stack on images        (stands in for the SAVi encoder)
    B: lax.scan of small matmuls   (stands in for the rollout)
    C: conv stack on many frames   (stands in for the broadcast decoder)

and times A+B+C as one jitted program vs (A+B) and (C) chained.

Usage (on the TPU runtime):
    python scripts/repro_three_stage_fusion.py [--batch 32] [--steps 19]

Prints one timing line per configuration. If `fused` ~= `split`, the
pathology is gone on the current toolchain and the two-program split in
bench.py / train/evaluator.py can be retired.

RESULT on the current toolchain (v5e, 2026-08-16): this TOY shape does NOT
reproduce it — fused 69.3 ms vs split 59.6 ms (1.16x), while the real model
degrades ~7x. The trigger needs the real pipeline's structure (the
spatial-broadcast/gather-expand decode feeding wide conv stacks, per the
decode-chunking bisection in docs/PERFORMANCE.md: broadcast/gather mixed
into conv-heavy program regions is what the scheduler mishandles). Kept as
the baseline harness for building a faithful minimal repro.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def build(batch, steps, h=64, ch=64, slots=8, dim=128):
    k = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(k, (batch, h, h, 3), dtype=jnp.bfloat16)
    enc_w = [jax.random.normal(jax.random.fold_in(k, i),
                               (5, 5, 3 if i == 0 else ch, ch),
                               dtype=jnp.bfloat16) * 0.05 for i in range(4)]
    dec_w = [jax.random.normal(jax.random.fold_in(k, 10 + i),
                               (5, 5, ch, ch), dtype=jnp.bfloat16) * 0.05
             for i in range(4)]
    mat = jax.random.normal(jax.random.fold_in(k, 20), (slots * dim, slots * dim),
                            dtype=jnp.bfloat16) * 0.02

    def conv(x, w):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))

    def stage_a(imgs):
        x = imgs
        for w in enc_w:
            x = conv(x, w)
        # pool to a slot-state-sized carrier
        s = jnp.mean(x, axis=(1, 2))                       # (B, ch)
        s = jnp.tile(s, (1, slots * dim // ch))            # (B, slots*dim)
        return s

    def stage_b(s):
        def body(carry, _):
            nxt = jnp.tanh(carry @ mat)
            return nxt, nxt
        _, ys = jax.lax.scan(body, s, None, length=steps)  # (steps, B, slots*dim)
        return ys

    def stage_c(ys):
        # expand each step-state to a frame and run the decoder stack
        x = ys.reshape(steps * ys.shape[1], slots, dim)
        x = x.reshape(x.shape[0], 1, 1, slots * dim)[..., :ch]
        x = jnp.broadcast_to(x, (x.shape[0], h, h, ch))
        for w in dec_w:
            x = conv(x, w)
        return jnp.sum(x)

    fused = jax.jit(lambda imgs: stage_c(stage_b(stage_a(imgs))))
    ab = jax.jit(lambda imgs: stage_b(stage_a(imgs)))
    c_only = jax.jit(stage_c)
    return imgs, fused, ab, c_only


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jnp.sum(out if isinstance(out, jnp.ndarray) else out[0])
    float(jnp.sum(out))  # sync
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(jnp.sum(o))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=19)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    print("devices:", jax.devices())
    imgs, fused, ab, c_only = build(args.batch, args.steps)

    t_fused = timeit(fused, imgs, iters=args.iters)

    def split(imgs):
        return c_only(ab(imgs))

    t_split = timeit(split, imgs, iters=args.iters)
    t_ab = timeit(ab, imgs, iters=args.iters)
    t_c = timeit(c_only, ab(imgs), iters=args.iters)

    print(f"fused A+B+C : {t_fused:8.1f} ms")
    print(f"split (A+B),(C): {t_split:8.1f} ms   [A+B {t_ab:.1f} + C {t_c:.1f}]")
    print(f"ratio fused/split: {t_fused / t_split:.2f}x "
          f"({'PATHOLOGY PRESENT' if t_fused > 1.5 * t_split else 'no pathology'})")


if __name__ == "__main__":
    main()
