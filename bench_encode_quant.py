"""In-process A/B: bf16 vs int8 frozen-ViT encode (tpu.encode_quant) at the
CLIPort 03-eval shape — the protocol where the encode dominates (the ViT
runs over ALL B*T frames, not just the seeds).

Times the full ExtendedDINOSAUR decompose(decode=False) program (ViT +
projection + slot attention + transition) both arms in one process.
"""

from __future__ import annotations

import argparse
import json
import sys

from bench_common import time_windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model
    from textocvp_tpu.models.quant import calibrate_encode_scales

    print(f"devices: {jax.devices()}", file=sys.stderr)
    exp = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    exp["tpu"] = {"compute_dtype": args.dtype}
    model = setup_model(exp)
    img = exp["model"]["model_params"]["img_size"]
    b, t = args.batch, args.frames
    videos = jax.random.uniform(jax.random.PRNGKey(0), (b, t, img, img, 3),
                                jnp.float32)
    mv = jax.jit(lambda r, x: model.init(r, x, decode=False, train=False))(
        {"params": jax.random.PRNGKey(1), "slots": jax.random.PRNGKey(2)},
        videos[:1, :2])
    scales = jnp.asarray(calibrate_encode_scales(model, mv, videos[:1, :2]))

    def build(es):
        @jax.jit
        def f(mv, x, key):
            ekw = {} if es is None else {"encode_quant_scales": es}
            out = model.apply(mv, x, decode=False, rngs={"slots": key}, **ekw)
            return out["slot_history"]
        return f

    key = jax.random.PRNGKey(7)
    rows = {}
    for name, es in (("bf16", None), ("int8", scales)):
        fn = build(es)
        dt = time_windows(
            lambda i: fn(mv, videos, jax.random.fold_in(key, i)),
            lambda o: float(o[0, 0, 0, 0]), args.iters, windows=args.windows)
        ms = 1000 * dt / args.iters
        rows[name] = round(ms, 2)
        print(f"{name:>6}: {ms:8.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": f"dinosaur_encode_quant_ab (B={b}, T={t}, {img}px, "
                  f"{args.dtype})",
        "ms": rows,
        "speedup": round(rows["bf16"] / rows["int8"], 3),
        "unit": "ms/decompose(decode=False)",
    }))


if __name__ == "__main__":
    main()
