#!/usr/bin/env python
"""End-to-end SERVING throughput: the flagship model behind the HTTP npz
endpoint, measured from the client side (tokenize + pad + dispatch + decode +
serialization + HTTP overhead included).

Builds a CATER SAVi + TextOCVP_T5 experiment with random-init checkpoints in
a temp dir (serving cost does not depend on weight values), starts the real
ThreadingHTTPServer on a loopback port, and fires back-to-back requests.

Prints one JSON line:
  {"metric": "serve_pred_frames_per_sec", "value": N, "unit": ..., ...}

Usage: python bench_serve.py [--batch 16] [--num_preds 19] [--requests 8]
"""

import argparse
import io
import json
import sys
import tempfile
import threading
import time
import urllib.request
import os

# Default the persistent XLA compile cache on (same as bench.py): these
# ViT-scale programs take minutes to compile cold on the remote-attached
# runtime but reload in seconds once cached. setdefault only.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/textocvp_jax_cache"))


def build_experiment(root, num_preds: int, model_kind: str = "cater"):
    """Random-init served experiment: CATER SAVi (the flagship) or the FULL
    CLIPort ExtendedDINOSAUR config (336px, ViT-B/14, MLP patch decoder +
    CNN head) — the heaviest per-request encode the serving stack supports.
    Serving cost does not depend on weight values."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.models import setup_model, setup_predictor
    from textocvp_tpu.train.checkpoints import save_checkpoint

    if model_kind == "dinosaur":
        parent = Experiment.create(root / "e", "ExtendedDINOSAUR", "CLIPort")
    else:
        parent = Experiment.create(root / "e", "SAVi", "CATER_Easy")
    params = parent.params
    params["prediction_params"]["num_preds"] = num_preds
    parent.save_params(params)
    img = params["model"]["model_params"].get("img_size", 64)

    model = setup_model(params)
    videos = jnp.zeros((1, 1, img, img, 3))
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    model_vars = jax.jit(
        lambda r, x: model.init(r, x, decode=True, train=False))(init_rngs, videos)
    save_checkpoint(parent.models_dir, "checkpoint_epoch_final",
                    {"params": model_vars["params"],
                     "batch_stats": model_vars.get("batch_stats", {}) or {}})

    pred_exp = Experiment.create_predictor(parent.exp_path, "t5", "TextOCVP_T5")
    pparams = pred_exp.params
    pparams["prediction_params"]["num_preds"] = num_preds
    pred_exp.save_params(pparams)
    predictor = setup_predictor(pparams)
    slots = jax.jit(
        lambda mv, x, k: model.apply(mv, x, decode=False, rngs={"slots": k})
    )(model_vars, videos, jax.random.PRNGKey(2))["slot_history"]
    pred_vars = jax.jit(
        lambda r, s: predictor.init(
            r, s, caption_tokens=jnp.ones((1, 8), jnp.int32),
            attn_masks=jnp.ones((1, 8), jnp.int32))
    )({"params": jax.random.PRNGKey(3)}, slots)
    save_checkpoint(pred_exp.models_dir, "checkpoint_epoch_final",
                    {"params": pred_vars["params"]})
    return parent.exp_path


def run_concurrent_clients(args, base: str, httpd):
    """--clients N: N threads each fire --requests single-row requests
    back-to-back. Without dynamic batching every 1-row request pays a full
    padded device batch; with --dynamic_batch_ms concurrent rows share one."""
    import numpy as np

    img = 336 if args.model == "dinosaur" else 64
    caption = ("put the red block in the green bowl"
               if args.model == "dinosaur" else "the snitch is picked up")

    def one_request(i: int) -> bytes:
        frames = (np.full((1, 1, img, img, 3), (i % 7) / 7.0) * 255
                  ).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames, captions=np.array([caption]))
        return urllib.request.urlopen(urllib.request.Request(
            base + "/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/npz"}), timeout=600).read()

    latencies = []

    def client(i: int):
        for r in range(args.requests):
            t0 = time.perf_counter()
            body = one_request(i * 1000 + r)
            latencies.append(time.perf_counter() - t0)
            out = np.load(io.BytesIO(body))["pred_frames"]
            assert out.shape == (1, args.num_preds, img, img, 3)

    one_request(0)  # steady-state warm request
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    httpd.shutdown()

    rows = args.clients * args.requests
    lat = sorted(latencies)
    print(json.dumps({
        "metric": f"serve_pred_frames_per_sec (HTTP, {args.model}, "
                  f"{args.clients} concurrent 1-row clients, "
                  f"dynamic_batch_ms={args.dynamic_batch_ms}, "
                  f"pipeline_depth={args.pipeline_depth})",
        "value": round(rows * args.num_preds / dt, 2),
        "unit": "frames/s",
        "request_latency_ms_p50": round(1000 * lat[len(lat) // 2], 1),
        "request_latency_ms_p95": round(1000 * lat[int(len(lat) * 0.95)], 1),
        "batch": args.batch,
        "num_preds": args.num_preds,
    }))


def run_ab_depths(args, service):
    """--ab_depths: alternate DynamicBatcher pipeline depths over one warmed
    service (threads call batcher.predict directly — the HTTP layer is
    common to both arms and only adds noise). Reports per-depth medians."""
    import numpy as np

    from textocvp_tpu.serve.batching import DynamicBatcher

    service.warmup()

    def one_round(depth: int):
        batcher = DynamicBatcher(service, max_wait_ms=args.dynamic_batch_ms,
                                 pipeline_depth=depth)
        lat = []
        n_req = args.clients * args.requests
        interval = (args.open_loop_ms / args.clients / 1000
                    if args.open_loop_ms else 0.0)

        def fire(j: int, start: float):
            if interval:
                time.sleep(max(0.0, start + j * interval - time.perf_counter()))
            frames = np.full((1, 1, 64, 64, 3), (j % 7) / 7.0, np.float32)
            t0 = time.perf_counter()
            out = batcher.predict(frames, ["the snitch is picked up"])
            lat.append(time.perf_counter() - t0)
            assert out.shape[0] == 1

        def client(i: int, start: float):
            for r in range(args.requests):
                fire(i * args.requests + r, start)

        try:
            t0 = time.perf_counter()
            if interval:  # open loop: every request is its own timed thread
                threads = [threading.Thread(target=fire, args=(j, t0))
                           for j in range(n_req)]
            else:  # closed loop: each client fires its next on completion
                threads = [threading.Thread(target=client, args=(i, t0))
                           for i in range(args.clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
        finally:
            batcher.close()
        lat.sort()
        return (n_req * args.num_preds / dt,
                1000 * lat[len(lat) // 2], 1000 * lat[int(len(lat) * 0.95)],
                batcher._dispatches)

    rounds = {1: [], 2: []}
    for r in range(args.ab_depths):
        for depth in (1, 2) if r % 2 == 0 else (2, 1):  # order-balanced
            rounds[depth].append(one_round(depth))
            print(f"round {r} depth {depth}: "
                  f"{rounds[depth][-1][0]:.1f} f/s  "
                  f"p50 {rounds[depth][-1][1]:.0f} ms  "
                  f"p95 {rounds[depth][-1][2]:.0f} ms  "
                  f"({rounds[depth][-1][3]} dispatches)", file=sys.stderr)

    med = lambda v: sorted(v)[len(v) // 2]  # noqa: E731
    out = {}
    for depth, rs in rounds.items():
        out[f"depth{depth}"] = {
            "fps_median": round(med([x[0] for x in rs]), 1),
            "p50_ms_median": round(med([x[1] for x in rs]), 1),
            "p95_ms_median": round(med([x[2] for x in rs]), 1),
        }
    print(json.dumps({
        "metric": f"serve_depth_ab ({args.clients} concurrent 1-row "
                  f"clients x {args.requests}, window "
                  f"{args.dynamic_batch_ms} ms, {args.ab_depths} rounds "
                  "per depth, batcher-level"
                  + (f", open-loop {args.open_loop_ms} ms"
                     if args.open_loop_ms else ", closed-loop") + ")",
        **out, "batch": args.batch, "num_preds": args.num_preds,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cater",
                    choices=["cater", "dinosaur"],
                    help="cater: flagship SAVi+TextOCVP_T5 @64px. dinosaur: "
                         "the FULL CLIPort ExtendedDINOSAUR+TextOCVP_T5 "
                         "@336px (protocol: --batch 16 --num_preds 9) — the "
                         "heaviest per-request encode the stack serves")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_preds", type=int, default=None,
                    help="default: 19 (cater flagship) / 9 (dinosaur "
                         "protocol)")
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--decode_quant", default=None, choices=["int8"],
                    help="opt-in int8 decode on the served model "
                         "(docs/PERFORMANCE.md 'int8 decode')")
    ap.add_argument("--wire_dtype", default="float32",
                    choices=["float32", "uint8"],
                    help="service input wire: uint8 ships request frames to "
                         "the device as uint8, normalized on-device "
                         "(data/wire.py; the HTTP payload is uint8 npz "
                         "either way)")
    ap.add_argument("--clients", type=int, default=0,
                    help="concurrent 1-row clients (0 = one full-batch "
                         "client, the default protocol). Models the "
                         "many-small-requests serving regime")
    ap.add_argument("--dynamic_batch_ms", type=float, default=None,
                    help="enable serve-side dynamic request batching with "
                         "this coalescing window")
    ap.add_argument("--pipeline_depth", type=int, default=2,
                    help="batcher dispatcher threads (2 = double-buffered "
                         "dispatch, 1 = serial as in round 3)")
    ap.add_argument("--ab_depths", type=int, default=0, metavar="ROUNDS",
                    help="A/B pipeline depth 1 vs 2 at the BATCHER level: "
                         "one warmed service, ROUNDS alternating rounds per "
                         "depth, median throughput/p50/p95 per depth. "
                         "Removes the warmup/tunnel drift that makes "
                         "separate-process runs incomparable")
    ap.add_argument("--open_loop_ms", type=float, default=0,
                    help="with --ab_depths: OPEN-loop arrivals — one 1-row "
                         "request every open_loop_ms/clients ms regardless "
                         "of completions (models independent clients; the "
                         "closed-loop default is lockstep, where pipelined "
                         "dispatch cannot engage because the queue is empty "
                         "while a batch is in flight)")
    args = ap.parse_args()
    if args.num_preds is None:
        args.num_preds = 9 if args.model == "dinosaur" else 19

    import numpy as np

    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        print("building experiment + service...", file=sys.stderr)
        exp_path = build_experiment(Path(tmp), args.num_preds, args.model)

        from textocvp_tpu.serve import PredictionService, serve

        if args.decode_quant:
            import json as _json

            pp = Path(exp_path) / "predictors" / "t5" / "experiment_params.json"
            d = _json.loads(pp.read_text())
            d.setdefault("tpu", {})["decode_quant"] = args.decode_quant
            pp.write_text(_json.dumps(d))
        service = PredictionService(
            exp_path, "t5", decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final", batch_size=args.batch,
            wire_dtype=args.wire_dtype)
        if args.ab_depths:
            if args.dynamic_batch_ms is None:
                args.dynamic_batch_ms = 50.0
            run_ab_depths(args, service)
            return
        t0 = time.perf_counter()
        httpd = serve(service, host="127.0.0.1", port=0,  # warmup=compile
                      dynamic_batch_ms=args.dynamic_batch_ms,
                      pipeline_depth=args.pipeline_depth)
        print(f"warmup+compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        if args.clients:
            run_concurrent_clients(args, base, httpd)
            return

        rng = np.random.default_rng(0)
        img = 336 if args.model == "dinosaur" else 64
        caption = ("put the red block in the green bowl"
                   if args.model == "dinosaur" else "the snitch is picked up")
        frames = (rng.random((args.batch, 1, img, img, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames,
                 captions=np.array([caption] * args.batch))
        payload = buf.getvalue()
        req = lambda: urllib.request.urlopen(urllib.request.Request(  # noqa: E731
            base + "/predict", data=payload,
            headers={"Content-Type": "application/npz"})).read()

        req()  # steady-state warm request
        t0 = time.perf_counter()
        for _ in range(args.requests):
            body = req()
        dt = time.perf_counter() - t0
        httpd.shutdown()

        out = np.load(io.BytesIO(body))["pred_frames"]
        assert out.shape[0] == args.batch
        frames_total = args.requests * args.batch * args.num_preds
        suffix = (f", decode_quant={args.decode_quant}"
                  if args.decode_quant else "")
        if args.wire_dtype != "float32":
            suffix += f", wire={args.wire_dtype}"
        label = ("CLIPort ExtendedDINOSAUR+TextOCVP_T5 336px"
                 if args.model == "dinosaur" else "CATER SAVi+TextOCVP_T5")
        print(json.dumps({
            "metric": f"serve_pred_frames_per_sec (HTTP end-to-end, "
                      f"{label}{suffix})",
            "value": round(frames_total / dt, 2),
            "unit": "frames/s",
            "request_latency_ms": round(1000 * dt / args.requests, 1),
            "batch": args.batch,
            "num_preds": args.num_preds,
        }))


if __name__ == "__main__":
    main()
