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


def build_experiment(root, num_preds: int):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.models import setup_model, setup_predictor
    from textocvp_tpu.train.checkpoints import save_checkpoint

    parent = Experiment.create(root / "e", "SAVi", "CATER_Easy")
    params = parent.params
    params["prediction_params"]["num_preds"] = num_preds
    parent.save_params(params)

    model = setup_model(params)
    videos = jnp.zeros((1, 1, 64, 64, 3))
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    model_vars = jax.jit(
        lambda r, x: model.init(r, x, decode=True, train=False))(init_rngs, videos)
    save_checkpoint(parent.models_dir, "checkpoint_epoch_final",
                    {"params": model_vars["params"]})

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

    def one_request(i: int) -> bytes:
        frames = (np.full((1, 1, 64, 64, 3), (i % 7) / 7.0) * 255
                  ).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames,
                 captions=np.array(["the snitch is picked up"]))
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
            assert out.shape == (1, args.num_preds, 64, 64, 3)

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
        "metric": "serve_pred_frames_per_sec (HTTP, "
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num_preds", type=int, default=19)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--decode_quant", default=None, choices=["int8"],
                    help="opt-in int8 decode on the served model "
                         "(docs/PERFORMANCE.md 'int8 decode')")
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
    args = ap.parse_args()

    import numpy as np

    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        print("building experiment + service...", file=sys.stderr)
        exp_path = build_experiment(Path(tmp), args.num_preds)

        from textocvp_tpu.serve import PredictionService, serve

        if args.decode_quant:
            import json as _json

            pp = Path(exp_path) / "predictors" / "t5" / "experiment_params.json"
            d = _json.loads(pp.read_text())
            d.setdefault("tpu", {})["decode_quant"] = args.decode_quant
            pp.write_text(_json.dumps(d))
        service = PredictionService(
            exp_path, "t5", decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final", batch_size=args.batch)
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
        frames = (rng.random((args.batch, 1, 64, 64, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames,
                 captions=np.array(["the snitch is picked up"] * args.batch))
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
        print(json.dumps({
            "metric": "serve_pred_frames_per_sec (HTTP end-to-end, CATER "
                      f"SAVi+TextOCVP_T5{suffix})",
            "value": round(frames_total / dt, 2),
            "unit": "frames/s",
            "request_latency_ms": round(1000 * dt / args.requests, 1),
            "batch": args.batch,
            "num_preds": args.num_preds,
        }))


if __name__ == "__main__":
    main()
