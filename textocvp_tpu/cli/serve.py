"""CLI 07: serve a trained predictor experiment over HTTP (TPU-native
deployment path; no reference equivalent — its inference surface stops at the
batch eval script, reference 05_evaluate_predictor.py)."""

import argparse

from textocvp_tpu.cli.arguments import _norm_exp_dir


def serve_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve text-conditioned video prediction over HTTP")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--name_pred_exp", required=True)
    parser.add_argument("--decomp_ckpt", required=True)
    parser.add_argument("--pred_ckpt", required=True)
    parser.add_argument("--num_seed", type=int, default=None)
    parser.add_argument("--num_preds", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="compiled request batch (requests are padded)")
    parser.add_argument("--max_tokens", type=int, default=24)
    parser.add_argument("--mesh_data", type=int, default=0,
                        help="multi-chip serving: shard request batches over "
                             "a data axis of this size (-1 = all remaining "
                             "devices; 0 = single-device serving)")
    parser.add_argument("--mesh_model", type=int, default=1,
                        help="multi-chip serving: tensor-parallel axis for "
                             "the predictor's matmuls (needs --mesh_data)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--dynamic_batch_ms", type=float, default=None,
                        help="coalesce concurrent requests into shared "
                             "device batches, waiting at most this many ms "
                             "to fill a batch (off by default)")
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="dispatcher threads for dynamic batching: 2 "
                             "packs batch N+1 while N runs on-device "
                             "(lower p95), 1 dispatches serially")
    parser.add_argument("--wire_dtype", default="float32",
                        choices=["float32", "uint8"],
                        help="request wire dtype: uint8 ships context frames "
                             "to the device as uint8 and normalizes on-device "
                             "(4x fewer H2D bytes; float inputs snap to the "
                             "1/255 grid — lossless for camera frames)")
    parser.add_argument("--export", default=None, metavar="DIR",
                        help="instead of serving, AOT-export the compiled "
                             "stages (StableHLO + manifest) to DIR — "
                             "deployable without model code or checkpoints")
    args = parser.parse_args(argv)
    if args.mesh_model > 1 and not args.mesh_data:
        parser.error("--mesh_model needs a mesh: pass --mesh_data "
                     "(e.g. --mesh_data -1 to span the remaining devices); "
                     "with --mesh_data 0 the service is single-device and "
                     "the tensor-parallel request would be silently ignored")
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def main(argv=None):
    args = serve_args(argv)
    from textocvp_tpu.serve import PredictionService, serve

    mesh_axes = ({"data": args.mesh_data, "model": args.mesh_model}
                 if args.mesh_data else None)
    service = PredictionService(
        args.exp_directory, args.name_pred_exp,
        decomp_ckpt=args.decomp_ckpt, pred_ckpt=args.pred_ckpt,
        num_seed=args.num_seed, num_preds=args.num_preds,
        batch_size=args.batch_size, max_tokens=args.max_tokens,
        mesh_axes=mesh_axes, wire_dtype=args.wire_dtype,
    )
    if args.export:
        from textocvp_tpu.serve.export import export_service

        if (getattr(service, "_quant_mode", None)
                or getattr(service, "_encode_quant_mode", None)):
            # int8 services must be calibrated before export (the artifact
            # bakes the scales); the warmup request calibrates on noise —
            # for real-data calibration use service.calibrate() via the API
            service.warmup()
        out = export_service(service, args.export)
        print(f"exported serving artifact to {out}")
        return 0
    httpd = serve(service, host=args.host, port=args.port,
                  dynamic_batch_ms=args.dynamic_batch_ms,
                  pipeline_depth=args.pipeline_depth)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
    return 0


if __name__ == "__main__":
    main()
