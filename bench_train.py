#!/usr/bin/env python
"""
Training-side step-time benchmarks, built from the REAL trainer classes
(DecompTrainer / PredictorTrainer jitted steps — the exact programs the CLI
runs), on whatever accelerator JAX sees.

Workloads:
  savi      SAVi CATER flagship train step (B=64, T=8, 64px,
            fwd+bwd+adam, donated buffers). --train-decode-chunks enables the
            scanned decode tail with per-chunk remat in training
            (tpu.train_decode_chunks).
  pred      Stage-2 predictor train step (frozen SAVi + TextOCVP_T5 rollout
            + decode + slot/img losses in ONE jitted step; B=16 default —
            the per-chip shard of the reference's global batch 64 on 4+
            chips; B>=32 crashes the remote compile helper here — c=1, p=9,
            the workload the reference trains for 1000 epochs).
  dinosaur  ExtendedDINOSAUR train step at 336px, ViT-B/14 frozen encoder,
            MLP patch decoder + CNN head, tpu.remat (B=8 default — B=16
            exceeds v5e HBM by ~400M even with remat).

Timing: steps are dispatched back-to-back (device FIFO) and synchronized by
fetching one loss scalar at the end — on the remote-attached TPU runtime,
``block_until_ready`` can return early, so a D2H fetch is the only reliable
sync. Prints one JSON line per workload.
"""

import argparse
import json
import sys
import tempfile
import time

import numpy as np


# warmup-sync + best-of-N-windows methodology shared by all benches
from bench_common import time_steps_ms as _time_steps


def bench_savi(tmp, batch, iters, dtype, train_decode_chunks, accum=1):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.train.trainer import DecompTrainer

    name = f"savi_b{batch}_{dtype}_c{train_decode_chunks or 0}"
    exp = Experiment.create(f"{tmp}/{name}", "SAVi", "CATER_Easy")
    p = exp.params
    p["training"]["batch_size"] = batch
    p["training"]["accum_steps"] = accum
    p.setdefault("tpu", {})["compute_dtype"] = dtype
    if train_decode_chunks:
        p["tpu"]["train_decode_chunks"] = train_decode_chunks
    exp.save_params(p)

    tr = DecompTrainer(exp.exp_path)
    t_frames = p["dataset"]["num_frames"]
    videos = np.random.default_rng(0).uniform(
        0, 1, (batch, t_frames, 64, 64, 3)).astype(np.float32)
    tr.setup_model(videos)

    videos_j = jnp.asarray(videos)
    state = [tr.params, tr.batch_stats, tr.opt_state]
    rng = jax.random.PRNGKey(7)

    def step():
        params, bs, opt, values = tr.train_step(
            state[0], state[1], state[2], videos_j, rng)
        state[0], state[1], state[2] = params, bs, opt
        return values

    t0 = time.perf_counter()
    values = step()
    sync = lambda v: float(next(iter(v.values())))
    sync(values)
    print(f"[savi] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    ms = _time_steps(step, sync, iters)
    return {
        "metric": f"savi_train_step_ms (B={batch}, T={t_frames}, {dtype}, "
                  f"decode_chunks={train_decode_chunks or 'off'}"
                  f"{f', accum={accum}' if accum > 1 else ''})",
        "value": round(ms, 2), "unit": "ms/step",
        "frames_per_sec": round(batch * t_frames / (ms / 1000), 1),
    }


def bench_pred(tmp, batch, iters, dtype, train_decode_chunks=None,
               remat=False, accum=1):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.models import setup_model
    from textocvp_tpu.train.checkpoints import save_checkpoint
    from textocvp_tpu.train.predictor_trainer import PredictorTrainer

    parent = Experiment.create(f"{tmp}/pred_parent", "SAVi", "CATER_Easy")
    pp = parent.params
    pp.setdefault("tpu", {})["compute_dtype"] = dtype
    parent.save_params(pp)

    # random-init decomp ckpt (weights are frozen in stage 2 — values don't
    # affect step time)
    model = setup_model(pp)
    variables = jax.jit(lambda r, x: model.init(r, x, decode=True, train=False))(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        jnp.zeros((1, 2, 64, 64, 3)))
    save_checkpoint(parent.models_dir, "bench_decomp",
                    {"params": variables["params"], "batch_stats": {},
                     "opt_state": {}, "epoch": 0, "step": 0})

    pred_exp = Experiment.create_predictor(
        parent.exp_path, "bench_t5", "TextOCVP_T5", require_parent_ckpt=False)
    qp = pred_exp.params
    qp["training"]["batch_size"] = batch
    qp["training"]["accum_steps"] = accum
    qp.setdefault("tpu", {})["compute_dtype"] = dtype
    if train_decode_chunks:
        qp["tpu"]["train_decode_chunks"] = train_decode_chunks
    if remat:
        qp["tpu"]["remat"] = True
    pred_exp.save_params(qp)

    tr = PredictorTrainer(pred_exp.exp_path, decomp_ckpt="bench_decomp")
    c = tr.prediction_params["num_context"]
    p_ = tr.prediction_params["num_preds"]
    videos = np.random.default_rng(0).uniform(
        0, 1, (batch, c + p_, 64, 64, 3)).astype(np.float32)
    text = {"caption_tokens": np.random.default_rng(1).integers(
                2, 30000, (batch, 20)).astype(np.int64),
            "attn_masks": np.ones((batch, 20), np.int64)}
    tr.setup_model(videos, sample_text=text)

    videos_j = jnp.asarray(videos)
    tk = {k: jnp.asarray(v) for k, v in text.items()}
    state = [tr.params, tr.opt_state]
    rng = jax.random.PRNGKey(7)

    def step():
        params, opt, values = tr.train_step(state[0], state[1], videos_j, rng, **tk)
        state[0], state[1] = params, opt
        return values

    t0 = time.perf_counter()
    values = step()
    sync = lambda v: float(next(iter(v.values())))
    sync(values)
    print(f"[pred] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    ms = _time_steps(step, sync, iters)
    return {
        "metric": f"predictor_train_step_ms (B={batch}, c={c}, p={p_}, "
                  f"TextOCVP_T5, {dtype}, "
                  f"decode_chunks={train_decode_chunks or 'off'}"
                  f"{', remat' if remat else ''}"
                  f"{f', accum={accum}' if accum > 1 else ''})",
        "value": round(ms, 2), "unit": "ms/step",
        "pred_frames_per_sec": round(batch * p_ / (ms / 1000), 1),
    }


def bench_dinosaur(tmp, batch, iters, dtype, accum=1):
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.train.trainer import DecompTrainer

    exp = Experiment.create(f"{tmp}/dinosaur", "ExtendedDINOSAUR", "CLIPort")
    p = exp.params
    p["training"]["batch_size"] = batch
    p["training"]["accum_steps"] = accum
    p.setdefault("tpu", {})["compute_dtype"] = dtype
    p["tpu"]["remat"] = True
    exp.save_params(p)

    tr = DecompTrainer(exp.exp_path)
    t_frames = p["dataset"]["num_frames"]
    img = p["model"]["model_params"]["img_size"]
    videos = np.random.default_rng(0).uniform(
        0, 1, (batch, t_frames, img, img, 3)).astype(np.float32)
    tr.setup_model(videos)

    videos_j = jnp.asarray(videos)
    state = [tr.params, tr.batch_stats, tr.opt_state]
    rng = jax.random.PRNGKey(7)

    def step():
        params, bs, opt, values = tr.train_step(
            state[0], state[1], state[2], videos_j, rng)
        state[0], state[1], state[2] = params, bs, opt
        return values

    t0 = time.perf_counter()
    values = step()
    sync = lambda v: float(next(iter(v.values())))
    sync(values)
    print(f"[dinosaur] compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    ms = _time_steps(step, sync, iters)
    return {
        "metric": f"dinosaur_train_step_ms (B={batch}, T={t_frames}, {img}px, "
                  f"ViT-B/14, remat, {dtype}"
                  f"{f', accum={accum}' if accum > 1 else ''})",
        "value": round(ms, 2), "unit": "ms/step",
        "frames_per_sec": round(batch * t_frames / (ms / 1000), 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workload", default="savi",
                        choices=["savi", "pred", "dinosaur"])
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--train-decode-chunks", default=None,
                        help="savi/pred: 'auto' or an int (tpu.train_decode_chunks)")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="pred: set tpu.remat (rollout+decode recomputed in backward)")
    parser.add_argument("--accum", type=int, default=1,
                        help="training.accum_steps: sequential equal "
                             "microbatches inside one jitted step, one "
                             "averaged optimizer update (docs/TRAIN.md)")
    args = parser.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    with tempfile.TemporaryDirectory() as tmp:
        chunks = args.train_decode_chunks
        if chunks is not None and chunks != "auto":
            chunks = int(chunks)
        if args.workload == "savi":
            result = bench_savi(tmp, args.batch_size or 64, args.iters,
                                args.dtype, chunks, accum=args.accum)
        elif args.workload == "pred":
            # default B=16: the one-program predictor step at B>=32 crashes
            # the remote compile helper (docs/PERFORMANCE.md training finding
            # 2); 16 is also the per-chip shard of the reference's global
            # batch 64 on 4+ chips.
            result = bench_pred(tmp, args.batch_size or 16, args.iters,
                                args.dtype, chunks, remat=args.remat,
                                accum=args.accum)
        else:
            # default B=8: B=16 fails HBM allocation on v5e (16.14G needed
            # vs 15.75G, measured) even with tpu.remat
            result = bench_dinosaur(tmp, args.batch_size or 8, args.iters,
                                    args.dtype, accum=args.accum)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
