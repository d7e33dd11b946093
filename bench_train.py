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
import os

# Default the persistent XLA compile cache on (same as bench.py): these
# ViT-scale programs take minutes to compile cold on the remote-attached
# runtime but reload in seconds once cached. setdefault only.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/textocvp_jax_cache"))

import numpy as np


# warmup-sync + best-of-N-windows methodology shared by all benches
from bench_common import time_steps_ms as _time_steps


def _grad_sink(val, grads):
    """Fold the gradients into the returned scalar so XLA cannot dead-code
    eliminate the backward pass (``value_and_grad(...)[0]`` alone compiles to
    the forward only — measured: fwd_bwd == fwd exactly). The global grad
    norm mirrors work the real train step does anyway (clip-by-global-norm),
    and the 1e-12 scale keeps the reported loss readable."""
    import jax
    import jax.numpy as jnp

    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                         for g in jax.tree_util.tree_leaves(grads)))
    return val + 1e-12 * gnorm


def bench_savi(tmp, batch, iters, dtype, train_decode_chunks, accum=1,
               breakdown=False):
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

    sync = lambda v: float(next(iter(v.values())))
    if breakdown:
        # the timed full step DONATES tr.params; fwd/stage
        # programs need their own live copy
        p0 = jax.tree_util.tree_map(jnp.array, tr.params)
        mp = p["model"]["model_params"]
        s_, d_ = mp["num_slots"], mp["slot_dim"]

        def fwd_loss(q, v):
            out = tr.model.apply({"params": q}, v, train=True,
                                 rngs={"slots": rng})
            return tr.loss_fn(**tr._loss_tensors(out, v))[0]

        fwd_j = jax.jit(fwd_loss)
        fwd_bwd_j = jax.jit(lambda q, v: _grad_sink(*jax.value_and_grad(
            lambda r_: fwd_loss(r_, v))(q)))
        enc_j = jax.jit(lambda q, v: tr.model.apply(
            {"params": q}, v, decode=False,
            rngs={"slots": rng})["slot_history"])
        slots_flat = enc_j(p0, videos_j).reshape(
            batch * t_frames, s_, d_)
        dec_j = jax.jit(lambda q, sl: tr.model.apply(
            {"params": q}, sl, method="decode")["recons_imgs"])
        fl = _savi_flops(p, batch, t_frames)
        flops = {"encode+slot_attn": fl["encode"] + fl["slot_attention"],
                 "decode": fl["decode"]}
        ssum = lambda o: float(jnp.sum(o))
        rows = _breakdown(
            iters, flops,
            fwd=lambda: fwd_j(p0, videos_j),
            fwd_bwd=lambda: fwd_bwd_j(p0, videos_j),
            step=step, step_sync=sync,
            stage_fns=[
                ("encode+slot_attn",
                 lambda: enc_j(p0, videos_j), ssum),
                ("decode", lambda: dec_j(p0, slots_flat), ssum),
            ])
        return {"metric": f"savi_train_breakdown (B={batch}, T={t_frames}, "
                          f"{dtype})",
                "stages": rows, "unit": "ms/stage"}

    t0 = time.perf_counter()
    values = step()
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


def _rollout_flops(exp_params, b, p_steps, m_text=20):
    """Analytic fwd FLOPs of the text-conditioned rollout (T5 encode once +
    p_steps predictor steps over buffer*slots tokens)."""
    pp = exp_params["predictor"]["predictor_params"]["predictor_params"]
    d_tok, n_layers = pp["token_dim"], pp["num_layers"]
    s = exp_params["model"]["model_params"]["num_slots"]
    buf = exp_params["prediction_params"]["input_buffer_size"]
    n_ctx = buf * s
    per_step = n_layers * (12 * n_ctx * d_tok ** 2 + 2 * n_ctx ** 2 * d_tok
                           + 2 * n_ctx * m_text * d_tok
                           + 2 * n_ctx * d_tok ** 2)
    t5 = 6 * (12 * m_text * 512 ** 2 + 2 * m_text ** 2 * 512)
    return 2 * (per_step * p_steps + t5) * b


def bench_pred(tmp, batch, iters, dtype, train_decode_chunks=None,
               remat=False, accum=1, breakdown=False):
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

    sync = lambda v: float(next(iter(v.values())))
    if breakdown:
        # the timed full step DONATES tr.params; fwd/stage
        # programs need their own live copy
        p0 = jax.tree_util.tree_map(jnp.array, tr.params)
        mp = qp["model"]["model_params"]
        s_, d_ = mp["num_slots"], mp["slot_dim"]
        dvars = {"params": tr.decomp_params["params"]}
        model, predictor = tr.decomp_model, tr.predictor

        def fwd_loss(q, v):
            out = model.apply(dvars, v[:, :c + p_], decode=False,
                              rngs={"slots": rng})
            sh = jax.lax.stop_gradient(out["slot_history"])
            ps = predictor.apply({"params": q}, sh, teacher_force=False, **tk)
            dec = model.apply(dvars, ps.reshape(batch * p_, s_, d_),
                              method="decode")
            target_imgs = v[:, c:c + p_]
            return tr.loss_fn(
                pred_slots=ps, target_slots=sh[:, c:c + p_],
                pred_imgs=dec["recons_imgs"].reshape(target_imgs.shape),
                target_imgs=target_imgs)[0]

        fwd_j = jax.jit(fwd_loss)
        fwd_bwd_j = jax.jit(lambda q, v: _grad_sink(*jax.value_and_grad(
            lambda r_: fwd_loss(r_, v))(q)))
        enc_j = jax.jit(lambda v: model.apply(
            dvars, v[:, :c + p_], decode=False,
            rngs={"slots": rng})["slot_history"])
        sh0 = enc_j(videos_j)
        roll_j = jax.jit(lambda q, sh: predictor.apply(
            {"params": q}, sh, teacher_force=False, **tk))
        ps0 = roll_j(p0, sh0).reshape(batch * p_, s_, d_)
        dec_j = jax.jit(lambda sl: model.apply(
            dvars, sl, method="decode")["recons_imgs"])
        fl = _savi_flops(qp, batch, c + p_)
        fl_dec = _savi_flops(qp, batch, p_)["decode"]
        flops = {"frozen_encode": fl["encode"] + fl["slot_attention"],
                 "rollout": _rollout_flops(qp, batch, p_),
                 "decode": fl_dec}
        ssum = lambda o: float(jnp.sum(o))
        rows = _breakdown(
            iters, flops,
            fwd=lambda: fwd_j(p0, videos_j),
            fwd_bwd=lambda: fwd_bwd_j(p0, videos_j),
            step=step, step_sync=sync,
            stage_fns=[
                ("frozen_encode", lambda: enc_j(videos_j), ssum),
                ("rollout", lambda: roll_j(p0, sh0), ssum),
                ("decode", lambda: dec_j(ps0), ssum),
            ],
            # encode is behind stop_gradient (no backward at all); the
            # frozen decoder's WEIGHTS get no grads but pred_slots flow
            # through it, so its backward is grad-input only (~1x fwd)
            bwd_mult={"frozen_encode": 0, "decode": 1})
        return {"metric": f"predictor_train_breakdown (B={batch}, c={c}, "
                          f"p={p_}, TextOCVP_T5, {dtype})",
                "stages": rows, "unit": "ms/stage"}

    t0 = time.perf_counter()
    values = step()
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


def _dinosaur_flops(exp_params, b, t):
    """Analytic fwd FLOPs per stage of the DINOSAUR decomp forward at (b, t)
    (same math as bench_dinosaur_eval._stage_flops, at train shapes)."""
    mp = exp_params["model"]["model_params"]
    dp = mp["decoder"]["decoder_params"]
    img, s = mp["img_size"], mp["num_slots"]
    patch, n_patches = dp["patch_size"], dp["num_patches"]
    d_vit = mp["mlp_encoder_dim"]
    depth = mp["encoder"]["encoder_params"].get("encoder_num_blocks", 12)
    n_tok = n_patches + 1
    vit = depth * (12 * n_tok * d_vit ** 2 + 2 * n_tok ** 2 * d_vit)
    vit += n_tok * (patch ** 2 * 3) * d_vit
    h, out, n_mlp = dp["hidden_dim"], dp["out_dim"], dp["num_layers"]
    per_ps = dp["in_dim"] * h + h * h * max(0, n_mlp - 2) + h * out
    mlp = per_ps * s * n_patches
    g = int(n_patches ** 0.5)
    hidden, cur, macs = h, g, 0
    cin = out - 1
    for i in range(dp.get("num_layers_cnn", 0)):
        grow = ((i + 1) * 2 < patch) and (cur < img)
        if i > 0 and grow:
            hidden //= 2
        macs += cur * cur * cin * hidden * 9
        cin = hidden
        if grow:
            cur *= 2
    macs += cur * cur * cin * 3 * 9
    frames = b * t
    return {"vit_encode": 2 * vit * frames,
            "patch_mlp": 2 * mlp * frames,
            "cnn_head": 2 * macs * frames}


def bench_dinosaur(tmp, batch, iters, dtype, accum=1, breakdown=False):
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

    sync = lambda v: float(next(iter(v.values())))
    if breakdown:
        # the timed full step DONATES tr.params; fwd/stage
        # programs need their own live copy
        p0 = jax.tree_util.tree_map(jnp.array, tr.params)
        mp = p["model"]["model_params"]
        s_, d_ = mp["num_slots"], mp["slot_dim"]
        # batch_stats needs its own copy too: the donating step deletes the
        # trainer's buffers, and these stage programs close over bn
        bn = ({"batch_stats": jax.tree_util.tree_map(jnp.array,
                                                     tr.batch_stats)}
              if tr.batch_stats else {})

        def fwd_loss(q, v):
            variables = {"params": q, **bn}
            if tr.batch_stats is not None:
                out, _ = tr.model.apply(variables, v, train=True,
                                        rngs={"slots": rng},
                                        mutable=["batch_stats"])
            else:
                out = tr.model.apply(variables, v, train=True,
                                     rngs={"slots": rng})
            return tr.loss_fn(**tr._loss_tensors(out, v))[0]

        fwd_j = jax.jit(fwd_loss)
        # mirror the trainer: tpu.remat wraps the whole forward, with the
        # frozen-ViT features saved rather than replayed (trainer.py)
        _policy = jax.checkpoint_policies.save_only_these_names("frozen_feats")
        fwd_bwd_j = jax.jit(lambda q, v: _grad_sink(*jax.value_and_grad(
            lambda r_: jax.checkpoint(fwd_loss, policy=_policy)(r_, v))(q)))
        enc_j = jax.jit(lambda q, v: tr.model.apply(
            {"params": q, **bn}, v, decode=False,
            rngs={"slots": rng})["slot_history"])
        slots_flat = enc_j(p0, videos_j).reshape(
            batch * t_frames, s_, d_)
        dec_j = jax.jit(lambda q, sl: tr.model.apply(
            {"params": q, **bn}, sl, method="decode")["recons_imgs"])
        flops = _dinosaur_flops(p, batch, t_frames)
        ssum = lambda o: float(jnp.sum(o))
        rows = _breakdown(
            iters, flops,
            fwd=lambda: fwd_j(p0, videos_j),
            fwd_bwd=lambda: fwd_bwd_j(p0, videos_j),
            step=step, step_sync=sync,
            stage_fns=[
                ("vit_encode", lambda: enc_j(p0, videos_j), ssum),
                ("decode(mlp+cnn)",
                 lambda: dec_j(p0, slots_flat), ssum),
            ],
            # frozen ViT sits behind stop_gradient: NO backward through it;
            # remat replays the forward once, EXCEPT the frozen ViT whose
            # tagged output the checkpoint policy saves (trainer.py)
            bwd_mult={"vit_encode": 0}, remat=("vit_encode",))
        return {"metric": f"dinosaur_train_breakdown (B={batch}, "
                          f"T={t_frames}, {img}px, remat, {dtype})",
                "stages": rows, "unit": "ms/stage"}

    t0 = time.perf_counter()
    values = step()
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


# ------------------------------------------------------------- train breakdown
def bench_valid(tmp, batch, iters, dtype):
    """In-process A/B of the SAVi valid_step — the forward-only program the
    epoch template runs BEFORE every train epoch (reference
    baseTrainer.py:159-165): flat decode vs the evaluators' chunked policy
    (wired round 5 via models/chunked.py::valid_decode_kwargs). Both arms run
    in one process; cross-run drift on the tunneled runtime makes separate
    processes incomparable."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.train.trainer import DecompTrainer

    videos = np.random.default_rng(0).uniform(
        0, 1, (batch, 8, 64, 64, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    rows = {}
    for arm, chunks in (("flat (decode_chunks=1)", 1),
                        ("chunked (auto policy)", None)):
        exp = Experiment.create(f"{tmp}/valid_{1 if chunks else 0}",
                                "SAVi", "CATER_Easy")
        p = exp.params
        p["training"]["batch_size"] = batch
        p.setdefault("tpu", {})["compute_dtype"] = dtype
        if chunks is not None:
            p["tpu"]["decode_chunks"] = chunks
        exp.save_params(p)
        tr = DecompTrainer(exp.exp_path)
        tr.setup_model(videos)
        videos_j = jnp.asarray(videos)
        fn = lambda: tr.valid_step(tr.params, tr.batch_stats, videos_j, rng)
        sync = lambda v: float(next(iter(v.values())))
        t0 = time.perf_counter()
        sync(fn())
        print(f"[valid/{arm}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        rows[arm] = round(_time_steps(fn, sync, iters), 2)
    return {"metric": f"savi_valid_step_ms (B={batch}, T=8, {dtype}, "
                      "forward-only A/B)",
            "arms": rows, "unit": "ms/step",
            "speedup": round(rows["flat (decode_chunks=1)"]
                             / rows["chunked (auto policy)"], 2)}


def _conv_stack_flops(hw, channels, k, in_ch):
    """2*MACs of a same-padding conv stack at constant resolution."""
    f, cin = 0, in_ch
    for cout in channels:
        f += 2 * hw * hw * k * k * cin * cout
        cin = cout
    return f, cin


def _savi_flops(exp_params, b, t):
    """Analytic fwd FLOPs (2x MACs; elementwise/softmax ignored) of the SAVi
    decomp forward at (b, t) — encoder, slot attention, transition, decoder —
    plus the per-stage split. Backward of a conv/dense is ~2x its forward
    (grad-input + grad-weight); everything here is trainable."""
    mp = exp_params["model"]["model_params"]
    s, d = mp["num_slots"], mp["slot_dim"]
    ep = mp["encoder"]["encoder_params"]
    dp = mp["decoder"]["decoder_params"]
    hw = ep.get("resolution", [64, 64])[0]
    frames = b * t

    enc, cenc = _conv_stack_flops(hw, ep["num_channels"], ep.get("kernel_size", 5), 3)
    n_loc = hw * hw
    denc = mp["mlp_encoder_dim"]
    enc += 2 * n_loc * cenc * denc * 2  # pos-proj + feature MLP (approx 2 denses)
    enc *= frames

    # slot attention: qkv + attn + gru + mlp per iteration (first frame extra)
    iters = mp.get("num_iterations", 2) * t + (
        mp.get("num_iterations_first", mp.get("num_iterations", 2))
        - mp.get("num_iterations", 2))
    per_iter = (2 * n_loc * denc * d * 2      # k,v proj (hoisted: once per frame)
                + 2 * s * d * d               # q proj
                + 2 * 2 * s * n_loc * d       # scores + weighted V
                + 2 * 6 * s * d * d           # GRU (3 gates, x+h)
                + 2 * 2 * s * d * mp["mlp_hidden"])
    sa = b * iters * per_iter
    trans = mp.get("transition_module") or {}
    if trans.get("model_name") == "TransformerBlock":
        sa += frames * (2 * 4 * s * d * d + 2 * 2 * s * s * d
                        + 2 * 2 * s * d * trans.get("mlp_size", 512))

    dhw = dp.get("resolution", [hw, hw])[0]
    dec, cdec = _conv_stack_flops(dhw, dp["num_channels"],
                                  dp.get("kernel_size", 5), d)
    dec += 2 * dhw * dhw * dp.get("kernel_size", 5) ** 2 * cdec * 4  # RGBA conv
    dec *= frames * s  # spatial-broadcast: one stack per slot per frame
    return {"encode": enc, "slot_attention": sa, "decode": dec}


def _breakdown(iters, flops, fwd, fwd_bwd, step, step_sync,
               stage_fns=(), bwd_mult=None, remat=False):
    """``remat``: False, or an iterable of stage names NOT replayed by the
    checkpoint policy (save_only_these_names skips the frozen encoder);
    True replays the whole forward."""
    """Measure fwd / fwd+bwd / full-step as separate programs and derive the
    backward and optimizer costs; report sustained TFLOPS against analytic
    algorithmic FLOPs. ``bwd_mult`` maps stage -> backward FLOP multiple of
    its forward: 2 for trainable stages (grad-input + grad-weight), 1 for
    frozen stages activations still flow through (grad-input only), 0 for
    stages behind stop_gradient. Remat replays the WHOLE forward once in the
    backward. ``fwd``/``fwd_bwd`` are nullary callables returning a scalar
    (their own sync); ``step`` returns the loss dict synced by ``step_sync``.
    Stage programs time the forward pieces in isolation (each pays its own
    dispatch; the fused fwd can run faster than the stage sum)."""
    from bench_common import time_steps_ms as _t

    rows = {}
    float(fwd())
    rows["fwd"] = _t(fwd, float, iters)
    float(fwd_bwd())
    rows["fwd_bwd"] = _t(fwd_bwd, float, iters)
    step_sync(step())
    rows["step"] = _t(step, step_sync, iters)
    for name, fn, syncf in stage_fns:
        syncf(fn())
        rows[f"stage_{name}"] = _t(fn, syncf, iters)

    rows["bwd (derived)"] = rows["fwd_bwd"] - rows["fwd"]
    rows["optimizer+dispatch (derived)"] = rows["step"] - rows["fwd_bwd"]

    bwd_mult = bwd_mult or {}
    f_fwd = sum(flops.values())
    f_bwd = sum(v * bwd_mult.get(k, 2) for k, v in flops.items())
    if remat is True:          # replay the whole forward
        f_bwd += f_fwd
    elif remat:                # policy: replay all but the excluded stages
        f_bwd += sum(v for k, v in flops.items() if k not in set(remat))
    f_total = f_fwd + f_bwd
    out = {}
    for k, ms in rows.items():
        entry = {"ms": round(ms, 2)}
        fl = None
        if k == "fwd":
            fl = f_fwd
        elif k in ("fwd_bwd", "step"):
            fl = f_total
        elif k == "bwd (derived)":
            fl = f_bwd
        elif k.startswith("stage_"):
            fl = flops.get(k[len("stage_"):])
        if fl and ms > 0:
            entry["analytic_gflops"] = round(fl / 1e9, 1)
            entry["sustained_tflops"] = round(fl / (ms / 1000) / 1e12, 1)
        out[k] = entry
        print(f"{k:>28}: {ms:8.2f} ms"
              + (f"  {fl / 1e9:9.1f} GF  {fl / (ms / 1000) / 1e12:6.1f} TFLOPS"
                 if fl and ms > 0 else ""), file=sys.stderr)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workload", default="savi",
                        choices=["savi", "pred", "dinosaur", "valid"])
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
    parser.add_argument("--breakdown", action="store_true", default=False,
                        help="per-stage train-step breakdown: fwd / bwd "
                             "(derived) / optimizer (derived) + isolated "
                             "stage-forward programs, each with analytic "
                             "FLOPs and sustained TFLOPS")
    args = parser.parse_args()

    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    with tempfile.TemporaryDirectory() as tmp:
        chunks = args.train_decode_chunks
        if chunks is not None and chunks != "auto":
            chunks = int(chunks)
        if args.workload == "savi":
            result = bench_savi(tmp, args.batch_size or 64, args.iters,
                                args.dtype, chunks, accum=args.accum,
                                breakdown=args.breakdown)
        elif args.workload == "pred":
            # default B=16: the one-program predictor step at B>=32 crashes
            # the remote compile helper (docs/PERFORMANCE.md training finding
            # 2); 16 is also the per-chip shard of the reference's global
            # batch 64 on 4+ chips.
            result = bench_pred(tmp, args.batch_size or 16, args.iters,
                                args.dtype, chunks, remat=args.remat,
                                accum=args.accum, breakdown=args.breakdown)
        elif args.workload == "valid":
            result = bench_valid(tmp, args.batch_size or 64, args.iters,
                                 args.dtype)
        else:
            # default B=8: B=16 fails HBM allocation on v5e (16.14G needed
            # vs 15.75G, measured) even with tpu.remat
            result = bench_dinosaur(tmp, args.batch_size or 8, args.iters,
                                    args.dtype, accum=args.accum,
                                    breakdown=args.breakdown)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
