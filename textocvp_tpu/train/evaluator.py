"""
Evaluators (reference base/baseEvaluator.py + 03_evaluate_decomp_model.py +
05_evaluate_predictor.py).

* DecompEvaluator — full-sequence reconstruction PSNR/SSIM/LPIPS.
* PredictorEvaluator — seed-encode -> num_preds rollout -> decode -> metrics,
  compiled as ONE jitted XLA program per batch (the north-star inference
  path). Unlike the reference, only the ``num_seed`` seed frames are encoded —
  the slot recurrence is causal, so encoding the ground-truth futures (as the
  reference does at 05_evaluate_predictor.py:82-89) is redundant compute with
  identical results.

CLI overrides mirror the reference: ``num_seed`` overrides ``num_context``,
``num_preds`` overrides the rollout length, and the dataset sequence length
becomes ``num_seed + num_preds`` (baseEvaluator.py:61-86).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import Logger, for_all_methods, log_function, print_
from textocvp_tpu.data import DataLoader, load_data
from textocvp_tpu.data.wire import as_float_video
from textocvp_tpu.models import setup_model, setup_predictor
from textocvp_tpu.parallel.distributed import (
    get_runtime_mesh,
    is_process_zero,
    loader_process_kwargs,
    maybe_initialize_distributed,
)
from textocvp_tpu.parallel.mesh import (
    get_mesh,
    pad_batch,
    replicated_sharding,
    shard_batch,
)
from textocvp_tpu.parallel.partitioning import shard_predictor_params
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint
from textocvp_tpu.train.metrics import MetricTracker


def _text_kwargs(others: dict) -> dict:
    out = {}
    for k in ("caption_tokens", "caption_lengths", "attn_masks"):
        v = others.get(k)
        if v is not None:
            out[k] = jnp.asarray(v)
    return out



def _tokenizer_fallback_flags(dataset) -> dict:
    """Honesty marker: when the dataset tokenizes captions with a fallback
    (hash ids instead of the real T5 vocab), eval numbers are not comparable
    to the reference — record that in results.json instead of staying silent."""
    tok = getattr(dataset, "tokenizer", None)
    if tok is not None and getattr(tok, "is_fallback", False):
        return {"tokenizer_fallback": True}
    return {}


def _progress(iterable, total=None, desc=""):
    """tqdm progress bar when available (reference baseEvaluator.py:180)."""
    try:
        from tqdm import tqdm

        return tqdm(iterable, total=total, desc=desc, leave=False)
    except Exception:
        return iterable


@for_all_methods(log_function)
class DecompEvaluator:
    """Evaluate a decomposition checkpoint on full-sequence reconstruction."""

    # DecompFigGenerator overrides this: it renders what the decoder CAN
    # produce (feature-only DINOSAUR still yields masks/objects figures),
    # while metric eval strictly needs RGB reconstructions.
    requires_image_reconstruction = True

    def __init__(self, exp_path, checkpoint: str, batch_size: Optional[int] = None,
                 results_name: Optional[str] = None,
                 metrics=("psnr", "ssim", "lpips")):
        self.exp = Experiment(exp_path)
        Logger(self.exp.exp_path)
        self.exp_params = self.exp.params
        if self.requires_image_reconstruction:
            from textocvp_tpu.models.factory import check_image_reconstruction

            check_image_reconstruction(
                self.exp_params, purpose="compute reconstruction metrics for")
        self.checkpoint = checkpoint
        self.batch_size = batch_size or self.exp_params["training"]["batch_size"]
        self.results_name = results_name or f"eval_decomp_{checkpoint}"
        # inference-only: the gather-expand fuses best (no backward pass)
        self.exp_params.setdefault("tpu", {})["fast_decode_expand"] = "gather"
        maybe_initialize_distributed()
        self.mesh = get_runtime_mesh(self.exp_params.get("tpu"))
        self.model = setup_model(self.exp_params)
        self.metric_tracker = MetricTracker(metrics)

    def load_data(self):
        self.test_set = load_data(self.exp_params, split="test")
        self.test_loader = DataLoader(self.test_set, batch_size=self.batch_size, shuffle=False,
                                      **loader_process_kwargs(self.mesh))

    def load_model(self, sample_videos: np.ndarray):
        init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
        variables = self.model.init(
            init_rngs, as_float_video(jnp.asarray(sample_videos[:1])),
            train=False)
        restored = load_checkpoint(checkpoint_path(self.exp.models_dir, self.checkpoint))
        self.variables = {"params": jax.tree_util.tree_map(jnp.asarray, restored["params"])}
        if restored.get("batch_stats"):
            self.variables["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, restored["batch_stats"])
        elif "batch_stats" in variables:
            self.variables["batch_stats"] = variables["batch_stats"]
        from textocvp_tpu.parallel.partitioning import (
            decomp_tp_enabled,
            shard_decomp_variables,
        )

        if self.mesh.shape["model"] > 1 and decomp_tp_enabled(self.exp_params):
            # ViT-scale model: Megatron sharding over the model axis
            self.variables = shard_decomp_variables(self.variables, self.mesh)
        else:
            self.variables = jax.device_put(self.variables,
                                            replicated_sharding(self.mesh))
        model = self.model
        tracker = self.metric_tracker

        rep = replicated_sharding(self.mesh)

        from textocvp_tpu.models.chunked import resolve_tail_chunks

        decode_chunks_cfg = (self.exp_params.get("tpu") or {}).get("decode_chunks")
        n_slots = self.exp_params["model"]["model_params"]["num_slots"]

        def _eval(variables, videos, rng, tail_chunks=None, tail_unroll=None,
                  quant_scales=None, encode_scales=None):
            videos = as_float_video(videos)  # uint8 wire → [0,1] on device
            b, t = videos.shape[:2]
            # scan-chunked decoder tail on large recon batches (exact;
            # docs/PERFORMANCE.md "decode chunking"). ExtendedDINOSAUR
            # accepts and ignores tail_chunks (measured: no win there).
            if tail_chunks is None:
                tail_chunks = resolve_tail_chunks(
                    decode_chunks_cfg, b * t, n_slots,
                    quant=quant_scales is not None)
            qkw = {} if quant_scales is None else {"quant_scales": quant_scales}
            if encode_scales is not None:  # int8 frozen-ViT encode (opt-in)
                qkw["encode_quant_scales"] = encode_scales
            out = model.apply(
                variables, videos, rngs={"slots": rng},
                tail_chunks=tail_chunks, tail_unroll=tail_unroll, **qkw)
            recons = jnp.clip(out["recons_imgs"], 0, 1)
            targets = jnp.clip(videos, 0, 1)
            vals = tracker.compute(recons, targets)
            # replicate the tiny (B, F) metrics so every process holds the
            # full result (multi-host) and host slicing is addressable
            return jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), vals)

        # small frozen models: bake weights into the executable as constants
        # (measured 2.3x on conv decodes); ViT-scale models pass as argument
        # (oversized constants are rejected by the remote compile service)
        from functools import partial

        from textocvp_tpu.models.chunked import should_bake_constants

        bake = should_bake_constants(self.variables)
        variables = self.variables

        def make_step(tail_chunks=None, tail_unroll=None, quant_scales=None,
                      encode_scales=None):
            if bake:
                return jax.jit(partial(_eval, variables, tail_chunks=tail_chunks,
                                       tail_unroll=tail_unroll,
                                       quant_scales=quant_scales,
                                       encode_scales=encode_scales))
            _j = jax.jit(partial(_eval, tail_chunks=tail_chunks,
                                 tail_unroll=tail_unroll,
                                 quant_scales=quant_scales,
                                 encode_scales=encode_scales))
            return lambda videos, rng: _j(variables, videos, rng)

        # opt-in runtime autotune of the decode schedule: measures the
        # candidate (chunks, unroll) pairs on the first batch and reuses the
        # winner (models/autotune.py)
        from textocvp_tpu.models.autotune import autotune_enabled, autotuned_stage
        from textocvp_tpu.models.quant import decode_quant_mode, encode_quant_mode

        def build_stage(quant_scales=None, encode_scales=None):
            mk = partial(make_step, quant_scales=quant_scales,
                         encode_scales=encode_scales)
            if autotune_enabled(self.exp_params):
                from textocvp_tpu.models.chunked import decode_candidate_schedules

                def schedules_of(videos, rng):
                    b, t = videos.shape[:2]
                    return decode_candidate_schedules(
                        b * t, n_slots, configured_chunks=decode_chunks_cfg,
                        quant=quant_scales is not None)

                def sync(vals):
                    np.asarray(next(iter(vals.values())))

                return autotuned_stage(mk, schedules_of, sync, log=print_)
            return mk()

        self._quant_mode = decode_quant_mode(self.exp_params)
        self._encode_quant_mode = encode_quant_mode(self.exp_params)

        def build_with_decode_quant(encode_scales=None):
            # int8 decoder tail: calibrate activation scales on the FIRST
            # batch's slots (one extra encode + bf16 tail pass), bake them,
            # and use the quantized stage for every batch incl. this one —
            # so all reported metrics come from the same program
            # (models/quant.py; results.json carries a decode_quant flag)
            bs = partial(build_stage, encode_scales=encode_scales)
            if not self._quant_mode:
                return bs()
            from textocvp_tpu.models.quant import lazy_quantized_stage

            def slots_of(videos, rng):
                slots = jax.jit(
                    lambda v, x, r: model.apply(
                        v, as_float_video(x), decode=False,
                        rngs={"slots": r})["slot_history"]
                )(variables, videos, rng)
                return slots.reshape(-1, *slots.shape[-2:])

            return lazy_quantized_stage(
                bs, slots_of, model, variables,
                on_scales=lambda s: setattr(self, "decode_quant_scales", s),
                log=print_)

        if self._encode_quant_mode:
            # int8 frozen-ViT encode (tpu.encode_quant): calibrated the same
            # lazy way on the first batch's frames; composes OUTSIDE the
            # decode-quant wrapper so one first call calibrates both
            from textocvp_tpu.models.quant import lazy_encode_quantized_stage

            self.eval_step = lazy_encode_quantized_stage(
                build_with_decode_quant,
                lambda videos, rng: as_float_video(videos),
                model, variables,
                on_scales=lambda s: setattr(self, "encode_quant_scales", s),
                log=print_)
        else:
            self.eval_step = build_with_decode_quant()

    def evaluate(self) -> dict:
        """Set TEXTOCVP_PROFILE=<dir> to capture a jax.profiler trace of the
        eval loop (same knob as the trainers)."""
        import os as _os

        profile_dir = _os.environ.get("TEXTOCVP_PROFILE")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            step = 0
            pending = None  # accumulate batch i-1 while batch i computes
            for videos, others in _progress(self.test_loader, total=len(self.test_loader), desc="eval"):
                step += 1
                # pad ragged final batches to the data-axis multiple (stay sharded
                # instead of replicating), then drop the padded rows from metrics.
                # Multi-host: the loader already padded GLOBALLY (num_valid set).
                if "num_valid" in others:
                    b = int(others["num_valid"])
                    batch = shard_batch(np.asarray(videos), self.mesh)
                else:
                    padded, b = pad_batch(np.asarray(videos), self.mesh)
                    batch = shard_batch(jnp.asarray(padded), self.mesh)
                rng = jax.random.fold_in(jax.random.PRNGKey(14), step)
                vals = self.eval_step(batch, rng)
                if pending is not None:
                    self.metric_tracker.accumulate(precomputed=pending)
                pending = {k: v[:b] for k, v in vals.items()}
            if pending is not None:
                self.metric_tracker.accumulate(precomputed=pending)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()
        self.metric_tracker.aggregate()
        results = self.metric_tracker.to_json()
        results.update(_tokenizer_fallback_flags(self.test_set))
        if getattr(self, "_quant_mode", None):
            # honesty flag: these metrics come from a quantized decoder
            results["decode_quant"] = self._quant_mode
        if getattr(self, "_encode_quant_mode", None):
            # honesty flag: these metrics come from a quantized ViT encoder
            results["encode_quant"] = self._encode_quant_mode
        if is_process_zero():  # one results.json / plot set per experiment
            self.exp.save_results(self.results_name, results)
            _save_framewise_plots(self.exp, self.results_name, results, start_x=0)
        print_(f"Results: { {k: v['mean'] for k, v in results.items() if isinstance(v, dict)} }")
        return results


def _save_framewise_plots(exp, results_name: str, results: dict, start_x: int = 0):
    """Per-frame metric curves next to results.json (reference
    metrics.py:128-144, baseEvaluator.py:211-216)."""
    from textocvp_tpu.viz.figures import visualize_metric

    out_dir = exp.results_dir(results_name)
    for metric, vals in results.items():
        if isinstance(vals, dict) and "framewise" in vals:
            visualize_metric(
                vals["framewise"], savepath=out_dir / f"{metric}_framewise.png",
                title=metric, start_x=start_x,
            )


@for_all_methods(log_function)
class PredictorEvaluator:
    """Evaluate a predictor checkpoint on the video-prediction protocol."""

    def __init__(self, exp_path, name_pred_exp: str, decomp_ckpt: str, pred_ckpt: str,
                 num_seed: Optional[int] = None, num_preds: Optional[int] = None,
                 batch_size: Optional[int] = None, results_name: Optional[str] = None,
                 metrics=("psnr", "ssim", "lpips")):
        parent = Experiment(exp_path)
        self.exp = Experiment(parent.exp_path / "predictors" / name_pred_exp) \
            if not str(name_pred_exp).startswith(str(parent.exp_path)) \
            else Experiment(name_pred_exp)
        Logger(self.exp.exp_path)
        self.parent = Experiment(exp_path)
        self.exp_params = self.exp.params
        self.decomp_ckpt = decomp_ckpt
        self.pred_ckpt = pred_ckpt

        # num_seed overrides num_context; num_preds overrides rollout length
        pp = self.exp_params["prediction_params"]
        if num_seed is not None:
            pp["num_context"] = num_seed
        if num_preds is not None:
            pp["num_preds"] = num_preds
        self.num_context = pp["num_context"]
        self.num_preds = pp["num_preds"]
        self.exp_params["dataset"]["num_frames"] = self.num_context + self.num_preds

        self.batch_size = batch_size or self.exp_params["training"]["batch_size"]
        self.results_name = results_name or (
            f"eval_pred_{pred_ckpt}_NumSeed={self.num_context}_NumPreds={self.num_preds}"
        )
        # inference-only: the gather-expand fuses best (no backward pass)
        self.exp_params.setdefault("tpu", {})["fast_decode_expand"] = "gather"
        # fail fast (matches serve/pipeline.py): prediction metrics need frames
        from textocvp_tpu.models.factory import check_image_reconstruction

        check_image_reconstruction(self.exp_params, purpose="evaluate predictions on")
        maybe_initialize_distributed()
        self.mesh = get_runtime_mesh(self.exp_params.get("tpu"))
        self.decomp_model = setup_model(self.exp_params)
        self.predictor = setup_predictor(self.exp_params)
        self.metric_tracker = MetricTracker(metrics)

    def load_data(self):
        self.test_set = load_data(self.exp_params, split="test")
        self.test_loader = DataLoader(self.test_set, batch_size=self.batch_size, shuffle=False,
                                      **loader_process_kwargs(self.mesh))

    def load_models(self, sample_videos: np.ndarray, sample_text: Optional[dict] = None):
        c, p = self.num_context, self.num_preds
        videos = as_float_video(jnp.asarray(sample_videos[:1, : c + p]))
        init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
        init_vars = self.decomp_model.init(init_rngs, videos, decode=True, train=False)

        restored = load_checkpoint(checkpoint_path(self.parent.models_dir, self.decomp_ckpt))
        self.decomp_vars = {"params": jax.tree_util.tree_map(jnp.asarray, restored["params"])}
        if restored.get("batch_stats"):
            self.decomp_vars["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, restored["batch_stats"])
        elif "batch_stats" in init_vars:
            self.decomp_vars["batch_stats"] = init_vars["batch_stats"]
        # ViT-scale decomp models shard over the model axis (Megatron specs
        # for the ViT blocks + patch-decoder MLP); SAVi stays replicated —
        # its 128-wide kernels don't pay for the per-step all-reduce
        from textocvp_tpu.parallel.partitioning import (
            decomp_tp_enabled,
            shard_decomp_variables,
        )

        if self.mesh.shape["model"] > 1 and decomp_tp_enabled(self.exp_params):
            self.decomp_vars = shard_decomp_variables(self.decomp_vars, self.mesh)
        else:
            self.decomp_vars = jax.device_put(self.decomp_vars,
                                              replicated_sharding(self.mesh))

        slot_sample = self.decomp_model.apply(
            {"params": self.decomp_vars["params"]}, videos[:, :c], decode=False,
            rngs={"slots": jax.random.PRNGKey(2)},
        )["slot_history"]
        text_kwargs = {k: v[:1] for k, v in _text_kwargs(sample_text or {}).items()}
        self.predictor.init({"params": jax.random.PRNGKey(3)}, slot_sample, **text_kwargs)
        pred_restored = load_checkpoint(checkpoint_path(self.exp.models_dir, self.pred_ckpt))
        self.pred_params = jax.tree_util.tree_map(jnp.asarray, pred_restored["params"])
        if self.mesh.shape["model"] > 1:
            # tensor-parallel serving: Megatron-pattern sharding of the
            # predictor's large matmuls over the 'model' axis
            self.pred_params = shard_predictor_params(self.pred_params, self.mesh)
        else:
            self.pred_params = jax.device_put(self.pred_params,
                                              replicated_sharding(self.mesh))
        self._build_step()

    def _build_step(self):
        decomp_model = self.decomp_model
        predictor = self.predictor
        tracker = self.metric_tracker
        decomp_vars = self.decomp_vars
        c, p = self.num_context, self.num_preds
        num_slots = self.exp_params["model"]["model_params"]["num_slots"]
        slot_dim = self.exp_params["model"]["model_params"]["slot_dim"]

        rep = replicated_sharding(self.mesh)

        from functools import partial

        from textocvp_tpu.models.chunked import (
            resolve_tail_chunks,
            should_bake_constants,
        )

        decode_chunks_cfg = (self.exp_params.get("tpu") or {}).get("decode_chunks")

        def _predict(dv, pred_params, videos, rng, encode_scales=None,
                     **text_kwargs):
            """Seed-encode + rollout -> predicted slots. ``encode_scales``
            switches the frozen-ViT denses to int8 (tpu.encode_quant)."""
            seed = as_float_video(videos[:, :c])  # uint8 wire → [0,1]
            ekw = {} if encode_scales is None else {
                "encode_quant_scales": encode_scales}
            out = decomp_model.apply(dv, seed, decode=False,
                                     rngs={"slots": rng}, **ekw)
            return predictor.apply(
                {"params": pred_params}, out["slot_history"], num_preds=p,
                teacher_force=False, **text_kwargs,
            )

        def _decode_metrics(dv, pred_slots, videos, tail_chunks=None,
                            tail_unroll=None, quant_scales=None):
            b = pred_slots.shape[0]
            # decoder tail convs scanned over chunks: ~1.6x on large TPU
            # eval batches, exact (docs/PERFORMANCE.md "decode chunking")
            if tail_chunks is None:
                tail_chunks = resolve_tail_chunks(
                    decode_chunks_cfg, b * p, num_slots,
                    quant=quant_scales is not None)
            qkw = {} if quant_scales is None else {"quant_scales": quant_scales}
            dec = decomp_model.apply(
                dv, pred_slots.reshape(b * p, num_slots, slot_dim),
                method="decode", tail_chunks=tail_chunks, tail_unroll=tail_unroll,
                **qkw,
            )
            targets = jnp.clip(as_float_video(videos[:, c : c + p]), 0, 1)
            pred_imgs = jnp.clip(dec["recons_imgs"].reshape(targets.shape), 0, 1)
            vals = tracker.compute(pred_imgs, targets)
            # replicate the tiny (B, F) metrics so every process holds the
            # full result (multi-host) and host slicing is addressable
            vals = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), vals)
            return vals, pred_imgs

        # Frozen decomp weights: close over (constant-baked executables,
        # measured 2.3x faster decode) when the pytree is small; pass as an
        # argument for ViT-scale models — oversized constants are rejected by
        # the remote compile service (docs/PERFORMANCE.md "decode chunking").
        bake = should_bake_constants(decomp_vars)

        def make_decode_stage(tail_chunks=None, tail_unroll=None,
                              quant_scales=None):
            if bake:
                return jax.jit(partial(_decode_metrics, decomp_vars,
                                       tail_chunks=tail_chunks,
                                       tail_unroll=tail_unroll,
                                       quant_scales=quant_scales))
            _dj = jax.jit(partial(_decode_metrics, tail_chunks=tail_chunks,
                                  tail_unroll=tail_unroll,
                                  quant_scales=quant_scales))
            return lambda pred_slots, videos: _dj(decomp_vars, pred_slots, videos)

        def make_predict_stage(encode_scales=None):
            if bake:
                return jax.jit(partial(_predict, decomp_vars,
                                       encode_scales=encode_scales))
            _pj = jax.jit(partial(_predict, encode_scales=encode_scales))

            def stage(pred_params, videos, rng, **text_kwargs):
                return _pj(decomp_vars, pred_params, videos, rng, **text_kwargs)

            return stage

        from textocvp_tpu.models.quant import encode_quant_mode

        self._encode_quant_mode = encode_quant_mode(self.exp_params)
        if self._encode_quant_mode:
            # int8 frozen-ViT seed encode: lazily calibrated on the first
            # batch's seed frames (models/quant.py; results.json carries an
            # encode_quant flag)
            from textocvp_tpu.models.quant import lazy_encode_quantized_stage

            predict_stage = lazy_encode_quantized_stage(
                make_predict_stage,
                lambda pred_params, videos, rng, **tk: as_float_video(
                    videos[:, :c]),
                decomp_model, decomp_vars,
                on_scales=lambda s: setattr(self, "encode_quant_scales", s),
                log=print_)
        else:
            predict_stage = make_predict_stage()

        # opt-in runtime autotune of the decode schedule: measure the
        # candidate (chunks, unroll) pairs on the first batch, reuse the
        # winner for the rest of the eval (models/autotune.py)
        from textocvp_tpu.models.autotune import autotune_enabled, autotuned_stage
        from textocvp_tpu.models.quant import decode_quant_mode

        def build_decode_stage(quant_scales=None):
            mk = partial(make_decode_stage, quant_scales=quant_scales)
            if autotune_enabled(self.exp_params):
                from textocvp_tpu.models.chunked import decode_candidate_schedules

                def schedules_of(pred_slots, videos):
                    b = pred_slots.shape[0]
                    return decode_candidate_schedules(
                        b * p, num_slots, configured_chunks=decode_chunks_cfg,
                        quant=quant_scales is not None)

                def sync(out):
                    np.asarray(next(iter(out[0].values())))

                return autotuned_stage(mk, schedules_of, sync, log=print_)
            return mk()

        self._quant_mode = decode_quant_mode(self.exp_params)
        if self._quant_mode:
            # int8 decoder tail: calibrate activation scales on the FIRST
            # batch's PREDICTED slots (one extra bf16 tail pass), bake them,
            # and use the quantized stage for every batch incl. this one —
            # all reported metrics come from the same program
            # (models/quant.py; results.json carries a decode_quant flag)
            from textocvp_tpu.models.quant import lazy_quantized_stage

            decode_metrics_stage = lazy_quantized_stage(
                build_decode_stage,
                lambda pred_slots, videos: pred_slots.reshape(
                    -1, num_slots, slot_dim),
                decomp_model, decomp_vars,
                on_scales=lambda s: setattr(self, "decode_quant_scales", s),
                log=print_)
        else:
            decode_metrics_stage = build_decode_stage()

        def eval_step(pred_params, videos, rng, **text_kwargs):
            """Two chained XLA programs with no host round-trip between them
            (a single fused 3-stage program compiles to a far slower schedule
            on the remote-compiled TPU runtime; see bench.py)."""
            pred_slots = predict_stage(pred_params, videos, rng, **text_kwargs)
            return decode_metrics_stage(pred_slots, videos)

        self.predict_stage = predict_stage
        self.decode_metrics_stage = decode_metrics_stage
        self.eval_step = eval_step

    def evaluate(self) -> dict:
        """Set TEXTOCVP_PROFILE=<dir> to capture a jax.profiler trace of the
        eval loop (same knob as the trainers)."""
        import os as _os

        profile_dir = _os.environ.get("TEXTOCVP_PROFILE")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        try:
            step = 0
            pending = None  # accumulate batch i-1 while batch i computes
            for videos, others in _progress(self.test_loader, total=len(self.test_loader), desc="eval"):
                step += 1
                if "num_valid" in others:  # loader padded globally (multi-host)
                    b = int(others["num_valid"])
                    videos_p, text_p = np.asarray(videos), _text_kwargs(others)
                else:
                    (videos_p, text_p), b = pad_batch(
                        (np.asarray(videos), _text_kwargs(others)), self.mesh)
                batch = shard_batch(jnp.asarray(videos_p), self.mesh)
                text_p = shard_batch(text_p, self.mesh)
                rng = jax.random.fold_in(jax.random.PRNGKey(14), step)
                vals, _ = self.eval_step(self.pred_params, batch, rng, **text_p)
                if pending is not None:
                    self.metric_tracker.accumulate(precomputed=pending)
                pending = {k: v[:b] for k, v in vals.items()}
            if pending is not None:
                self.metric_tracker.accumulate(precomputed=pending)
        finally:
            if profile_dir:
                jax.profiler.stop_trace()
        self.metric_tracker.aggregate()
        results = self.metric_tracker.to_json()
        results.update(_tokenizer_fallback_flags(self.test_set))
        if getattr(self, "_quant_mode", None):
            # honesty flag: these metrics come from a quantized decoder
            results["decode_quant"] = self._quant_mode
        if getattr(self, "_encode_quant_mode", None):
            # honesty flag: these metrics come from a quantized ViT encoder
            results["encode_quant"] = self._encode_quant_mode
        if is_process_zero():  # one results.json / plot set per experiment
            self.exp.save_results(self.results_name, results)
            _save_framewise_plots(self.exp, self.results_name, results,
                                  start_x=self.num_context)
        print_(f"Results: { {k: v['mean'] for k, v in results.items() if isinstance(v, dict)} }")
        return results
