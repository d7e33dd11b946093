"""Production inference pipeline: load a trained experiment once, compile the
two-stage prediction program once, answer requests at fixed shapes.

The reference has no serving story (its inference surface is the batch eval
script, /root/reference/src/05_evaluate_predictor.py); this module is the
TPU-native deployment path:

* fixed request shapes (batch, token length) so every request hits the same
  compiled executables — no retrace, no recompile;
* the frozen decomposition weights are baked into the decode executable as
  constants and the decoder tail runs as a scanned loop — the measured-fastest
  inference decode structure (docs/PERFORMANCE.md "decode chunking");
* predict and decode dispatched back-to-back with no host round-trip between
  them (the two-program split that avoids the three-stage fusion pathology);
* thread-safe: dispatch is serialized by a lock (a single chip runs one
  program at a time anyway), tokenization happens outside it.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import Logger
from textocvp_tpu.data.tokenizers import get_tokenizer
from textocvp_tpu.data.wire import as_float_video, to_uint8_frames
from textocvp_tpu.data.vocabularies import (
    CATER_EASY_VOCAB,
    CATER_HARD_VOCAB,
    CLIPORT_VOCAB,
    SYNTHETIC_VOCAB,
)
from textocvp_tpu.models import setup_model, setup_predictor
from textocvp_tpu.models.chunked import pick_tail_chunks
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint

_VOCABS = {
    "CATER_Easy": CATER_EASY_VOCAB,
    "CATER_Hard": CATER_HARD_VOCAB,
    "CLIPort": CLIPORT_VOCAB,
    "Synthetic": SYNTHETIC_VOCAB,
}


def _serving_tokenizer(exp_params):
    ds = exp_params["dataset"]
    return get_tokenizer(ds.get("tokenizer", "T5"),
                         vocabulary=_VOCABS.get(ds.get("dataset_name")))


class InferenceFrontend:
    """Shared host-side request handling for the live service and the AOT
    ExportedPredictionService: tokenization, validation, batch padding, RNG.

    Subclasses provide ``_predict_stage(videos, key, **text_kwargs)`` and
    ``_decode_stage(pred_slots)`` plus the contract attributes
    (batch_size, num_context, num_preds, resolution, max_tokens, tokenizer).
    Keeping this single-sourced means the live and exported behaviors cannot
    drift."""

    def _finalize_token(self, key: str, v: np.ndarray) -> np.ndarray:
        """Hook for subclasses to coerce a token array to the compiled dtype."""
        return v

    def _place_inputs(self, frames: np.ndarray, text_kwargs: dict):
        """Hook: put the padded request on device. The live mesh service
        overrides this to shard the batch axis over the mesh's data axis."""
        frames = (jnp.asarray(frames) if frames.dtype == np.uint8
                  else jnp.asarray(frames, jnp.float32))
        return frames, {k: jnp.asarray(v) for k, v in text_kwargs.items()}

    def _tokenize(self, captions: Sequence[str]) -> dict:
        try:
            info = self.tokenizer(list(captions))
        except KeyError as e:
            # CustomTokenizer has a closed vocabulary (reference
            # text_encoders.py:142-195) — surface OOV as a request error
            raise ValueError(
                f"caption contains out-of-vocabulary word: {e}") from e
        kwargs = {}
        for k in ("caption_tokens", "caption_lengths", "attn_masks"):
            v = info.get(k)
            if v is None:
                continue
            v = np.asarray(v)
            if v.ndim == 2:  # pad the token axis to the fixed compiled length
                t = self.max_tokens
                if v.shape[1] > t:
                    # rejecting (not truncating) keeps [SEP]/lengths intact —
                    # a silent cut would return degraded predictions with no
                    # signal to the client
                    raise ValueError(
                        f"caption too long: {v.shape[1]} tokens exceed the "
                        f"compiled max_tokens={t}")
                if v.shape[1] < t:
                    v = np.pad(v, ((0, 0), (0, t - v.shape[1])))
            kwargs[k] = self._finalize_token(k, v)
        return kwargs

    def _warmup_caption(self) -> str:
        """An in-vocabulary caption for compile warmup (closed-vocab
        tokenizers reject arbitrary words)."""
        vocab = getattr(self.tokenizer, "vocabulary", None)
        if isinstance(vocab, dict):
            for word, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
                if not (word.startswith("[") and word.endswith("]")):
                    return word
        return "warmup"

    def warmup(self):
        """Compile/load both executables with a dummy request (idempotent).

        Quantized services (tpu.decode_quant / tpu.encode_quant) CALIBRATE
        on their first request, so the dummy must not be degenerate: a
        black video's slot/ViT activations would under-estimate the int8
        ranges and clip every real request. Noise frames give a
        non-degenerate range; for tightest quality (especially before AOT
        export, which bakes the scales), call :meth:`calibrate` with real
        frames first."""
        h, w = self.resolution
        if (getattr(self, "_quant_mode", None)
                or getattr(self, "_encode_quant_mode", None)):
            frames = np.random.default_rng(14).uniform(
                0, 1, (1, self.num_context, h, w, 3)).astype(np.float32)
        else:
            frames = np.zeros((1, self.num_context, h, w, 3), dtype=np.float32)
        self.predict(frames, [self._warmup_caption()])

    def calibrate(self, frames: np.ndarray, captions: Sequence[str]):
        """Explicitly calibrate a quantized service on REPRESENTATIVE data
        (one normal predict call) — run this with real frames before
        serving traffic or exporting AOT artifacts, so the baked int8
        scales cover the true activation range rather than the warmup
        sample's. No-op re-calls are not supported: the first predict wins
        (models/quant.py::lazy_quantized_stage)."""
        if not (getattr(self, "_quant_mode", None)
                or getattr(self, "_encode_quant_mode", None)):
            raise ValueError("calibrate() only applies to services with "
                             "tpu.decode_quant or tpu.encode_quant set")
        self.predict(frames, captions)

    def predict(self, frames: np.ndarray, captions: Sequence[str]) -> np.ndarray:
        """
        frames: (B, num_context, H, W, 3) uint8 or float32 in [0, 1];
        captions: B strings. Returns (B, num_preds, H, W, 3) float32 in [0, 1].
        B may be anything from 1 to batch_size; rows are padded to the
        compiled batch and the padding sliced off the reply.
        """
        frames = np.asarray(frames)
        if getattr(self, "wire_dtype", "float32") == "uint8":
            # uint8-on-the-wire (data/wire.py): the compiled program
            # normalizes on device; float inputs snap to the 1/255 grid
            # (lossless for anything that came from a camera/decoder)
            if frames.dtype != np.uint8:
                frames = to_uint8_frames(np.asarray(frames, np.float32))
        elif frames.dtype == np.uint8:
            frames = as_float_video(frames)
        b = frames.shape[0]
        if b < 1:
            raise ValueError("empty request: at least one video is required")
        if b > self.batch_size:
            raise ValueError(
                f"request batch {b} exceeds compiled batch {self.batch_size}")
        if len(captions) != b:
            raise ValueError(f"{b} videos but {len(captions)} captions")
        if frames.shape[1] != self.num_context:
            raise ValueError(
                f"expected {self.num_context} context frames, got {frames.shape[1]}")

        pad = getattr(self, "_compiled_batch", self.batch_size) - b
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)], axis=0)
            captions = list(captions) + [captions[-1]] * pad
        text_kwargs = self._tokenize(captions)

        with self._lock:
            self._counter += 1
            key = jax.random.fold_in(jax.random.PRNGKey(14), self._counter)
            videos_dev, text_dev = self._place_inputs(frames, text_kwargs)
            pred_slots = self._predict_stage(videos_dev, key, **text_dev)
            imgs_dev = self._decode_stage(pred_slots)
        # fetch OUTSIDE the lock: jax dispatch is async, so the lock only
        # serializes enqueue order — a second caller can pack and dispatch
        # batch N+1 while this thread waits for batch N's bytes (the
        # DynamicBatcher's pipelined dispatchers rely on this).
        # device-side uint8 (see _decode); serving output is 8-bit by
        # contract — the HTTP wire format is uint8 npz
        out = np.asarray(imgs_dev)
        return out[:b].astype(np.float32) / 255.0


class PredictionService(InferenceFrontend):
    """Compiled text-conditioned video-prediction service over one experiment.

    frames in -> ``num_preds`` predicted frames out. Requests are padded to
    ``batch_size`` rows and ``max_tokens`` caption tokens so every call reuses
    the same two executables compiled at :meth:`warmup`.

    Multi-chip serving is opt-in via the ``mesh_axes`` constructor kwarg
    (e.g. ``{"data": 4, "model": 2}``; ``src/07_serve.py --mesh_data
    --mesh_model``): the request batch shards over the ``data`` axis and,
    with ``model > 1``, the predictor's large matmuls shard Megatron-style
    over the ``model`` axis (parallel/partitioning.py).
    A batch size NOT divisible by the data axis (e.g. a batch-1
    single-sequence service on 8 chips) switches to SEQUENCE-parallel
    decode: encode+rollout replicate (latency-bound sequential work) and
    the decode — the dominant stage — shards its flattened
    ``batch*num_preds`` frame dim across the mesh.
    ``tpu.mesh_axes`` (a TRAINING knob that defaults to data=-1) is
    deliberately not consulted: a serving process must not silently change
    its compiled shapes with the host's device count. Without ``mesh_axes``
    the service is single-device, and the AOT export path stays
    single-device by design (exported StableHLO replays need no mesh)."""

    def __init__(self, exp_path, name_pred_exp: str, decomp_ckpt: str,
                 pred_ckpt: str, num_seed: Optional[int] = None,
                 num_preds: Optional[int] = None, batch_size: int = 8,
                 max_tokens: int = 24, mesh_axes: Optional[dict] = None,
                 wire_dtype: str = "float32"):
        parent = Experiment(exp_path)
        self.exp = Experiment(parent.exp_path / "predictors" / name_pred_exp) \
            if not str(name_pred_exp).startswith(str(parent.exp_path)) \
            else Experiment(name_pred_exp)
        Logger(self.exp.exp_path)
        self.parent = parent
        self.exp_params = self.exp.params

        pp = self.exp_params["prediction_params"]
        if num_seed is not None:
            pp["num_context"] = num_seed
        if num_preds is not None:
            pp["num_preds"] = num_preds
        self.num_context = pp["num_context"]
        self.num_preds = pp["num_preds"]
        self.batch_size = int(batch_size)
        # the executable's batch dim; may pad up past batch_size for mesh
        # divisibility (see below). batch_size stays the REQUEST cap the
        # operator configured — validation and the HTTP banner read it.
        self._compiled_batch = self.batch_size
        self.max_tokens = int(max_tokens)
        # input wire dtype (data/wire.py): "uint8" ships requests to the
        # device as uint8 and normalizes inside the compiled program — 4x
        # fewer H2D bytes (the narrow link on remote-attached runtimes).
        # Lossless for camera/decoder frames (k/255 values); arbitrary float
        # inputs are quantized to the 1/255 grid, hence opt-in.
        if wire_dtype not in ("float32", "uint8"):
            raise ValueError(f"wire_dtype {wire_dtype!r}: use float32|uint8")
        self.wire_dtype = wire_dtype

        mp = self.exp_params["model"]["model_params"]
        self.num_slots = mp["num_slots"]
        self.slot_dim = mp["slot_dim"]
        # input resolution: the dataset config is authoritative (the SAVi
        # model params carry resolution only inside encoder/decoder params)
        res = (self.exp_params["dataset"].get("img_size")
               or mp.get("resolution") or mp.get("img_size"))
        if isinstance(res, int):
            res = (res, res)
        self.resolution = (int(res[0]), int(res[1]))

        from textocvp_tpu.models.factory import check_image_reconstruction

        check_image_reconstruction(self.exp_params, purpose="serve")

        # measured-fastest inference decode structure (PERFORMANCE.md)
        self.exp_params.setdefault("tpu", {})["fast_decode_expand"] = "gather"
        self.model = setup_model(self.exp_params)
        self.predictor = setup_predictor(self.exp_params)
        self.tokenizer = _serving_tokenizer(self.exp_params)

        restored = load_checkpoint(
            checkpoint_path(self.parent.models_dir, decomp_ckpt))
        self.model_vars = {
            "params": jax.tree_util.tree_map(jnp.asarray, restored["params"])}
        if restored.get("batch_stats"):
            self.model_vars["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, restored["batch_stats"])
        pred_restored = load_checkpoint(
            checkpoint_path(self.exp.models_dir, pred_ckpt))
        self.pred_vars = {
            "params": jax.tree_util.tree_map(jnp.asarray, pred_restored["params"])}

        # opt-in multi-chip serving (see class docstring)
        self.mesh = None
        self._seq_parallel = False
        if mesh_axes:
            from textocvp_tpu.parallel.distributed import get_runtime_mesh
            from textocvp_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )
            from textocvp_tpu.parallel.partitioning import shard_predictor_params

            from textocvp_tpu.core.logger import print_
            from textocvp_tpu.parallel.mesh import _batch_axis_size

            self.mesh = get_runtime_mesh({"mesh_axes": mesh_axes})
            d = _batch_axis_size(self.mesh)
            # batch_size SMALLER than the batch mesh axis (the
            # single-sequence low-latency case, e.g. batch 1 on 8 chips):
            # fall back to SEQUENCE-parallel decode — inputs replicate, the
            # tiny encode+rollout runs identically everywhere (it is
            # latency-bound sequential work; replication costs no
            # wall-clock), and the decode (the dominant stage) shards its
            # flattened batch*num_preds FRAME dim across the chips instead
            # of the batch dim. The reference has no counterpart
            # (DataParallel scatters batch only, base/baseTrainer.py:132-135);
            # this is the TPU-native way to spend a mesh on one long rollout.
            #
            # A LARGER batch that merely isn't divisible (e.g. 12 on data=8)
            # would replicate a full 12-sequence encode+rollout on every
            # chip under seq-parallel — a throughput cliff — so instead the
            # compiled batch pads up to the next axis multiple and batch-
            # shards; requests still accept up to the caller's batch_size.
            self._seq_parallel = self.batch_size < d
            if self._seq_parallel:
                print_(f"serve: batch {self.batch_size} < data axis {d} — "
                       "sequence-parallel decode engaged (encode+rollout "
                       "replicate; decode shards the frame dim)")
            elif self.batch_size % d:
                self._compiled_batch = -(-self.batch_size // d) * d
                print_(f"serve: batch {self.batch_size} not divisible by "
                       f"data axis {d} — compiling at padded batch "
                       f"{self._compiled_batch} (requests stay capped at "
                       f"{self.batch_size}; padding sliced off per call)")
            from textocvp_tpu.parallel.partitioning import (
                decomp_tp_enabled,
                shard_decomp_variables,
            )

            if (self.mesh.shape["model"] > 1
                    and decomp_tp_enabled(self.exp_params)):
                # ViT-scale decomp (DINOSAUR): TP-shard encoder + patch
                # decoder over the model axis; SAVi stays replicated
                self.model_vars = shard_decomp_variables(
                    self.model_vars, self.mesh)
            else:
                self.model_vars = jax.device_put(
                    self.model_vars, replicated_sharding(self.mesh))
            if self.mesh.shape["model"] > 1:
                self.pred_vars = {"params": shard_predictor_params(
                    self.pred_vars["params"], self.mesh)}
            else:
                self.pred_vars = jax.device_put(
                    self.pred_vars, replicated_sharding(self.mesh))
            self._batch_sharding = (replicated_sharding(self.mesh)
                                    if self._seq_parallel
                                    else batch_sharding(self.mesh))

        self._lock = threading.Lock()
        self._counter = 0
        self._build()

    def _place_inputs(self, frames, text_kwargs):
        if self.mesh is None:
            return super()._place_inputs(frames, text_kwargs)
        put = lambda v: jax.device_put(np.asarray(v), self._batch_sharding)
        frames = (np.asarray(frames) if frames.dtype == np.uint8
                  else np.asarray(frames, np.float32))
        return put(frames), {k: put(v) for k, v in text_kwargs.items()}

    # ------------------------------------------------------------------ build
    def _build(self):
        from functools import partial

        from textocvp_tpu.models.chunked import should_bake_constants

        model, predictor = self.model, self.predictor
        model_vars, pred_vars = self.model_vars, self.pred_vars
        p, s, d = self.num_preds, self.num_slots, self.slot_dim

        # sequence-parallel decode (see __init__): shard the flattened
        # batch*num_preds frame dim over the mesh instead of the batch dim.
        # Frames pad up to the shard multiple inside the traced program
        # (static shapes) and the pad rows are sliced off before returning.
        seq_par = self.mesh is not None and self._seq_parallel
        frame_sharding = None
        n_shards = 1
        if seq_par:
            from jax.sharding import NamedSharding, PartitionSpec

            from textocvp_tpu.parallel.mesh import _batch_axes
            from textocvp_tpu.parallel.partitioning import decomp_tp_enabled

            # the frame dim shards over every batch axis ('dcn'+'data' on
            # hybrid multi-host meshes, 'data' otherwise) ...
            axes = _batch_axes(self.mesh)
            if (self.mesh.shape["model"] > 1
                    and not decomp_tp_enabled(self.exp_params)):
                # ... plus 'model' when decode weights replicate over it
                # (only ViT-scale decomps TP-shard the decoder): spend
                # EVERY chip on frames
                axes = axes + ("model",)
            for a in axes:
                n_shards *= self.mesh.shape[a]
            frame_sharding = NamedSharding(self.mesh, PartitionSpec(axes))
        rows = self._compiled_batch * p
        decode_rows = -(-rows // n_shards) * n_shards  # ceil to shard multiple
        tail_chunks = pick_tail_chunks(decode_rows, s, shard_multiple=n_shards)

        def _predict(mv, pv, videos, key, encode_scales=None, **text_kwargs):
            videos = as_float_video(videos)  # uint8 wire → [0,1] on device
            # int8 frozen-ViT encode (tpu.encode_quant; models/quant.py)
            ekw = {} if encode_scales is None else {
                "encode_quant_scales": encode_scales}
            out = model.apply(mv, videos, decode=False, rngs={"slots": key},
                              **ekw)
            return predictor.apply(pv, out["slot_history"], num_preds=p,
                                   teacher_force=False, **text_kwargs)

        def _decode(mv, pred_slots, tail_chunks=tail_chunks, tail_unroll=None,
                    quant_scales=None):
            b = pred_slots.shape[0]
            flat = pred_slots.reshape(b * p, s, d)
            if seq_par:
                pad_rows = decode_rows - b * p
                if pad_rows:
                    flat = jnp.concatenate(
                        [flat, jnp.zeros((pad_rows, s, d), flat.dtype)], axis=0)
                flat = jax.lax.with_sharding_constraint(flat, frame_sharding)
            # int8 decode (tpu.decode_quant; models/quant.py)
            qkw = {} if quant_scales is None else {"quant_scales": quant_scales}
            dec = model.apply(mv, flat,
                              method="decode", tail_chunks=tail_chunks,
                              tail_unroll=tail_unroll, **qkw)
            imgs = jnp.clip(dec["recons_imgs"], 0.0, 1.0)
            # quantize ON DEVICE: the serving wire format is uint8 anyway,
            # and fetching uint8 instead of float32 is 4x less D2H traffic
            # (the bottleneck on remote-attached runtimes; bench_serve.py)
            imgs = jnp.round(imgs * 255.0).astype(jnp.uint8)
            if seq_par:
                imgs = imgs[:b * p]
            return imgs.reshape(b, p, *imgs.shape[1:])

        # small frozen weights: bake into the executables as constants
        # (measured 2.3x on the decode); ViT/T5-scale pytrees stay arguments
        # (oversized constants are rejected by the remote compile service
        # and inflate compile time) — docs/PERFORMANCE.md "decode chunking"
        bake_m = should_bake_constants(model_vars)
        bake_p = should_bake_constants(pred_vars)

        def make_predict_stage(encode_scales=None):
            if bake_m and bake_p:
                return jax.jit(partial(_predict, model_vars, pred_vars,
                                       encode_scales=encode_scales))
            pj = jax.jit(partial(_predict, encode_scales=encode_scales))
            return lambda videos, key, **kw: pj(model_vars, pred_vars,
                                                videos, key, **kw)

        def make_decode_stage(tail_chunks=tail_chunks, tail_unroll=None,
                              quant_scales=None):
            d_ = partial(_decode, tail_chunks=tail_chunks, tail_unroll=tail_unroll,
                         quant_scales=quant_scales)
            dj = jax.jit(partial(d_, model_vars)) if bake_m else jax.jit(d_)
            return dj if bake_m else (lambda ps: dj(model_vars, ps))

        # opt-in runtime decode-schedule autotune (tpu.decode_autotune): a
        # long-lived service at a fixed padded batch shape amortizes the
        # per-candidate compile best — candidates are measured on the first
        # request (usually warmup()) and the winner serves from then on.
        # Same wiring as the evaluators (models/autotune.py).
        from textocvp_tpu.models.autotune import autotune_enabled, autotuned_stage
        from textocvp_tpu.models.quant import decode_quant_mode

        def build_decode_stage(quant_scales=None):
            mk = partial(make_decode_stage, quant_scales=quant_scales)
            if quant_scales is not None:
                # under int8 the flat decode is fastest — the chunking
                # pathology inverts (models/chunked.py::resolve_tail_chunks)
                from textocvp_tpu.models.chunked import resolve_tail_chunks

                cfg = (self.exp_params.get("tpu") or {}).get("decode_chunks")
                mk = partial(make_decode_stage, quant_scales=quant_scales,
                             tail_chunks=resolve_tail_chunks(
                                 cfg, decode_rows, s, quant=True,
                                 shard_multiple=n_shards))
            if autotune_enabled(self.exp_params):
                from textocvp_tpu.core.logger import print_
                from textocvp_tpu.models.chunked import decode_candidate_schedules

                cfg_chunks = (self.exp_params.get("tpu") or {}).get("decode_chunks")

                def schedules_of(pred_slots):
                    n_rows = (decode_rows if seq_par
                              else pred_slots.shape[0] * p)
                    return decode_candidate_schedules(
                        n_rows, s, configured_chunks=cfg_chunks,
                        quant=quant_scales is not None,
                        shard_multiple=n_shards)

                def sync(imgs):
                    np.asarray(imgs)  # full output fetch = the real serving cost

                return autotuned_stage(mk, schedules_of, sync, log=print_)
            return mk()

        from textocvp_tpu.models.quant import encode_quant_mode

        self._encode_quant_mode = encode_quant_mode(self.exp_params)
        if self._encode_quant_mode:
            # int8 frozen-ViT encode (tpu.encode_quant): lazily calibrated
            # on the first request's context frames, same contract as
            # decode_quant below — warmup() uses noise frames so the range
            # is not degenerate, calibrate() takes representative data, and
            # AOT export serializes the calibrated `.inner()` stage with
            # the scales baked (serve/export.py).
            from textocvp_tpu.core.logger import print_
            from textocvp_tpu.models.quant import lazy_encode_quantized_stage

            self._predict_stage = lazy_encode_quantized_stage(
                make_predict_stage,
                lambda videos, key, **kw: as_float_video(videos),
                model, model_vars,
                on_scales=lambda sc: setattr(self, "encode_quant_scales", sc),
                log=print_)
        else:
            self._predict_stage = make_predict_stage()
        self._quant_mode = decode_quant_mode(self.exp_params)
        if self._quant_mode:
            # int8 decoder tail (tpu.decode_quant): calibrate activation
            # scales on the first request's predicted slots — warmup(),
            # which for quantized services uses noise frames rather than a
            # black video so the calibration range is not degenerate — then
            # serve the quantized stage from then on (models/quant.py). The
            # `.inner()` handle is what AOT export serializes. Output
            # quality changes; the knob is an explicit per-experiment
            # opt-in.
            from textocvp_tpu.core.logger import print_
            from textocvp_tpu.models.quant import lazy_quantized_stage

            self._decode_stage = lazy_quantized_stage(
                build_decode_stage,
                lambda pred_slots: pred_slots.reshape(-1, s, d),
                model, model_vars,
                on_scales=lambda sc: setattr(self, "decode_quant_scales", sc),
                log=print_)
        else:
            self._decode_stage = build_decode_stage()

