"""
Stage-2 (predictor) trainer (reference base/basePredictorTrainer.py +
04_train_predictor.py).

The frozen decomposition model encodes ``num_context + num_preds`` frames into
slots (under stop_gradient), the predictor rolls out ``num_preds`` future
slots (teacher forcing per config), the frozen decoder renders predicted
frames, and the loss is pred_slot_mse + pred_img_mse. All of it — decomp
encode, rollout (with cached text K/V), decode, loss, backward, update — is
one jitted XLA program per step.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
import optax

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import Logger, for_all_methods, log_function, print_
from textocvp_tpu.data import DataLoader, load_data
from textocvp_tpu.data.wire import as_float_video
from textocvp_tpu.models import setup_model, setup_predictor
from textocvp_tpu.parallel.distributed import (
    get_runtime_mesh,
    loader_process_kwargs,
    maybe_initialize_distributed,
)
from textocvp_tpu.parallel.mesh import get_mesh, replicated_sharding
from textocvp_tpu.parallel.partitioning import shard_predictor_params
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint, save_checkpoint
from textocvp_tpu.train.losses import build_loss_fn
from textocvp_tpu.train.schedulers import build_optimizer


def _text_kwargs(others: dict) -> dict:
    out = {}
    for k in ("caption_tokens", "caption_lengths", "attn_masks"):
        v = others.get(k)
        if v is not None:
            out[k] = jnp.asarray(v)
    return out



@for_all_methods(log_function)
class PredictorTrainer:
    """Trainer for slot predictors with a frozen stage-1 model."""

    def __init__(self, exp_path, decomp_ckpt: str,
                 checkpoint: Optional[str] = None, resume_training: bool = False):
        self.exp = Experiment(exp_path)
        Logger(self.exp.exp_path)
        self.exp_params = self.exp.params
        parent = self.exp.parent
        if parent is None:
            raise ValueError(f"{exp_path} is not a nested predictor experiment")
        self.parent = parent
        self.training_params = self.exp_params["training"]
        self.prediction_params = self.exp_params["prediction_params"]
        self.decomp_ckpt = decomp_ckpt
        self.checkpoint = checkpoint
        self.resume_training = resume_training

        maybe_initialize_distributed()
        self.mesh = get_runtime_mesh(self.exp_params.get("tpu"))
        self.decomp_model = setup_model(self.exp_params)
        self.predictor = setup_predictor(self.exp_params, train=True)
        self.loss_fn = build_loss_fn(self.exp_params["predictor_loss"])
        self.start_epoch = 0
        self.global_step = 0
        self.writer = None

    # ------------------------------------------------------------------ data
    def load_data(self):
        """Dataset with num_frames overridden to num_context + num_preds
        (reference basePredictorTrainer.py:88-93)."""
        num_frames = self.prediction_params["num_context"] + self.prediction_params["num_preds"]
        exp_params = dict(self.exp_params)
        exp_params["dataset"] = {**self.exp_params["dataset"], "num_frames": num_frames}
        bs = self.training_params["batch_size"]
        d = self.mesh.shape["data"]
        if bs % d:
            print_(f"batch_size {bs} is not divisible by the data axis ({d}); "
                   "ragged batches will replicate across chips — pad the batch "
                   "size for full utilization", "warning")
        self.train_set = load_data(exp_params, split="train")
        self.valid_set = load_data(exp_params, split="valid")
        self.train_loader = DataLoader(
            self.train_set, batch_size=bs,
            shuffle=exp_params["dataset"].get("shuffle_train", True), **loader_process_kwargs(self.mesh))
        self.valid_loader = DataLoader(
            self.valid_set, batch_size=bs,
            shuffle=exp_params["dataset"].get("shuffle_eval", False), **loader_process_kwargs(self.mesh))

    # ----------------------------------------------------------------- model
    def setup_model(self, sample_videos: np.ndarray, sample_text: Optional[dict] = None):
        c = self.prediction_params["num_context"]
        p = self.prediction_params["num_preds"]
        videos = jnp.asarray(sample_videos[:1, : c + p])

        # frozen decomposition model from the PARENT experiment
        # (reference basePredictorTrainer.py:111-144)
        init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
        # jit the inits/applies here: eager flax init dispatches thousands of
        # tiny ops — pathologically slow over remote-attached device transports
        variables = jax.jit(
            lambda r, x: self.decomp_model.init(r, as_float_video(x),
                                                decode=True, train=False)
        )(init_rngs, videos)
        decomp_target = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}) or {},
        }
        path = checkpoint_path(self.parent.models_dir, self.decomp_ckpt)
        restored = load_checkpoint(path)
        decomp_host = jax.tree_util.tree_map(
            jnp.asarray,
            {"params": restored["params"],
             "batch_stats": restored.get("batch_stats", {}) or {}},
        )
        from textocvp_tpu.parallel.partitioning import (
            decomp_tp_enabled,
            shard_decomp_variables,
        )

        if self.mesh.shape["model"] > 1 and decomp_tp_enabled(self.exp_params):
            # frozen ViT-scale decomp: TP-shard its blocks like the predictor
            self.decomp_params = shard_decomp_variables(decomp_host, self.mesh)
        else:
            self.decomp_params = jax.device_put(
                decomp_host, replicated_sharding(self.mesh))
        del decomp_target

        # predictor init (jitted — see the init note above)
        slot_sample = jax.jit(
            lambda p, x, key: self.decomp_model.apply(
                {"params": p}, as_float_video(x), decode=False,
                rngs={"slots": key})
        )(self.decomp_params["params"], videos,
          jax.random.PRNGKey(2))["slot_history"]
        text_kwargs = {k: v[:1] for k, v in _text_kwargs(sample_text or {}).items()}
        pred_vars = jax.jit(
            lambda r, s, tk: self.predictor.init(r, s, **tk)
        )({"params": jax.random.PRNGKey(3)}, slot_sample, text_kwargs)
        self.params = pred_vars["params"]
        self._place_params()

        self.tx, self.lr_schedule = build_optimizer(self.training_params)
        # opt_state moments are zeros_like(params) and inherit their shardings
        self.opt_state = self.tx.init(self.params)

        if self.checkpoint is not None:
            ckpt = load_checkpoint(
                checkpoint_path(self.exp.models_dir, self.checkpoint),
                target={"params": self.params, "opt_state": self.opt_state,
                        "epoch": 0, "step": 0, "batch_stats": {}},
            )
            self.params = ckpt["params"]
            self._place_params()
            if self.resume_training:
                self.opt_state = ckpt["opt_state"]
                self.start_epoch = int(ckpt["epoch"])
                self.global_step = int(ckpt["step"])

        self._build_steps()

    def _place_params(self):
        """Tensor-parallel placement: with ``tpu.mesh_axes.model > 1`` the
        predictor's large matmuls shard over the 'model' axis (Megatron
        pattern, parallel/partitioning.py); otherwise params replicate."""
        if self.mesh.shape["model"] > 1:
            self.params = shard_predictor_params(self.params, self.mesh)
        else:
            self.params = jax.device_put(self.params, replicated_sharding(self.mesh))

    def _build_steps(self):
        decomp_model = self.decomp_model
        decomp_params = self.decomp_params
        predictor = self.predictor
        loss_fn = self.loss_fn
        tx = self.tx
        c = self.prediction_params["num_context"]
        p = self.prediction_params["num_preds"]
        teacher_force = bool(self.prediction_params.get("teacher_force", False))
        num_slots = self.exp_params["model"]["model_params"]["num_slots"]
        slot_dim = self.exp_params["model"]["model_params"]["slot_dim"]
        has_bn = bool(decomp_params.get("batch_stats"))

        def decomp_vars():
            v = {"params": decomp_params["params"]}
            if has_bn:
                v["batch_stats"] = decomp_params["batch_stats"]
            return v

        # train-time decode chunking (tpu.train_decode_chunks): the scanned
        # conv tail with a per-chunk-remat backward. Measured NEGATIVE for
        # speed on v5e at the SAVi decomp step (779 vs 349 ms, B=64) — a
        # memory knob, not a throughput one (models/chunked.py).
        from textocvp_tpu.models.chunked import (train_decode_kwargs,
                                                 valid_decode_kwargs)

        exp_params = self.exp_params

        def _decode_kwargs(b: int, valid: bool = False) -> dict:
            # valid_step is forward-only: the evaluators' chunked-decode
            # policy applies (flat forward-only programs schedule
            # pathologically on v5e — models/chunked.py::valid_decode_kwargs)
            if valid:
                return valid_decode_kwargs(exp_params, b * p)
            return train_decode_kwargs(exp_params, b * p)

        def forward_loss(params, videos, rng, text_kwargs, tf: bool,
                         valid: bool = False):
            videos = videos[:, : c + p]
            b = videos.shape[0]
            out = decomp_model.apply(
                decomp_vars(), videos, decode=False, rngs={"slots": rng}
            )
            # tag the frozen-decomp slots so the remat policy below can SAVE
            # them instead of replaying the whole frozen encode (SAVi CNN or
            # DINOSAUR ViT-B/14) in the backward — it sits behind
            # stop_gradient and is never differentiated
            slot_history = jax.ad_checkpoint.checkpoint_name(
                jax.lax.stop_gradient(out["slot_history"]), "frozen_feats")
            pred_slots = predictor.apply(
                {"params": params}, slot_history, teacher_force=tf, **text_kwargs
            )
            dec = decomp_model.apply(
                decomp_vars(), pred_slots.reshape(b * p, num_slots, slot_dim),
                method="decode", **_decode_kwargs(b, valid=valid),
            )
            pred_imgs = dec["recons_imgs"]
            target_imgs = videos[:, c : c + p]
            pred_imgs = pred_imgs.reshape(target_imgs.shape) \
                if pred_imgs is not None and pred_imgs.size else None
            tensors = {
                "pred_slots": pred_slots,
                "target_slots": slot_history[:, c : c + p],
            }
            if pred_imgs is not None:
                tensors["pred_imgs"] = pred_imgs
                tensors["target_imgs"] = target_imgs
            total, values = loss_fn(**tensors)
            return total, values

        use_remat = bool((self.exp_params.get("tpu") or {}).get("remat", False))

        from textocvp_tpu.train.trainer import (
            accum_steps_of,
            microbatch_sharding,
            ragged_accum,
        )

        constrain_micro = microbatch_sharding(self.mesh)

        def micro_grads(params, videos, rng, text_kwargs, tf):
            def loss_of(q, v):
                return forward_loss(q, v, rng, text_kwargs, tf)

            if use_remat:
                # recompute the rollout+decode during backward: trades ~1.3x
                # FLOPs for activation memory (needed at 336px / long
                # rollouts). The tagged frozen-decomp slots are SAVED, not
                # replayed (see forward_loss).
                loss_of = jax.checkpoint(
                    loss_of,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "frozen_feats"))

            (_, values), grads = jax.value_and_grad(
                lambda q: loss_of(q, videos), has_aux=True
            )(params)
            return grads, values

        @partial(jax.jit, static_argnames=("tf", "accum"), donate_argnums=(0, 1))
        def train_step(params, opt_state, videos, rng, tf, accum=1, **text_kwargs):
            videos = as_float_video(videos)  # uint8 wire → [0,1] on device
            if accum == 1:
                grads, values = micro_grads(params, videos, rng, text_kwargs, tf)
            else:
                # gradient accumulation (training.accum_steps): sequential
                # equal-sized microbatches inside ONE jitted step, averaged
                # gradient, one optimizer update — effective-batch parity
                # with the reference's global batch where the flat fused
                # step exceeds HBM or toolchain limits (docs/PERFORMANCE.md
                # "Training side" finding 2).
                mb = videos.shape[0] // accum
                vr = constrain_micro(videos.reshape(accum, mb, *videos.shape[1:]))
                tk = {
                    k: constrain_micro(v.reshape(accum, mb, *v.shape[1:]))
                    for k, v in text_kwargs.items()
                }
                keys = jax.random.split(rng, accum)

                def body(g_acc, xs):
                    v, r, t = xs
                    g, vals = micro_grads(params, v, r, t, tf)
                    return jax.tree_util.tree_map(jnp.add, g_acc, g), vals

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                g_sum, vals_stack = jax.lax.scan(body, zeros, (vr, keys, tk))
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
                values = jax.tree_util.tree_map(
                    lambda v: jnp.mean(v, axis=0), vals_stack)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, values

        @partial(jax.jit, static_argnames=("tf",))
        def valid_step(params, videos, rng, tf, **text_kwargs):
            videos = as_float_video(videos)
            _, values = forward_loss(params, videos, rng, text_kwargs, tf,
                                     valid=True)
            return values

        accum = accum_steps_of(self.training_params)
        bs = self.training_params["batch_size"]

        def train_step_accum(params, opt_state, videos, rng, **tk):
            a = ragged_accum(videos.shape[0], accum, bs)
            return train_step(params, opt_state, videos, rng, teacher_force,
                              accum=a, **tk)

        self.train_step = train_step_accum
        self.valid_step = lambda params, videos, rng, **tk: valid_step(
            params, videos, rng, False, **tk)

        @jax.jit
        def viz_forward(params, videos, rng, **text_kwargs):
            """Free-running rollout + decode of one sequence for TB images."""
            videos = as_float_video(videos[:1, : c + p])
            out = decomp_model.apply(decomp_vars(), videos, decode=False,
                                     rngs={"slots": rng})
            pred_slots = predictor.apply(
                {"params": params}, out["slot_history"], teacher_force=False,
                **text_kwargs)
            dec = decomp_model.apply(
                decomp_vars(), pred_slots.reshape(p, num_slots, slot_dim),
                method="decode")
            return dec["recons_imgs"]

        self.viz_forward = viz_forward

    # ------------------------------------------------------------------ loop
    def _rng(self):
        self.global_step += 1
        return jax.random.fold_in(jax.random.PRNGKey(14), self.global_step)

    def _setup_writer(self):
        from textocvp_tpu.parallel.distributed import is_process_zero

        if not is_process_zero():
            self.writer = None  # one TB event stream per experiment
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=str(self.exp.exp_path / "tboard_logs"))
        except Exception:
            self.writer = None

    def train_epoch(self, epoch: int) -> float:
        losses = []
        log_freq = self.training_params.get("log_frequency", 100)
        max_iters = self.training_params.get("train_iters_per_epoch")
        from textocvp_tpu.parallel.mesh import device_prefetch

        for i, (videos, others) in enumerate(device_prefetch(self.train_loader, self.mesh)):
            if max_iters is not None and i >= max_iters:
                break
            self.params, self.opt_state, values = self.train_step(
                self.params, self.opt_state, videos, self._rng(), **_text_kwargs(others)
            )
            if i % log_freq == 0:
                vals = {k: float(v) for k, v in values.items()}
                if self.writer is not None:
                    for k, v in vals.items():
                        self.writer.add_scalar(f"train/{k}", v, self.global_step)
                print_(f"  epoch {epoch} iter {i}: loss={vals['_total']:.6f}")
            if self.writer is not None and i % self.training_params.get(
                    "image_log_frequency", 300) == 0:
                self._log_images(videos, others)
            losses.append(float(values["_total"]))
        return float(np.mean(losses)) if losses else float("nan")

    def _log_images(self, videos, others):
        """GT-vs-prediction strip to TensorBoard (reference
        basePredictorTrainer.py:308-311).

        Skipped on EVERY process in multi-process runs: the caller's
        writer gate is process-local, and running a device program (or the
        ``self._rng()`` global-step bump) on one process only diverges the
        cross-process collective order / rng stream — see
        tests/test_multiprocess.py."""
        if jax.process_count() > 1:
            return
        try:
            c = self.prediction_params["num_context"]
            p = self.prediction_params["num_preds"]
            tk = {k: v[:1] for k, v in _text_kwargs(others).items()}
            preds = np.clip(np.asarray(
                self.viz_forward(self.params, videos, self._rng(), **tk)), 0, 1)
            gt = np.clip(np.asarray(as_float_video(videos[0, c : c + p])), 0, 1)
            panel = np.concatenate([gt, preds], axis=1)  # vertical GT/pred
            strip = np.concatenate(list(panel), axis=1)
            self.writer.add_image("train/predictions", strip.transpose(2, 0, 1),
                                  self.global_step)
        except Exception:
            pass  # image logging must never break training

    def valid_epoch(self, epoch: int) -> float:
        losses = []
        from textocvp_tpu.parallel.mesh import device_prefetch

        for videos, others in device_prefetch(self.valid_loader, self.mesh):
            values = self.valid_step(self.params, videos, self._rng(), **_text_kwargs(others))
            losses.append(float(values["_total"]))
        return float(np.mean(losses)) if losses else float("nan")

    def _state(self, epoch: int) -> dict:
        return {"params": self.params, "opt_state": self.opt_state,
                "epoch": epoch, "step": self.global_step, "batch_stats": {}}

    def training_loop(self):
        self._setup_writer()
        num_epochs = self.training_params["num_epochs"]
        save_freq = self.training_params.get("save_frequency", 25)
        epoch = self.start_epoch
        # tpu.async_checkpoint: serialization+disk on a worker thread, the
        # loop only pays for the D2H snapshot (checkpoints.py)
        from textocvp_tpu.train.checkpoints import make_checkpoint_saver

        save_ckpt, flush_ckpts = make_checkpoint_saver(
            self.exp_params, self.exp.models_dir)
        try:
            for epoch in range(self.start_epoch, num_epochs):
                t0 = time.time()
                val_loss = self.valid_epoch(epoch)
                train_loss = self.train_epoch(epoch)
                print_(
                    f"Epoch {epoch + 1}/{num_epochs}: train={train_loss:.6f} "
                    f"valid={val_loss:.6f} ({time.time() - t0:.1f}s)"
                )
                save_ckpt("checkpoint_last_saved", self._state(epoch + 1))
                if (epoch + 1) % save_freq == 0:
                    save_ckpt(f"checkpoint_epoch_{epoch + 1}", self._state(epoch + 1))
            save_ckpt("checkpoint_epoch_final", self._state(num_epochs))
            flush_ckpts()
        except (Exception, KeyboardInterrupt) as e:
            try:
                flush_ckpts()  # drain pending async writes first, best-effort
            except BaseException as flush_err:
                # BaseException: a second Ctrl-C during the flush must not
                # skip the emergency checkpoint
                print_(f"async checkpoint flush failed during emergency "
                       f"handling: {flush_err}", "error")
            save_checkpoint(self.exp.models_dir, f"emergency_checkpoint_epoch_{epoch}",
                            self._state(epoch))
            from textocvp_tpu.core import logger as _logger

            if _logger._LOGGER is not None:
                _logger._LOGGER.log_exception(e)
            print_(f"Emergency checkpoint saved at epoch {epoch} ({type(e).__name__})", "error")
            raise
