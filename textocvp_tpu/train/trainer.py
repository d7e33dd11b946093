"""
Stage-1 (decomposition) trainer — the TPU-native counterpart of the
reference's BaseTrainer + 02_train_* scripts (reference base/baseTrainer.py,
02_train_savi.py, 02_train_extended_dinosaur.py).

Semantics preserved from the reference:
* validation epoch runs BEFORE each training epoch (baseTrainer.py:159-165)
* checkpoint cadence: last-saved every epoch, numbered every save_frequency,
  final at the end, emergency on crash/interrupt (baseTrainer.py:185-195)
* Adam + linear warmup + per-iteration cosine annealing, grad clip 0.05
* SAVi loss: MSE on [0,1]-clamped reconstructions; ExtendedDINOSAUR adds the
  clamped DINO-feature MSE (02_train_extended_dinosaur.py:57-62)

TPU-native execution: one jitted train step (forward+backward+update) with the
batch sharded over the mesh 'data' axis and replicated params — XLA emits the
gradient all-reduce; buffers are donated so the optimizer updates in place.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import Logger, for_all_methods, log_function, print_
from textocvp_tpu.data import DataLoader, load_data
from textocvp_tpu.data.wire import as_float_video
from textocvp_tpu.models import setup_model
from textocvp_tpu.parallel.distributed import (
    get_runtime_mesh,
    loader_process_kwargs,
    maybe_initialize_distributed,
)
from textocvp_tpu.parallel.mesh import get_mesh
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint, save_checkpoint
from textocvp_tpu.train.losses import build_loss_fn
from textocvp_tpu.train.schedulers import build_optimizer


def accum_steps_of(training_params: dict) -> int:
    """Validated ``training.accum_steps`` (gradient accumulation; default 1).

    Effective-batch parity knob: the optimizer sees ONE averaged gradient per
    global batch of ``batch_size`` sequences, but the forward/backward runs as
    ``accum_steps`` sequential microbatches inside the same jitted step — peak
    activation memory drops ~accum_steps-fold, letting a single chip train at
    the reference's global batch 64 where the flat step OOMs (ExtendedDINOSAUR
    B=16) or exceeds toolchain limits (predictor step B>=32 on the remote
    compile service, docs/PERFORMANCE.md "Training side")."""
    raw = training_params.get("accum_steps")
    accum = 1 if raw is None else int(raw)
    if accum < 1:
        raise ValueError(f"training.accum_steps must be >= 1, got {accum}")
    bs = training_params["batch_size"]
    if bs % accum:
        raise ValueError(
            f"training.accum_steps ({accum}) must divide batch_size ({bs}) "
            "so microbatches are equal-sized (equal sizes are what make the "
            "averaged gradient equal the full-batch gradient)")
    return accum


def ragged_accum(n: int, accum: int, batch_size: int) -> int:
    """Accumulation factor for a (possibly ragged) batch of ``n`` sequences.

    Accumulation exists because the FLAT step does not fit (HBM or toolchain
    limits), so the ragged final batch of an epoch (drop_last is false,
    reference-DataLoader parity) must never fall back to a near-full flat
    step. Picks the smallest divisor of ``n`` whose microbatch still fits
    the configured microbatch size (``batch_size // accum``); worst case
    (``n`` prime) degrades to size-1 microbatches for that one batch rather
    than OOMing."""
    if n % accum == 0:
        return accum
    mb = max(1, batch_size // accum)
    return min(d for d in range(1, n + 1) if n % d == 0 and n // d <= mb)


def microbatch_sharding(mesh):
    """Sharding constraint keeping (accum, micro_b, ...) microbatches split
    over the batch axes: a contiguous reshape of a data-sharded batch would
    otherwise land the sharding on the accum (scan) axis and force an
    all-gather per step. Batch axes are ('dcn', 'data') on hybrid multi-host
    meshes — constraining only 'data' there would replicate every microbatch
    across hosts, the exact collective this helper exists to prevent."""
    import jax.sharding as shd

    from textocvp_tpu.parallel.mesh import _batch_axes, _batch_axis_size

    def constrain(x):
        d = _batch_axis_size(mesh)
        if d > 1 and x.ndim >= 2 and x.shape[1] % d == 0:
            return jax.lax.with_sharding_constraint(
                x, shd.NamedSharding(mesh,
                                     shd.PartitionSpec(None, _batch_axes(mesh))))
        return x

    return constrain


def freeze_labels(params, frozen_prefixes: tuple[str, ...]):
    """Label pytree for optax.multi_transform: 'freeze' for frozen subtrees."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for path, _ in flat:
        keys = tuple(p.key for p in path)
        label = "freeze" if any(keys[0] == fp for fp in frozen_prefixes) else "train"
        put(labels, keys, label)
    return labels



@for_all_methods(log_function)
class DecompTrainer:
    """Trainer for SAVi / ExtendedDINOSAUR decomposition models."""

    def __init__(self, exp_path, checkpoint: Optional[str] = None,
                 resume_training: bool = False):
        self.exp = Experiment(exp_path)
        Logger(self.exp.exp_path)
        self.exp_params = self.exp.params
        self.model_name = self.exp_params["model"]["model_name"]
        self.training_params = self.exp_params["training"]
        self.checkpoint = checkpoint
        self.resume_training = resume_training

        maybe_initialize_distributed()
        self.mesh = get_runtime_mesh(self.exp_params.get("tpu"))
        self.model = setup_model(self.exp_params)
        self.loss_fn = build_loss_fn(self.exp_params["loss"])
        self.start_epoch = 0
        self.global_step = 0
        self.writer = None

    # ------------------------------------------------------------------ data
    def load_data(self):
        bs = self.training_params["batch_size"]
        self.train_set = load_data(self.exp_params, split="train")
        self.valid_set = load_data(self.exp_params, split="valid")
        self.train_loader = DataLoader(
            self.train_set, batch_size=bs,
            shuffle=self.exp_params["dataset"].get("shuffle_train", True),
            **loader_process_kwargs(self.mesh))
        self.valid_loader = DataLoader(
            self.valid_set, batch_size=bs,
            shuffle=self.exp_params["dataset"].get("shuffle_eval", False),
            **loader_process_kwargs(self.mesh))
        print_(f"Loaded {len(self.train_set)} train / {len(self.valid_set)} valid sequences")

    # ----------------------------------------------------------------- model
    def setup_model(self, sample_videos: np.ndarray):
        """Initialize params (or restore a checkpoint) and build the jitted steps."""
        init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
        # jit the init: eager flax init dispatches thousands of tiny ops,
        # which is pathologically slow over remote-attached device transports
        variables = jax.jit(
            lambda r, x: self.model.init(r, as_float_video(x), train=False)
        )(init_rngs, jnp.asarray(sample_videos[:1]))
        params = variables["params"]
        self.batch_stats = variables.get("batch_stats", None)

        frozen = ("image_encoder",) if self.model_name == "ExtendedDINOSAUR" else ()
        mask = freeze_labels(params, frozen) if frozen else None
        self.tx, self.lr_schedule = build_optimizer(self.training_params, freeze_mask=mask)
        opt_state = self.tx.init(params)

        self.params = params
        self.opt_state = opt_state

        if self.checkpoint is not None:
            path = checkpoint_path(self.exp.models_dir, self.checkpoint)
            target = {
                "params": params,
                "batch_stats": self.batch_stats or {},
                "opt_state": opt_state,
                "epoch": 0,
                "step": 0,
            }
            state = load_checkpoint(path, target=target)
            self.params = state["params"]
            if self.batch_stats is not None:
                self.batch_stats = state["batch_stats"]
            if self.resume_training:
                self.opt_state = state["opt_state"]
                self.start_epoch = int(state["epoch"])
                self.global_step = int(state["step"])
                print_(f"Resuming training from epoch {self.start_epoch}")

        self._build_steps()

    def _loss_tensors(self, out: dict, videos: jax.Array) -> dict:
        if self.model_name == "ExtendedDINOSAUR":
            return {
                "preds_feats": jnp.clip(out["recons_feats"], 0, 1),
                "targets_feats": jnp.clip(out["encoded_img_feats"], 0, 1),
                "pred_imgs": jnp.clip(out["recons_imgs"], 0, 1),
                "target_imgs": jnp.clip(videos, 0, 1),
            }
        return {
            "pred_imgs": jnp.clip(out["recons_imgs"], 0, 1),
            "target_imgs": jnp.clip(videos, 0, 1),
        }

    def _build_steps(self):
        model, loss_fn = self.model, self.loss_fn
        tx = self.tx
        has_bn = self.batch_stats is not None
        # rematerialize the forward during backward: trades ~1.3x FLOPs for
        # activation memory — needed for ExtendedDINOSAUR at 336px with large
        # batches (tpu.remat in experiment params)
        use_remat = bool((self.exp_params.get("tpu") or {}).get("remat", False))
        # train-time decode chunking: the scanned tail with a per-chunk-remat
        # backward ("auto"/int via tpu.train_decode_chunks). Measured NEGATIVE
        # for speed on v5e (779 vs 349 ms at the B=64 SAVi step — the
        # scan-with-remat backward schedules pathologically); the knob exists
        # for memory-limited configs, not throughput (models/chunked.py).
        from textocvp_tpu.models.chunked import (train_decode_kwargs,
                                                 valid_decode_kwargs)

        exp_params = self.exp_params

        def forward(params, batch_stats, videos, rng, train: bool):
            variables = {"params": params}
            n_rows = videos.shape[0] * videos.shape[1]
            # forward-only programs (valid epoch) take the evaluators'
            # chunked-decode policy: the flat forward-only schedule is a
            # measured 3x pathology on v5e (models/chunked.py
            # ::valid_decode_kwargs)
            kwargs = (train_decode_kwargs(exp_params, n_rows) if train
                      else valid_decode_kwargs(exp_params, n_rows))
            if has_bn:
                variables["batch_stats"] = batch_stats
            if train and has_bn:
                out, mut = model.apply(variables, videos, train=True,
                                       rngs={"slots": rng}, mutable=["batch_stats"],
                                       **kwargs)
                return out, mut.get("batch_stats")
            out = model.apply(variables, videos, train=False, rngs={"slots": rng},
                              **kwargs)
            return out, batch_stats

        constrain_micro = microbatch_sharding(self.mesh)

        def micro_grads(params, batch_stats, videos, rng):
            """Gradient/loss of ONE (micro)batch — both the flat step and the
            accumulation scan body."""

            def fwd(p, v):
                return forward(p, batch_stats, v, rng, train=True)

            if use_remat:
                # save the tagged frozen-ViT features instead of replaying
                # the (stop_gradient'ed, never-differentiated) ViT forward
                # in the backward (docs/PERFORMANCE.md round-5 training
                # breakdown). SAVi tags nothing, so the policy degenerates
                # to plain full remat there.
                fwd = jax.checkpoint(
                    fwd,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "frozen_feats"))

            def loss_of(p):
                out, new_bs = fwd(p, videos)
                total, values = loss_fn(**self._loss_tensors(out, videos))
                return total, (values, new_bs)

            (_, (values, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            return grads, values, new_bs

        @partial(jax.jit, static_argnames=("accum",), donate_argnums=(0, 1, 2))
        def train_step(params, batch_stats, opt_state, videos, rng, accum=1):
            videos = as_float_video(videos)  # uint8 wire → [0,1] on device
            if accum == 1:
                grads, values, new_bs = micro_grads(params, batch_stats, videos, rng)
            else:
                # gradient accumulation: scan over equal-sized microbatches,
                # average the gradients, apply ONE optimizer update. The
                # per-microbatch losses are batch MEANS over equal sizes, so
                # the averaged gradient equals the full-batch gradient
                # (tests/test_train_e2e.py::test_accum_step_matches_flat);
                # batch_stats thread sequentially (BN sees accum minibatches).
                mb = videos.shape[0] // accum
                vr = constrain_micro(videos.reshape(accum, mb, *videos.shape[1:]))
                keys = jax.random.split(rng, accum)

                def body(carry, xs):
                    bs, g_acc = carry
                    v, r = xs
                    g, vals, bs = micro_grads(params, bs, v, r)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (bs, g_acc), vals

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
                (new_bs, g_sum), vals_stack = jax.lax.scan(
                    body, (batch_stats, zeros), (vr, keys))
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
                values = jax.tree_util.tree_map(
                    lambda v: jnp.mean(v, axis=0), vals_stack)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, values

        @jax.jit
        def valid_step(params, batch_stats, videos, rng):
            videos = as_float_video(videos)
            out, _ = forward(params, batch_stats, videos, rng, train=False)
            _, values = loss_fn(**self._loss_tensors(out, videos))
            return values

        @jax.jit
        def valid_forward(params, batch_stats, videos, rng):
            videos = as_float_video(videos)
            out, _ = forward(params, batch_stats, videos, rng, train=False)
            return out

        accum = accum_steps_of(self.training_params)
        bs = self.training_params["batch_size"]

        def train_step_accum(params, batch_stats, opt_state, videos, rng):
            a = ragged_accum(videos.shape[0], accum, bs)
            return train_step(params, batch_stats, opt_state, videos, rng, accum=a)

        self.train_step = train_step_accum
        # raw jit object, for HLO-level sharding inspection (tests) and AOT
        self._train_step_jit = train_step
        self.valid_step = valid_step
        self.valid_forward = valid_forward

    # ------------------------------------------------------------------ loop
    def _rng(self):
        key = jax.random.PRNGKey(14)
        self.global_step += 1
        return jax.random.fold_in(key, self.global_step)

    def _log_scalars(self, values: dict, prefix: str):
        if self.writer is None:
            return
        for k, v in values.items():
            self.writer.add_scalar(f"{prefix}/{k}", float(v), self.global_step)

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
        img_freq = self.training_params.get("image_log_frequency", 300)
        from textocvp_tpu.parallel.mesh import device_prefetch

        for i, (videos, _) in enumerate(device_prefetch(self.train_loader, self.mesh)):
            self.params, self.batch_stats, self.opt_state, values = self.train_step(
                self.params, self.batch_stats, self.opt_state, videos, self._rng()
            )
            if i % log_freq == 0:
                vals = {k: float(v) for k, v in values.items()}
                self._log_scalars(vals, "train")
                if self.writer is not None:
                    self.writer.add_scalar(
                        "train/lr", float(self.lr_schedule(self.global_step)), self.global_step
                    )
                print_(f"  epoch {epoch} iter {i}: loss={vals['_total']:.6f}")
            if self.writer is not None and i % img_freq == 0:
                self._log_images(videos)
            losses.append(float(values["_total"]))
        return float(np.mean(losses)) if losses else float("nan")

    def _log_images(self, videos):
        """GT vs reconstruction image panel to TensorBoard every
        image_log_frequency iterations (reference 02_train_savi.py:78-137).

        Multi-process runs skip this ON EVERY process: the caller's
        ``self.writer is not None`` gate is process-local (only process 0
        owns a writer), and a device program run by one process but not the
        others is a cross-process collective-order divergence — the Gloo
        mismatch tests/test_multiprocess.py exists to catch. Scalars still
        log; image panels are a single-host nicety."""
        if jax.process_count() > 1:
            return
        try:
            out = self.valid_forward(self.params, self.batch_stats, videos[:1], self._rng())
            recons = np.clip(np.asarray(out["recons_imgs"][0]), 0, 1)  # (T, H, W, C)
            gt = np.clip(np.asarray(as_float_video(videos[0])), 0, 1)
            panel = np.concatenate([gt, recons], axis=1)  # stack vertically per frame
            strip = np.concatenate(list(panel), axis=1)   # frames left-to-right
            self.writer.add_image(
                "train/recons", strip.transpose(2, 0, 1), self.global_step
            )
        except Exception:
            pass  # image logging must never break training

    def valid_epoch(self, epoch: int) -> float:
        losses = []
        from textocvp_tpu.parallel.mesh import device_prefetch

        for videos, _ in device_prefetch(self.valid_loader, self.mesh):
            values = self.valid_step(self.params, self.batch_stats, videos, self._rng())
            losses.append(float(values["_total"]))
        mean = float(np.mean(losses)) if losses else float("nan")
        self._log_scalars({"_total": mean}, "valid")
        return mean

    def _state(self, epoch: int) -> dict:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats or {},
            "opt_state": self.opt_state,
            "epoch": epoch,
            "step": self.global_step,
        }

    def log_architecture(self):
        """Dump the module structure to model_architecture.txt
        (reference lib/utils.py:90-129)."""
        from textocvp_tpu.parallel.distributed import is_process_zero

        if not is_process_zero():
            return
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        with open(self.exp.exp_path / "model_architecture.txt", "w") as f:
            f.write(str(self.model) + "\n")
            f.write(f"\nLearnable parameters: {n_params}\n")

    def training_loop(self):
        """Epoch loop with emergency checkpointing (reference
        setup_model.py:244-276 and baseTrainer.py:148-196).

        Set TEXTOCVP_PROFILE=<dir> to capture a jax.profiler trace of the
        first training epoch."""
        self._setup_writer()
        self.log_architecture()
        import os

        profile_dir = os.environ.get("TEXTOCVP_PROFILE")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
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
                dt = time.time() - t0
                print_(
                    f"Epoch {epoch + 1}/{num_epochs}: train={train_loss:.6f} "
                    f"valid={val_loss:.6f} ({dt:.1f}s)"
                )
                save_ckpt("checkpoint_last_saved", self._state(epoch + 1))
                if (epoch + 1) % save_freq == 0:
                    save_ckpt(f"checkpoint_epoch_{epoch + 1}", self._state(epoch + 1))
                if profile_dir and epoch == self.start_epoch:
                    jax.profiler.stop_trace()
                    profile_dir = None
            save_ckpt("checkpoint_epoch_final", self._state(num_epochs))
            flush_ckpts()
        except (Exception, KeyboardInterrupt) as e:
            try:
                flush_ckpts()  # drain pending async writes first, best-effort
            except BaseException as flush_err:
                # BaseException: a second Ctrl-C while the flush drains a
                # multi-second write must not skip the emergency checkpoint
                print_(f"async checkpoint flush failed during emergency "
                       f"handling: {flush_err}", "error")
            save_checkpoint(self.exp.models_dir, f"emergency_checkpoint_epoch_{epoch}",
                            self._state(epoch))
            from textocvp_tpu.core import logger as _logger

            if _logger._LOGGER is not None:
                _logger._LOGGER.log_exception(e)
            print_(f"Emergency checkpoint saved at epoch {epoch} ({type(e).__name__})", "error")
            raise
