"""
Qualitative figure/GIF generation (reference 06_generate_figs_decomp_model.py
and 06_generate_figs_predictor.py).

DecompFigGenerator: per-sequence reconstruction figs, object grids and
segmentation overlays. PredictorFigGenerator: rollout figs with per-sequence
PSNR/LPIPS in the directory name, seed/target/pred panels, sequence GIFs and
the caption saved to prompt.txt (reference 06_generate_figs_predictor.py:83-259).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.core.logger import print_
from textocvp_tpu.data.wire import as_float_video
from textocvp_tpu.train.evaluator import DecompEvaluator, PredictorEvaluator, _text_kwargs
from textocvp_tpu.train.metrics import MetricTracker
from textocvp_tpu.viz import figures as viz


class DecompFigGenerator(DecompEvaluator):
    """Figure generation for decomposition models (batch_size=1 sequences)."""

    # feature-only decoders (reconstruct_images=false) still produce
    # masks/objects figures; only the recons panels are skipped.
    requires_image_reconstruction = False

    def __init__(self, exp_path, checkpoint: str, num_seqs: int = 10):
        super().__init__(exp_path, checkpoint, batch_size=1, metrics=("psnr",))
        self.num_seqs = num_seqs

    def load_model(self, sample_videos):
        super().load_model(sample_videos)
        model = self.model

        @jax.jit
        def fig_step(variables, videos, rng):
            return model.apply(variables, as_float_video(videos),
                               rngs={"slots": rng})

        self.fig_step = fig_step

    def generate_figs(self):
        out_dir = self.exp.plots_dir / f"figs_{self.checkpoint}"
        for i, (videos, others) in enumerate(self.test_loader):
            if i >= self.num_seqs:
                break
            out = self.fig_step(self.variables, jnp.asarray(videos),
                                jax.random.fold_in(jax.random.PRNGKey(14), i))
            seq_dir = out_dir / f"sequence_{i:02d}"
            gt = np.asarray(as_float_video(videos[0]))
            if "recons_imgs" in out:
                recons = np.clip(np.asarray(out["recons_imgs"][0]), 0, 1)
                viz.visualize_recons(gt, recons, savepath=seq_dir / "recons.png")
                viz.make_gif(recons, seq_dir / "recons.gif", n_seed=len(recons))
            masks = np.asarray(out["masks"][0]) if "masks" in out else None
            if masks is not None and masks.shape[-1] == 1:  # SAVi (T, S, H, W, 1)
                objs = np.clip(np.asarray(out["recons_objs"][0]) * masks, 0, 1)
                viz.visualize_decomp(objs, savepath=seq_dir / "objects.png")
                viz.visualize_decomp(masks, savepath=seq_dir / "masks.png")
                overlays = np.stack([
                    viz.overlay_segmentations(gt[t], masks[t]) for t in range(gt.shape[0])
                ])
                viz.visualize_sequence(overlays, savepath=seq_dir / "segmentation.png")
            elif masks is not None:  # DINOSAUR (T, S, 1, gh, gw) patch alphas
                objs, masks_up, frames_tiny = viz.process_objs_masks_dinosaur(
                    gt, masks, out_size=96, return_all=True)
                viz.visualize_decomp(objs, savepath=seq_dir / "objects.png")
                viz.visualize_decomp(masks_up[..., None],
                                     savepath=seq_dir / "masks.png")
                onehot = viz.idx_to_one_hot(np.argmax(masks_up, axis=1),
                                            num_classes=masks_up.shape[1])
                overlays = np.stack([
                    viz.overlay_segmentations(frames_tiny[t], onehot[t])
                    for t in range(gt.shape[0])
                ])
                viz.visualize_sequence(overlays, savepath=seq_dir / "segmentation.png")
            print_(f"Saved figures for sequence {i} -> {seq_dir}")
        return out_dir


class PredictorFigGenerator(PredictorEvaluator):
    """Figure/GIF generation for predictors (batch_size=1 sequences)."""

    def __init__(self, exp_path, name_pred_exp, decomp_ckpt, pred_ckpt,
                 num_seed: Optional[int] = None, num_preds: Optional[int] = None,
                 num_seqs: int = 10):
        super().__init__(exp_path, name_pred_exp, decomp_ckpt, pred_ckpt,
                         num_seed=num_seed, num_preds=num_preds, batch_size=1,
                         metrics=("psnr", "lpips"))
        self.num_seqs = num_seqs

    def load_models(self, sample_videos, sample_text=None):
        super().load_models(sample_videos, sample_text)
        decomp_model = self.decomp_model
        decomp_vars = self.decomp_vars
        c, p = self.num_context, self.num_preds
        num_slots = self.exp_params["model"]["model_params"]["num_slots"]
        slot_dim = self.exp_params["model"]["model_params"]["slot_dim"]

        @jax.jit
        def decode_full(pred_slots):
            b = pred_slots.shape[0]
            return decomp_model.apply(
                decomp_vars, pred_slots.reshape(b * p, num_slots, slot_dim),
                method="decode",
            )

        @jax.jit
        def decode_seed(videos, rng):
            """Seed frames decomposed WITH decoding (objects + masks for the
            aligned-slots figure; reference 06_generate_figs_predictor.py:108-127)."""
            return decomp_model.apply(decomp_vars,
                                      as_float_video(videos[:, :c]),
                                      decode=True, rngs={"slots": rng})

        self.decode_full = decode_full
        self.decode_seed = decode_seed

    # ------------------------------------------------------------- per-seq figs
    @staticmethod
    def _objs_masks(frames, objs, masks):
        """Normalize SAVi / DINOSAUR mask layouts to per-object crops
        (T, S, h, w, C), spatial masks (T, S, h, w) and matching frames.
        SAVi: masks (T, S, H, W, 1) + decoded per-object RGB. DINOSAUR:
        masks (T, S, 1, gh, gw) patch-grid alphas, objects built by masking
        the frames at 96px (reference 06_generate_figs_predictor.py:160-171)."""
        if masks is None:
            return None, None, frames
        masks = np.asarray(masks)
        if masks.shape[-1] == 1:  # SAVi
            objs = np.asarray(objs) * masks
            return objs, masks[..., 0], frames
        return viz.process_objs_masks_dinosaur(frames, masks, out_size=96,
                                               return_all=True)

    def generate_figs(self):
        out_dir = self.exp.plots_dir / (
            f"figs_pred_{self.pred_ckpt}_NumPreds={self.num_preds}"
        )
        c, p = self.num_context, self.num_preds
        for i, (videos, others) in enumerate(self.test_loader):
            if i >= self.num_seqs:
                break
            batch = jnp.asarray(videos)
            rng = jax.random.fold_in(jax.random.PRNGKey(14), i)
            pred_slots = self.predict_stage(self.pred_params, batch, rng,
                                            **_text_kwargs(others))
            vals, pred_imgs = self.decode_metrics_stage(pred_slots, batch)
            psnr_v = float(np.asarray(vals["psnr"]).mean())
            lpips_v = float(np.asarray(vals["lpips"]).mean()) if "lpips" in vals else 0.0
            seq_dir = out_dir / f"sequence_{i:02d}_psnr={psnr_v:.2f}_lpips={lpips_v:.3f}"
            seq_dir.mkdir(parents=True, exist_ok=True)

            gt = np.clip(np.asarray(as_float_video(videos[0])), 0, 1)
            preds = np.clip(np.asarray(pred_imgs[0]), 0, 1)

            # qualitative panel (reference qual_eval_rgb.png)
            viz.visualize_qualitative_eval(
                gt[:c], gt[c : c + p], preds, savepath=seq_dir / "qual_eval_rgb.png"
            )

            # per-object decompositions of seed + predicted frames
            seed_dec = self.decode_seed(batch, rng)
            pred_dec = self.decode_full(pred_slots)
            seed_objs, seed_masks, seed_frames = self._objs_masks(
                gt[:c],
                seed_dec["recons_objs"][0] if "recons_objs" in seed_dec else None,
                seed_dec["masks"][0] if "masks" in seed_dec else None,
            )
            pred_objs, pred_masks, pred_frames = self._objs_masks(
                preds, pred_dec.get("recons"), pred_dec.get("masks"))

            if seed_objs is not None and pred_objs is not None:
                # aligned slots: green seed / red pred borders per object
                # (reference 06_generate_figs_predictor.py:181-187)
                all_objs = np.concatenate([
                    viz.add_border(seed_objs, viz.GREEN, pad=2),
                    viz.add_border(pred_objs, viz.RED, pad=2),
                ], axis=0)  # (c+p, S, h, w, C)
                viz.visualize_aligned_slots(all_objs,
                                            savepath=seq_dir / "aligned_slots.png")

                # segmentation GIFs (masks -> categorical -> RGB; overlay)
                all_masks = np.concatenate([seed_masks, pred_masks], axis=0)
                cat = np.argmax(all_masks, axis=1)  # (c+p, h, w)
                masks_vis = viz.COLORS[cat % len(viz.COLORS)]
                onehot = viz.idx_to_one_hot(cat, num_classes=all_masks.shape[1])
                frames_overlay = np.concatenate([seed_frames, pred_frames], axis=0)
                overlay = np.stack([
                    viz.overlay_segmentations(frames_overlay[t], onehot[t])
                    for t in range(c + p)
                ])
                viz.make_gif(masks_vis, seq_dir / "masks_GIF_masks.gif", n_seed=c)
                viz.make_gif(overlay, seq_dir / "overlay_GIF.gif", n_seed=c)

                # per-object GIFs (reference :243-252)
                for obj_id in range(all_objs.shape[1]):
                    viz.make_gif(all_objs[:, obj_id],
                                 seq_dir / f"gt_obj_{obj_id + 1}.gif",
                                 n_seed=c, use_border=False)

            # sequence GIFs (reference :221-239: GT all-green, pred seed/pred)
            viz.make_gif(gt[: c + p], seq_dir / "gt_GIF_frames.gif",
                         n_seed=c + p)
            viz.make_gif(np.concatenate([gt[:c], preds], axis=0),
                         seq_dir / "pred_GIF_frames.gif", n_seed=c)

            caption = others.get("caption", [""])[0]
            with open(seq_dir / "prompt.txt", "w") as f:
                f.write(str(caption) + "\n")
            print_(f"Saved prediction figures for sequence {i} -> {seq_dir}")
        return out_dir
