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
from textocvp_tpu.train.evaluator import DecompEvaluator, PredictorEvaluator, _text_kwargs
from textocvp_tpu.train.metrics import MetricTracker
from textocvp_tpu.viz import figures as viz


class DecompFigGenerator(DecompEvaluator):
    """Figure generation for decomposition models (batch_size=1 sequences)."""

    def __init__(self, exp_path, checkpoint: str, num_seqs: int = 10):
        super().__init__(exp_path, checkpoint, batch_size=1, metrics=("psnr",))
        self.num_seqs = num_seqs

    def load_model(self, sample_videos):
        super().load_model(sample_videos)
        model = self.model

        @jax.jit
        def fig_step(variables, videos, rng):
            return model.apply(variables, videos, rngs={"slots": rng})

        self.fig_step = fig_step

    def generate_figs(self):
        out_dir = self.exp.plots_dir / f"figs_{self.checkpoint}"
        for i, (videos, others) in enumerate(self.test_loader):
            if i >= self.num_seqs:
                break
            out = self.fig_step(self.variables, jnp.asarray(videos),
                                jax.random.fold_in(jax.random.PRNGKey(14), i))
            seq_dir = out_dir / f"sequence_{i:02d}"
            gt = np.asarray(videos[0])
            if "recons_imgs" in out:
                recons = np.clip(np.asarray(out["recons_imgs"][0]), 0, 1)
                viz.visualize_recons(gt, recons, savepath=seq_dir / "recons.png")
                viz.make_gif(recons, seq_dir / "recons.gif", n_seed=len(recons))
            if "recons_objs" in out:
                objs = np.asarray(out["recons_objs"][0]) * np.asarray(out["masks"][0])
                viz.visualize_decomp(objs, savepath=seq_dir / "objects.png")
            masks = np.asarray(out.get("masks", None)[0]) if "masks" in out else None
            if masks is not None and masks.ndim == 5:  # (T, S, H, W, 1)
                overlays = np.stack([
                    viz.overlay_segmentations(gt[t], masks[t]) for t in range(gt.shape[0])
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
        p = self.num_preds
        num_slots = self.exp_params["model"]["model_params"]["num_slots"]
        slot_dim = self.exp_params["model"]["model_params"]["slot_dim"]

        @jax.jit
        def decode_full(pred_slots):
            b = pred_slots.shape[0]
            return decomp_model.apply(
                decomp_vars, pred_slots.reshape(b * p, num_slots, slot_dim),
                method="decode",
            )

        self.decode_full = decode_full

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

            gt = np.asarray(videos[0])
            preds = np.asarray(pred_imgs[0])
            viz.visualize_qualitative_eval(
                gt[:c], gt[c : c + p], preds, savepath=seq_dir / "qualitative.png"
            )
            full = np.concatenate([gt[:c], preds], axis=0)
            viz.make_gif(full, seq_dir / "prediction.gif", n_seed=c)
            viz.make_gif(gt[: c + p], seq_dir / "ground_truth.gif", n_seed=c)
            self._object_figs(seq_dir, preds, pred_slots)
            caption = others.get("caption", [""])[0]
            seq_dir.mkdir(parents=True, exist_ok=True)
            with open(seq_dir / "prompt.txt", "w") as f:
                f.write(str(caption) + "\n")
            print_(f"Saved prediction figures for sequence {i} -> {seq_dir}")
        return out_dir

    def _object_figs(self, seq_dir, pred_frames, pred_slots):
        """Per-object decompositions + segmentation overlays of the predicted
        frames (reference 06_generate_figs_predictor.py:147-261)."""
        dec = self.decode_full(pred_slots)
        p = self.num_preds
        masks = dec.get("masks")
        if masks is None:
            return
        masks = np.asarray(masks)
        if masks.ndim == 5 and masks.shape[-1] == 1:  # SAVi: (P, S, H, W, 1)
            recons = np.asarray(dec["recons"])  # (P, S, H, W, C)
            objs = recons * masks
            viz.visualize_decomp(objs[: min(8, p)], savepath=seq_dir / "pred_objects.png")
            overlays = np.stack([
                viz.overlay_segmentations(pred_frames[t], masks[t])
                for t in range(min(8, p))
            ])
            viz.visualize_sequence(overlays, savepath=seq_dir / "pred_segmentation.png")
        elif masks.ndim == 5:  # DINOSAUR: (P, S, 1, gh, gw)
            objs = viz.process_objs_masks_dinosaur(pred_frames, masks, out_size=96)
            viz.visualize_decomp(objs[: min(8, p)], savepath=seq_dir / "pred_objects.png")
