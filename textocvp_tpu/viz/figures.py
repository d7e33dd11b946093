"""
Figure and GIF generation (reference src/lib/visualizations.py). Pure host
code over numpy NHWC arrays in [0, 1]; matplotlib/imageio only.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

# distinct colors for segmentation overlays (reference CONFIG.py:76-80 uses
# named webcolors; RGB triplets here to avoid the webcolors dependency)
COLORS = np.array([
    (255, 255, 255), (0, 0, 255), (0, 128, 0), (128, 128, 0), (255, 0, 0),
    (255, 255, 0), (128, 0, 128), (255, 165, 0), (0, 255, 255), (165, 42, 42),
    (255, 192, 203), (255, 140, 0), (218, 165, 32), (148, 0, 211), (0, 255, 127),
    (0, 255, 255), (65, 105, 225), (0, 0, 128), (34, 139, 34), (221, 160, 221),
    (255, 0, 255), (112, 128, 144), (128, 0, 0), (255, 215, 0), (255, 218, 185),
    (192, 192, 192), (127, 255, 212), (205, 92, 92), (173, 255, 47), (0, 139, 139),
    (244, 164, 96),
], dtype=np.float32) / 255.0


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _save_or_show(fig, savepath):
    import matplotlib.pyplot as plt

    if savepath is not None:
        Path(savepath).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(savepath, bbox_inches="tight")
        plt.close(fig)
    return fig


def visualize_sequence(sequence, savepath=None, n_cols: int = 8, titles=None,
                       suptitle: Optional[str] = None):
    """Grid of frames (T, H, W, C) (reference visualizations.py:18-69)."""
    import matplotlib.pyplot as plt

    seq = np.clip(_to_numpy(sequence), 0, 1)
    t = seq.shape[0]
    n_cols = min(n_cols, t)
    n_rows = (t + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(2 * n_cols, 2 * n_rows), squeeze=False)
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols][i % n_cols]
        ax.axis("off")
        if i < t:
            ax.imshow(seq[i])
            if titles is not None and i < len(titles):
                ax.set_title(titles[i], fontsize=8)
    if suptitle:
        fig.suptitle(suptitle)
    return _save_or_show(fig, savepath)


def visualize_recons(imgs, recons, savepath=None, n_cols: int = 8):
    """GT / reconstruction / error rows (reference visualizations.py:73-105)."""
    import matplotlib.pyplot as plt

    imgs = np.clip(_to_numpy(imgs), 0, 1)
    recons = np.clip(_to_numpy(recons), 0, 1)
    t = min(imgs.shape[0], n_cols)
    fig, axes = plt.subplots(3, t, figsize=(2 * t, 6), squeeze=False)
    for i in range(t):
        axes[0][i].imshow(imgs[i]); axes[0][i].axis("off")
        axes[1][i].imshow(recons[i]); axes[1][i].axis("off")
        err = np.abs(imgs[i] - recons[i]).mean(-1)
        axes[2][i].imshow(err, cmap="magma"); axes[2][i].axis("off")
    axes[0][0].set_title("GT", fontsize=9)
    axes[1][0].set_title("Recons", fontsize=9)
    axes[2][0].set_title("Error", fontsize=9)
    return _save_or_show(fig, savepath)


def visualize_decomp(objs, savepath=None, vmin: float = 0, vmax: float = 1):
    """Objects (T, S, H, W, C) as an objects-x-time grid
    (reference visualizations.py:109-179)."""
    import matplotlib.pyplot as plt

    objs = np.clip(_to_numpy(objs), vmin, vmax)
    t, s = objs.shape[:2]
    fig, axes = plt.subplots(s, t, figsize=(1.5 * t, 1.5 * s), squeeze=False)
    for i in range(s):
        for j in range(t):
            img = objs[j, i]
            if img.shape[-1] == 1:
                axes[i][j].imshow(img[..., 0], cmap="gray", vmin=vmin, vmax=vmax)
            else:
                axes[i][j].imshow(img)
            axes[i][j].axis("off")
    return _save_or_show(fig, savepath)


def add_border(img: np.ndarray, color, pad: int = 2) -> np.ndarray:
    """Colored border around (..., H, W, C) — leading dims are batched
    (reference visualizations.py:247-274)."""
    img = np.asarray(img)
    *lead, h, w, c = img.shape
    out = np.empty((*lead, h + 2 * pad, w + 2 * pad, c), dtype=img.dtype)
    out[...] = np.asarray(color, dtype=img.dtype)
    out[..., pad : pad + h, pad : pad + w, :] = img
    return out


GREEN = np.array([0.0, 0.8, 0.0])
RED = np.array([0.8, 0.0, 0.0])


def visualize_qualitative_eval(context, targets, preds, savepath=None):
    """Seed/target/prediction panel with green seed and red pred borders
    (reference visualizations.py:184-243)."""
    import matplotlib.pyplot as plt

    context = np.clip(_to_numpy(context), 0, 1)
    targets = np.clip(_to_numpy(targets), 0, 1)
    preds = np.clip(_to_numpy(preds), 0, 1)
    n_ctx, n_pred = context.shape[0], preds.shape[0]
    n_cols = n_ctx + n_pred
    fig, axes = plt.subplots(2, n_cols, figsize=(1.8 * n_cols, 4), squeeze=False)
    for i in range(n_ctx):
        axes[0][i].imshow(add_border(context[i], GREEN))
        axes[1][i].imshow(add_border(context[i], GREEN))
    for i in range(n_pred):
        axes[0][n_ctx + i].imshow(add_border(targets[i], GREEN))
        axes[1][n_ctx + i].imshow(add_border(preds[i], RED))
    for ax_row in axes:
        for ax in ax_row:
            ax.axis("off")
    axes[0][0].set_ylabel("GT")
    axes[1][0].set_ylabel("Pred")
    return _save_or_show(fig, savepath)


def masks_to_rgb(masks: np.ndarray) -> np.ndarray:
    """One-hot argmax masks (S, H, W[, 1]) -> RGB segmentation (H, W, 3)
    (reference visualizations.py:355-428)."""
    if masks.ndim == 4:
        masks = masks[..., 0]
    seg = np.argmax(masks, axis=0)  # (H, W)
    return COLORS[seg % len(COLORS)]


def overlay_segmentations(img: np.ndarray, masks: np.ndarray, alpha: float = 0.6) -> np.ndarray:
    """Overlay the RGB segmentation on the image."""
    seg_rgb = masks_to_rgb(masks)
    if seg_rgb.shape[:2] != img.shape[:2]:
        from PIL import Image

        seg_img = Image.fromarray((seg_rgb * 255).astype(np.uint8))
        seg_img = seg_img.resize((img.shape[1], img.shape[0]), Image.NEAREST)
        seg_rgb = np.asarray(seg_img, dtype=np.float32) / 255.0
    return np.clip((1 - alpha) * img + alpha * seg_rgb, 0, 1)


def make_gif(frames, savepath, n_seed: int = 0, upscale: int = 2, fps: int = 4,
             use_border: bool = True):
    """Save (T, H, W, C) frames as a GIF with 2x upscaling and green
    seed / red prediction borders (reference visualizations.py:314-329);
    ``use_border=False`` for per-object GIFs (reference
    06_generate_figs_predictor.py:243-252)."""
    import imageio

    frames = np.clip(_to_numpy(frames), 0, 1)
    out = []
    for i, frame in enumerate(frames):
        frame = np.repeat(np.repeat(frame, upscale, axis=0), upscale, axis=1)
        if use_border:
            frame = add_border(frame, GREEN if i < n_seed else RED, pad=2 * upscale)
        out.append((frame * 255).astype(np.uint8))
    Path(savepath).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimsave(savepath, out, duration=1000 / fps, loop=0)
    return savepath


def idx_to_one_hot(x: np.ndarray, num_classes: Optional[int] = None) -> np.ndarray:
    """Categorical mask indices (..., H, W) -> one-hot masks with a leading
    class axis per element: (..., S, H, W) (reference visualizations.py:355-368)."""
    x = np.asarray(x)
    s = int(num_classes if num_classes is not None else x.max() + 1)
    eye = np.eye(s, dtype=np.float32)
    onehot = eye[x.reshape(-1)].reshape(x.shape + (s,))
    return np.moveaxis(onehot, -1, -3)  # (..., S, H, W)


def visualize_aligned_slots(recons_objs, savepath=None, vmin: float = 0, vmax: float = 1):
    """Aligned per-slot reconstructions (reference visualizations.py:278-310).

    Accepts (S, H, W, C) — one row of slots — or (T, S, H, W, C) — a
    slots-x-time grid with the slot index labeling each row (the aligned-slots
    figure of 06_generate_figs_predictor.py:181-187).
    """
    import matplotlib.pyplot as plt

    objs = np.clip(_to_numpy(recons_objs), vmin, vmax)
    if objs.ndim == 4:  # (S, H, W, C) -> single-timestep grid
        objs = objs[None]
    t, s = objs.shape[:2]
    fig, axes = plt.subplots(s, t, figsize=(1.5 * t, 1.5 * s), squeeze=False)
    for i in range(s):
        for j in range(t):
            axes[i][j].imshow(objs[j, i])
            axes[i][j].axis("off")
        axes[i][0].axis("on")
        axes[i][0].set_ylabel(f"Slot {i}", fontsize=8)
        axes[i][0].set_xticks([]); axes[i][0].set_yticks([])
    return _save_or_show(fig, savepath)


def process_objs_masks_dinosaur(frames, masks, out_size: int = 96,
                                return_all: bool = False):
    """Crop per-object views for DINOSAUR-style models: upsample the patch-grid
    alpha masks to the frame resolution and mask the frames, resized to
    out_size (reference visualizations.py:432-451).

    frames: (T, H, W, C); masks: (T, S, 1, gh, gw). Returns (T, S, out, out, C),
    or ``(objs, masks_up, frames_tiny)`` with masks_up (T, S, out, out) and
    frames_tiny (T, out, out, C) when ``return_all`` (the reference returns all
    three for the segmentation GIFs, 06_generate_figs_predictor.py:160-171).
    """
    from PIL import Image

    frames = _to_numpy(frames)
    masks = _to_numpy(masks)
    t, s = masks.shape[:2]
    c = frames.shape[-1]
    objs = np.zeros((t, s, out_size, out_size, c), dtype=np.float32)
    masks_up = np.zeros((t, s, out_size, out_size), dtype=np.float32)
    frames_tiny = np.zeros((t, out_size, out_size, c), dtype=np.float32)
    for ti in range(t):
        frame = Image.fromarray((np.clip(frames[ti], 0, 1) * 255).astype(np.uint8))
        frame = np.asarray(frame.resize((out_size, out_size), Image.BILINEAR),
                           dtype=np.float32) / 255.0
        frames_tiny[ti] = frame
        for si in range(s):
            m = Image.fromarray((np.clip(masks[ti, si, 0], 0, 1) * 255).astype(np.uint8))
            m = np.asarray(m.resize((out_size, out_size), Image.BILINEAR),
                           dtype=np.float32) / 255.0
            masks_up[ti, si] = m
            objs[ti, si] = frame * m[..., None]
    if return_all:
        return objs, masks_up, frames_tiny
    return objs


def visualize_metric(values: Sequence[float], savepath=None, title: str = "",
                     start_x: int = 0, xlabel: str = "Frame"):
    """Per-frame metric curve (reference visualizations.py:333-351)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    xs = np.arange(start_x, start_x + len(values))
    ax.plot(xs, values, marker="o")
    ax.set_xlabel(xlabel)
    ax.set_title(title)
    ax.grid(alpha=0.3)
    return _save_or_show(fig, savepath)
