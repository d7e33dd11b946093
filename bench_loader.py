#!/usr/bin/env python
"""
Host input-pipeline throughput benchmark (SURVEY.md §7 hard part 5: input
starvation is the 10x-killer).

Measures frames/sec through the DataLoader for the two real dataset shapes:

* CATER-like:  frame-directory videos decoded as PNGs at 320x240, resized to
  64x64 (the CATER protocol; reference data/Cater.py:132-147).
* CLIPort-like: episode dirs of 640x480 PNGs resized to 336x336
  (reference data/CLIPort.py:100-106).

With real data present (TEXTOCVP_DATA pointing at cater/ and cliport/ roots)
the real datasets are measured; otherwise synthetic on-disk fixtures with the
same image sizes and file formats are generated, so the measured decode+resize
cost matches the real pipeline.

Each dataset prints one JSON line:
  {"dataset": ..., "workers": N, "worker_type": ..., "frames_per_sec": F,
   "consumer_frames_per_sec": C, "keeps_up": F >= C}

Consumer rates (what the TPU eats): CATER eval consumes ~2784 pred-frames/s
(BENCH_r01 on v5e-1) but only num_seed=1 INPUT frames per 19 predicted, so the
input requirement is (1+19)/19 * rollout rate counted in INPUT frames; decomp
eval consumes full sequences. We benchmark against the harshest case: every
loaded frame feeds the chip (decomp eval), i.e. loader f/s must beat the
chip's full-sequence consumption (~4500 f/s CATER recon, ~550 f/s DINOSAUR
@336 from PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np

# TPU consumption rates to keep up with (frames/s/chip). Round-2 values:
# CATER recon eval's model side doubled with decode chunking (220.9 ->
# 113.9 ms at B=64*T=8 => ~4500 f/s before metrics; PERFORMANCE.md);
# the 336px DINOSAUR eval stage compute measures ~550 f/s (fused
# decode+metrics; PERFORMANCE.md).
CONSUMER_RATES = {"cater64": 4500.0, "cliport336": 550.0}


# ------------------------------------------------------------------ fixtures
def _frame(h: int, w: int, rng: np.random.Generator) -> np.ndarray:
    """Semi-realistic frame: smooth background + a few solid shapes. Pure
    noise makes PNGs pathologically large/slow and overstates decode cost."""
    y = np.linspace(0, 1, h)[:, None]
    x = np.linspace(0, 1, w)[None, :]
    base = np.stack([y * x, y * (1 - x), (1 - y) * x], axis=-1)
    arr = (base * 200).astype(np.uint8) + 20
    for _ in range(4):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = int(min(h, w) * 0.1)
        color = rng.integers(0, 255, 3)
        arr[max(0, cy - r):cy + r, max(0, cx - r):cx + r] = color
    return arr


def _write_png(path: Path, h: int, w: int, rng: np.random.Generator):
    from PIL import Image

    Image.fromarray(_frame(h, w, rng)).save(path)


def make_cater_fixture(root: Path, num_videos: int = 24, frames_per_video: int = 10,
                       h: int = 240, w: int = 320):
    """Frame-dir CATER videos at source resolution + explicit-caption JSON."""
    rng = np.random.default_rng(14)
    mode_dir = root / "easy"
    ann = {}
    for i in range(num_videos):
        vdir = mode_dir / f"video_{i:04d}"
        vdir.mkdir(parents=True, exist_ok=True)
        for t in range(frames_per_video):
            _write_png(vdir / f"{t:05d}.png", h, w, rng)
        ann[str(i)] = {"video": f"video_{i:04d}",
                       "caption": "the small rubber ball is picked up"}
    with open(mode_dir / "test_explicit.json", "w") as f:
        json.dump(ann, f)
    return root


def make_cater_npy_fixture(root: Path, num_videos: int = 24,
                           frames_per_video: int = 10):
    """Pre-decoded uint8 .npy cache at the TRAINING resolution (64x64) — the
    recommended production format when PNG/mp4 decode can't keep up: loading
    is a mmap'd slice, no decode at all."""
    rng = np.random.default_rng(14)
    mode_dir = root / "easy"
    mode_dir.mkdir(parents=True, exist_ok=True)
    ann = {}
    for i in range(num_videos):
        frames = np.stack([_frame(64, 64, rng) for _ in range(frames_per_video)])
        np.save(mode_dir / f"video_{i:04d}.npy", frames)
        ann[str(i)] = {"video": f"video_{i:04d}.npy",
                       "caption": "the small rubber ball is picked up"}
    with open(mode_dir / "test_explicit.json", "w") as f:
        json.dump(ann, f)
    return root


def make_cliport_fixture(root: Path, num_episodes: int = 12, frames_per_ep: int = 10,
                         h: int = 480, w: int = 640):
    rng = np.random.default_rng(14)
    split_dir = root / "test"
    for i in range(num_episodes):
        ep = split_dir / f"episode{i:05d}"
        (ep / "color").mkdir(parents=True, exist_ok=True)
        for t in range(frames_per_ep):
            _write_png(ep / "color" / f"{t:06d}_color.png", h, w, rng)
        with open(ep / "task_description.txt", "w") as f:
            f.write("put the red blocks in a green bowl")
    return root


# ------------------------------------------------------------------ measurement
def measure(dataset, batch_size: int, num_frames: int, workers: int,
            worker_type: str, epochs: int = 2) -> float:
    from textocvp_tpu.data.loader import DataLoader

    loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                        num_workers=workers, worker_type=worker_type)
    # warmup epoch (page cache, pool spin-up), then timed epochs
    for _ in loader:
        pass
    n_frames = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for videos, _ in loader:
            n_frames += videos.shape[0] * videos.shape[1]
    dt = time.perf_counter() - t0
    return n_frames / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int,
                    default=int(os.environ.get("TEXTOCVP_NUM_WORKERS", "8")))
    ap.add_argument("--worker-type", choices=["thread", "process", "both"],
                    default="thread")
    ap.add_argument("--data-root", default=os.environ.get("TEXTOCVP_DATA", ""))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--imgio", choices=["native", "pil", "both"], default="native",
                    help="PNG decode path: the C++ extension (default, falls "
                         "back to PIL if unbuildable), pure PIL, or an A/B "
                         "of the two")
    args = ap.parse_args(argv)

    from textocvp_tpu.data.datasets import CATER, CLIPort

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        real = Path(args.data_root) if args.data_root else None

        if real and (real / "cater").exists():
            cater_root = real / "cater"
        else:
            cater_root = make_cater_fixture(tmp / "cater")
        if real and (real / "cliport").exists():
            cliport_root = real / "cliport"
        else:
            cliport_root = make_cliport_fixture(tmp / "cliport")
        cater_npy_root = make_cater_npy_fixture(tmp / "cater_npy")

        cater = CATER(root=str(cater_root), mode="easy", split="test",
                      num_frames=8, img_size=(64, 64))
        cater_npy = CATER(root=str(cater_npy_root), mode="easy", split="test",
                          num_frames=8, img_size=(64, 64))
        cliport = CLIPort(root=str(cliport_root), split="test",
                          num_frames=8, img_size=336)

        ncores = os.cpu_count() or 1
        worker_types = ["thread", "process"] if args.worker_type == "both" \
            else [args.worker_type]
        from textocvp_tpu import native

        imgio_modes = ["native", "pil"] if args.imgio == "both" else [args.imgio]
        prev_imgio_env = os.environ.get("TEXTOCVP_NATIVE_IMGIO")
        try:
            for name, ds, bs, rate_key in [
                ("cater64_png", cater, 8, "cater64"),
                ("cater64_npy_cache", cater_npy, 8, "cater64"),
                ("cliport336_png", cliport, 4, "cliport336"),
            ]:
                for wt in worker_types:
                    for im in imgio_modes:
                        # toggle the native PNG path (latched state reset so
                        # the env var is re-consulted)
                        os.environ["TEXTOCVP_NATIVE_IMGIO"] = \
                            "1" if im == "native" else "0"
                        native._lib, native._load_failed = None, False
                        used_native = im == "native" and native.available()
                        fps = measure(ds, batch_size=bs, num_frames=8,
                                      workers=args.workers, worker_type=wt,
                                      epochs=args.epochs)
                        consumer = CONSUMER_RATES[rate_key]
                        no_png = "npy" in name  # pipeline decodes no images
                        print(json.dumps({
                            "dataset": name, "workers": args.workers,
                            "worker_type": wt,
                            "imgio": "none" if no_png
                                     else ("native" if used_native else "pil"),
                            "host_cores": ncores,
                            "frames_per_sec": round(fps, 1),
                            "frames_per_sec_per_core": round(fps / ncores, 1),
                            "consumer_frames_per_sec": consumer,
                            "keeps_up": fps >= consumer,
                            "cores_needed_est": round(
                                consumer / max(fps / ncores, 1e-9), 1),
                        }))
                        if no_png:
                            break  # no decode: an imgio A/B is meaningless
        finally:
            if prev_imgio_env is None:
                os.environ.pop("TEXTOCVP_NATIVE_IMGIO", None)
            else:
                os.environ["TEXTOCVP_NATIVE_IMGIO"] = prev_imgio_env
            native._lib, native._load_failed = None, False
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
