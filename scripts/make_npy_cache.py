#!/usr/bin/env python
"""
Pre-decode a CATER dataset into uint8 .npy arrays at the training resolution.

bench_loader.py shows the decode economics: PNG/mp4 decode sustains ~500
frames/s/core at CATER 64px, while the .npy cache loads >11k frames/s/core —
one loader core then feeds ~4 TPU chips. Run this once per dataset:

  python scripts/make_npy_cache.py --root /data/cater --mode easy \
      --split test --img-size 64

It rewrites each annotation's video to point at the .npy and writes
``{split}_explicit.json`` into the output root; the CATER dataset class reads
either format transparently (textocvp_tpu/data/datasets.py:_read_video).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# runnable from anywhere: the package lives next to scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="dataset root containing <mode>/")
    ap.add_argument("--mode", default="easy", choices=["easy", "hard"])
    ap.add_argument("--split", default="train")
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--out", default=None,
                    help="output root (default: <root>_npy<img-size>)")
    ap.add_argument("--num-frames", type=int, default=None,
                    help="cache enough frames for clips of length N (default: "
                         "all). N+1 frames are stored: CATER's fixed start is "
                         "frame 1 (reference Cater.py:137-141), so clips read "
                         "indices [1, N].")
    args = ap.parse_args(argv)

    from textocvp_tpu.data.datasets import _read_video, _resize_frames, _video_length

    src_dir = os.path.join(args.root, args.mode)
    out_root = args.out or f"{args.root.rstrip('/')}_npy{args.img_size}"
    out_dir = os.path.join(out_root, args.mode)
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(src_dir, f"{args.split}_explicit.json")) as f:
        annotations = json.load(f)

    new_ann = {}
    for key, ann in annotations.items():
        video_path = os.path.join(src_dir, ann["video"])
        # +1: fixed-start clips read indices [1, num_frames]
        n = (args.num_frames + 1) if args.num_frames else _video_length(video_path)
        n = min(n, _video_length(video_path))
        frames = _read_video(video_path, np.arange(n),
                             size=(args.img_size, args.img_size))
        if frames.shape[1:3] != (args.img_size, args.img_size):
            frames = _resize_frames(frames, (args.img_size, args.img_size))
        out_name = os.path.splitext(os.path.basename(ann["video"]))[0] + ".npy"
        np.save(os.path.join(out_dir, out_name),
                (np.clip(frames, 0, 1) * 255).astype(np.uint8))
        new_ann[key] = {**ann, "video": out_name}
        if len(new_ann) % 100 == 0:
            print(f"  cached {len(new_ann)}/{len(annotations)}")

    with open(os.path.join(out_dir, f"{args.split}_explicit.json"), "w") as f:
        json.dump(new_ann, f)
    print(f"Wrote {len(new_ann)} cached videos to {out_dir}. Point the dataset "
          f"root at {out_root} to use the cache.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
