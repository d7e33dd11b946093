#!/usr/bin/env python
"""
Pre-decode a dataset into uint8 .npy arrays at the training resolution.

bench_loader.py shows the decode economics: PNG/mp4 decode sustains ~500
frames/s/core at CATER 64px and only ~86 f/s/core at CLIPort 336px, while
.npy caches load at memcpy speed — one loader core then feeds multiple TPU
chips. Run once per dataset:

  # CATER (mp4 / frame dirs -> per-video .npy + rewritten annotations)
  python scripts/make_npy_cache.py --root /data/cater --mode easy \
      --split test --img-size 64

  # CLIPort (episode color/ PNGs -> per-episode color_cache_<size>.npy)
  python scripts/make_npy_cache.py --dataset cliport --root /data/cliport \
      --split test --img-size 336

Both caches are round-trip-exact with the decode path (uint8-identical: the
decoded float frames are k/255, and the cache is built through the SAME
resize functions the datasets use). The dataset classes read either format
transparently (textocvp_tpu/data/datasets.py: CATER via _read_video on .npy,
CLIPort via the per-episode color_cache_<size>.npy probe). Reference loader
semantics being replaced: /root/reference/src/data/CLIPort.py:174-217,
data/Cater.py:132-147.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

# runnable from anywhere: the package lives next to scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_size(s):
    """'336' -> 336 (shorter-side int); '336x448' -> [336, 448] (exact)."""
    if isinstance(s, int):
        return s
    if "x" in s:
        return [int(v) for v in s.split("x")]
    return int(s)


def _size_suffix(img_size) -> str:
    from textocvp_tpu.data.datasets import _size_token

    return _size_token(img_size)


def cache_cater(args) -> int:
    from textocvp_tpu.data.datasets import _read_video, _resize_frames, _video_length

    sz = args.img_size
    if isinstance(sz, (list, tuple)):
        sz = tuple(sz)
    else:
        sz = (sz, sz)
    src_dir = os.path.join(args.root, args.mode)
    out_root = args.out or f"{args.root.rstrip('/')}_npy{_size_suffix(args.img_size)}"
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
        frames = _read_video(video_path, np.arange(n), size=sz)
        if frames.shape[1:3] != sz:
            frames = _resize_frames(frames, sz)
        out_name = os.path.splitext(os.path.basename(ann["video"]))[0] + ".npy"
        np.save(os.path.join(out_dir, out_name),
                np.round(np.clip(frames, 0, 1) * 255).astype(np.uint8))
        new_ann[key] = {**ann, "video": out_name}
        if len(new_ann) % 100 == 0:
            print(f"  cached {len(new_ann)}/{len(annotations)}")

    with open(os.path.join(out_dir, f"{args.split}_explicit.json"), "w") as f:
        json.dump(new_ann, f)
    print(f"Wrote {len(new_ann)} cached videos to {out_dir}. Point the dataset "
          f"root at {out_root} to use the cache.")
    return 0


def cache_cliport(args) -> int:
    """Per-episode pre-decoded cache: <out>/<split>/<episode>/ gets the
    episode's task_description.txt plus color_cache_<size>.npy holding every
    frame decoded+resized through _load_image_resized — the exact function
    CLIPort.__getitem__ uses, so the cache is uint8-identical to the PNG
    path. Writing into the ORIGINAL root (--out == --root) also works: the
    dataset probes for the cache file before touching color/."""
    from textocvp_tpu.data.datasets import _load_image_resized, _size_token

    img_size = args.img_size
    src_dir = os.path.join(args.root, args.split)
    if not os.path.isdir(src_dir):
        raise FileNotFoundError(f"{src_dir} does not exist")
    out_root = args.out or f"{args.root.rstrip('/')}_npy{_size_token(img_size)}"
    out_dir = os.path.join(out_root, args.split)
    token = _size_token(img_size)

    episodes = sorted(e for e in os.listdir(src_dir) if e.startswith("episode"))
    done = 0
    for episode in episodes:
        ep_src = os.path.join(src_dir, episode)
        color_dir = os.path.join(ep_src, "color")
        if not os.path.isdir(color_dir):
            print(f"  {episode}: no color/ dir, skipped")
            continue
        ep_out = os.path.join(out_dir, episode)
        os.makedirs(ep_out, exist_ok=True)
        desc = os.path.join(ep_src, "task_description.txt")
        desc_out = os.path.join(ep_out, "task_description.txt")
        if os.path.exists(desc) and os.path.abspath(desc) != os.path.abspath(desc_out):
            shutil.copyfile(desc, desc_out)
        frame_files = sorted(os.listdir(color_dir))
        if not frame_files:
            print(f"  {episode}: empty color/ dir, skipped")
            continue
        frames = [
            _load_image_resized(
                os.path.join(color_dir, f"{f.split('_')[0]}_color.png"),
                img_size)
            for f in frame_files
        ]
        arr = np.round(np.clip(np.stack(frames), 0, 1) * 255).astype(np.uint8)
        cache_path = os.path.join(ep_out, f"color_cache_{token}.npy")
        tmp = cache_path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save(path) would append .npy to tmp
            np.save(f, arr)
        os.replace(tmp, cache_path)
        done += 1
        if done % 50 == 0:
            print(f"  cached {done}/{len(episodes)}")
    print(f"Wrote {done} cached episodes to {out_dir} "
          f"(color_cache_{token}.npy). Point the dataset root at {out_root} "
          "to use the cache.")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="cater", choices=["cater", "cliport"])
    ap.add_argument("--root", required=True,
                    help="dataset root (cater: contains <mode>/; cliport: "
                         "contains <split>/episode*)")
    ap.add_argument("--mode", default="easy", choices=["easy", "hard"],
                    help="cater only")
    ap.add_argument("--split", default="train")
    ap.add_argument("--img-size", type=_parse_size, default=64,
                    help="an int N (cater: NxN exact; cliport: shorter-side "
                         "resize) or HxW for an exact target (the CLIPort "
                         "config's 336x336)")
    ap.add_argument("--out", default=None,
                    help="output root (default: <root>_npy<img-size>)")
    ap.add_argument("--num-frames", type=int, default=None,
                    help="cater only: cache enough frames for clips of "
                         "length N (default: all). N+1 frames are stored: "
                         "CATER's fixed start is frame 1 (reference "
                         "Cater.py:137-141), so clips read indices [1, N].")
    args = ap.parse_args(argv)
    if args.dataset == "cliport":
        return cache_cliport(args)
    return cache_cater(args)


if __name__ == "__main__":
    raise SystemExit(main())
