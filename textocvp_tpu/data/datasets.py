"""
Real dataset loaders: CATER (mp4 videos + explicit-caption JSON,
reference data/Cater.py) and CLIPort put-block-in-bowl episodes
(reference data/CLIPort.py). Host-side numpy only; frames come out as
(T, H, W, C) float32 in [0, 1], NHWC for the TPU pipeline.

Video decoding uses imageio(+ffmpeg) instead of decord; CLIPort PNGs load via
PIL with bilinear resize (torch ``transforms.Resize`` semantics: the SHORTER
side is resized to ``img_size`` when an int is given).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from textocvp_tpu.data.vocabularies import (
    CATER_EASY_VOCAB,
    CATER_HARD_VOCAB,
    CLIPORT_VOCAB,
    CLIPORT_VOCAB_TEST,
)
# INV255: the shared uint8→float normalization constant. Multiply (never /255)
# so host decode and the on-device uint8-wire normalization are bit-identical
# (XLA strength-reduces constant division; see data/wire.py).
from textocvp_tpu.data.wire import INV255


def _random_start(seed: int, epoch: int, idx: int, n_choices: int) -> int:
    """Deterministic per-(seed, epoch, item) start-frame draw in [0, n_choices).

    Stateless by design: loader workers (threads OR processes) call
    ``__getitem__`` concurrently, and a shared ``np.random.Generator`` is not
    thread-safe — this hash keeps start sampling reproducible under any
    worker schedule while still re-sampling every epoch."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, idx]))
    return int(rng.integers(0, n_choices))


def _target_hw(h: int, w: int, size) -> tuple[int, int]:
    """Resize target: an int resizes the SHORTER side (torchvision
    transforms.Resize semantics); a tuple is exact."""
    if isinstance(size, int):
        if h <= w:
            return size, max(1, round(w * size / h))
        return max(1, round(h * size / w)), size
    return tuple(size)


def _size_token(img_size) -> str:
    """Filename token identifying a resize target: ``336`` (shorter-side int)
    or ``336x448`` (exact tuple). Pre-decoded caches embed it so a cache built
    at one resolution can never silently serve a config at another."""
    if isinstance(img_size, (list, tuple)):
        return "x".join(str(int(s)) for s in img_size)
    return str(int(img_size))


def _resize_frames(frames: np.ndarray, size) -> np.ndarray:
    """Bilinear resize of (T, H, W, C) float frames to the target size. An int
    target resizes the shorter side (torchvision semantics); a tuple is exact."""
    from PIL import Image

    t, h, w, c = frames.shape
    new_h, new_w = _target_hw(h, w, size)
    if (new_h, new_w) == (h, w):
        return frames.astype(np.float32)
    out = np.empty((t, new_h, new_w, c), dtype=np.float32)
    for i in range(t):
        # round, don't truncate: k*INV255*255 can land 1 ulp below k
        img = Image.fromarray(
            np.round(np.clip(frames[i], 0, 1) * 255).astype(np.uint8))
        out[i] = np.asarray(img.resize((new_w, new_h), Image.BILINEAR), dtype=np.float32) * INV255
    return out


def _load_image_resized(path: str, size, as_uint8: bool = False) -> np.ndarray:
    """Decode one image and resize it INSIDE PIL's uint8 domain, converting to
    float32 [0,1] only at the final (small) resolution. This is the throughput
    path: full-res float round-trips cost ~10x (see bench_loader.py).
    ``as_uint8`` skips that final conversion entirely — the uint8-on-the-wire
    path (data/wire.py) normalizes on device instead.

    PNGs take the native C++ fast path when the extension has been built
    (textocvp_tpu/native/imgio.cpp — libpng decode + a resize that is
    bit-exact with PIL.BILINEAR, so both paths produce identical arrays);
    everything else, and any native failure, falls back to PIL."""
    from PIL import Image

    if path.lower().endswith(".png"):
        from textocvp_tpu import native

        if native.available():
            with open(path, "rb") as f:
                data = f.read()
            hw = native.png_size(data)
            if hw is not None:
                if size is None:
                    arr8 = native.decode_png_rgb(data)
                else:
                    new_h, new_w = _target_hw(hw[0], hw[1], size)
                    arr8 = native.decode_png_rgb_resized(data, new_h, new_w)
                if arr8 is not None:
                    if as_uint8:
                        return arr8
                    return arr8.astype(np.float32) * INV255

    with open(path, "rb") as f:
        img = Image.open(f).convert("RGB")
        if size is not None:
            new_h, new_w = _target_hw(img.height, img.width, size)
            if (new_h, new_w) != (img.height, img.width):
                img = img.resize((new_w, new_h), Image.BILINEAR)
        if as_uint8:
            return np.asarray(img, dtype=np.uint8)
        arr = np.asarray(img, dtype=np.float32)
    arr *= INV255
    return arr


# Frame counts of video CONTAINERS (mp4/avi), keyed by path. Probing a
# container is a full-file scan (imageio count_frames); training data is
# immutable, and random_start needs the length on EVERY __getitem__
# (reference pays this once per open via decord's indexed reader,
# /root/reference/src/data/Cater.py:132-142). Per-process: loader worker
# processes each build their own on first touch — O(1) amortized per video.
_VIDEO_LENGTH_CACHE: dict = {}


def _video_length(path: str) -> int:
    """Number of frames in a video (any format _read_video supports).
    Container probes are cached per path (see _VIDEO_LENGTH_CACHE)."""
    if os.path.isdir(path):
        return sum(1 for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if path.endswith((".npy", ".npz")):
        arr = np.load(path, mmap_mode="r" if path.endswith(".npy") else None)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
        return int(arr.shape[0])
    n = _VIDEO_LENGTH_CACHE.get(path)
    if n is None:
        import imageio

        reader = imageio.get_reader(path)
        try:
            n = int(reader.count_frames())
        finally:
            reader.close()
        _VIDEO_LENGTH_CACHE[path] = n
    return n


# Whether indexed (seek-based) frame access is trustworthy for a container,
# keyed by path. imageio's get_data(i) seeks by TIME (index / metadata fps),
# which is exact only for constant-frame-rate videos with correct fps
# metadata. CATER mp4s are CFR, but rather than assume, we verify once per
# path: metadata fps*duration must agree with the exact frame count. VFR or
# fps-metadata-poor containers fall back to a sequential scan, which is
# exact by construction (the pre-round-4 behavior).
_VIDEO_SEEK_SAFE: dict = {}


def _indexed_seek_safe(reader, path: str) -> bool:
    ok = _VIDEO_SEEK_SAFE.get(path)
    if ok is None:
        try:
            meta = reader.get_meta_data()
            fps = meta.get("fps")
            dur = meta.get("duration")
            ok = (bool(fps) and bool(dur)
                  and abs(round(fps * dur) - _video_length(path)) <= 1)
        except Exception:
            ok = False
        _VIDEO_SEEK_SAFE[path] = ok
    return ok


def _read_video(path: str, indices: np.ndarray, size=None,
                as_uint8: bool = False) -> np.ndarray:
    """
    Decode selected frames as float32 [0,1] (T, H, W, C). Supports:
    * mp4/avi via imageio (requires an ffmpeg backend)
    * .npy/.npz arrays of shape (T, H, W, C) in uint8 or float
    * a directory of per-frame images (sorted lexicographically)
    The non-mp4 formats keep CATER usable in environments without ffmpeg
    (re-export the videos once with any tool).

    ``size`` resizes during decode (uint8 domain, per frame) — the throughput
    path for directory-of-images videos; other formats resize after decode.
    ``as_uint8`` keeps the decoder-native uint8 frames (every source format
    is uint8 underneath) for the uint8-on-the-wire path (data/wire.py);
    float sources in .npy/.npz are converted back losslessly.
    """
    indices = np.asarray(indices, dtype=np.int64)
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        frames = [_load_image_resized(os.path.join(path, files[int(i)]), size,
                                      as_uint8=as_uint8)
                  for i in indices]
        return np.stack(frames, axis=0)
    if path.endswith((".npy", ".npz")):
        arr = np.load(path, mmap_mode="r" if path.endswith(".npy") else None)
        if hasattr(arr, "files"):  # npz: first array
            arr = arr[arr.files[0]]
        arr = np.asarray(arr[indices])
        if as_uint8:
            from textocvp_tpu.data.wire import to_uint8_frames

            return to_uint8_frames(arr)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) * INV255
        return arr.astype(np.float32)

    import imageio

    try:
        reader = imageio.get_reader(path)  # noqa: SIM105
    except Exception as e:
        raise RuntimeError(
            f"Cannot decode {path!r}: no ffmpeg backend available "
            "(pip install imageio-ffmpeg), or re-export CATER videos as "
            "frame directories or .npy arrays — both are supported."
        ) from e
    # Indexed reads, mirroring the reference's decord VideoReader.get_batch
    # (/root/reference/src/data/Cater.py:132-142): imageio's get_data(i)
    # reads forward for nearby indices and ffmpeg-seeks for far jumps, so a
    # large random_start never decodes the whole prefix. Seeking is by time
    # (index / fps), so it is gated on a once-per-path CFR verification
    # (_indexed_seek_safe); otherwise decode sequentially, which is exact
    # for any container.
    def _frame(fr):
        if as_uint8:
            return np.asarray(fr, dtype=np.uint8)
        return np.asarray(fr, dtype=np.float32) * INV255

    try:
        if _indexed_seek_safe(reader, path):
            frames = [_frame(reader.get_data(int(i))) for i in indices]
        else:
            want = {int(i) for i in indices}
            last = max(want)
            got = {}
            for j, fr in enumerate(reader):
                if j in want:
                    got[j] = _frame(fr)
                if j >= last:
                    break
            missing = want - got.keys()
            if missing:
                raise IndexError(
                    f"{path!r}: frames {sorted(missing)} beyond the end of "
                    "the video")
            frames = [got[int(i)] for i in indices]
    finally:
        reader.close()
    return np.stack(frames, axis=0)


class CATER:
    """CATER easy/hard video-caption dataset (reference data/Cater.py:66-187)."""

    MODES = ["easy", "hard"]

    def __init__(self, root, mode, split, num_frames=16, img_size=(64, 64),
                 random_start=False, seed: int = 14,
                 uint8_output: bool = False, **kwargs):
        if mode not in self.MODES:
            raise NameError(f"mode={mode!r} unknown. Use one of {self.MODES}")
        if split not in ["train", "val", "valid", "test", "eval"]:
            raise ValueError(f"Unknown split={split!r}")
        split = "test" if split in ("valid", "val", "test", "eval") else split
        self.root = os.path.join(root, mode)
        if not os.path.exists(self.root):
            raise FileNotFoundError(f"{self.root} does not exist")
        self.mode = mode
        self.split = split
        self.num_frames = num_frames
        self.img_size = img_size if not isinstance(img_size, int) else (img_size, img_size)
        self.random_start = random_start
        self._seed = seed
        self._epoch = 0
        # uint8-on-the-wire (data/wire.py): items stay uint8, consumers
        # normalize on device. Config knob: dataset.uint8_wire.
        self.uint8_output = uint8_output
        with open(os.path.join(self.root, f"{split}_explicit.json")) as f:
            self.annotations = json.load(f)

    def set_epoch(self, epoch: int):
        """Advance the random-start stream (called by DataLoader each epoch)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.annotations)

    def __getitem__(self, idx: int):
        ann = self.annotations[str(idx)]
        video_path = os.path.join(self.root, ann["video"])
        caption = ann["caption"]
        # the reference probes the video length via decord; CATER clips are 31+
        # frames — mirror its start logic (fixed start = frame 1, Cater.py:137-141)
        if self.random_start and self.split == "train":
            n_total = _video_length(video_path)
            start = _random_start(self._seed, self._epoch, idx,
                                  n_total - self.num_frames + 1)
        else:
            start = 1
        indices = np.arange(start, start + self.num_frames)
        frames = _read_video(video_path, indices, size=self.img_size,
                             as_uint8=self.uint8_output)
        if frames.shape[1:3] != tuple(self.img_size):
            if frames.dtype == np.uint8:
                from textocvp_tpu.data.wire import to_uint8_frames

                frames = to_uint8_frames(_resize_frames(
                    frames.astype(np.float32) * INV255, self.img_size))
            else:
                frames = _resize_frames(frames, self.img_size)
        return frames, caption

    @property
    def vocabulary(self) -> dict:
        return CATER_EASY_VOCAB if self.mode == "easy" else CATER_HARD_VOCAB


class CLIPort:
    """CLIPort put-block-in-bowl episodes (reference data/CLIPort.py:77-262)."""

    EXCLUDE_EPISODES = ["episode07564", "episode09031", "episode13755", "episode11237"]

    def __init__(self, root, split, num_frames, img_size, random_start=False,
                 seed: int = 14, uint8_output: bool = False, **kwargs):
        if split not in ["train", "val", "valid", "test", "eval"]:
            raise ValueError(f"Unknown split={split!r}")
        split = "val" if split in ("val", "valid") else ("test" if split in ("test", "eval") else split)
        self.root = os.path.join(root, split)
        if not os.path.exists(self.root):
            raise FileNotFoundError(f"{self.root} does not exist")
        self.split = split
        self.num_frames = num_frames
        self.img_size = img_size
        self.random_start = random_start if split == "train" else False
        self._seed = seed
        self._epoch = 0
        # uint8-on-the-wire (data/wire.py): items stay uint8, consumers
        # normalize on device. Config knob: dataset.uint8_wire.
        self.uint8_output = uint8_output

        self.episodes = sorted(
            (f for f in os.listdir(self.root)
             if f.startswith("episode") and f not in self.EXCLUDE_EPISODES),
            key=lambda x: int(x.split("episode")[-1]),
        )
        self.labels = [self._load_label(e) for e in self.episodes]

    def _load_label(self, episode: str) -> str:
        path = os.path.join(self.root, episode, "task_description.txt")
        with open(path) as f:
            return f.read().strip()

    def set_epoch(self, epoch: int):
        """Advance the random-start stream (called by DataLoader each epoch)."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.episodes)

    def __getitem__(self, idx: int):
        episode = self.episodes[idx]
        # pre-decoded uint8 cache (scripts/make_npy_cache.py --dataset
        # cliport): one (T, H, W, 3) array per episode at the training
        # resolution, round-trip-exact with the PNG path (both go through
        # _load_image_resized, and float frames are k/255 so the uint8 store
        # is lossless). PNG decode+resize at 336px sustains only ~86
        # frames/s/core (docs/PERFORMANCE.md "Host input pipeline") — far
        # under the ~893 f/s the CLIPort eval consumer needs — while the
        # mmap'd cache is memcpy-bound.
        cache = os.path.join(self.root, episode,
                             f"color_cache_{_size_token(self.img_size)}.npy")
        if os.path.exists(cache):
            arr = np.load(cache, mmap_mode="r")
            n = arr.shape[0]
        else:
            arr = None
            color_dir = os.path.join(self.root, episode, "color")
            frame_files = sorted(os.listdir(color_dir))
            n = len(frame_files)
        if n < self.num_frames:
            raise ValueError(f"{self.num_frames} frames required but {n} available in {episode}")
        if self.random_start:
            start = _random_start(self._seed, self._epoch, idx,
                                  max(n - self.num_frames, 0) + 1)
        else:
            start = 0
        if arr is not None:
            if self.uint8_output:
                # pure memcpy out of the mmap — the fastest wire there is
                return (np.asarray(arr[start:start + self.num_frames]),
                        self.labels[idx])
            frames = np.asarray(arr[start:start + self.num_frames],
                                dtype=np.float32) * INV255
            return frames, self.labels[idx]
        frames = [
            _load_image_resized(
                os.path.join(color_dir,
                             f"{frame_files[i].split('_')[0]}_color.png"),
                self.img_size,
                as_uint8=self.uint8_output,
            )
            for i in range(start, start + self.num_frames)
        ]
        return np.stack(frames), self.labels[idx]

    @property
    def vocabulary(self) -> dict:
        return CLIPORT_VOCAB_TEST if self.split == "test" else CLIPORT_VOCAB
