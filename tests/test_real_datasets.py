"""Real-dataset loader tests against generated on-disk fixtures (CLIPort
episode tree; CATER gated on video-decode availability)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from textocvp_tpu.data.datasets import CLIPort, _resize_frames
from textocvp_tpu.data.vocabularies import CLIPORT_VOCAB, CLIPORT_VOCAB_TEST


@pytest.fixture(scope="module")
def cliport_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cliport")
    rng = np.random.default_rng(14)
    for split in ("train", "test"):
        for ep in range(3):
            ep_dir = root / split / f"episode{ep:05d}"
            color = ep_dir / "color"
            color.mkdir(parents=True)
            for f in range(6):
                img = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
                Image.fromarray(img).save(color / f"{f:06d}_color.png")
            color_name = "red" if split == "train" else "pink"
            (ep_dir / "task_description.txt").write_text(
                f"put the {color_name} block in the green bowl\n"
            )
    # an excluded episode must be skipped
    bad = root / "train" / "episode07564" / "color"
    bad.mkdir(parents=True)
    (root / "train" / "episode07564" / "task_description.txt").write_text("x")
    return root


def test_cliport_loader(cliport_root):
    ds = CLIPort(root=str(cliport_root), split="train", num_frames=4, img_size=32)
    assert len(ds) == 3  # excluded episode dropped
    frames, caption = ds[0]
    # int img_size resizes the SHORTER side (torchvision semantics): 48x64 -> 32x43
    assert frames.shape[0] == 4 and frames.shape[3] == 3
    assert frames.shape[1] == 32
    assert frames.min() >= 0 and frames.max() <= 1
    assert caption == "put the red block in the green bowl"
    assert ds.vocabulary == CLIPORT_VOCAB


def test_cliport_test_split_vocab(cliport_root):
    ds = CLIPort(root=str(cliport_root), split="test", num_frames=4, img_size=(32, 32))
    assert ds.vocabulary == CLIPORT_VOCAB_TEST
    frames, caption = ds[1]
    assert frames.shape == (4, 32, 32, 3)
    assert "pink" in caption
    # test split never uses random start
    assert ds.random_start is False


def test_cliport_too_few_frames_raises(cliport_root):
    ds = CLIPort(root=str(cliport_root), split="train", num_frames=10, img_size=(16, 16))
    with pytest.raises(ValueError):
        ds[0]


def test_resize_frames_tuple_and_int():
    frames = np.random.default_rng(0).uniform(0, 1, (2, 20, 30, 3)).astype(np.float32)
    out = _resize_frames(frames, (10, 10))
    assert out.shape == (2, 10, 10, 3)
    out = _resize_frames(frames, 10)  # shorter side -> 10, other side scales
    assert out.shape == (2, 10, 15, 3)


def test_cater_missing_root_raises(tmp_path):
    from textocvp_tpu.data.datasets import CATER

    with pytest.raises(FileNotFoundError):
        CATER(root=str(tmp_path / "nope"), mode="easy", split="train")


def test_cater_npy_and_framedir_videos(tmp_path):
    """CATER loads .npy arrays and frame directories without ffmpeg."""
    from textocvp_tpu.data.datasets import CATER

    root = tmp_path / "CATER" / "easy"
    (root / "videos").mkdir(parents=True)
    rng = np.random.default_rng(3)
    vid = (rng.uniform(0, 255, (12, 24, 24, 3))).astype(np.uint8)
    np.save(root / "videos" / "v0.npy", vid)
    framedir = root / "videos" / "v1"
    framedir.mkdir()
    for i in range(12):
        Image.fromarray(vid[i]).save(framedir / f"{i:04d}.png")
    ann = {
        "0": {"video": "videos/v0.npy", "caption": "the snitch is rotating"},
        "1": {"video": "videos/v1", "caption": "the cone is sliding"},
    }
    with open(root / "test_explicit.json", "w") as f:
        json.dump(ann, f)

    ds = CATER(root=str(tmp_path / "CATER"), mode="easy", split="test",
               num_frames=4, img_size=(16, 16))
    f0, c0 = ds[0]
    f1, c1 = ds[1]
    assert f0.shape == (4, 16, 16, 3) and f1.shape == (4, 16, 16, 3)
    # both formats decode the same underlying frames (fixed start = frame 1)
    np.testing.assert_allclose(f0, f1, atol=0.05)
    assert c0 == "the snitch is rotating"


def _cater_train_fixture(tmp_path, n_items=6, n_total=12):
    """CATER train tree of .npy videos where frame t has constant pixel value
    t*20 — the sampled start frame is readable off the loaded batch."""
    root = tmp_path / "CATER" / "easy"
    (root / "videos").mkdir(parents=True)
    ann = {}
    for i in range(n_items):
        vid = np.broadcast_to(
            (np.arange(n_total, dtype=np.uint8) * 20)[:, None, None, None],
            (n_total, 8, 8, 3)).copy()
        np.save(root / "videos" / f"v{i}.npy", vid)
        ann[str(i)] = {"video": f"videos/v{i}.npy",
                       "caption": "the snitch is rotating"}
    with open(root / "train_explicit.json", "w") as f:
        json.dump(ann, f)
    return tmp_path / "CATER"


@pytest.mark.parametrize("worker_type", ["thread", "process"])
def test_cater_random_start_deterministic_across_workers(tmp_path, worker_type):
    """random_start sampling is a stateless (seed, epoch, idx) hash: two
    8-worker loaders with the same seed produce identical epochs regardless of
    worker schedule, and starts are re-sampled between epochs."""
    from textocvp_tpu.data.datasets import CATER
    from textocvp_tpu.data.loader import DataLoader

    root = _cater_train_fixture(tmp_path)

    def run_epochs(n_epochs):
        ds = CATER(root=str(root), mode="easy", split="train",
                   num_frames=4, img_size=(8, 8), random_start=True, seed=14)
        loader = DataLoader(ds, batch_size=3, shuffle=False, num_workers=8,
                            worker_type=worker_type, seed=14)
        return [[np.asarray(v) for v, _ in loader] for _ in range(n_epochs)]

    a = run_epochs(2)
    b = run_epochs(2)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b)
        for va, vb in zip(ep_a, ep_b):
            np.testing.assert_array_equal(va, vb)
    # shuffle=False, so any epoch-0 vs epoch-1 difference is start re-sampling
    assert any(not np.array_equal(va, vb) for va, vb in zip(a[0], a[1]))


def test_cater_annotations_and_vocab(tmp_path):
    from textocvp_tpu.data.datasets import CATER
    from textocvp_tpu.data.vocabularies import CATER_HARD_VOCAB

    root = tmp_path / "CATER" / "hard"
    root.mkdir(parents=True)
    ann = {"0": {"video": "videos/v0.mp4", "caption": "the snitch is rotating"}}
    with open(root / "test_explicit.json", "w") as f:
        json.dump(ann, f)
    ds = CATER(root=str(tmp_path / "CATER"), mode="hard", split="valid", num_frames=4)
    assert len(ds) == 1
    assert ds.split == "test"
    assert ds.vocabulary == CATER_HARD_VOCAB
