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


class _StubVideoReader:
    """imageio-reader lookalike over an in-memory (T,H,W,C) uint8 array —
    lets the mp4 code paths (indexed get_data, count_frames, meta probe,
    sequential iteration, close) run without an ffmpeg backend."""

    def __init__(self, video, counters, fps=10.0, cfr=True):
        self.video = video
        self.counters = counters
        self.closed = False
        self.fps = fps
        self.cfr = cfr

    def get_meta_data(self):
        assert not self.closed, "probe after close()"
        self.counters["get_meta_data"] += 1
        if self.fps is None:
            return {"duration": 3.1}
        n = self.video.shape[0] if self.cfr else self.video.shape[0] + 7
        return {"fps": self.fps, "duration": n / self.fps}

    def __iter__(self):
        assert not self.closed, "read after close()"
        for f in self.video:
            self.counters["iter_data"] += 1
            yield f

    def get_data(self, i):
        assert not self.closed, "read after close()"
        self.counters["get_data"] += 1
        if not 0 <= int(i) < self.video.shape[0]:
            raise IndexError(i)
        return self.video[int(i)]

    def count_frames(self):
        assert not self.closed, "probe after close()"
        self.counters["count_frames"] += 1
        return self.video.shape[0]

    def close(self):
        self.closed = True
        self.counters["close"] += 1


@pytest.fixture()
def stub_mp4(monkeypatch):
    """Patch imageio.get_reader so any .mp4 path decodes from a synthetic
    video whose frame t is constant pixel value t (start indices are then
    readable off the loaded frames). Returns the call counters."""
    import imageio

    from textocvp_tpu.data import datasets

    n_total = 31  # CATER clips are 31+ frames (reference Cater.py:137-141)
    video = np.broadcast_to(
        np.arange(n_total, dtype=np.uint8)[:, None, None, None],
        (n_total, 8, 8, 3)).copy()
    counters = {"get_data": 0, "count_frames": 0, "close": 0, "open": 0,
                "get_meta_data": 0, "iter_data": 0}

    def fake_get_reader(path, *a, **k):
        assert str(path).endswith(".mp4")
        counters["open"] += 1
        return _StubVideoReader(video, counters,
                                fps=counters.get("_fps", 10.0),
                                cfr=counters.get("_cfr", True))

    monkeypatch.setattr(imageio, "get_reader", fake_get_reader)
    datasets._VIDEO_LENGTH_CACHE.clear()
    datasets._VIDEO_SEEK_SAFE.clear()
    yield counters, n_total
    datasets._VIDEO_LENGTH_CACHE.clear()
    datasets._VIDEO_SEEK_SAFE.clear()


def test_mp4_read_video_indexed_and_closed(stub_mp4):
    """_read_video on a container: exactly one get_data per wanted index
    (indexed access like the reference's decord get_batch — NOT a full
    prefix decode), and the reader is closed afterwards."""
    from textocvp_tpu.data.datasets import _read_video

    counters, _ = stub_mp4
    indices = np.arange(20, 24)
    frames = _read_video("clip.mp4", indices)
    assert frames.shape == (4, 8, 8, 3)
    np.testing.assert_allclose(frames[:, 0, 0, 0] * 255, indices, atol=0.5)
    assert counters["get_data"] == 4  # no decode of frames 0..19
    assert counters["iter_data"] == 0  # indexed path, not sequential
    # readers closed: the one-time CFR/length probe reader + the data reader
    assert counters["close"] == counters["open"]
    # the CFR gate (fps*duration vs exact count) ran once; repeats are cached
    _read_video("clip.mp4", indices)
    assert counters["get_meta_data"] == 1
    assert counters["count_frames"] == 1


def test_mp4_vfr_falls_back_to_sequential(stub_mp4):
    """When fps metadata is missing or inconsistent with the true frame
    count (VFR / fps-metadata-poor containers), indexed time-seeking is NOT
    trusted: _read_video decodes sequentially, which is exact by
    construction, and still returns the right frames."""
    from textocvp_tpu.data.datasets import _read_video

    counters, _ = stub_mp4
    counters["_cfr"] = False  # metadata fps*duration != count_frames
    indices = np.arange(20, 24)
    frames = _read_video("clip.mp4", indices)
    np.testing.assert_allclose(frames[:, 0, 0, 0] * 255, indices, atol=0.5)
    assert counters["get_data"] == 0
    assert counters["iter_data"] == 24  # scans exactly up to max index + 1
    assert counters["close"] == counters["open"]

    # missing fps metadata: same sequential fallback
    from textocvp_tpu.data import datasets

    datasets._VIDEO_SEEK_SAFE.clear()
    datasets._VIDEO_LENGTH_CACHE.clear()
    counters["_fps"] = None
    frames = _read_video("clip2.mp4", np.arange(3))
    np.testing.assert_allclose(frames[:, 0, 0, 0] * 255, np.arange(3), atol=0.5)
    assert counters["get_data"] == 0


def test_mp4_video_length_cached(stub_mp4):
    """_video_length probes the container ONCE per path: repeated calls
    (random_start hits this every __getitem__) come from the cache, and the
    probing reader is closed."""
    from textocvp_tpu.data.datasets import _video_length

    counters, n_total = stub_mp4
    assert _video_length("clip.mp4") == n_total
    assert _video_length("clip.mp4") == n_total
    assert _video_length("clip.mp4") == n_total
    assert counters["count_frames"] == 1
    assert counters["open"] == 1
    assert counters["close"] == 1
    # a different path is its own cache entry
    assert _video_length("other.mp4") == n_total
    assert counters["count_frames"] == 2


def test_cater_mp4_random_start(tmp_path, stub_mp4):
    """The CATER mp4 leg end to end (stubbed decoder): random_start draws a
    valid start for the 31-frame clip, the loaded frames are the contiguous
    window at that start, the length probe is amortized to one per video,
    and the fixed-start path starts at frame 1 (reference Cater.py:137-141)."""
    from textocvp_tpu.data.datasets import CATER

    counters, n_total = stub_mp4
    root = tmp_path / "CATER" / "easy"
    root.mkdir(parents=True)
    ann = {str(i): {"video": "videos/v.mp4", "caption": "the snitch is rotating"}
           for i in range(4)}
    for split in ("train", "test"):
        with open(root / f"{split}_explicit.json", "w") as f:
            json.dump(ann, f)

    num_frames = 8
    ds = CATER(root=str(tmp_path / "CATER"), mode="easy", split="train",
               num_frames=num_frames, img_size=(8, 8), random_start=True)
    starts = []
    for epoch in range(3):
        ds.set_epoch(epoch)
        for i in range(len(ds)):
            frames, _ = ds[i]
            start = int(round(float(frames[0, 0, 0, 0]) * 255))
            starts.append(start)
            assert 0 <= start <= n_total - num_frames
            np.testing.assert_allclose(
                frames[:, 0, 0, 0] * 255,
                np.arange(start, start + num_frames), atol=0.5)
    assert len(set(starts)) > 1  # actually random, not stuck at one start
    # 12 __getitem__ calls, ONE length probe (same video path throughout)
    assert counters["count_frames"] == 1

    ds_test = CATER(root=str(tmp_path / "CATER"), mode="easy", split="test",
                    num_frames=num_frames, img_size=(8, 8))
    frames, _ = ds_test[0]
    assert int(round(float(frames[0, 0, 0, 0]) * 255)) == 1  # fixed start = 1


def test_cater_real_mp4_when_ffmpeg_present(tmp_path):
    """Skip-gated real-decoder leg: when an ffmpeg backend exists, write a
    real mp4 and run the same CATER path with no stubs."""
    import imageio

    from textocvp_tpu.data.datasets import CATER

    root = tmp_path / "CATER" / "easy"
    (root / "videos").mkdir(parents=True)
    vid = np.broadcast_to(
        (np.arange(16, dtype=np.uint8) * 16)[:, None, None, None],
        (16, 16, 16, 3)).copy()
    try:
        writer = imageio.get_writer(str(root / "videos" / "v.mp4"), fps=10)
        for f in vid:
            writer.append_data(f)
        writer.close()
    except Exception:
        pytest.skip("no ffmpeg backend available for mp4 encode")
    ann = {"0": {"video": "videos/v.mp4", "caption": "the snitch is rotating"}}
    with open(root / "test_explicit.json", "w") as f:
        json.dump(ann, f)
    ds = CATER(root=str(tmp_path / "CATER"), mode="easy", split="test",
               num_frames=4, img_size=(16, 16))
    frames, caption = ds[0]
    assert frames.shape == (4, 16, 16, 3)
    # lossy codec: frame values only approximately match (fixed start = 1)
    np.testing.assert_allclose(
        frames[:, 8, 8, 0] * 255, np.arange(1, 5) * 16, atol=12)


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


# --------------------------------------------------------------- CLIPort cache
def _run_npy_cache(argv):
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_npy_cache", os.path.join(repo, "scripts", "make_npy_cache.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main(argv) == 0


def test_cliport_npy_cache_round_trips(cliport_root, tmp_path):
    """scripts/make_npy_cache.py --dataset cliport writes per-episode
    pre-decoded uint8 caches that are ROUND-TRIP EXACT with the PNG path
    (both decode through _load_image_resized; float frames are k/255, so the
    uint8 store is lossless), preserving captions, episode exclusion, and
    the deterministic random-start stream."""
    out_root = tmp_path / "cliport_cache"
    _run_npy_cache(["--dataset", "cliport", "--root", str(cliport_root),
                    "--split", "train", "--img-size", "32",
                    "--out", str(out_root)])

    ds_png = CLIPort(root=str(cliport_root), split="train", num_frames=4,
                     img_size=32, random_start=True)
    ds_npy = CLIPort(root=str(out_root), split="train", num_frames=4,
                     img_size=32, random_start=True)
    assert len(ds_npy) == len(ds_png) == 3  # excluded episode still dropped
    # the cache file is what's being read (no color/ dir exists in out_root)
    assert not (out_root / "train" / ds_npy.episodes[0] / "color").exists()
    for ds in (ds_png, ds_npy):
        ds.set_epoch(5)
    for idx in range(3):
        f_png, cap_png = ds_png[idx]
        f_npy, cap_npy = ds_npy[idx]
        assert cap_npy == cap_png
        assert f_npy.dtype == np.float32
        np.testing.assert_array_equal(f_npy, f_png)  # bit-identical


def test_cliport_npy_cache_in_place_and_size_gated(cliport_root):
    """Caching INTO the original root works, and the size token gates it: a
    config at a different img_size ignores the cache and decodes PNGs (a
    cache built at one resolution must never serve another)."""
    _run_npy_cache(["--dataset", "cliport", "--root", str(cliport_root),
                    "--split", "test", "--img-size", "24",
                    "--out", str(cliport_root)])
    ds24 = CLIPort(root=str(cliport_root), split="test", num_frames=4,
                   img_size=24)
    ep0 = ds24.episodes[0]
    assert (cliport_root / "test" / ep0 / "color_cache_24.npy").exists()
    frames24, _ = ds24[0]
    assert frames24.shape[1] == 24  # shorter side

    # different size -> cache filename mismatch -> PNG path
    ds16 = CLIPort(root=str(cliport_root), split="test", num_frames=4,
                   img_size=(16, 16))
    frames16, _ = ds16[0]
    assert frames16.shape == (4, 16, 16, 3)
