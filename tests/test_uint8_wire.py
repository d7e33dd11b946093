"""
uint8-on-the-wire (textocvp_tpu/data/wire.py): datasets/loader keep frames
uint8 end-to-end and every jitted step normalizes on device.

The contract under test is EXACTNESS: the uint8 wire must produce
bit-identical model inputs to the float32 wire — both compute
``uint8.astype(float32) / 255.0``, only on different sides of the
host→device hop. (Measured why: a float32 CLIPort batch is 216 MB and took
3.4 s over the tunneled transport + 1.8 s host conversion; the same batch
as uint8 moves in 0.19 s — docs/PERFORMANCE.md "Host input pipeline".)
Reference behavior being replaced: torch float tensors over PCIe,
/root/reference/src/data/load_data.py:53-74.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.data import DataLoader
from textocvp_tpu.data.datasets import CATER, CLIPort, _size_token
from textocvp_tpu.data.wire import as_float_video, to_uint8_frames

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from bench_loader import make_cater_npy_fixture, make_cliport_fixture  # noqa: E402


def test_as_float_video_is_exact_and_jittable():
    rng = np.random.default_rng(14)
    u8 = rng.integers(0, 256, (2, 3, 8, 8, 3), dtype=np.uint8)
    host = u8.astype(np.float32) * np.float32(1.0 / 255.0)

    # host numpy path
    np.testing.assert_array_equal(as_float_video(u8), host)
    # float input passes through untouched (no-op trace under jit)
    assert as_float_video(host) is host

    # device path under jit: bit-identical to the host float conversion
    dev = jax.jit(as_float_video)(jnp.asarray(u8))
    np.testing.assert_array_equal(np.asarray(dev), host)

    # downstream compute sees identical values: any jitted consumer of the
    # two wires produces the same bits
    f = jax.jit(lambda x: jnp.sum(as_float_video(x) ** 2))
    assert float(f(jnp.asarray(u8))) == float(f(jnp.asarray(host)))


def test_to_uint8_frames_inverts_decoder_floats():
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (4, 6, 6, 3), dtype=np.uint8)
    # every decoder-produced float frame is k/255 — the round trip is exact
    np.testing.assert_array_equal(
        to_uint8_frames(as_float_video(u8)), u8)
    # uint8 passes through
    assert to_uint8_frames(u8) is u8


def test_cliport_png_uint8_roundtrip(tmp_path):
    make_cliport_fixture(tmp_path, num_episodes=3, frames_per_ep=4, h=48, w=64)
    kw = dict(root=tmp_path, split="test", num_frames=4, img_size=(24, 32))
    f = CLIPort(**kw)[0][0]
    u8 = CLIPort(uint8_output=True, **kw)[0][0]
    assert u8.dtype == np.uint8 and f.dtype == np.float32
    np.testing.assert_array_equal(as_float_video(u8), f)


def test_cliport_cache_uint8_is_raw_slice(tmp_path):
    # hand-build the pre-decoded cache format make_npy_cache.py writes
    rng = np.random.default_rng(7)
    size = (16, 16)
    for i in range(2):
        ep = tmp_path / "test" / f"episode{i:05d}"
        ep.mkdir(parents=True)
        (ep / "task_description.txt").write_text("put the block in the bowl")
        np.save(ep / f"color_cache_{_size_token(size)}.npy",
                rng.integers(0, 256, (5, *size, 3), dtype=np.uint8))
    kw = dict(root=tmp_path, split="test", num_frames=5, img_size=size)
    f = CLIPort(**kw)[1][0]
    u8 = CLIPort(uint8_output=True, **kw)[1][0]
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(as_float_video(u8), f)
    # the uint8 path must be a plain copy of the stored cache bytes
    stored = np.load(tmp_path / "test" / "episode00001"
                     / f"color_cache_{_size_token(size)}.npy")
    np.testing.assert_array_equal(u8, stored)


def test_cater_npy_uint8_roundtrip(tmp_path):
    make_cater_npy_fixture(tmp_path, num_videos=3, frames_per_video=6)
    kw = dict(root=tmp_path, mode="easy", split="test", num_frames=4,
              img_size=(64, 64))
    f = CATER(**kw)[0][0]
    u8 = CATER(uint8_output=True, **kw)[0][0]
    assert u8.dtype == np.uint8 and f.dtype == np.float32
    np.testing.assert_array_equal(as_float_video(u8), f)


def test_loader_collate_preserves_uint8(tmp_path):
    make_cater_npy_fixture(tmp_path, num_videos=4, frames_per_video=6)
    ds = CATER(root=tmp_path, mode="easy", split="test", num_frames=4,
               img_size=(64, 64), uint8_output=True)
    videos, _ = next(iter(DataLoader(ds, batch_size=2, num_workers=0)))
    assert videos.dtype == np.uint8
    assert videos.shape == (2, 4, 64, 64, 3)
    # float datasets still collate to float32 (unchanged contract)
    ds_f = CATER(root=tmp_path, mode="easy", split="test", num_frames=4,
                 img_size=(64, 64))
    videos_f, _ = next(iter(DataLoader(ds_f, batch_size=2, num_workers=0)))
    assert videos_f.dtype == np.float32


def test_load_data_uint8_wire_knob(tmp_path):
    from textocvp_tpu.data import load_data

    make_cater_npy_fixture(tmp_path, num_videos=3, frames_per_video=6)
    exp_params = {"dataset": {
        "dataset_name": "CATER_Easy", "tokenizer": "CustomTokenizer",
        "root": str(tmp_path), "num_frames": 4, "img_size": [64, 64],
        "uint8_wire": True,
    }}
    ds = load_data(exp_params, split="test")
    assert ds[0][0].dtype == np.uint8
    exp_params["dataset"]["uint8_wire"] = False
    assert load_data(exp_params, split="test")[0][0].dtype == np.float32


class _EchoService:
    """InferenceFrontend with stub stages: pins the host-side wire logic
    (what dtype crosses _place_inputs) without compiling a model."""

    from textocvp_tpu.serve.pipeline import InferenceFrontend as _IF

    def __init__(self, wire_dtype):
        from textocvp_tpu.data.tokenizers import get_tokenizer
        from textocvp_tpu.data.vocabularies import CATER_EASY_VOCAB

        self._svc = self._IF.__new__(self._IF)
        s = self._svc
        s.batch_size = 2
        s.num_context = 1
        s.num_preds = 2
        s.resolution = (8, 8)
        s.max_tokens = 8
        s.wire_dtype = wire_dtype
        s.tokenizer = get_tokenizer("CustomTokenizer", CATER_EASY_VOCAB)
        s._lock = __import__("threading").Lock()
        s._counter = 0
        s.seen = {}

        def predict_stage(videos, key, **tk):
            s.seen["dtype"] = np.asarray(videos).dtype
            s.seen["videos"] = np.asarray(videos)
            return jnp.zeros((videos.shape[0], s.num_preds, 4, 4))

        def decode_stage(slots):
            b = slots.shape[0]
            return jnp.zeros((b, s.num_preds, 8, 8, 3), jnp.uint8)

        s._predict_stage = predict_stage
        s._decode_stage = decode_stage

    def predict(self, frames, captions):
        return self._svc.predict(frames, captions)

    @property
    def seen(self):
        return self._svc.seen


def test_serving_wire_dtype_controls_transport():
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (1, 1, 8, 8, 3), dtype=np.uint8)
    fl = as_float_video(u8)

    # default float32 wire: uint8 requests are converted on host (back-compat)
    svc = _EchoService("float32")
    svc.predict(u8, ["the snitch is picked up"])
    assert svc.seen["dtype"] == np.float32

    # uint8 wire: uint8 passes through, float input snaps (exactly) to uint8
    svc8 = _EchoService("uint8")
    svc8.predict(u8, ["the snitch is picked up"])
    assert svc8.seen["dtype"] == np.uint8
    np.testing.assert_array_equal(svc8.seen["videos"][:1], u8)
    svc8.predict(fl, ["the snitch is picked up"])
    assert svc8.seen["dtype"] == np.uint8
    np.testing.assert_array_equal(svc8.seen["videos"][:1], u8)


def test_trainer_steps_accept_uint8(tmp_path):
    """One real SAVi trainer step on each wire: bit-identical losses.

    Uses the Synthetic dataset's uint8_output (quantized frames) as the
    uint8 batch and ITS exact float image (u8/255) as the float batch, so
    the two steps see the same underlying video."""
    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.train.trainer import DecompTrainer

    exp = Experiment.create(tmp_path / "e", "SAVi", "Synthetic")
    params = exp.params
    mp = params["model"]["model_params"]
    res = 16
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16,
              resolution=[res, res])
    mp["encoder"]["encoder_params"].update(num_channels=[8, 8],
                                           resolution=[res, res])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8],
                                           resolution=[res, res])
    mp["transition_module"] = {"model_name": "TransformerBlock",
                               "num_heads": 2, "mlp_size": 16}
    params["dataset"].update(img_size=[res, res], num_frames=3,
                             tokenizer="CustomTokenizer", num_train_seqs=4,
                             num_eval_seqs=2)
    params["training"].update(batch_size=2)
    exp.save_params(params)

    t = DecompTrainer(exp.exp_path)
    t.load_data()
    sample = next(iter(t.train_loader))[0]
    t.setup_model(sample)

    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, sample.shape[:1] + sample.shape[1:], dtype=np.uint8)
    fl = as_float_video(u8)
    key = jax.random.PRNGKey(0)

    import copy

    p0 = jax.tree_util.tree_map(jnp.copy, t.params)
    o0 = jax.tree_util.tree_map(jnp.copy, t.opt_state)
    bs0 = (jax.tree_util.tree_map(jnp.copy, t.batch_stats)
           if t.batch_stats is not None else None)
    _, _, _, v_f = t._train_step_jit(p0, bs0, o0, jnp.asarray(fl), key)

    p1 = jax.tree_util.tree_map(jnp.copy, t.params)
    o1 = jax.tree_util.tree_map(jnp.copy, t.opt_state)
    bs1 = (jax.tree_util.tree_map(jnp.copy, t.batch_stats)
           if t.batch_stats is not None else None)
    _, _, _, v_u = t._train_step_jit(p1, bs1, o1, jnp.asarray(u8), key)

    for k in v_f:
        assert float(v_f[k]) == float(v_u[k]), k

    # valid_step too (forward-only program)
    a = t.valid_step(t.params, t.batch_stats, jnp.asarray(fl), key)
    b = t.valid_step(t.params, t.batch_stats, jnp.asarray(u8), key)
    for k in a:
        assert float(a[k]) == float(b[k]), k
