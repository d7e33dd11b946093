"""Checkpoint round-trip tests including optimizer-state restoration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint, save_checkpoint


def test_roundtrip_params_and_opt_state(tmp_path):
    params = {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.chain(optax.clip_by_global_norm(0.05), optax.adam(1e-4))
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    state = {"params": params, "batch_stats": {}, "opt_state": opt_state,
             "epoch": 7, "step": 123}
    path = save_checkpoint(tmp_path, "checkpoint_epoch_7", state)
    assert path.name == "checkpoint_epoch_7.msgpack"

    # raw restore (no target): nested dicts
    raw = load_checkpoint(path)
    assert int(raw["epoch"]) == 7
    np.testing.assert_allclose(raw["params"]["dense"]["kernel"],
                               np.asarray(params["dense"]["kernel"]))

    # structured restore onto a fresh target: optimizer namedtuples recover
    fresh_opt = tx.init(params)
    target = {"params": params, "batch_stats": {}, "opt_state": fresh_opt,
              "epoch": 0, "step": 0}
    restored = load_checkpoint(path, target=target)
    assert int(restored["step"]) == 123
    # adam moments restored into the right namedtuple slots
    mu_orig = jax.tree_util.tree_leaves(opt_state)[0]
    mu_rest = jax.tree_util.tree_leaves(restored["opt_state"])[0]
    np.testing.assert_allclose(np.asarray(mu_rest), np.asarray(mu_orig))


def test_checkpoint_path_resolution(tmp_path):
    state = {"params": {"w": jnp.ones(3)}, "epoch": 0}
    save_checkpoint(tmp_path, "SAVi_CATER", state)
    # .pth-style names from reference scripts resolve to the msgpack file
    assert checkpoint_path(tmp_path, "SAVi_CATER.pth").exists()
    assert checkpoint_path(tmp_path, "SAVi_CATER").exists()
    assert checkpoint_path(tmp_path, "SAVi_CATER.msgpack").exists()


def test_missing_checkpoint_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_checkpoint(tmp_path / "nope.msgpack")


def test_async_writer_roundtrip_and_ordering(tmp_path):
    """AsyncCheckpointWriter: submitted states land on disk in submission
    order (last write wins for a reused name) and survive a load."""
    from textocvp_tpu.train.checkpoints import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    for i in range(5):
        state = {"params": {"w": jnp.full((4,), float(i))},
                 "batch_stats": {}, "opt_state": {}, "epoch": i, "step": i}
        w.save(tmp_path, "checkpoint_last_saved", state)
    w.save(tmp_path, "checkpoint_epoch_final",
           {"params": {"w": jnp.full((4,), 7.0)},
            "batch_stats": {}, "opt_state": {}, "epoch": 5, "step": 5})
    w.close()

    last = load_checkpoint(tmp_path / "checkpoint_last_saved.msgpack")
    np.testing.assert_array_equal(last["params"]["w"], np.full((4,), 4.0))
    assert last["epoch"] == 4
    final = load_checkpoint(tmp_path / "checkpoint_epoch_final.msgpack")
    np.testing.assert_array_equal(final["params"]["w"], np.full((4,), 7.0))


def test_async_writer_snapshot_is_immediate(tmp_path):
    """save() must snapshot to host BEFORE returning: mutating (rebinding)
    the caller's arrays after save cannot change what lands on disk — this
    is what makes async saving safe next to donated train-step buffers."""
    from textocvp_tpu.train.checkpoints import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    state = {"params": {"w": np.zeros(3)}, "batch_stats": {},
             "opt_state": {}, "epoch": 0, "step": 0}
    w.save(tmp_path, "snap", state)
    state["params"]["w"] += 99.0  # in-place mutation after submission
    w.close()
    on_disk = load_checkpoint(tmp_path / "snap.msgpack")
    np.testing.assert_array_equal(on_disk["params"]["w"], np.zeros(3))


def test_async_writer_surfaces_write_errors(tmp_path):
    from textocvp_tpu.train.checkpoints import AsyncCheckpointWriter

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where the models dir should be")
    w = AsyncCheckpointWriter()
    w.save(blocker / "models", "ck",
           {"params": {}, "batch_stats": {}, "opt_state": {}, "epoch": 0, "step": 0})
    import pytest

    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # the writer is reusable after the error is surfaced
    w.save(tmp_path, "ok",
           {"params": {}, "batch_stats": {}, "opt_state": {}, "epoch": 0, "step": 0})
    w.close()
    assert (tmp_path / "ok.msgpack").exists()


def test_make_checkpoint_saver_sync_and_async(tmp_path):
    from textocvp_tpu.train.checkpoints import make_checkpoint_saver

    state = {"params": {"w": jnp.ones(2)}, "batch_stats": {},
             "opt_state": {}, "epoch": 1, "step": 1}
    save, flush = make_checkpoint_saver({}, tmp_path / "sync")
    save("a", state)
    flush()
    assert (tmp_path / "sync" / "a.msgpack").exists()

    save, flush = make_checkpoint_saver(
        {"tpu": {"async_checkpoint": True}}, tmp_path / "async")
    save("b", state)
    flush()
    assert (tmp_path / "async" / "b.msgpack").exists()


def test_async_saver_flush_retires_worker_thread(tmp_path):
    """flush() must retire the writer thread (a process running several
    training loops must not accumulate blocked daemon threads), be
    idempotent, and reject saves submitted after it."""
    import threading

    from textocvp_tpu.train.checkpoints import make_checkpoint_saver

    state = {"params": {"w": jnp.ones(2)}, "batch_stats": {},
             "opt_state": {}, "epoch": 1, "step": 1}
    before = threading.active_count()
    save, flush = make_checkpoint_saver(
        {"tpu": {"async_checkpoint": True}}, tmp_path)
    save("c", state)
    flush()
    flush()  # second flush (emergency path after a failed epoch) is a no-op
    assert threading.active_count() == before
    with pytest.raises(RuntimeError, match="closed"):
        save("d", state)
