"""Checkpoint round-trip tests including optimizer-state restoration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
