"""
Checkpoint I/O (reference lib/setup_model.py:142-240).

State is a pytree ``{"params", "batch_stats", "opt_state", "epoch", "step"}``
serialized with flax msgpack into single files inside the experiment's
``models/`` dir. Naming mirrors the reference cadence:

* ``checkpoint_last_saved.msgpack``   — every epoch
* ``checkpoint_epoch_<E>.msgpack``    — every ``save_frequency`` epochs
* ``checkpoint_epoch_final.msgpack``  — end of training
* ``emergency_checkpoint_epoch_<E>.msgpack`` — on crash/interrupt
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x, tree
    )


def checkpoint_path(models_dir, name: str) -> Path:
    name = str(name)
    for ext in ("", ".msgpack", ".pth"):
        cand = Path(models_dir) / (name + ext if not name.endswith(ext) or not ext else name)
        if cand.exists():
            return cand
    if not name.endswith(".msgpack"):
        name = name.replace(".pth", "") + ".msgpack"
    return Path(models_dir) / name


def save_checkpoint(models_dir, name: str, state: dict) -> Path:
    path = Path(models_dir) / (name if name.endswith(".msgpack") else f"{name}.msgpack")
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(serialization.to_state_dict(_to_host(state)))
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path, target: Optional[dict] = None) -> dict:
    """Restore a checkpoint. With ``target``, structure/dtypes are restored
    onto it (needed for optimizer state namedtuples); otherwise raw dicts."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Checkpoint {path} not found")
    with open(path, "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    if target is not None:
        return serialization.from_state_dict(target, state_dict)
    return state_dict
