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


def _leaf_to_host(x, copy: bool = False):
    """One leaf to host numpy, multi-process safe.

    A leaf sharded across processes (e.g. TP over a model axis that spans
    hosts) is not fully addressable, so ``np.asarray`` would raise; gather it
    with ``process_allgather`` instead — a COLLECTIVE, so every process must
    reach this save in lockstep (the epoch-cadence saves do; see
    ``save_checkpoint``). ``copy=True`` forces an owning snapshot (async
    writer: the source buffer may be donated away before serialization)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    if isinstance(x, (jax.Array, np.ndarray)):
        return np.array(x) if copy else np.asarray(x)
    return x


def _to_host(tree, copy: bool = False):
    return jax.tree_util.tree_map(lambda x: _leaf_to_host(x, copy=copy), tree)


def _is_process_zero() -> bool:
    return jax.process_index() == 0


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
    """Write one checkpoint file (atomic replace). Multi-process runs: every
    process participates in gathering cross-process-sharded leaves (a
    collective — callers save in lockstep, which the epoch-cadence sites do),
    but only process 0 touches the (shared) filesystem; the others return the
    would-be path without writing."""
    path = Path(models_dir) / (name if name.endswith(".msgpack") else f"{name}.msgpack")
    host_state = _to_host(state)
    if not _is_process_zero():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(serialization.to_state_dict(host_state))
    # unique tmp name: concurrent savers (async writer + emergency path, or
    # unrelated processes on a shared FS) must not truncate each other's
    # in-flight tmp file; os.replace stays atomic on the same filesystem
    tmp = path.with_suffix(f".tmp.{os.getpid()}")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer (``tpu.async_checkpoint``).

    The reference blocks its train loop on every ``torch.save``
    (setup_model.py:142-186). Here the loop pays only for the device->host
    fetch; msgpack serialization and the (atomic) disk write happen on a
    worker thread, overlapped with the next epoch's compute.

    The D2H fetch MUST stay synchronous: the train step donates its input
    buffers, so the params arrays captured for a checkpoint are invalidated
    the moment the next step is dispatched — ``save`` snapshots them to host
    numpy before returning.

    One writer thread => saves land in submission order (``last_saved`` can
    never be overwritten by an older state). A failed write re-raises on the
    next ``save``/``wait`` so checkpoint loss is never silent.

    The queue is bounded (2 snapshots): each item is a full host copy of
    params+opt_state (~hundreds of MB at ViT-B scale), so if epochs outpace
    the disk, ``save`` backpressures to roughly sync behavior instead of
    growing host memory without bound.
    """

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue(maxsize=2)
        self._error = None
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            models_dir, name, host_state = item
            try:
                save_checkpoint(models_dir, name, host_state)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def save(self, models_dir, name: str, state: dict):
        if self._closed:
            raise RuntimeError("AsyncCheckpointWriter is closed")
        self._check()
        # owning snapshot (copy=True): np.asarray aliases numpy leaves, and an
        # aliased buffer could be mutated (or a jax buffer donated away)
        # before the worker serializes it. Taken HERE, on the caller thread:
        # the cross-process gather for non-addressable leaves is a collective
        # and must run in lockstep with the other processes, not on the
        # writer thread.
        snap = _to_host(state, copy=True)
        self._q.put((models_dir, name, snap))

    def wait(self):
        """Block until every submitted checkpoint is on disk."""
        self._q.join()
        self._check()

    def close(self):
        if self._closed:
            return
        self.wait()
        self._closed = True
        self._q.put(None)
        self._thread.join()


def make_checkpoint_saver(exp_params: dict, models_dir):
    """(save, flush) pair honoring ``tpu.async_checkpoint``.

    ``save(name, state)`` returns after the D2H snapshot when async (write
    happens on the worker thread) or after the full write when sync.
    ``flush()`` blocks until everything submitted is durable on disk AND
    retires the worker thread — call it exactly once, when training ends
    (further ``save`` calls raise; the trainers' emergency path saves via
    the sync ``save_checkpoint`` after flushing)."""
    if (exp_params.get("tpu") or {}).get("async_checkpoint"):
        writer = AsyncCheckpointWriter()
        return (lambda name, state: writer.save(models_dir, name, state),
                writer.close)
    return (lambda name, state: save_checkpoint(models_dir, name, state),
            lambda: None)


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
