"""
Device-mesh layer: the SPMD replacement for the reference's
``torch.nn.DataParallel`` (reference baseTrainer.py:132-135; SURVEY.md §2.7).

A 2-axis mesh is created over all local devices:

* ``data``  — batch-sharded inputs ride the ICI; gradients are all-reduced by
  XLA (psum emitted from jit with sharded inputs + replicated params).
* ``model`` — reserved for tensor-parallel sharding of large predictors; size
  1 in the stock configs so every program is valid single-chip too.

Multi-host scaling would add a DCN axis via ``jax.distributed.initialize``;
the mesh helpers keep axis names stable so that is an additive change.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def _batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch dim shards over: ('dcn', 'data') on hybrid
    multi-host meshes, ('data',) otherwise."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def _batch_axis_size(mesh: Mesh) -> int:
    size = 1
    for a in _batch_axes(mesh):
        size *= mesh.shape[a]
    return size


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis (and the dcn axis
    on hybrid multi-host meshes)."""
    return NamedSharding(mesh, P(_batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with the batch axis sharded over
    'data'. Arrays whose leading dim doesn't divide the data axis (e.g. a
    ragged final batch) are replicated instead; non-array leaves (caption
    strings) pass through."""
    sharding = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)
    d = _batch_axis_size(mesh)
    multiprocess = "dcn" in mesh.axis_names and jax.process_count() > 1

    def put(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1:
            if multiprocess:
                # each process holds only its local shard of the global batch
                return jax.make_array_from_process_local_data(sharding, np.asarray(x))
            target = sharding if x.shape[0] % d == 0 else replicated
            return jax.device_put(x, target)
        return x

    return jax.tree_util.tree_map(put, batch)


def pad_batch_to_multiple(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= batch_size divisible by the batch-sharding axes."""
    d = _batch_axis_size(mesh)
    return ((batch_size + d - 1) // d) * d


def pad_batch(batch, mesh: Mesh):
    """
    Pad every array leaf's leading (batch) dim up to the data-axis multiple by
    repeating the last row, so ragged final batches stay SHARDED instead of
    silently replicating (each chip would otherwise redundantly compute the
    full batch). Returns ``(padded_batch, original_batch_size)`` — the caller
    must slice per-sample outputs back to the original size.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(batch)
              if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1]
    if not leaves:
        return batch, 0
    b = leaves[0].shape[0]
    target = pad_batch_to_multiple(b, mesh)
    if target == b:
        return batch, b

    reps = np.concatenate([np.arange(b), np.full(target - b, b - 1)]).astype(np.int32)

    def pad(x):
        if isinstance(x, (np.ndarray, jax.Array)) and getattr(x, "ndim", 0) >= 1 \
                and x.shape[0] == b:
            return np.asarray(x)[reps]
        return x

    return jax.tree_util.tree_map(pad, batch), b


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """
    Wrap a host batch iterator with asynchronous host->device transfer: up to
    ``size`` batches are device_put ahead of consumption, overlapping input
    transfer with TPU compute (the tf.data-style prefetch of SURVEY.md §7.6).
    Works on (videos, others) tuples; array leaves get batch-sharded.
    """
    import collections

    queue = collections.deque()

    def put(batch):
        return shard_batch(batch, mesh)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
