"""
Multi-host scaffolding (SURVEY.md §2.7 TPU mandate; docs/SCALING.md design).

Three pieces:

* :func:`maybe_initialize_distributed` — env-gated ``jax.distributed``
  bring-up. Single-process runs are untouched; launching each host with
  ``TEXTOCVP_COORDINATOR=host0:1234 TEXTOCVP_NUM_PROCESSES=N
  TEXTOCVP_PROCESS_ID=i`` (or the standard JAX coordinator env) joins the
  cluster before any device query.
* :func:`get_hybrid_mesh` — a ``(dcn, data, model)`` mesh: the ``dcn`` axis
  spans hosts (cross-host collectives ride the data-center network), while
  ``data``/``model`` ride the ICI within each host. ``jax.devices()`` orders
  devices by process, so the plain reshape keeps every host's chips contiguous
  along the dcn rows — DP gradient reductions contract over ('dcn', 'data')
  with the fast inner axis on ICI.
* per-process input sharding lives in :class:`textocvp_tpu.data.DataLoader`
  (``process_index``/``process_count``) and
  :func:`textocvp_tpu.parallel.mesh.shard_batch`, which assembles a global
  array from process-local shards on hybrid meshes.
"""

from __future__ import annotations

import os
from typing import Optional


_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize ``jax.distributed`` when the multi-process env is set.
    Returns True iff distributed was (or already is) initialized. Idempotent:
    trainers and evaluators all call this, and only the first call in a
    process actually initializes. No-op for single-process runs.
    """
    global _DISTRIBUTED_INITIALIZED
    coord = os.environ.get("TEXTOCVP_COORDINATOR") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    if _DISTRIBUTED_INITIALIZED:
        return True
    import jax

    already = getattr(jax.distributed, "is_initialized", None)
    if already is not None and already():
        _DISTRIBUTED_INITIALIZED = True
        return True
    kwargs = {"coordinator_address": coord}
    nproc = os.environ.get("TEXTOCVP_NUM_PROCESSES")
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
        kwargs["process_id"] = int(os.environ.get("TEXTOCVP_PROCESS_ID", "0"))
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    if jax.process_index() != 0:
        # shared experiment dirs: exactly one process writes logs.txt
        from textocvp_tpu.core.logger import Logger

        Logger.file_writes_enabled = False
    return True


def is_process_zero() -> bool:
    """True on the (single) process that owns filesystem side-outputs.

    Multi-process runs replicate the train/eval loops on every host; exactly
    one of them should write checkpoints, TensorBoard events, results.json,
    figures, and logs.txt to the (typically shared) experiment directory —
    everything else is duplicate work at best and a same-path write race at
    worst. Single-process runs always return True."""
    import jax

    return jax.process_index() == 0


def get_hybrid_mesh(data: int = -1, model: int = 1, dcn: Optional[int] = None,
                    devices=None):
    """Build a (dcn, data, model) mesh. ``dcn`` defaults to the process count;
    ``data=-1`` uses all remaining devices per dcn group."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(devices if devices is not None else jax.devices())
    n_dcn = int(dcn) if dcn is not None else jax.process_count()
    n = devices.size
    assert n % n_dcn == 0, f"{n} devices not divisible by dcn={n_dcn}"
    per_group = n // n_dcn
    if data == -1:
        assert per_group % model == 0, \
            f"{per_group} devices/group not divisible by model={model}"
        data = per_group // model
    assert data * model * n_dcn == n, f"mesh {n_dcn}x{data}x{model} != {n} devices"
    return Mesh(devices.reshape(n_dcn, data, model), ("dcn", "data", "model"))


def loader_process_kwargs(mesh) -> dict:
    """DataLoader kwargs for per-process input sharding. Multi-process runs
    get (process_index, process_count) plus ``pad_to_multiple`` — the global
    batch-sharding axis size — so every process emits the SAME number of
    equally-sized batches (ragged global batches pad by repeating the last
    row) and no process ever launches a collective the others skip.
    Single-process runs get no kwargs (unchanged behavior)."""
    import jax

    if jax.process_count() <= 1:
        return {}
    from textocvp_tpu.parallel.mesh import _batch_axis_size

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "pad_to_multiple": _batch_axis_size(mesh),
    }


def get_runtime_mesh(tpu_params: Optional[dict] = None):
    """Mesh selection for trainers/evaluators: single-process runs get the
    (data, model) ICI mesh; multi-process runs get the hybrid
    (dcn, data, model) mesh with dcn spanning hosts."""
    import jax

    from textocvp_tpu.parallel.mesh import get_mesh

    axes = dict((tpu_params or {}).get("mesh_axes") or {"data": -1, "model": 1})
    if jax.process_count() > 1:
        return get_hybrid_mesh(data=axes.get("data", -1), model=axes.get("model", 1))
    return get_mesh(data=axes.get("data", -1), model=axes.get("model", 1))
