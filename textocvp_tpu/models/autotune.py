"""Runtime decode-schedule autotuner (``tpu.decode_autotune``).

The measured-best (chunk, unroll) schedule for the scanned decoder tail is
shape-dependent and non-monotonic on the current toolchain (the full grid is
in docs/PERFORMANCE.md "decode scheduling probe" — e.g. only the
fully-unrolled 4-chunk form wins at the flagship shape while every other
unroll regresses). The static policy in :mod:`textocvp_tpu.models.chunked`
encodes the measured points; for OTHER shapes, the opt-in autotuner measures
a small candidate set live on the first batch and uses the winner for the
rest of the run.

Cost model: each candidate is one extra compile of the decode stage (~1-2 min
on the remote-compiled TPU runtime, amortized by the persistent compilation
cache on reruns) plus ~``iters`` timed dispatches. That is why it is opt-in:
worth it for long evals and serving, not for one-batch smoke runs.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence


def measure_variants(
    variants: Sequence[tuple],
    run_args: tuple,
    sync: Callable,
    iters: int = 3,
    log: Callable = print,
):
    """Time ``variants`` of a jitted stage and return the fastest.

    ``variants``: sequence of (label, fn). Each fn is called as
    ``fn(*run_args)``; ``sync(out)`` must force completion on-device (on
    remote-attached runtimes ``block_until_ready`` can return early, so sync
    should fetch a small result to the host). The first call per variant
    compiles and is untimed; the next ``iters`` calls are dispatched
    back-to-back and synced once.
    """
    times = []
    for label, fn in variants:
        out = fn(*run_args)
        sync(out)  # compile + first run, untimed
        t0 = time.perf_counter()
        outs = [fn(*run_args) for _ in range(iters)]
        for o in outs:
            sync(o)
        ms = 1000 * (time.perf_counter() - t0) / iters
        log(f"  autotune {label}: {ms:.1f} ms")
        times.append(ms)
    best_idx = min(range(len(variants)), key=times.__getitem__)

    # Multi-host: per-process timing noise must not let processes pick
    # DIFFERENT winners — from then on they would execute different XLA
    # programs whose collectives no longer match, deadlocking the eval.
    # Every process measures the same variants in the same order; process
    # 0's pick is broadcast and wins everywhere.
    import jax

    if jax.process_count() > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        agreed = int(multihost_utils.broadcast_one_to_all(np.int32(best_idx)))
        if agreed != best_idx:
            log(f"  autotune deferring to process 0's pick "
                f"({variants[agreed][0]} over local {variants[best_idx][0]})")
        best_idx = agreed

    best_label = variants[best_idx][0]
    # times[best_idx] is this process's own measurement of the (possibly
    # process-0-agreed) pick — never another variant's number.
    log(f"  autotune picked {best_label} ({times[best_idx]:.1f} ms local)")
    return variants[best_idx][1]


def autotune_enabled(exp_params: dict) -> bool:
    """True when ``tpu.decode_autotune`` is set AND the model has a
    schedulable decode — SAVi's conv decoder. The MLP patch decoder ignores
    ``tail_chunks`` (measured: no win, docs/PERFORMANCE.md), so its variants
    would be identical programs."""
    return (bool((exp_params.get("tpu") or {}).get("decode_autotune"))
            and exp_params["model"]["model_name"] == "SAVi")


def autotuned_stage(make_stage: Callable, schedules_of: Callable,
                    sync: Callable, log: Callable = print):
    """Wrap a ``make_stage(tail_chunks=, tail_unroll=)`` builder in a
    first-call autotuner over the candidate decode schedules.

    ``schedules_of(*args)`` maps the stage's first-batch arguments to the
    (chunks, unroll) candidates (shapes are only known then). Shared by both
    evaluators so the wiring cannot drift between them."""

    def build_variants(*args):
        return [(f"chunks={ck} unroll={un}",
                 make_stage(tail_chunks=ck, tail_unroll=un))
                for ck, un in schedules_of(*args)]

    return lazy_autotuned(build_variants, sync, log=log)


def lazy_autotuned(build_variants: Callable, sync: Callable,
                   iters: int = 3, log: Callable = print):
    """Wrap a stage so the first call autotunes and later calls reuse the
    winner. ``build_variants(*args)`` returns [(label, fn), ...] for the
    actual first-batch arguments (shapes are only known then)."""
    state = {}

    def stage(*args):
        if "fn" not in state:
            state["fn"] = measure_variants(
                build_variants(*args), args, sync, iters=iters, log=log)
        return state["fn"](*args)

    return stage
