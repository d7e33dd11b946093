"""Shared timing methodology for the bench_* scripts.

ONE implementation of the warmup-sync + best-of-N-windows loop so the three
benches cannot drift (the round-3 warmup-sync bug — warmup dispatched but not
synced, inflating every reading by (warmup+iters)/iters — lived in exactly
one of three hand-copied loops).

Rules encoded here (docs/PERFORMANCE.md "What mattered"):
- Warmup steps are synced THROUGH, not just dispatched: the device queue is
  FIFO, so un-synced warmups would still be executing when the timed window
  opens.
- Timed steps are dispatched back-to-back and synced at the end of the
  window — overlaps the host-fetch round trip with compute instead of paying
  it per step.
- Several independent windows, best reported: a single window is vulnerable
  to transient host contention (measured: a concurrent CPU test run inflated
  one window 274 -> 344 ms).
- sync() must fetch device data to the host: on the remote-attached TPU
  runtime ``block_until_ready`` can return before remote execution completes.
"""

import sys
import time


def time_windows(run_step, sync, iters, windows=2, warmup=2):
    """Return best-window seconds for ``iters`` chained dispatches.

    ``run_step(i)`` dispatches one step and returns an output ``sync`` can
    force; ``i`` is a distinct non-negative index per call (warmup indices
    come first) — fold it into the step's rng when steps need distinct keys.
    """
    for i in range(max(1, warmup)):
        sync(run_step(i))
    best = float("inf")
    for w in range(max(1, windows)):
        t0 = time.perf_counter()
        outs = [run_step(warmup + w * iters + i) for i in range(iters)]
        for out in outs:
            sync(out)
        dt = time.perf_counter() - t0
        print(f"window {w}: {1000 * dt / iters:.2f} ms/step", file=sys.stderr)
        best = min(best, dt)
    return best


def time_steps_ms(run_step, sync, iters, windows=2):
    """Best-window milliseconds per step for an index-less ``run_step()``."""
    return 1000 * time_windows(lambda i: run_step(), sync, iters,
                               windows=windows) / iters
