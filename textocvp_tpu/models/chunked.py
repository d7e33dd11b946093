"""Decode chunking policy for large inference batches.

Measured on TPU v5e (docs/PERFORMANCE.md "decode chunking"): the flagship
decode's tail convs sustain ~58 TFLOPS dispatched as one flat batch of 9728
frames but ~152 TFLOPS as a ``lax.scan`` over chunks of ~1216 frames — the
toolchain schedules the small-working-set loop body far better than the giant
flat op. Crucially, ONLY the tail convs may live inside the scan: putting the
spatial-broadcast / gather-expand first stage in the scan body compiles to a
4-6x SLOWER schedule (measured 1406 ms and 557 ms vs the 372 ms flat
baseline; the flat-expand + scanned-tail form runs 228 ms).

The scan itself is implemented in ConvDecoder.decode_broadcast
(``tail_chunks``); this module holds the policy for choosing the chunk count.
Chunking is exact — batch elements are independent — and is applied by
default on the inference paths (bench.py, evaluators). In TRAINING the
scanned tail's plain BACKWARD materializes stacked per-chunk residuals on
top of the flat-path activations and the B=64 SAVi fwd+bwd fails HBM
allocation (19.0 G needed vs 15.75 G at tail_chunks=2); the opt-in
``tpu.train_decode_chunks`` knob therefore pairs chunking with a per-chunk
``jax.checkpoint`` (``tail_remat`` on the decode path) so the backward
recomputes each chunk's tail instead of storing it. Measured on v5e
(bench_train.py, B=64 SAVi): the remat form FITS but runs 779 ms vs 349 ms
flat — the scan-with-remat backward schedules pathologically — so training
keeps the flat decode by default and the knob exists for memory-limited
configs only (docs/PERFORMANCE.md "training side").
"""

from __future__ import annotations

from typing import Optional

# Sweet spot measured on v5e (chunk-count sweep at the flagship shape:
# 4 chunks of 2432 frames = 218.7 ms vs 8x1216 = 227.9, 16x608 = 358.5;
# the recon-eval shape's best was 2x2048): ~2048 conv frames per chunk.
TARGET_FRAMES_PER_CHUNK = 2048


def pick_tail_chunks(n_rows: int, num_slots: int,
                     target_frames: int = TARGET_FRAMES_PER_CHUNK,
                     shard_multiple: int = 1) -> int:
    """Chunk count for a decode of ``n_rows`` slot-sets (conv batch =
    n_rows * num_slots frames): the largest divisor of n_rows keeping at
    least ``target_frames`` frames per chunk. 1 = flat decode (small batches
    are left alone).

    ``shard_multiple``: under sequence-parallel decode the row dim carries a
    mesh sharding of that many shards; only chunk counts whose per-chunk row
    slice stays a multiple of it are admissible, else GSPMD reshards inside
    the scan body and negates the frame-sharding win."""
    frames = n_rows * num_slots
    if frames < 1.5 * target_frames:
        return 1
    best = 1
    for c in range(2, n_rows + 1):
        if n_rows % c:
            continue
        if frames // c < target_frames:
            break
        if (n_rows // c) % shard_multiple:
            continue
        best = c
    return best


def resolve_tail_chunks(config_value, n_rows: int, num_slots: int,
                        quant: bool = False, shard_multiple: int = 1) -> int:
    """Resolve the ``tpu.decode_chunks`` experiment option: None/"auto" ->
    measured policy; an int -> that many chunks (1 disables).

    ``quant``: under the int8 decoder tail the chunking pathology INVERTS —
    the flat decode is fastest (127.3 ms vs 142.8 for the best chunked form
    at the flagship shape; int8 intermediates halve the working set, so the
    giant flat batch no longer thrashes — bench_decode_probe.py
    --decode_quant int8, docs/PERFORMANCE.md "int8 decode"). Auto policy
    therefore returns 1 when quantizing; an explicit int still wins."""
    if config_value in (None, "auto"):
        return 1 if quant else pick_tail_chunks(
            n_rows, num_slots, shard_multiple=shard_multiple)
    return max(1, int(config_value))


def train_decode_kwargs(exp_params: dict, n_rows: int) -> dict:
    """Decode kwargs for a TRAIN step under ``tpu.train_decode_chunks``.

    Returns {} (flat decode) unless chunking is configured, the model is
    SAVi (the MLP patch decoder ignores ``tail_chunks``), and the resolved
    count exceeds 1. The chunked form always pairs with per-chunk remat
    (``tail_remat``) so the backward fits HBM — see the module docstring for
    why this is a memory knob, not a throughput one. Shared by both trainers
    so the gate logic cannot drift."""
    cfg = (exp_params.get("tpu") or {}).get("train_decode_chunks")
    if cfg in (None, 0, 1) or exp_params["model"]["model_name"] != "SAVi":
        return {}
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    chunks = resolve_tail_chunks(cfg, n_rows, num_slots)
    return {"tail_chunks": chunks, "tail_remat": True} if chunks > 1 else {}


def valid_decode_kwargs(exp_params: dict, n_rows: int) -> dict:
    """Decode kwargs for the trainers' FORWARD-ONLY programs (valid_step /
    valid_forward): the evaluators' chunking policy, no remat (there is no
    backward to fit).

    Measured motivation (bench_train.py --breakdown, round 5): the flat
    forward-only SAVi program schedules pathologically on v5e — 1033 ms at
    B=64/T=8 where the SAME forward inside the fused fwd+bwd train step
    costs 348 ms — while the scanned-tail eval form runs the same decode in
    ~114 ms. The reference's epoch template runs a full valid epoch BEFORE
    every train epoch (baseTrainer.py:159-165), so the forward-only program
    is a per-epoch production cost, not just an eval one. Uses the same
    ``tpu.decode_chunks`` option as the evaluators; SAVi only (the MLP patch
    decoder ignores ``tail_chunks`` — measured no-win, docs/PERFORMANCE.md)."""
    if exp_params["model"]["model_name"] != "SAVi":
        return {}
    num_slots = exp_params["model"]["model_params"]["num_slots"]
    cfg = (exp_params.get("tpu") or {}).get("decode_chunks")
    chunks = resolve_tail_chunks(cfg, n_rows, num_slots)
    if chunks <= 1:
        return {}
    return {"tail_chunks": chunks, "tail_unroll": pick_tail_unroll(chunks)}


def pick_tail_unroll(tail_chunks: int, remat: bool = False) -> int:
    """Scan-unroll factor for the chunked decoder tail (inference only).

    Measured grid at the flagship decode shape (9728 conv frames, v5e,
    bench_decode_probe.py, 10-20 iteration averages):

        chunks=2: unroll 1/2/4 -> 218.8 / 271.6 / 271.5 ms
        chunks=4: unroll 1/2/4 -> 215.8 / 234.2 / 205.9 ms   <- only win
        chunks=8: unroll 1/2/4 -> 224.7 / 251.4 / 248.0 ms

    Only the FULLY-unrolled 4-chunk form beats the rolled scan (confirmed at
    20 iters: 204.2 vs 214.1 ms; flagship end-to-end 4283 -> 4434
    frames/s/chip). Everything else regresses, so the policy is exactly
    that data point. Remat (training) keeps unroll=1 — unrolling a
    rematerialized body just multiplies program size."""
    if remat:
        return 1
    return 4 if tail_chunks == 4 else 1


def decode_candidate_schedules(n_rows: int, num_slots: int,
                               configured_chunks=None, quant: bool = False,
                               shard_multiple: int = 1):
    """Candidate (tail_chunks, tail_unroll) pairs for the runtime decode
    autotuner (``tpu.decode_autotune``): the static policy pick, its fully
    unrolled form, and the neighboring chunk counts. Small, because each
    candidate costs one compile of the decode stage. An explicit
    ``tpu.decode_chunks`` config (``configured_chunks``) is always among the
    candidates — the user's override must at least be measured, never
    silently disregarded. With ``quant`` the policy pick is flat (see
    resolve_tail_chunks), so the candidate set degenerates to flat plus a
    couple of chunked probes. ``shard_multiple`` filters out chunk counts
    that would break the sequence-parallel row sharding (pick_tail_chunks)."""
    c0 = 1 if quant else pick_tail_chunks(n_rows, num_slots,
                                          shard_multiple=shard_multiple)
    cands = []

    def add(c: int, u: int):
        if (c >= 1 and (c == 1 or n_rows % c == 0) and (c, u) not in cands
                and (c == 1 or (n_rows // c) % shard_multiple == 0)):
            cands.append((c, u))

    if isinstance(configured_chunks, int):
        add(configured_chunks, pick_tail_unroll(configured_chunks))
        add(configured_chunks, 1)
    add(c0, pick_tail_unroll(c0))
    add(c0, 1)                       # rolled scan
    add(c0, c0)                      # fully unrolled
    add(c0 * 2, 1)
    add(max(1, c0 // 2), 1)
    if c0 == 1:
        add(2, 1)
    return cands


# Baking frozen weights into the executable as jit constants is another
# measured 2.3x on the decode — but only for SMALL pytrees: the remote
# compile service rejects oversized requests (HTTP 413 at ~hundreds of MB;
# the 344 MB DINOv2 ViT-B/14 trips it), and very large constants inflate
# compile time regardless (35M-param T5 -> 10+ min). 64 MB covers every
# SAVi-decoder model while excluding the ViT/T5 giants.
CONST_BAKE_LIMIT_BYTES = 64 << 20


def tree_bytes(tree) -> int:
    """Total byte size of all array leaves in a pytree."""
    import jax

    return sum(
        getattr(x, "size", 0) * getattr(getattr(x, "dtype", None), "itemsize", 0)
        for x in jax.tree_util.tree_leaves(tree)
    )


def should_bake_constants(variables, limit_bytes: int = CONST_BAKE_LIMIT_BYTES) -> bool:
    """Whether a frozen-weight pytree is small enough to close over inside
    jit (constant-baked executables) rather than pass as an argument."""
    return tree_bytes(variables) <= limit_bytes
