"""Opt-in int8 quantization of the decoder tail (``tpu.decode_quant``).

The flagship decode — 4x [5x5 conv, 64ch, 64x64] over B*P*num_slots
slot-frames — is ~68% of the eval step and runs at ~60% of the v5e bf16 MXU
peak. The int8 MXU path is ~2x that peak, and the probe at the production
chunk shape measured **1.68x** per conv including dequant
(bench_int8_conv.py; docs/PERFORMANCE.md "int8 decode"). This module wires
post-training quantization of the decoder:

* SAVi ``ConvDecoder``: the hidden tail convs (ConvDecoder._quantize_conv);
* ExtendedDINOSAUR ``MLPPatchDecoder``: the patch-MLP denses (1.62x
  measured) and the CNN-head convs with BatchNorm folded into the conv
  affine (1.44x/1.30x/1.35x/1.09x per layer at the CLIPort protocol shapes);
* **weights**: per-output-channel symmetric int8, quantized inside the
  traced program (const-folded when the frozen decoder weights are baked);
* **activations**: per-tensor symmetric int8 with STATIC scales calibrated
  from real data (one bf16 amax pass on the first batch / warmup sample),
  so the quantize fuses into the producing op's epilogue and intermediates
  are written to HBM as int8 — no per-step dynamic-range pass;
* the final RGB(A) conv stays bf16/f32 (a sliver of the FLOPs; the output's
  precision is consumed directly).

This CHANGES outputs (quantization error), so it is opt-in per experiment
(``tpu: {"decode_quant": "int8"}``) and every results.json produced with it
carries a ``"decode_quant": "int8"`` honesty flag, like the LPIPS fallback
flag. Measured quality delta and throughput are in docs/PERFORMANCE.md.

There is no reference counterpart (the reference evaluates fp32 CUDA,
lib/metrics.py); this is a TPU-native serving/eval acceleration.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

VALID = (None, "int8")


def decode_quant_mode(exp_params: dict) -> Optional[str]:
    """Validated ``tpu.decode_quant`` (None = off, the default)."""
    mode = (exp_params.get("tpu") or {}).get("decode_quant")
    if mode not in VALID:
        raise ValueError(
            f"tpu.decode_quant must be one of {VALID}, got {mode!r}")
    model_name = (exp_params.get("model") or {}).get("model_name")
    if mode is not None and model_name not in ("SAVi", "ExtendedDINOSAUR"):
        raise ValueError(
            "tpu.decode_quant supports the SAVi ConvDecoder and the "
            "ExtendedDINOSAUR MLPPatchDecoder; this experiment uses "
            f"{model_name!r}. Unset tpu.decode_quant.")
    return mode


def encode_quant_mode(exp_params: dict) -> Optional[str]:
    """Validated ``tpu.encode_quant`` (None = off, the default).

    int8 for the FROZEN ViT encoder's denses (qkv/proj/fc1/fc2 per block;
    nn/vit.py::_dense_int8). ExtendedDINOSAUR only — SAVi's conv encoder is
    a sliver of its step and 128 channels wide (int8 would not pay)."""
    mode = (exp_params.get("tpu") or {}).get("encode_quant")
    if mode not in VALID:
        raise ValueError(
            f"tpu.encode_quant must be one of {VALID}, got {mode!r}")
    model_name = (exp_params.get("model") or {}).get("model_name")
    if mode is not None and model_name != "ExtendedDINOSAUR":
        raise ValueError(
            "tpu.encode_quant quantizes the frozen ViT encoder and is only "
            f"supported for ExtendedDINOSAUR; this experiment uses "
            f"{model_name!r}. Unset tpu.encode_quant.")
    return mode


def calibrate_encode_scales(decomp_model, decomp_vars, videos) -> np.ndarray:
    """Per-block per-dense activation scales (depth, 4) for the int8 ViT
    encode: one compute-dtype ViT pass over ``videos`` (B, T, H, W, C),
    amax of every dense input mapped to the int8 grid."""
    amaxes = jax.jit(lambda v, x: decomp_model.apply(
        v, x, method="encode_calibrate"))(decomp_vars, videos)
    scales = np.maximum(np.asarray(amaxes, np.float32), 1e-12) / 127.0
    if not np.all(np.isfinite(scales)):
        raise ValueError(
            f"int8 encode calibration produced non-finite scales: {scales}")
    return scales


def lazy_quantized_stage(build_stage, slots_of, decomp_model, decomp_vars,
                         on_scales=None, log=print):
    """First call calibrates on that call's inputs, builds the quantized
    stage, and reuses it from then on — the shared wiring for both
    evaluators and the serving pipeline (one implementation so
    thread-safety/logging/recalibration fixes cannot drift).

    ``build_stage(scales)`` -> the stage callable; ``slots_of(*args)`` ->
    the (N, S, D) calibration slots for the first call's arguments;
    ``on_scales(np_scales)`` optional hook (evaluators stash them on self).
    The returned callable exposes ``.inner()`` -> the built stage (or None
    before calibration) for AOT export.

    First-call calibration is guarded by a lock so concurrent callers (the
    serving pipeline dispatches from worker threads) cannot calibrate/build
    twice; steady-state calls take the lock-free fast path."""
    import threading

    import jax.numpy as jnp

    holder = {}
    init_lock = threading.Lock()

    def stage(*args):
        if "stage" not in holder:
            with init_lock:
                if "stage" not in holder:
                    scales = calibrate_decode_scales(
                        decomp_model, decomp_vars, slots_of(*args))
                    if on_scales is not None:
                        on_scales(scales)
                    log(f"int8 decode calibration: scales={scales.tolist()}")
                    holder["stage"] = build_stage(jnp.asarray(scales))
        return holder["stage"](*args)

    stage.inner = lambda: holder.get("stage")
    return stage


def lazy_encode_quantized_stage(build_stage, videos_of, decomp_model,
                                decomp_vars, on_scales=None, log=print):
    """Encode-side sibling of :func:`lazy_quantized_stage`: first call
    calibrates the (depth, 4) ViT activation scales on that call's seed
    frames, builds the int8-encode stage, and reuses it from then on.

    ``build_stage(encode_scales)`` -> the stage callable (which may itself be
    a decode-lazy wrapper — compose encode OUTSIDE decode so one first call
    calibrates both); ``videos_of(*args, **kwargs)`` -> the (B, T, H, W, C)
    calibration frames for the first call's arguments. Note the decode
    calibration then sees compute-dtype (not int8-encoded) slots — the
    standard PTQ approximation, same class as calibrating on batch 1 only.

    First-call calibration is lock-guarded like :func:`lazy_quantized_stage`
    so concurrent first callers cannot calibrate/build twice."""
    import threading

    import jax.numpy as jnp

    holder = {}
    init_lock = threading.Lock()

    def stage(*args, **kwargs):
        if "stage" not in holder:
            with init_lock:
                if "stage" not in holder:
                    scales = calibrate_encode_scales(
                        decomp_model, decomp_vars,
                        videos_of(*args, **kwargs))
                    if on_scales is not None:
                        on_scales(scales)
                    log(f"int8 encode calibration: (depth, 4) scales, "
                        f"max={scales.max():.4g} min={scales.min():.4g}")
                    holder["stage"] = build_stage(jnp.asarray(scales))
        return holder["stage"](*args, **kwargs)

    def _inner():
        s = holder.get("stage")
        return s.inner() if hasattr(s, "inner") else s

    stage.inner = _inner
    return stage


def calibrate_decode_scales(decomp_model, decomp_vars, slots) -> np.ndarray:
    """Per-layer activation scales (L,) for the int8 decoder tail.

    Runs the bf16 tail once on ``slots`` (a representative (N, S, D) batch —
    predicted slots in the evaluator, the warmup sample in serving) and maps
    each layer's input amax to the int8 grid. One extra bf16 decode-tail
    pass, paid once per run."""
    amaxes = jax.jit(lambda v, s: decomp_model.apply(
        v, s, method="decode_calibrate"))(decomp_vars, slots)
    scales = np.maximum(np.asarray(amaxes, np.float32), 1e-12) / 127.0
    if not np.all(np.isfinite(scales)):
        raise ValueError(
            f"int8 decode calibration produced non-finite scales: {scales}")
    return scales
