"""AOT serving artifacts: serialize a PredictionService's two compiled stages
to StableHLO via ``jax.export``.

Deployment then needs NO model code and NO checkpoints — the exported
modules embed the frozen weights (the service's constant-baked executables)
and replay on any runtime with a compatible jax/XLA, including future
versions (StableHLO forward compatibility). The artifact directory holds:

* ``predict.shlo``  — seed-encode + rollout (videos, key, text...) -> slots
* ``decode.shlo``   — slots -> frames
* ``manifest.json`` — request contract (shapes, token length) + the
  experiment params needed to rebuild the host-side tokenizer

Restore with :class:`ExportedPredictionService`, which mirrors
``PredictionService.predict`` (padding, tokenization, RNG) over the
deserialized modules.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Sequence  # noqa: F401 (doc types)

import numpy as np

import jax  # noqa: F401
import jax.numpy as jnp
from jax import export as jax_export

from textocvp_tpu.serve.pipeline import InferenceFrontend

_MANIFEST = "manifest.json"
_PREDICT = "predict.shlo"
_DECODE = "decode.shlo"


def export_service(service, out_dir) -> Path:
    """Serialize ``service``'s compiled stages. Requires a service whose
    weights were constant-baked (small models); argument-passing services
    (ViT-scale) would need the weight pytrees shipped separately — not
    supported here."""
    from textocvp_tpu.serve.pipeline import PredictionService  # noqa: F401

    if getattr(service, "mesh", None) is not None:
        raise ValueError(
            "AOT export is single-device by design (exported StableHLO "
            "replays carry no mesh); build the service without mesh_axes "
            "to export")
    predict_stage = service._predict_stage
    if getattr(service, "_encode_quant_mode", None):
        # int8-encode services export the calibrated inner stage (scales
        # baked); calibration happens on the first request, so warmup()
        # must run before export
        predict_stage = getattr(predict_stage, "inner", lambda: None)()
        if predict_stage is None:
            raise ValueError(
                "quantized service (tpu.encode_quant) has not been "
                "calibrated yet — call service.calibrate(real_frames, "
                "captions) (preferred: the exported artifact bakes these "
                "scales permanently) or service.warmup() before export")
    if getattr(predict_stage, "lower", None) is None:
        raise ValueError(
            "service weights exceed the constant-bake limit; AOT export "
            "requires the baked configuration (see models/chunked.py)")
    decode_stage = service._decode_stage
    if getattr(service, "_quant_mode", None):
        # int8 services export the calibrated inner stage (scales baked);
        # calibration happens on the first request, so warmup() must run
        # before export
        decode_stage = getattr(decode_stage, "inner", lambda: None)()
        if decode_stage is None:
            raise ValueError(
                "quantized service (tpu.decode_quant) has not been "
                "calibrated yet — call service.calibrate(real_frames, "
                "captions) (preferred: the exported artifact bakes these "
                "scales permanently) or service.warmup() before export")
    if getattr(decode_stage, "lower", None) is None:
        raise ValueError(
            "the decode stage is not a plain jitted function — build the "
            "service without tpu.decode_autotune to export (the exported "
            "artifact is a single fixed schedule by design)")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # trace at the batch the live stages were compiled for (may be padded
    # up from the operator's request cap for mesh divisibility)
    b = getattr(service, "_compiled_batch", service.batch_size)
    h, w = service.resolution
    wire_dtype = getattr(service, "wire_dtype", "float32")
    videos = jax.ShapeDtypeStruct(
        (b, service.num_context, h, w, 3),
        jnp.uint8 if wire_dtype == "uint8" else jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    text_kwargs = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype)
        for k, v in service._tokenize([service._warmup_caption()] * b).items()
    }

    exp_predict = jax_export.export(predict_stage)(
        videos, key, **{k: v for k, v in text_kwargs.items()})
    slots_spec = jax.ShapeDtypeStruct(exp_predict.out_avals[0].shape,
                                      exp_predict.out_avals[0].dtype)
    exp_decode = jax_export.export(decode_stage)(slots_spec)

    (out / _PREDICT).write_bytes(exp_predict.serialize())
    (out / _DECODE).write_bytes(exp_decode.serialize())
    manifest = {
        "batch_size": b,
        "num_context": service.num_context,
        "num_preds": service.num_preds,
        "resolution": [h, w],
        "max_tokens": service.max_tokens,
        "text_kwargs": {k: [list(v.shape), str(np.dtype(v.dtype))]
                        for k, v in text_kwargs.items()},
        "dataset": service.exp_params["dataset"],
        # honesty flags: the exported stages are int8-quantized (scales baked)
        "decode_quant": getattr(service, "_quant_mode", None),
        "encode_quant": getattr(service, "_encode_quant_mode", None),
        # input wire dtype the executable was traced at (data/wire.py)
        "wire_dtype": wire_dtype,
    }
    (out / _MANIFEST).write_text(json.dumps(manifest, indent=2))
    return out


class ExportedPredictionService(InferenceFrontend):
    """Drop-in ``predict()`` over an exported artifact directory — no model
    code, no checkpoints, no experiment directory. Host-side request handling
    (tokenize/validate/pad/RNG) is inherited from InferenceFrontend, so the
    exported behavior cannot drift from the live service's."""

    def __init__(self, artifact_dir):
        from textocvp_tpu.serve.pipeline import _serving_tokenizer

        d = Path(artifact_dir)
        manifest = json.loads((d / _MANIFEST).read_text())
        self.batch_size = manifest["batch_size"]
        self.num_context = manifest["num_context"]
        self.num_preds = manifest["num_preds"]
        self.resolution = tuple(manifest["resolution"])
        self.max_tokens = manifest["max_tokens"]
        self.wire_dtype = manifest.get("wire_dtype", "float32")
        self._text_spec = manifest["text_kwargs"]
        self.tokenizer = _serving_tokenizer({"dataset": manifest["dataset"]})

        predict_call = jax_export.deserialize((d / _PREDICT).read_bytes()).call
        decode_call = jax_export.deserialize((d / _DECODE).read_bytes()).call
        self._predict_stage = lambda videos, key, **kw: predict_call(
            videos, jnp.asarray(key, jnp.uint32), **kw)
        self._decode_stage = decode_call
        self._lock = threading.Lock()
        self._counter = 0

    def _finalize_token(self, key: str, v: np.ndarray) -> np.ndarray:
        # coerce to the dtype recorded at export time
        return v.astype(self._text_spec[key][1])
