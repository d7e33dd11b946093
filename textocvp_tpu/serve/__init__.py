from textocvp_tpu.serve.pipeline import PredictionService
from textocvp_tpu.serve.server import serve


def __getattr__(name):
    # lazy: jax.export is only needed for AOT artifact workflows
    if name in ("export_service", "ExportedPredictionService"):
        from textocvp_tpu.serve import export as _e

        return getattr(_e, name)
    if name == "DynamicBatcher":
        from textocvp_tpu.serve.batching import DynamicBatcher

        return DynamicBatcher
    raise AttributeError(name)


__all__ = ["PredictionService", "serve", "export_service",
           "ExportedPredictionService", "DynamicBatcher"]
