from textocvp_tpu.serve.pipeline import PredictionService
from textocvp_tpu.serve.server import serve

__all__ = ["PredictionService", "serve"]
