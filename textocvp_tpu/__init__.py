"""
textocvp_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for text-conditioned
object-centric video prediction.

Provides the full capability surface of the TextOCVP reference (object-centric
decomposition via SAVi / ExtendedDINOSAUR, text-conditioned transformer
predictors, two-stage training, evaluation with PSNR/SSIM/LPIPS, figure/GIF
generation and an experiment-directory workflow), re-designed TPU-first:

* Stage-1 frame recurrence runs as ``lax.scan`` with the frame encoder batched
  over ``B*T`` frames in a single MXU-friendly convolution/ViT call.
* The autoregressive predictor rollout is one jitted program using a static
  ring buffer (masked attention) and cached text cross-attention K/V.
* Data parallelism is SPMD over a ``jax.sharding.Mesh`` rather than
  replicate-and-gather.
* Hot inner loops (slot attention) have fused Pallas TPU kernels with pure-XLA
  fallbacks.
"""

__version__ = "0.1.0"
