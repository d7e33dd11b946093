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


def _enable_compilation_cache():
    """Honor JAX_COMPILATION_CACHE_DIR even on jax versions where the env var
    alone is ignored (this runtime needs the explicit config update). The
    persistent cache makes repeat CLI invocations compile-free — XLA compile
    dominates cold-start for every entry point."""
    import os

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        min_secs = os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
        if min_secs is not None:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              float(min_secs))
    except Exception:  # jax absent/old: the cache is an optimization only
        pass


_enable_compilation_cache()
