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
    # Parse the threshold BEFORE touching jax.config so a malformed env value
    # warns instead of leaving the config half-applied.
    min_secs = None
    raw = os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
    if raw is not None:
        try:
            min_secs = float(raw)
        except ValueError:
            import warnings

            warnings.warn(
                "ignoring unparseable "
                f"JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS={raw!r}")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if min_secs is not None:
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              min_secs)
    except Exception:  # jax absent/old: the cache is an optimization only
        pass


def _honor_jax_platforms_env():
    """Re-assert JAX_PLATFORMS over any in-process override.

    Some runtimes register a TPU plugin from ``sitecustomize`` and call
    ``jax.config.update("jax_platforms", ...)`` at interpreter start, which
    silently wins over the user's ``JAX_PLATFORMS`` env var — so e.g.
    ``JAX_PLATFORMS=cpu python src/02_train_decomp.py`` would still run on the
    remote TPU. Applying the env var via config.update (before any device
    query) restores the documented env-var semantics for every CLI entry."""
    import os

    platforms = os.environ.get("JAX_PLATFORMS")
    if not platforms:
        return
    try:
        import jax

        if jax.config.jax_platforms != platforms:
            jax.config.update("jax_platforms", platforms)
    except Exception:  # jax absent/old: nothing to re-assert
        pass


_enable_compilation_cache()
_honor_jax_platforms_env()
