"""
Test configuration: force the CPU backend with 8 virtual devices so mesh/pjit
logic is exercised without TPU hardware (standard JAX fake-backend idiom).
Must run before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: the suite is dominated by XLA CPU compiles;
# repeat runs become compile-free (textocvp_tpu/__init__ applies the config —
# this jax version ignores the bare env var)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/textocvp_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import textocvp_tpu  # noqa: E402,F401  (enables the compilation cache)

import jax  # noqa: E402

# The environment's sitecustomize may have registered a TPU plugin at
# interpreter startup; config.update still forces the CPU backend as long as
# no device query has happened yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(14)
