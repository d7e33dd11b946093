"""
Slot initializers (reference src/models/Blocks/initializers.py).

``LearnedRandomInit`` samples from a learned Gaussian at *every* call,
including evaluation (reference initializers.py:87-94) — callers must thread
an explicit ``jax.random`` key, which makes this reproducible under jit.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_limit(slot_dim: int) -> float:
    return math.sqrt(6.0 / (1 + slot_dim))


class LearnedInit(nn.Module):
    """Fixed learned slots, tiled over the batch (reference initializers.py:39-61)."""

    num_slots: int
    slot_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int, rng=None):
        limit = _uniform_limit(self.slot_dim)
        slots = self.param(
            "slots",
            lambda key, shape: jax.random.uniform(key, shape, minval=-limit, maxval=limit),
            (self.num_slots, self.slot_dim),
        )
        slots = jnp.asarray(slots, self.dtype)
        return jnp.broadcast_to(slots[None], (batch_size, self.num_slots, self.slot_dim))


class LearnedRandomInit(nn.Module):
    """
    Gaussian sampling with learned mean/std, stochastic at every call
    (reference initializers.py:65-94).
    """

    num_slots: int
    slot_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch_size: int, rng=None):
        limit = _uniform_limit(self.slot_dim)
        init = lambda key, shape: jax.random.uniform(key, shape, minval=-limit, maxval=limit)
        mu = self.param("slots_mu", init, (1, 1, self.slot_dim))
        sigma = self.param("slots_sigma", init, (1, 1, self.slot_dim))
        if rng is None:
            rng = self.make_rng("slots")
        noise = jax.random.normal(rng, (batch_size, self.num_slots, self.slot_dim))
        mu = jnp.asarray(mu, self.dtype)
        sigma = jnp.asarray(sigma, self.dtype)
        return mu + sigma * noise.astype(self.dtype)


def get_initializer(mode: str, slot_dim: int, num_slots: int, dtype=jnp.float32):
    """Initializer factory (reference initializers.py:11-35)."""
    if mode == "Learned":
        return LearnedInit(num_slots=num_slots, slot_dim=slot_dim, dtype=dtype)
    if mode == "LearnedRandom":
        return LearnedRandomInit(num_slots=num_slots, slot_dim=slot_dim, dtype=dtype)
    raise ValueError(f"{mode!r} is not a recognized initializer. Use 'Learned'|'LearnedRandom'")
