"""
Slot Attention (Locatello et al. 2020) — iterative inverted cross-attention
with GRU slot refinement (reference src/models/Blocks/attention.py:12-128).

Semantics per iteration (identical to the reference):
    slots_prev = slots
    slots = LN(slots); q = W_q slots
    dots = q k^T * dim_feats^-0.5              # scale uses the INPUT feature dim
    attn = softmax(dots, axis=slots) + eps     # competition across slots
    attn = attn / attn.sum(axis=locations)     # weighted-mean renorm
    updates = attn v
    slots = GRU(updates, slots_prev)
    slots = slots + MLP(LN(slots))

The inputs are layer-normed and projected to K/V once; the number of
iterations is a static Python int (3 for the first frame, 1 afterwards in the
stock configs), so each variant is traced/fused separately by XLA.

``impl='xla'`` lowers to plain jnp ops (fully fused by XLA for these small
shapes); ``impl='pallas'`` dispatches to the fused Pallas TPU kernel in
:mod:`textocvp_tpu.ops.pallas.slot_attention_kernel`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import MLP, xavier_uniform

Dtype = Any


class SlotAttention(nn.Module):
    dim_feats: int
    dim_slots: int
    num_slots: int
    mlp_hidden: int = 128
    epsilon: float = 1e-8
    impl: str = "xla"  # "xla" | "pallas"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm_input = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)
        self.norm_slot = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)
        self.norm_mlp = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)
        self.to_q = nn.Dense(self.dim_slots, kernel_init=xavier_uniform, dtype=self.dtype)
        self.to_k = nn.Dense(self.dim_slots, kernel_init=xavier_uniform, dtype=self.dtype)
        self.to_v = nn.Dense(self.dim_slots, kernel_init=xavier_uniform, dtype=self.dtype)
        # GRU: zero biases, orthogonal recurrent kernel, xavier input kernel
        # (reference SAVi.py:278-293).
        self.gru = nn.GRUCell(
            features=self.dim_slots,
            kernel_init=xavier_uniform,
            recurrent_kernel_init=nn.initializers.orthogonal(),
            dtype=self.dtype,
        )
        self.mlp = MLP([self.mlp_hidden, self.dim_slots], dtype=self.dtype)

    def project_inputs(self, inputs: jax.Array) -> tuple[jax.Array, jax.Array]:
        """LayerNorm the encoder features and project to K/V once per frame."""
        inputs = self.norm_input(inputs)
        return self.to_k(inputs), self.to_v(inputs)

    def iterate(
        self, k: jax.Array, v: jax.Array, slots: jax.Array, num_iters: int
    ) -> tuple[jax.Array, jax.Array]:
        """
        Run ``num_iters`` refinement iterations. Returns (slots, attn) where
        attn is the last iteration's (B, num_slots, num_locations) attention
        (pre-renormalization), used as the object segmentation masks.
        """
        # during init the params don't exist yet — trace the XLA path so the
        # module self-initializes regardless of impl
        if self.impl == "pallas" and not self.is_initializing():
            from textocvp_tpu.ops.pallas.slot_attention_kernel import slot_attention_iterations

            return slot_attention_iterations(
                k=k, v=v, slots=slots, num_iters=num_iters,
                params=self._iteration_params(), epsilon=self.epsilon,
                scale=self.dim_feats ** -0.5,
            )
        scale = self.dim_feats ** -0.5
        attn_out = None
        for _ in range(num_iters):
            slots_prev = slots
            q = self.to_q(self.norm_slot(slots))
            dots = jnp.einsum("bsd,bnd->bsn", q, k) * scale
            attn = jax.nn.softmax(dots.astype(jnp.float32), axis=1).astype(dots.dtype)
            attn = attn + self.epsilon
            attn_out = attn
            attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
            updates = jnp.einsum("bsn,bnd->bsd", attn, v)
            b = slots.shape[0]
            flat_updates = updates.reshape(-1, self.dim_slots)
            flat_prev = slots_prev.reshape(-1, self.dim_slots)
            new_h, _ = self.gru(flat_prev, flat_updates)
            slots = new_h.reshape(b, -1, self.dim_slots)
            slots = slots + self.mlp(self.norm_mlp(slots))
        return slots, attn_out

    def __call__(
        self, inputs: jax.Array, slots: jax.Array, num_iters: int = 2
    ) -> tuple[jax.Array, jax.Array]:
        """
        inputs: (B, num_locations, dim_feats); slots: (B, num_slots, dim_slots).
        Returns (refined_slots, attention_masks).
        """
        k, v = self.project_inputs(inputs)
        return self.iterate(k, v, slots, num_iters)

    def _iteration_params(self) -> dict:
        """Raw parameter arrays for the fused Pallas kernel."""
        def dense_params(mod):
            return {"kernel": mod.variables["params"]["kernel"],
                    "bias": mod.variables["params"].get("bias")}

        gru_p = self.gru.variables["params"]
        return {
            "norm_slot": {"scale": self.norm_slot.variables["params"]["scale"],
                          "bias": self.norm_slot.variables["params"]["bias"]},
            "norm_mlp": {"scale": self.norm_mlp.variables["params"]["scale"],
                         "bias": self.norm_mlp.variables["params"]["bias"]},
            "to_q": dense_params(self.to_q),
            "gru": gru_p,
            "mlp": self.mlp.variables["params"],
        }
