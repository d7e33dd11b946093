"""
Custom transformer text encoder (reference
src/models/EncodersDecoders/text_encoders.py:14-138).

Token + position embeddings -> LayerNorm -> zero out padding embeddings ->
post-norm torch-style transformer encoder layers with key-padding masking ->
LayerNorm + Linear projection to the predictor token dim.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import TorchStyleEncoderLayer


class TransformerTextEncoder(nn.Module):
    input_dim: int
    num_layers: int
    num_heads: int
    output_dim: int
    vocab_size: int
    context_length: int = 50
    dropout: float = 0.1
    padding_idx: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text, text_length, deterministic: bool = True):
        """
        text: (B, L) int tokens; text_length: (B,) true lengths.
        Returns (B, L, output_dim).
        """
        b, l = text.shape
        tok_emb = nn.Embed(
            self.vocab_size, self.input_dim,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, name="token_embedding",
        )(text)
        positions = jnp.broadcast_to(jnp.arange(l)[None], (b, l))
        pos_emb = nn.Embed(
            self.context_length, self.input_dim,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, name="position_embedding",
        )(positions)
        x = nn.LayerNorm(epsilon=1e-8, dtype=self.dtype, name="ln_in")(tok_emb + pos_emb)
        if self.dropout > 0 and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)

        # zero out padding-token embeddings (reference text_encoders.py:110-111)
        x = x * (text != self.padding_idx)[..., None].astype(x.dtype)

        # key-padding mask: True = attend. Position i (0-indexed) is valid iff
        # i+1 <= length (reference builds the inverse with cumsum, :112-113).
        keep = (jnp.arange(l)[None, :] + 1) <= text_length[:, None]
        attn_mask = keep[:, None, :] & jnp.ones((b, l, 1), dtype=bool)  # (B, Q, K)

        for i in range(self.num_layers):
            x = TorchStyleEncoderLayer(
                d_model=self.input_dim,
                nhead=self.num_heads,
                dim_feedforward=self.input_dim * 4,
                dropout=self.dropout,
                activation="gelu",
                norm_first=False,  # torch TransformerEncoderLayer default
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, mask=attn_mask, deterministic=deterministic)

        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="out_projection")(x)
