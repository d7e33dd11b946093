"""
T5 encoder stack in flax (for the frozen "t5-small" text encoder used by
TextOCVP_T5, reference text_cond_OCVP.py:141-151).

Implements the full T5 encoder semantics: RMSNorm (pre-norm, no bias), biasless
linear projections, UNscaled dot-product attention with a shared relative
position bias (bidirectional, 32 buckets, max distance 128, owned by layer 0),
ReLU feed-forward, and a final RMSNorm.

Pretrained weights load from a HuggingFace ``T5EncoderModel`` state_dict via
:func:`import_hf_t5_encoder` when available locally (no network access is
assumed); otherwise the module runs randomly initialized, which preserves
shapes/compute for benchmarking and testing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


T5_SMALL = T5Config()


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.epsilon)
        return (x * scale).astype(self.dtype)


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int = 32, max_distance: int = 128
) -> jax.Array:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, name=name
        )
        b, l, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = dense(inner, "k")(x).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = dense(inner, "v")(x).reshape(b, l, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        # T5 attention is unscaled (the 1/sqrt(d) factor is folded into init)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)

        if self.has_relative_bias:
            rel_emb = self.param(
                "relative_attention_bias",
                nn.initializers.normal(stddev=1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
            )
            pos = jnp.arange(l)
            rel = pos[None, :] - pos[:, None]  # key - query
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            position_bias = jnp.asarray(rel_emb, self.dtype)[buckets]  # (Q, K, H)
            position_bias = position_bias.transpose(2, 0, 1)[None]     # (1, H, Q, K)
        if position_bias is not None:
            scores = scores + position_bias
        if mask is not None:  # (B, K) with 1 = attend
            neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(mask[:, None, None, :].astype(bool), scores, neg)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, l, inner)
        return dense(cfg.d_model, "o")(y), position_bias


class T5EncoderLayer(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.config
        y, position_bias = T5SelfAttention(
            config=cfg, has_relative_bias=self.has_relative_bias,
            dtype=self.dtype, name="attn",
        )(RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_attn")(x),
          mask=mask, position_bias=position_bias)
        x = x + y
        h = RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_ff")(x)
        h = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x + h, position_bias


class T5EncoderStack(nn.Module):
    """Embedding + N encoder layers + final RMSNorm. Inputs: (B, L) token ids
    and an attention_mask (B, L) with 1 = real token."""

    config: T5Config = T5_SMALL
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        emb = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(stddev=1.0),
            dtype=self.dtype, name="shared",
        )
        x = emb(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5EncoderLayer(
                config=cfg, has_relative_bias=(i == 0), dtype=self.dtype, name=f"layer_{i}"
            )(x, mask=attention_mask, position_bias=position_bias)
        return RMSNorm(epsilon=cfg.layer_norm_epsilon, dtype=self.dtype, name="final_ln")(x)


def import_hf_t5_encoder(state_dict: dict, config: T5Config = T5_SMALL) -> dict:
    """
    Convert a HuggingFace T5EncoderModel state_dict (numpy-valued, keys like
    ``encoder.block.0.layer.0.SelfAttention.q.weight``) into this module's
    flax params.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def get(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(f"none of {names} in state_dict")

    p: dict = {"shared": {"embedding": get("shared.weight", "encoder.embed_tokens.weight")}}
    for i in range(config.num_layers):
        pre = f"encoder.block.{i}.layer"
        layer = {
            "ln_attn": {"weight": get(f"{pre}.0.layer_norm.weight")},
            "ln_ff": {"weight": get(f"{pre}.1.layer_norm.weight")},
            "attn": {
                "q": {"kernel": get(f"{pre}.0.SelfAttention.q.weight").T},
                "k": {"kernel": get(f"{pre}.0.SelfAttention.k.weight").T},
                "v": {"kernel": get(f"{pre}.0.SelfAttention.v.weight").T},
                "o": {"kernel": get(f"{pre}.0.SelfAttention.o.weight").T},
            },
            "wi": {"kernel": get(f"{pre}.1.DenseReluDense.wi.weight").T},
            "wo": {"kernel": get(f"{pre}.1.DenseReluDense.wo.weight").T},
        }
        if i == 0:
            layer["attn"]["relative_attention_bias"] = get(
                f"{pre}.0.SelfAttention.relative_attention_bias.weight"
            )
        p[f"layer_{i}"] = layer
    p["final_ln"] = {"weight": get("encoder.final_layer_norm.weight")}
    return p
