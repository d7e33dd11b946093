"""
Neural building blocks (flax.linen, NHWC layout, TPU-first).

Functionally equivalent to the reference block library
(``src/models/Blocks/model_blocks.py`` and ``src/models/Blocks/attention.py``)
but designed for XLA: static shapes, channels-last convolutions, boolean
attention masks (enabling the static ring-buffer rollout), and a compute-dtype
knob so matmuls can run in bfloat16 on the MXU with float32 parameters.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


def build_grid(resolution: Sequence[int], vmin: float = -1.0, vmax: float = 1.0) -> np.ndarray:
    """
    4-channel coordinate grid with gradients in (x, -x, y, -y), used as a soft
    positional encoding (reference model_utils.py:12-34). Shape (H, W, 4).
    """
    ranges = [np.linspace(vmin, vmax, num=res) for res in resolution]
    grid = np.meshgrid(*ranges, sparse=False, indexing="ij")
    grid = np.stack(grid, axis=-1).reshape(resolution[0], resolution[1], -1)
    grid = grid.astype(np.float32)
    return np.concatenate([grid, 1.0 - grid], axis=-1)


class MLP(nn.Module):
    """Linear -> ReLU -> ... -> Linear."""

    features: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, kernel_init=xavier_uniform, dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class ConvBlock(nn.Module):
    """
    Conv -> (BatchNorm) -> (MaxPool) -> (ReLU), NHWC
    (reference model_blocks.py:49-108).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    batch_norm: bool = False
    max_pool: Optional[int] = None
    activation: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.kernel_size // 2,
            kernel_init=xavier_uniform,
            dtype=self.dtype,
            name="Conv_0",
        )
        if self.batch_norm:
            self.bn = nn.BatchNorm(dtype=self.dtype, name="BatchNorm_0")

    def __call__(self, x, train: bool = False):
        x = self.conv(x)
        if self.batch_norm:
            x = self.bn(x, use_running_average=not train)
        if self.max_pool:
            x = nn.max_pool(
                x,
                (self.max_pool, self.max_pool),
                strides=(self.max_pool, self.max_pool),
            )
        if self.activation:
            x = nn.relu(x)
        return x


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor upsampling for NHWC tensors (reference Upsample, :23-45)."""
    if scale == 1:
        return x
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def upsample_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize for NHWC tensors (torch align_corners=False semantics).

    antialias=False: torch's F.interpolate does not antialias by default, and
    jax.image.resize does — on a DOWNSAMPLING resize (e.g. the MLPPatchDecoder
    CNN head's 128->112 at patch_size=14) the filters differ well beyond 1e-4.
    """
    return jax.image.resize(
        x, (x.shape[0], out_hw[0], out_hw[1], x.shape[3]), method="bilinear",
        antialias=False,
    )


class ConvTransposeBlock(nn.Module):
    """
    ConvTranspose (or Conv) -> (BatchNorm) -> (Upsample) -> (ReLU), NHWC
    (reference model_blocks.py:112-182; defined for capability parity — no
    shipped reference config instantiates it).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    batch_norm: bool = False
    upsample: Optional[int] = None
    activation: bool = True
    conv_transpose_2d: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        pad = self.kernel_size // 2
        if self.conv_transpose_2d:
            # torch ConvTranspose2d 'padding' REMOVES rows/cols from the
            # output; flax expresses the same op via explicit padding
            self.conv = nn.ConvTranspose(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(self.kernel_size - 1 - pad, self.kernel_size - 1 - pad)] * 2,
                kernel_init=xavier_uniform,
                dtype=self.dtype,
                name="Conv_0",
            )
        else:
            self.conv = nn.Conv(
                self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=pad,
                kernel_init=xavier_uniform,
                dtype=self.dtype,
                name="Conv_0",
            )
        if self.batch_norm:
            self.bn = nn.BatchNorm(dtype=self.dtype, name="BatchNorm_0")

    def __call__(self, x, train: bool = False):
        x = self.conv(x)
        if self.batch_norm:
            x = self.bn(x, use_running_average=not train)
        if self.upsample:
            x = upsample_nearest(x, self.upsample)
        if self.activation:
            x = nn.relu(x)
        return x


class SoftPositionEmbed(nn.Module):
    """
    Soft positional embedding: a 4-channel coordinate grid projected to
    ``hidden_size`` channels by a learned 1x1 projection and added to the
    input features (reference model_blocks.py:186-226). Input is NHWC.
    """

    hidden_size: int
    resolution: Sequence[int]
    dtype: Dtype = jnp.float32

    def setup(self):
        self.projection = nn.Dense(
            self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype, name="Dense_0"
        )

    def pos_map(self):
        """The projected positional map (H, W, hidden_size)."""
        grid = jnp.asarray(build_grid(self.resolution), dtype=self.dtype)
        return self.projection(grid)

    def __call__(self, x):
        return x + self.pos_map()[None]


# --------------------------------------------------------------------------- attention


def _dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
) -> jax.Array:
    """
    q: (..., Q, D), k/v: (..., K, D); mask: broadcastable to (..., Q, K) with
    True = attend. Softmax computed in float32 for stability regardless of the
    compute dtype.
    """
    dots = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    if mask is not None:
        dots = jnp.where(mask, dots, jnp.finfo(dots.dtype).min)
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dots.dtype)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)
    return jnp.einsum("...qk,...kd->...qd", attn, v)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, H*Dh) -> (B, H, N, Dh)."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, N, Dh) -> (B, N, H*Dh)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


class MultiHeadSelfAttention(nn.Module):
    """
    Multi-head self-attention with bias-free projections
    (reference attention.py:136-265).
    """

    emb_dim: int
    num_heads: int = 8
    dropout: float = 0.0
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        assert self.emb_dim % self.num_heads == 0
        dim_head = self.emb_dim // self.num_heads
        dense = lambda name: nn.Dense(
            self.emb_dim, use_bias=self.use_bias, kernel_init=xavier_uniform,
            dtype=self.dtype, name=name,
        )
        q = _split_heads(dense("q")(x), self.num_heads)
        k = _split_heads(dense("k")(x), self.num_heads)
        v = _split_heads(dense("v")(x), self.num_heads)
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        if mask is not None and mask.ndim == 3:  # (B, Q, K) -> (B, 1, Q, K)
            mask = mask[:, None]
        y = _dot_product_attention(
            q, k, v, scale=dim_head ** -0.5, mask=mask,
            dropout_rate=self.dropout, deterministic=deterministic, dropout_rng=rng,
        )
        y = _merge_heads(y)
        return dense("out")(y)


class MultiHeadCrossAttention(nn.Module):
    """
    Multi-head cross-attention; queries attend over encoder features
    (reference attention.py:269-319).
    """

    emb_dim: int
    dim_head: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.dim_head * self.num_heads
        dense = lambda feats: nn.Dense(
            feats, use_bias=False, kernel_init=xavier_uniform, dtype=self.dtype
        )
        self.q = dense(inner)
        self.k = dense(inner)
        self.v = dense(inner)
        self.out = nn.Dense(self.emb_dim, kernel_init=xavier_uniform, dtype=self.dtype)

    def __call__(self, feats, queries, kv_mask=None, deterministic: bool = True):
        return self.attend(self.q(queries), self.k(feats), self.v(feats),
                           kv_mask, deterministic)

    def attend(self, q, k, v, kv_mask=None, deterministic: bool = True):
        """Attention + output projection given already-projected q/k/v (B, N, H*Dh)."""
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        mask = None
        if kv_mask is not None:  # (B, K) -> (B, 1, 1, K)
            mask = kv_mask[:, None, None, :]
        rng = self.make_rng("dropout") if (self.dropout > 0 and not deterministic) else None
        y = _dot_product_attention(
            q, k, v, scale=self.dim_head ** -0.5, mask=mask,
            dropout_rate=self.dropout, deterministic=deterministic, dropout_rng=rng,
        )
        y = _merge_heads(y)
        return self.out(y)

    def project_kv(self, feats):
        """Project text/encoder features to K, V once (for rollout KV caching)."""
        return self.k(feats), self.v(feats)

    def project_q(self, queries):
        return self.q(queries)


class TransformerBlock(nn.Module):
    """
    Transformer encoder block, pre- or post-norm; post-norm is used as the
    SAVi transition module (reference attention.py:323-396,
    transition_models.py:12-39).
    """

    embed_dim: int
    num_heads: int
    mlp_size: int
    pre_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MultiHeadSelfAttention(
            emb_dim=self.embed_dim, num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )
        mlp = MLP([self.mlp_size, self.embed_dim], dtype=self.dtype, name="mlp")
        ln_q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_query")
        ln_m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_mlp")
        if self.pre_norm:
            y = attn(ln_q(x), mask=mask, deterministic=deterministic) + x
            z = mlp(ln_m(y)) + y
        else:
            y = ln_q(attn(x, mask=mask, deterministic=deterministic) + x)
            z = ln_m(mlp(y) + y)
        return z


class TransformerDecoderBlock(nn.Module):
    """
    Cross-attention-only decoder block: LN(q), LN(kv) -> cross-attn -> +res ->
    LN -> MLP -> +res (reference attention.py:400-467).
    """

    embed_dim: int
    head_dim: int
    kv_dim: int
    num_heads: int
    mlp_size: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln_q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.ln_kv = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.ln_mlp = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.cross_attn = MultiHeadCrossAttention(
            emb_dim=self.embed_dim, dim_head=self.head_dim,
            num_heads=self.num_heads, dtype=self.dtype,
        )
        self.mlp = MLP([self.mlp_size, self.embed_dim], dtype=self.dtype)

    def __call__(self, queries, feats, kv_mask=None, deterministic: bool = True):
        z = self.cross_attn(
            self.ln_kv(feats), self.ln_q(queries),
            kv_mask=kv_mask, deterministic=deterministic,
        ) + queries
        return self.mlp(self.ln_mlp(z)) + z

    def project_kv(self, feats):
        """Precompute text K/V after the kv LayerNorm (rollout-invariant)."""
        return self.cross_attn.project_kv(self.ln_kv(feats))

    def call_cached(self, queries, k, v, kv_mask=None, deterministic: bool = True):
        """Forward using precomputed K/V from :meth:`project_kv`."""
        q = self.cross_attn.project_q(self.ln_q(queries))
        z = self.cross_attn.attend(q, k, v, kv_mask=kv_mask,
                                   deterministic=deterministic) + queries
        return self.mlp(self.ln_mlp(z)) + z


class AdaptedEncoderBlock(nn.Module):
    """
    TextOCVP predictor layer: self-attention over slot tokens, cross-attention
    to text embeddings, then MLP (reference attention.py:471-534).

    Supports an optional self-attention mask (for the static ring buffer) and
    cached text K/V (pass ``text_kv`` instead of ``text_embeddings``).
    """

    embed_dim: int
    num_heads: int
    mlp_size: int
    fusion_num_heads: int
    fusion_head_dim: int
    fusion_mlp_size: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln_query = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.ln_mlp = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.attn = MultiHeadSelfAttention(
            emb_dim=self.embed_dim, num_heads=self.num_heads, dtype=self.dtype
        )
        self.mlp = MLP([self.mlp_size, self.embed_dim], dtype=self.dtype)
        self.cross_attention = TransformerDecoderBlock(
            embed_dim=self.embed_dim, head_dim=self.fusion_head_dim,
            kv_dim=self.embed_dim, num_heads=self.fusion_num_heads,
            mlp_size=self.fusion_mlp_size, dtype=self.dtype,
        )

    def __call__(
        self,
        x,
        text_embeddings=None,
        text_kv=None,
        self_mask=None,
        text_mask=None,
        deterministic: bool = True,
    ):
        y = self.attn(self.ln_query(x), mask=self_mask, deterministic=deterministic) + x
        if text_kv is not None:
            z = self.cross_attention.call_cached(
                y, *text_kv, kv_mask=text_mask, deterministic=deterministic
            )
        elif text_embeddings is not None:
            z = self.cross_attention(
                y, text_embeddings, kv_mask=text_mask, deterministic=deterministic
            )
        else:
            z = y
        z = self.mlp(self.ln_mlp(z))
        return z + y

    def project_text_kv(self, text_embeddings):
        return self.cross_attention.project_kv(text_embeddings)


class TorchStyleEncoderLayer(nn.Module):
    """
    Pre/post-norm transformer encoder layer matching
    ``torch.nn.TransformerEncoderLayer`` (biases in all projections,
    eps=1e-5), used by the unconditioned predictors and the custom text
    encoder (reference OCVP.py:81-89, text_encoders.py:45-52).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"
    norm_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MultiHeadSelfAttention(
            emb_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            use_bias=True, dtype=self.dtype, name="self_attn",
        )
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        act = nn.relu if self.activation == "relu" else nn.gelu

        def ff(h):
            h = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                         dtype=self.dtype, name="linear1")(h)
            h = act(h)
            if self.dropout > 0 and not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            return nn.Dense(self.d_model, kernel_init=xavier_uniform,
                            dtype=self.dtype, name="linear2")(h)

        if self.norm_first:
            x = x + attn(ln1(x), mask=mask, deterministic=deterministic)
            x = x + ff(ln2(x))
        else:
            x = ln1(x + attn(x, mask=mask, deterministic=deterministic))
            x = ln2(x + ff(x))
        return x


# --------------------------------------------------------------------- positional encodings


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal PE table, shape (max_len, d_model)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class SlotPositionalEncoding(nn.Module):
    """
    Sinusoidal per-timestep PE shared across all slots of a frame, preserving
    slot permutation equivariance (reference model_blocks.py:230-290).
    Input: (B, T, S, D); oldest frame gets pe[0].

    ``offset`` (a traced scalar) supports the zero-padded static ring buffer:
    frame index ``i`` receives ``pe[i - offset]`` so the oldest *valid* frame
    gets ``pe[0]``, exactly like the reference's shorter dynamic window
    (padding frames clamp to ``pe[0]``; they are masked out of attention).
    """

    d_model: int
    max_len: int = 50
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset=None, deterministic: bool = True):
        t = x.shape[1]
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model), dtype=self.dtype)
        if offset is None:
            x = x + pe[None, :t, None, :]
        else:
            idx = jnp.maximum(jnp.arange(t) - offset, 0)
            x = x + jnp.take(pe, idx, axis=0)[None, :, None, :]
        if self.dropout > 0 and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class TemporalPositionalEncoding(nn.Module):
    """
    Per-timestep PE, *flipped* so the newest frame always receives a fixed
    embedding regardless of the window length (reference
    model_blocks.py:294-390, flip at :376). Input: (B, T, S, D); the newest
    frame (index T-1) gets pe[0].

    For the static ring-buffer rollout, :meth:`table` exposes the raw table so
    the caller can gather embeddings by token age.
    """

    d_model: int
    max_len: int = 50
    mode: str = "sinusoid"  # "sinusoid" | "learned"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.mode == "learned":
            self.pe = self.param(
                "pe",
                lambda key, shape: (shape[-1] ** -0.5) * jax.random.normal(key, shape),
                (self.max_len, self.d_model),
            )
        elif self.mode == "sinusoid":
            self.pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        else:
            raise ValueError(f"Unknown temporal PE mode {self.mode!r}")

    def table(self):
        """PE table indexed by token age: table()[0] is the newest frame."""
        return jnp.asarray(self.pe, dtype=self.dtype)

    def __call__(self, x, deterministic: bool = True):
        t = x.shape[1]
        pe = self.table()[:t][::-1]  # newest (last) frame gets pe[0]
        return x + pe[None, :, None, :]


class LearnedPositionalEncoding1D(nn.Module):
    """Learned 1D PE (reference model_blocks.py:394-410). Input (B, N, D)."""

    max_len: int
    token_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset: int = 0, deterministic: bool = True):
        pe = self.param(
            "pe", nn.initializers.truncated_normal(stddev=1.0), (self.max_len, self.token_dim)
        )
        t = x.shape[1]
        x = x + jnp.asarray(pe, self.dtype)[None, offset : offset + t]
        if self.dropout > 0 and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x
