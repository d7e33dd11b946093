"""
Slot predictors (reference src/models/Predictors/OCVP.py and
text_cond_OCVP.py) and the autoregressive rollout wrapper
(reference predictor_wrapper.py).

All predictors map a window of slots (B, T, S, slot_dim) to the next-step
slots (B, S, slot_dim). The rollout wrapper unrolls ``num_preds`` steps
statically inside one jitted program, reproducing the reference's sliding
window semantics with static shapes (each distinct window length C..buffer is
its own statically-shaped call), and caches the text cross-attention K/V once
per sequence — they are rollout-invariant.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import (
    AdaptedEncoderBlock,
    SlotPositionalEncoding,
    TemporalPositionalEncoding,
    TorchStyleEncoderLayer,
    xavier_uniform,
)
from textocvp_tpu.nn.text_encoders import TransformerTextEncoder


class VanillaTransformerPredictor(nn.Module):
    """Joint self-attention over all (time x slot) tokens
    (reference OCVP.py:24-141)."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, slots, self_mask=None, pe_offset=None,
                 deterministic: bool = True, **kwargs):
        b, t, s, _ = slots.shape
        x = nn.Dense(self.token_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name="mlp_in")(slots)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size, dtype=self.dtype, name="pe"
        )(x, offset=pe_offset, deterministic=deterministic)
        x = x.reshape(b, t * s, self.token_dim)
        for i in range(self.num_layers):
            x = TorchStyleEncoderLayer(
                d_model=self.token_dim, nhead=self.n_heads,
                dim_feedforward=self.hidden_dim, norm_first=True,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask=self_mask, deterministic=deterministic)
        x = x.reshape(b, t, s, self.token_dim)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="mlp_out")(x[:, -1])
        return out + slots[:, -1] if self.residual else out


class OCVPSeqLayer(nn.Module):
    """Sequential object-attention then time-attention (reference OCVP.py:257-320).

    ``time_mask`` (broadcastable to (Q, T) over the time axis, True = attend)
    excludes ring-buffer padding frames as keys in the time attention. The
    object attention operates within a single frame, so padding frames only
    produce (finite) garbage there that the time mask then discards.
    """

    token_dim: int
    hidden_dim: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_mask=None, deterministic: bool = True):
        b, t, s, d = x.shape
        y = x.reshape(b * t, s, d)
        y = TorchStyleEncoderLayer(
            d_model=self.token_dim, nhead=self.n_heads, dim_feedforward=self.hidden_dim,
            norm_first=True, dtype=self.dtype, name="object_block",
        )(y, deterministic=deterministic)
        y = y.reshape(b, t, s, d).transpose(0, 2, 1, 3).reshape(b * s, t, d)
        y = TorchStyleEncoderLayer(
            d_model=self.token_dim, nhead=self.n_heads, dim_feedforward=self.hidden_dim,
            norm_first=True, dtype=self.dtype, name="time_block",
        )(y, mask=time_mask, deterministic=deterministic)
        return y.reshape(b, s, t, d).transpose(0, 2, 1, 3)


class OCVPSeq(nn.Module):
    """OCVP-Seq predictor (reference OCVP.py:145-253)."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, slots, time_mask=None, pe_offset=None,
                 deterministic: bool = True, **kwargs):
        b, t, s, _ = slots.shape
        x = nn.Dense(self.token_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name="mlp_in")(slots)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size, dtype=self.dtype, name="pe"
        )(x, offset=pe_offset, deterministic=deterministic)
        for i in range(self.num_layers):
            x = OCVPSeqLayer(
                token_dim=self.token_dim, hidden_dim=self.hidden_dim,
                n_heads=self.n_heads, dtype=self.dtype, name=f"layer_{i}",
            )(x, time_mask=time_mask, deterministic=deterministic)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="mlp_out")(x[:, -1])
        return out + slots[:, -1] if self.residual else out


class OCVPParLayer(nn.Module):
    """Parallel object- and time-attention branches, summed
    (reference OCVP.py:436-548). Pre-norm, biased projections (torch MHA)."""

    token_dim: int
    hidden_dim: int
    n_heads: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_mask=None, deterministic: bool = True):
        from textocvp_tpu.nn.blocks import MultiHeadSelfAttention

        b, t, s, d = x.shape
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        attn_obj = MultiHeadSelfAttention(
            emb_dim=self.token_dim, num_heads=self.n_heads, dropout=self.dropout,
            use_bias=True, dtype=self.dtype, name="self_attn_obj",
        )
        attn_time = MultiHeadSelfAttention(
            emb_dim=self.token_dim, num_heads=self.n_heads, dropout=self.dropout,
            use_bias=True, dtype=self.dtype, name="self_attn_time",
        )

        y = ln1(x)
        y_obj = attn_obj(y.reshape(b * t, s, d), deterministic=deterministic)
        y_obj = y_obj.reshape(b, t, s, d)
        y_time = attn_time(
            y.transpose(0, 2, 1, 3).reshape(b * s, t, d), mask=time_mask,
            deterministic=deterministic,
        ).reshape(b, s, t, d).transpose(0, 2, 1, 3)
        x = x + (y_obj + y_time)

        h = ln2(x)
        h = nn.Dense(self.hidden_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name="linear1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.token_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name="linear2")(h)
        return x + h


class OCVPPar(nn.Module):
    """OCVP-Par predictor (reference OCVP.py:324-432)."""

    num_slots: int
    slot_dim: int
    token_dim: int = 128
    hidden_dim: int = 256
    num_layers: int = 2
    n_heads: int = 4
    residual: bool = False
    input_buffer_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, slots, time_mask=None, pe_offset=None,
                 deterministic: bool = True, **kwargs):
        b, t, s, _ = slots.shape
        x = nn.Dense(self.token_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name="mlp_in")(slots)
        x = SlotPositionalEncoding(
            d_model=self.token_dim, max_len=self.input_buffer_size, dtype=self.dtype, name="pe"
        )(x, offset=pe_offset, deterministic=deterministic)
        for i in range(self.num_layers):
            x = OCVPParLayer(
                token_dim=self.token_dim, hidden_dim=self.hidden_dim,
                n_heads=self.n_heads, dtype=self.dtype, name=f"layer_{i}",
            )(x, time_mask=time_mask, deterministic=deterministic)
        out = nn.Dense(self.slot_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name="mlp_out")(x[:, -1])
        return out + slots[:, -1] if self.residual else out


class TextOCVP(nn.Module):
    """
    Text-conditioned predictor: mlp_in -> learned flipped temporal PE ->
    ``num_layers`` x AdaptedEncoderBlock (self-attn over slot tokens +
    cross-attn to text) -> mlp_out on the newest step + residual
    (reference text_cond_OCVP.py:21-119).

    The text encoder variant is selected by ``text_encoder_type``:
    'custom_tf' embeds captions with :class:`TransformerTextEncoder`;
    't5' uses a frozen T5-small encoder (textocvp_tpu.nn.t5).
    """

    num_slots: int
    slot_dim: int
    token_dim: int = 512
    n_heads: int = 8
    hidden_dim: int = 2048
    num_layers: int = 8
    residual: bool = True
    input_buffer_size: int = 10
    fusion_num_heads: int = 8
    fusion_head_dim: int = 64
    fusion_mlp_size: int = 2048
    text_encoder_type: str = "t5"  # "t5" | "custom_tf" | "none"
    text_encoder_params: dict = None
    dtype: Any = jnp.float32

    def setup(self):
        self.mlp_in = nn.Dense(self.token_dim, kernel_init=xavier_uniform, dtype=self.dtype)
        self.mlp_out = nn.Dense(self.slot_dim, kernel_init=xavier_uniform, dtype=self.dtype)
        self.blocks = [
            AdaptedEncoderBlock(
                embed_dim=self.token_dim,
                num_heads=self.n_heads,
                mlp_size=self.hidden_dim,
                fusion_num_heads=self.fusion_num_heads,
                fusion_head_dim=self.fusion_head_dim,
                fusion_mlp_size=self.fusion_mlp_size,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.pe = TemporalPositionalEncoding(
            d_model=self.token_dim,
            max_len=self.input_buffer_size + 1,
            mode="learned",
            dtype=self.dtype,
        )
        tep = dict(self.text_encoder_params or {})
        if self.text_encoder_type == "custom_tf":
            self.text_encoder = TransformerTextEncoder(
                input_dim=tep.get("input_dim", 128),
                num_layers=tep.get("num_layers", 2),
                num_heads=tep.get("num_heads", 4),
                output_dim=self.token_dim,
                vocab_size=tep.get("vocab_size", 50),
                dtype=self.dtype,
            )
        elif self.text_encoder_type == "t5":
            from textocvp_tpu.nn.t5 import T5Config, T5EncoderStack, T5_SMALL

            # stock configs use t5-small; explicit geometry overrides in
            # text_encoder_params support scaled-down tests/dryruns
            overrides = {k: v for k, v in tep.items()
                         if k in T5Config.__dataclass_fields__}
            cfg = T5Config(**overrides) if overrides else T5_SMALL
            self.text_encoder = T5EncoderStack(config=cfg, dtype=self.dtype)
        elif self.text_encoder_type != "none":
            raise ValueError(f"Unknown text_encoder_type {self.text_encoder_type!r}")

    def encode_text(self, caption_tokens, caption_lengths=None, attn_masks=None,
                    deterministic: bool = True):
        """Encode the caption once per sequence (reference
        predictor_wrapper.py:90-127)."""
        if self.text_encoder_type == "t5":
            if attn_masks is None:
                raise KeyError("'attn_masks' must be provided for the T5 text encoder")
            emb = self.text_encoder(caption_tokens, attention_mask=attn_masks)
            return jax.lax.stop_gradient(emb)  # frozen T5 (reference text_cond_OCVP.py:149)
        if self.text_encoder_type == "custom_tf":
            if caption_lengths is None:
                raise KeyError("'caption_lengths' must be provided for the CustomTF encoder")
            return self.text_encoder(caption_tokens, caption_lengths,
                                     deterministic=deterministic)
        return None

    def precompute_text_kv(self, text_embeddings):
        """Per-layer text K/V, rollout-invariant — computed once per sequence."""
        return [blk.project_text_kv(text_embeddings) for blk in self.blocks]

    def full_forward(self, slots, caption_tokens, caption_lengths=None, attn_masks=None,
                     deterministic: bool = True):
        """Text encoding + KV caching + one prediction step; exercises every
        parameter (used for module initialization)."""
        emb = self.encode_text(caption_tokens, caption_lengths=caption_lengths,
                               attn_masks=attn_masks, deterministic=deterministic)
        kv = self.precompute_text_kv(emb)
        return self(slots, text_kv=kv, deterministic=deterministic)

    def __call__(self, slots, text_embeddings=None, text_kv=None, self_mask=None,
                 deterministic: bool = True, **kwargs):
        """
        slots: (B, T, S, D) window, newest frame last. ``self_mask``
        (broadcastable to (B, T*S-queries, T*S-keys), True = attend) enables
        the zero-padded static ring buffer: masked-out padding keys make the
        fixed-shape window exactly equivalent to the reference's shorter
        dynamic window.
        """
        b, t, s, _ = slots.shape
        x = self.mlp_in(slots)
        x = self.pe(x, deterministic=deterministic)
        x = x.reshape(b, t * s, self.token_dim)
        for i, blk in enumerate(self.blocks):
            x = blk(
                x,
                text_embeddings=text_embeddings,
                text_kv=text_kv[i] if text_kv is not None else None,
                self_mask=self_mask,
                deterministic=deterministic,
            )
        x = x.reshape(b, t, s, self.token_dim)
        out = self.mlp_out(x[:, -1])
        return out + slots[:, -1] if self.residual else out


class PredictorWrapper(nn.Module):
    """
    Autoregressive rollout driver (reference predictor_wrapper.py:17-169).

    The caption is encoded once; then ``num_preds`` steps are statically
    unrolled: predict next slots from the current window, append the
    prediction (or the ground truth under teacher forcing), and slide the
    window to at most ``input_buffer_size`` timesteps. ``num_preds`` and
    ``teacher_force`` are static, so the whole rollout (plus text K/V caching)
    compiles into one XLA program.
    """

    predictor: nn.Module
    num_context: int = 1
    num_preds: int = 9
    teacher_force: bool = False
    input_buffer_size: Optional[int] = 10
    # lax.scan unroll factor for the rollout loop (semantics-preserving;
    # ``tpu.rollout_unroll`` config knob / TEXTOCVP_ROLLOUT_UNROLL perf-probe
    # env). 1 = rolled (compile time flat in num_preds — the default).
    rollout_unroll: int = 1

    @property
    def buffer_size(self) -> int:
        # None -> num_context (reference predictor_wrapper.py:156-169)
        return self.input_buffer_size if self.input_buffer_size else self.num_context

    def __call__(
        self,
        slot_history,
        num_preds: Optional[int] = None,
        teacher_force: Optional[bool] = None,
        caption_tokens=None,
        caption_lengths=None,
        attn_masks=None,
        deterministic: bool = True,
    ):
        """
        slot_history: (B, T, S, D) with T >= num_context (+ num_preds if
        teacher forcing). Returns predicted slots (B, num_preds, S, D).

        All predictors roll out through the masked static ring buffer
        (:meth:`_static_rollout`): one ``lax.scan`` body for every step, so
        XLA graph size and compile time are flat in ``num_preds`` and the
        buffer size.
        """
        num_preds = self.num_preds if num_preds is None else num_preds
        teacher_force = self.teacher_force if teacher_force is None else teacher_force

        is_text = isinstance(self.predictor, TextOCVP) and \
            self.predictor.text_encoder_type != "none"
        text_kv = None
        if is_text:
            if caption_tokens is None:
                raise KeyError("'caption_tokens' must be provided for the text-encoder")
            text_embeddings = self.predictor.encode_text(
                caption_tokens, caption_lengths=caption_lengths, attn_masks=attn_masks,
                deterministic=deterministic,
            )
            text_kv = self.predictor.precompute_text_kv(text_embeddings)

        return self._static_rollout(
            slot_history, num_preds, teacher_force, text_kv, is_text, deterministic
        )

    def _static_rollout(self, slot_history, num_preds, teacher_force, text_kv,
                        is_text, deterministic):
        """
        Zero-padded static ring buffer, used by ALL predictors: the window
        always has ``input_buffer_size`` frames (newest at the last index);
        padding positions are excluded from attention via a key mask, which is
        exactly equivalent to the reference's shorter dynamic window. The
        unconditioned predictors additionally receive a PE offset so the
        oldest *valid* frame gets pe[0] (their SlotPositionalEncoding is not
        flipped, unlike TextOCVP's TemporalPositionalEncoding). Every rollout
        step has the same shape, so the whole rollout is one ``lax.scan`` —
        compile time is flat in both ``num_preds`` and the buffer size.
        """
        b, _, s, d = slot_history.shape
        L = self.buffer_size
        c = min(self.num_context, L)

        buf = jnp.zeros((b, L, s, d), slot_history.dtype)
        # newest context frame at index L-1 (keep only the last L if C > L)
        ctx = slot_history[:, max(0, self.num_context - L) : self.num_context]
        buf = buf.at[:, L - c :].set(ctx)

        if teacher_force:
            gt = slot_history[:, self.num_context : self.num_context + num_preds]
            xs = jnp.moveaxis(gt, 1, 0)  # (steps, B, S, D)
        else:
            xs = None

        def body(mdl, carry, x):
            buf, cnt = carry
            # frame i is valid iff i >= L - cnt
            frame_valid = jnp.arange(L) >= (L - cnt)
            if is_text:
                key_mask = jnp.repeat(frame_valid, s)[None, None, :]  # (1, 1, L*S)
                cur = mdl(buf, text_kv=text_kv, self_mask=key_mask,
                          deterministic=deterministic)
            elif isinstance(mdl, VanillaTransformerPredictor):
                key_mask = jnp.repeat(frame_valid, s)[None, None, :]
                cur = mdl(buf, self_mask=key_mask, pe_offset=L - cnt,
                          deterministic=deterministic)
            else:  # OCVPSeq / OCVPPar: mask the time-attention keys
                time_mask = frame_valid[None, None, :]  # (1, 1, L)
                cur = mdl(buf, time_mask=time_mask, pe_offset=L - cnt,
                          deterministic=deterministic)
            nxt = x if teacher_force else cur
            buf = jnp.concatenate([buf[:, 1:], nxt[:, None]], axis=1)
            cnt = jnp.minimum(cnt + 1, L)
            return (buf, cnt), cur

        from textocvp_tpu.core.config import env_int

        env = env_int("TEXTOCVP_ROLLOUT_UNROLL")
        unroll = env if env is not None else self.rollout_unroll
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=num_preds,
            unroll=min(max(1, unroll), num_preds),
        )
        _, preds = scan(self.predictor, (buf, jnp.asarray(c, jnp.int32)), xs)
        return jnp.moveaxis(preds, 0, 1)  # (B, num_preds, S, D)
