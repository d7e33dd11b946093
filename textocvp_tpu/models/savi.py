"""
SAVi video decomposition model (Kipf et al., ICLR 2022), TPU-first
(reference src/models/SAVi.py).

Structural differences vs. the reference (semantics preserved):

* The CNN encoder + positional embedding + MLP run ONCE over all ``B*T``
  frames as a single batched call, and the slot-attention K/V projections are
  likewise hoisted out of the time loop — only the slot refinement recurrence
  is sequential (the reference re-enters the full encoder per frame inside a
  Python loop, SAVi.py:189-215).
* Decoding is batched over ``B*T*num_slots`` broadcast maps in one call.
* The time loop is a statically unrolled recurrence inside one jitted program
  (8-20 steps of tiny slot updates; unrolling maximizes XLA fusion).
* Data layout is NHWC (TPU conv layout); callers pass video as
  (B, T, H, W, C) in [0, 1].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import MLP, SoftPositionEmbed, TransformerBlock, xavier_uniform
from textocvp_tpu.nn.decoders import get_decoder
from textocvp_tpu.nn.encoders import get_encoder
from textocvp_tpu.nn.initializers import get_initializer
from textocvp_tpu.ops.slot_attention import SlotAttention


def get_transition_module(model_name: Optional[str], slot_dim: int, dtype, **kwargs):
    """Transition factory: None -> identity, 'TransformerBlock' -> post-norm
    block (reference transition_models.py:12-39)."""
    if model_name in (None, ""):
        return None
    if model_name == "TransformerBlock":
        return TransformerBlock(
            embed_dim=slot_dim,
            num_heads=kwargs.get("num_heads", 4),
            mlp_size=kwargs.get("mlp_size", 512),
            pre_norm=False,
            dtype=dtype,
        )
    raise ValueError(f"{model_name!r} is not a recognized transition module")


class SAVi(nn.Module):
    num_slots: int
    slot_dim: int
    num_iterations: int = 1
    num_iterations_first: int = 3
    in_channels: int = 3
    mlp_hidden: int = 128
    mlp_encoder_dim: int = 128
    initializer: str = "LearnedRandom"
    encoder: dict = None
    decoder: dict = None
    transition_module: dict = None
    use_pallas: bool = False
    fast_decode: bool = True
    # 'concat' backprops cheaply (training); 'gather' fuses best inference-only
    fast_decode_expand: str = "concat"
    dtype: Any = jnp.float32

    def setup(self):
        self.slot_initializer = get_initializer(
            self.initializer, slot_dim=self.slot_dim, num_slots=self.num_slots, dtype=self.dtype
        )
        tm = dict(self.transition_module or {})
        self.transition = get_transition_module(
            tm.pop("model_name", None), slot_dim=self.slot_dim, dtype=self.dtype, **tm
        )
        self.image_encoder, self.encoder_out_features = get_encoder(self.encoder, dtype=self.dtype)
        self.encoder_resolution = tuple(self.encoder["encoder_params"]["resolution"])
        self.encoder_pos_embedding = SoftPositionEmbed(
            hidden_size=self.encoder_out_features,
            resolution=self.encoder_resolution,
            dtype=self.dtype,
        )
        self.encoder_ln = nn.LayerNorm(dtype=self.dtype)
        self.encoder_mlp = MLP([self.mlp_encoder_dim, self.mlp_encoder_dim], dtype=self.dtype)

        self.decoder_resolution = tuple(self.decoder["decoder_params"]["resolution"])
        self.decoder_pos_embedding = SoftPositionEmbed(
            hidden_size=self.slot_dim, resolution=self.decoder_resolution, dtype=self.dtype
        )
        self.image_decoder = get_decoder(self.decoder, dtype=self.dtype)

        self.slot_attention = SlotAttention(
            dim_feats=self.mlp_encoder_dim,
            dim_slots=self.slot_dim,
            num_slots=self.num_slots,
            mlp_hidden=self.mlp_hidden,
            impl="pallas" if self.use_pallas else "xla",
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------ encode
    def encode(self, x, train: bool = False):
        """Frames (N, H, W, C) -> features (N, num_locations, mlp_encoder_dim)."""
        x = self.image_encoder(x, train=train)           # (N, H, W, F)
        x = self.encoder_pos_embedding(x)
        n, h, w, f = x.shape
        x = x.reshape(n, h * w, f)
        x = self.encoder_ln(x)
        return self.encoder_mlp(x)

    # ------------------------------------------------------------------ decode
    def decode(self, slots, train: bool = False, tail_chunks: int = 1,
               tail_remat: bool = False, tail_unroll=None, quant_scales=None):
        """
        Slots (N, S, D) -> spatial-broadcast decode
        (reference SAVi.py:241-275). Returns dict with recons_imgs (N, H, W, C),
        recons (N, S, H, W, C), masks (N, S, H, W, 1).

        With ``fast_decode`` (default), the first decoder conv exploits the
        broadcast structure (spatially-constant slot tile + positional map)
        and runs on a small tile — exact up to float reassociation; see
        ConvDecoder.decode_broadcast.

        ``tail_chunks > 1`` scans the decoder's tail convs over batch chunks
        (exact; large inference batches only — see ConvDecoder.decode_broadcast
        and textocvp_tpu/models/chunked.py for the auto policy);
        ``tail_remat`` makes the scanned tail's backward recompute per chunk
        (training-time chunking — ConvDecoder.decode_broadcast);
        ``tail_unroll`` overrides the scan-unroll policy (autotuner hook);
        ``quant_scales`` switches the decoder's hidden tail convs to int8
        with these calibrated activation scales (see
        :meth:`decode_calibrate`; opt-in via ``tpu.decode_quant`` —
        models/quant.py).
        """
        n, s, d = slots.shape
        h0, w0 = self.decoder_resolution
        if quant_scales is not None and not self.fast_decode:
            raise ValueError(
                "int8 decode quantization requires fast_decode (the "
                "broadcast-structured decoder); unset tpu.decode_quant or "
                "enable tpu.fast_decode.")
        if self.fast_decode:
            y = self.image_decoder.decode_broadcast(
                slots.reshape(n * s, d),
                self.decoder_pos_embedding.pos_map(),
                (h0, w0),
                train=train,
                expand_impl=self.fast_decode_expand,
                tail_chunks=tail_chunks,
                tail_remat=tail_remat,
                tail_unroll=tail_unroll,
                quant_scales=quant_scales,
            )
        else:
            x = jnp.broadcast_to(slots[:, :, None, None, :], (n, s, h0, w0, d))
            x = x.reshape(n * s, h0, w0, d)
            x = self.decoder_pos_embedding(x)
            y = self.image_decoder(x, train=train)        # (N*S, H, W, C+1)
        _, h, w, c1 = y.shape
        y = y.reshape(n, s, h, w, c1)
        recons, mask_logits = y[..., : self.in_channels], y[..., self.in_channels :]
        masks = jax.nn.softmax(mask_logits.astype(jnp.float32), axis=1).astype(y.dtype)
        recons_imgs = jnp.sum(recons * masks, axis=1)
        return {"recons_imgs": recons_imgs, "recons": recons, "masks": masks}

    def decode_calibrate(self, slots):
        """Per-layer decoder-tail input amaxes (L,) for int8 calibration:
        runs the bf16 fast-broadcast preamble + tail on ``slots`` and
        returns the activation ranges the quantizer must cover. Divide by
        127 for the ``quant_scales`` argument of :meth:`decode`
        (models/quant.py::calibrate_decode_scales does this)."""
        n, s, d = slots.shape
        h0, w0 = self.decoder_resolution
        if not self.fast_decode:
            raise ValueError("decode_calibrate requires fast_decode")
        return self.image_decoder.decode_broadcast(
            slots.reshape(n * s, d),
            self.decoder_pos_embedding.pos_map(),
            (h0, w0),
            expand_impl=self.fast_decode_expand,
            calibrate=True,
        )

    # ------------------------------------------------------------------ decomp
    def decompose(self, x, decode: bool = True, train: bool = False,
                  tail_chunks: int = 1, tail_remat: bool = False,
                  tail_unroll=None, quant_scales=None):
        """
        Video (B, T, H, W, C) -> object slots (and reconstructions).

        Returns dict with slot_history (B, T, S, D), attn_masks
        (B, T, S, num_locations) and, if decode, recons_imgs (B, T, H, W, C),
        recons_objs (B, T, S, H, W, C), masks (B, T, S, H, W, 1).
        ``tail_chunks`` is forwarded to :meth:`decode` (scan-chunked decoder
        tail for large inference batches; exact — see models/chunked.py).
        """
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        feats = self.encode(frames, train=train)          # (B*T, N, D) — one batched call
        k, v = self.slot_attention.project_inputs(feats)
        k = k.reshape(b, t, *k.shape[1:])
        v = v.reshape(b, t, *v.shape[1:])

        slots = self.slot_initializer(batch_size=b)
        slot_hist, attn_hist = [], []
        for step in range(t):
            n_iters = self.num_iterations_first if step == 0 else self.num_iterations
            slots, attn = self.slot_attention.iterate(k[:, step], v[:, step], slots, n_iters)
            slot_hist.append(slots)
            attn_hist.append(attn)
            if self.transition is not None:
                # applied every frame incl. the last (result unused there),
                # matching the reference (SAVi.py:198) and ensuring the
                # transition params exist even for single-frame traces
                slots = self.transition(slots)

        slot_history = jnp.stack(slot_hist, axis=1)       # (B, T, S, D)
        out = {"slot_history": slot_history, "attn_masks": jnp.stack(attn_hist, axis=1)}
        if decode:
            dec = self.decode(slot_history.reshape(b * t, self.num_slots, self.slot_dim),
                              train=train, tail_chunks=tail_chunks,
                              tail_remat=tail_remat, tail_unroll=tail_unroll,
                              quant_scales=quant_scales)
            h, w = dec["recons_imgs"].shape[1:3]
            out["recons_imgs"] = dec["recons_imgs"].reshape(b, t, h, w, self.in_channels)
            out["recons_objs"] = dec["recons"].reshape(b, t, self.num_slots, h, w, self.in_channels)
            out["masks"] = dec["masks"].reshape(b, t, self.num_slots, h, w, 1)
        return out

    def __call__(self, x, decode: bool = True, train: bool = False,
                 tail_chunks: int = 1, tail_remat: bool = False,
                 tail_unroll=None, quant_scales=None):
        return self.decompose(x, decode=decode, train=train,
                              tail_chunks=tail_chunks, tail_remat=tail_remat,
                              tail_unroll=tail_unroll, quant_scales=quant_scales)
