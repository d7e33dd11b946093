"""
ExtendedDINOSAUR: DINOSAUR extended to video — frozen DINO/DINOv2 ViT
encoder, slot-attention recurrence, MLP patch decoder reconstructing ViT
features (+ optionally images) (reference src/models/ExtendedDINOSAUR.py).

TPU-first structure mirrors :mod:`textocvp_tpu.models.savi`: the frozen ViT
runs once over all ``B*T`` frames (with ``stop_gradient``), slot refinement is
the only sequential part, and patch decoding is batched over all frames.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import MLP
from textocvp_tpu.nn.decoders import get_decoder
from textocvp_tpu.nn.encoders import get_encoder
from textocvp_tpu.nn.initializers import get_initializer
from textocvp_tpu.models.savi import get_transition_module
from textocvp_tpu.ops.slot_attention import SlotAttention


class ExtendedDINOSAUR(nn.Module):
    img_size: int
    num_slots: int
    slot_dim: int
    num_iterations: int = 1
    num_iterations_first: int = 3
    in_channels: int = 3
    mlp_hidden: int = 128
    mlp_encoder_dim: int = 768
    initializer: str = "LearnedRandom"
    encoder: dict = None
    decoder: dict = None
    transition_module: dict = None
    use_pallas: bool = False
    subpixel_upconv: bool = False  # fold CNN-head x2 upsamples into convs
    fused_slot_mix: bool = False  # slot-reduce before the final patch dense
    dtype: Any = jnp.float32

    def setup(self):
        if "vit" not in self.encoder["encoder_name"]:
            raise ValueError("ExtendedDINOSAUR expects a ViT-based encoder")
        if self.decoder["decoder_name"] != "MLPPatchDecoder":
            raise ValueError("ExtendedDINOSAUR expects an 'MLPPatchDecoder'")

        self.slot_initializer = get_initializer(
            self.initializer, slot_dim=self.slot_dim, num_slots=self.num_slots, dtype=self.dtype
        )
        tm = dict(self.transition_module or {})
        self.transition = get_transition_module(
            tm.pop("model_name", None), slot_dim=self.slot_dim, dtype=self.dtype, **tm
        )

        enc_cfg = dict(self.encoder)
        enc_cfg["encoder_params"] = {**enc_cfg.get("encoder_params", {}), "img_size": self.img_size}
        self.image_encoder, self.encoder_out_features = get_encoder(enc_cfg, dtype=self.dtype)

        # MLP projecting frozen ViT patch features to slot dim
        # (reference ExtendedDINOSAUR.py:97-102)
        self.feat_proj_ln = nn.LayerNorm(dtype=self.dtype)
        self.feat_proj_mlp = MLP([self.mlp_encoder_dim, self.slot_dim], dtype=self.dtype)

        dec_cfg = dict(self.decoder)
        dec_cfg["decoder_params"] = {
            **dec_cfg.get("decoder_params", {}),
            "img_size": self.img_size,
            "subpixel_upconv": self.subpixel_upconv,
            "fused_slot_mix": self.fused_slot_mix,
        }
        self.patch_decoder = get_decoder(dec_cfg, dtype=self.dtype)

        self.slot_attention = SlotAttention(
            dim_feats=self.slot_dim,
            dim_slots=self.slot_dim,
            num_slots=self.num_slots,
            mlp_hidden=self.mlp_hidden,
            impl="pallas" if self.use_pallas else "xla",
            dtype=self.dtype,
        )

    # ------------------------------------------------------------------ decode
    def decode(self, slots, train: bool = False, tail_chunks: int = 1,
               tail_remat: bool = False, tail_unroll=None, quant_scales=None):
        """Slots (N, S, D) -> patch features, masks and optional images.

        ``tail_chunks``/``tail_remat``/``tail_unroll`` are accepted for call-site uniformity
        with SAVi.decode but currently unused: the MLP patch decoder is
        matmul-shaped and does not exhibit the flat-conv-batch scheduling
        pathology the chunked scan works around (docs/PERFORMANCE.md "decode
        chunking").

        ``quant_scales`` switches the patch-MLP denses and the BN-folded
        CNN-head convs to int8 with these calibrated activation scales (see
        :meth:`decode_calibrate`; opt-in via ``tpu.decode_quant`` —
        models/quant.py)."""
        del tail_chunks, tail_remat, tail_unroll
        return self.patch_decoder(slots, train=train, quant_scales=quant_scales)

    def decode_calibrate(self, slots):
        """Per-layer decoder input amaxes (L,) for int8 calibration — the
        MLP-dense inputs followed by the CNN-head conv inputs. Divide by 127
        for :meth:`decode`'s ``quant_scales``
        (models/quant.py::calibrate_decode_scales does this)."""
        return self.patch_decoder(slots, calibrate=True)

    def encode_calibrate(self, x):
        """Per-dense ViT input amaxes (depth, 4) for int8 ENCODE calibration
        (``tpu.encode_quant``). ``x`` is a video (B, T, H, W, C); one compute-
        dtype ViT pass over the flattened frames, amaxes of every block's
        qkv/proj/fc1/fc2 inputs. Divide by 127 for
        :meth:`decompose`'s ``encode_quant_scales``
        (models/quant.py::calibrate_encode_scales does this)."""
        frames = x.reshape((-1,) + x.shape[2:])
        _, amaxes = self.image_encoder(frames, train=False, calibrate=True)
        return amaxes

    # ------------------------------------------------------------------ decomp
    def decompose(self, x, decode: bool = True, train: bool = False,
                  tail_chunks: int = 1, tail_remat: bool = False,
                  tail_unroll=None, quant_scales=None,
                  encode_quant_scales=None):
        """
        Video (B, T, H, W, C) in [0,1] -> slots + reconstructions.

        Returns dict with slot_history (B, T, S, D), encoded_img_feats
        (B, T, P, F) (the frozen-ViT training target,
        reference ExtendedDINOSAUR.py:190), attn_masks and, if decode,
        recons_feats (B, T, P, F), masks (B, T, S, 1, gh, gw) and recons_imgs
        (B, T, H, W, C) when the decoder reconstructs images.
        """
        b, t = x.shape[:2]
        frames = x.reshape((b * t,) + x.shape[2:])
        ekw = {} if encode_quant_scales is None else {
            "quant_scales": encode_quant_scales}
        # checkpoint_name tags the frozen-ViT output so the trainers' remat
        # policy (save_only_these_names("frozen_feats")) can SAVE it instead
        # of replaying the whole ViT-B/14 forward in the backward pass — the
        # ViT sits behind stop_gradient and is never differentiated, so its
        # replay is pure waste (~64 frames of ViT forward per train step at
        # the CLIPort config). Outside jax.checkpoint this is a no-op.
        img_feats = jax.ad_checkpoint.checkpoint_name(
            jax.lax.stop_gradient(
                self.image_encoder(frames, train=False, **ekw)),
            "frozen_feats")
        proj = self.feat_proj_mlp(self.feat_proj_ln(img_feats))  # (B*T, P, slot_dim)
        k, v = self.slot_attention.project_inputs(proj)
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
                slots = self.transition(slots)

        slot_history = jnp.stack(slot_hist, axis=1)
        out = {
            "slot_history": slot_history,
            "attn_masks": jnp.stack(attn_hist, axis=1),
            "encoded_img_feats": img_feats.reshape(b, t, *img_feats.shape[1:]),
        }
        if decode:
            dec = self.decode(slot_history.reshape(b * t, self.num_slots, self.slot_dim),
                              train=train, tail_chunks=tail_chunks,
                              tail_remat=tail_remat, tail_unroll=tail_unroll,
                              quant_scales=quant_scales)
            p, f = dec["recons_feats"].shape[1:]
            out["recons_feats"] = dec["recons_feats"].reshape(b, t, p, f)
            out["masks"] = dec["masks"].reshape(b, t, *dec["masks"].shape[1:])
            if dec["recons_imgs"] is not None:
                h, w, c = dec["recons_imgs"].shape[1:]
                out["recons_imgs"] = dec["recons_imgs"].reshape(b, t, h, w, c)
        return out

    def __call__(self, x, decode: bool = True, train: bool = False,
                 tail_chunks: int = 1, tail_remat: bool = False,
                 tail_unroll=None, quant_scales=None,
                 encode_quant_scales=None):
        return self.decompose(x, decode=decode, train=train,
                              tail_chunks=tail_chunks, tail_remat=tail_remat,
                              tail_unroll=tail_unroll, quant_scales=quant_scales,
                              encode_quant_scales=encode_quant_scales)
