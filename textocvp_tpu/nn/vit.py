"""
Vision Transformer encoder (timm-compatible layout) in flax, for the frozen
DINO/DINOv2 backbones used by ExtendedDINOSAUR
(reference src/models/EncodersDecoders/timm_encoders.py).

Matches the reference wrapper semantics exactly:
* classification head removed; class token stripped from the output
  (timm_encoders.py:69)
* blocks truncated to ``depth`` (timm_encoders.py:47-48); the final
  ``norm`` layer of timm's forward_features is *not* applied
* normalization quirk: both mean AND std are loaded from the config's
  ImageNet *mean* (timm_encoders.py:51-56) — replicated for numeric parity
  with released checkpoints.

Pretrained weights are imported from a timm/torch state_dict via
:func:`import_timm_state_dict`; without a weight file the module is randomly
initialized (useful for tests; training the frozen encoder is not supported,
mirroring the reference where the backbone is always frozen).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)

# Attention implementation switch for ViTBlock. The Pallas TPU flash kernel
# keeps score tiles in VMEM (the XLA path round-trips B*h*n^2 score matrices
# through HBM), but at the production shape (seq 577, head 64, B*h=192) it
# measured NO win — 78 ms default blocks / 52 ms full-row blocks vs 52 ms
# XLA (bench_vit_attention.py; docs/PERFORMANCE.md "ViT flash-attention
# probe") — so "auto" resolves to the XLA einsum path everywhere. The flash
# arms stay selectable for the probe and the interpret-mode equivalence
# tests (tests/test_vit_flash_attention.py).
_ATTENTION_IMPL = "auto"  # "auto" | "xla" | "flash" | "flash_tuned"


def _attention(q, k, v, scale: float, dtype):
    """Multi-head attention core; q, k, v are (b, h, n, dh)."""
    impl = _ATTENTION_IMPL
    if impl == "auto":
        impl = "xla"  # flash measured neutral-to-worse at this regime
    if impl in ("flash", "flash_tuned"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        b, h, n, dh = q.shape
        n_pad = -n % 128  # lane-align the token axis for the kernel
        if n_pad:
            pad = [(0, 0), (0, 0), (0, n_pad), (0, 0)]
            q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
            # pad tokens get their own segment -> the softmax for real
            # queries runs over exactly the real n keys, as unpadded
            seg = jnp.concatenate(
                [jnp.ones((b, n), jnp.int32), jnp.full((b, n_pad), 2, jnp.int32)],
                axis=1,
            )
            ids = SegmentIds(q=seg, kv=seg)
        else:
            ids = None
        kwargs = {}
        if impl == "flash_tuned":
            np_ = q.shape[2]  # padded token count
            kwargs["block_sizes"] = BlockSizes(
                block_q=np_, block_k_major=np_, block_k=np_, block_b=1)
        out = flash_attention(q, k, v, segment_ids=ids, causal=False,
                              sm_scale=scale, **kwargs)
        return out[:, :, :n].astype(dtype)
    attn = jax.nn.softmax(
        (jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale).astype(jnp.float32), axis=-1
    ).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

VIT_CONFIGS = {
    "vit_small_patch16_224_dino": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "vit_small_patch8_224_dino": dict(patch_size=8, embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16_224_dino": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_base_patch8_224_dino": dict(patch_size=8, embed_dim=768, depth=12, num_heads=12),
    "vit_small_patch14_dinov2": dict(
        patch_size=14, embed_dim=384, depth=12, num_heads=6, layerscale_init=1e-5
    ),
    "vit_base_patch14_dinov2": dict(
        patch_size=14, embed_dim=768, depth=12, num_heads=12, layerscale_init=1e-5
    ),
}


def _dense_int8(x, kernel, bias, a_scale, out_dtype):
    """int8 x int8 -> int32 dense with a STATIC per-tensor activation scale
    and per-output-channel weight scales, dequantized to f32 (+bias).

    Same contract as decoders.ConvDecoder._quantize_conv: the weight
    quantization lives inside the traced program (const-folded when weights
    are baked; one cheap pass otherwise), the activation quantize is
    elementwise with a static scale so XLA fuses it into the producer's
    epilogue and the intermediate hits HBM as int8."""
    w = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-30) / 127.0
    w_q = jnp.round(w / w_scale).astype(jnp.int8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (a_scale * w_scale)
            + bias.astype(jnp.float32)).astype(out_dtype)


class ViTBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = None
    dtype: Any = jnp.float32

    #: dense submodule names, in execution order — the per-block
    #: ``quant_scales``/calibration amax vectors index this order
    DENSES = ("qkv", "proj", "fc1", "fc2")

    @nn.compact
    def __call__(self, x, quant_scales=None, calibrate: bool = False):
        """``quant_scales`` — a (4,) f32 vector of static activation scales
        (one per dense, :data:`DENSES` order) switching the block's matmuls
        to the int8 MXU path (opt-in via ``tpu.encode_quant``). ``calibrate``
        returns ``(x, amaxes(4,))`` — the bf16 forward plus the per-dense
        input amaxes whose /127 are those scales."""
        d = self.embed_dim
        h = self.num_heads
        dh = d // h
        amaxes = []

        def dense(name, features, y, idx):
            mod = nn.Dense(features, dtype=self.dtype, name=name)
            if calibrate:
                amaxes.append(jnp.max(jnp.abs(y.astype(jnp.float32))))
            if quant_scales is None or self.is_initializing():
                return mod(y)
            p = self.variables["params"][name]
            return _dense_int8(y, p["kernel"], p["bias"], quant_scales[idx],
                               self.dtype)

        def layerscale(name, y):
            if self.layerscale_init is None:
                return y
            gamma = self.param(name, nn.initializers.constant(self.layerscale_init), (d,))
            return y * jnp.asarray(gamma, self.dtype)

        # attention (timm Block: qkv with bias, proj with bias, pre-norm)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = dense("qkv", 3 * d, y, 0)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n = q.shape[:2]
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        y = _attention(q, k, v, dh ** -0.5, self.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, d)
        y = dense("proj", d, y, 1)
        x = x + layerscale("ls1_gamma", y)

        # MLP
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = dense("fc1", int(d * self.mlp_ratio), y, 2)
        y = nn.gelu(y, approximate=False)
        y = dense("fc2", d, y, 3)
        x = x + layerscale("ls2_gamma", y)
        if calibrate:
            return x, jnp.stack(amaxes)
        return x


class ViTEncoder(nn.Module):
    """Frozen ViT feature extractor. Input NHWC in [0,1]; output (B, P, D)."""

    img_size: int
    patch_size: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = None
    timm_norm_quirk: bool = True  # std := mean, as in the reference wrapper
    dtype: Any = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x, train: bool = False, quant_scales=None,
                 calibrate: bool = False):
        """``quant_scales`` — (depth, 4) static activation scales switching
        every block's denses to int8 (``tpu.encode_quant``; the patch-embed
        conv and attention einsums stay in the compute dtype). ``calibrate``
        returns ``(features, amaxes(depth, 4))`` instead of features."""
        mean = jnp.asarray(IMAGENET_MEAN, self.dtype)
        std = mean if self.timm_norm_quirk else jnp.asarray((0.229, 0.224, 0.225), self.dtype)
        x = (x - mean) / std

        # patch embedding: conv patch_size/patch_size, NHWC
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, self.embed_dim)  # (B, P, D)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.num_patches + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + jnp.asarray(pos_embed, self.dtype)

        amaxes = []
        for i in range(self.depth):
            x = ViTBlock(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                layerscale_init=self.layerscale_init,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, quant_scales=None if quant_scales is None else quant_scales[i],
              calibrate=calibrate)
            if calibrate:
                x, block_amaxes = x
                amaxes.append(block_amaxes)
        out = x[:, 1:]  # strip class token; no final norm (matches reference)
        if calibrate:
            return out, jnp.stack(amaxes)
        return out


def interpolate_pos_embed(pos_embed: np.ndarray, new_grid: int) -> np.ndarray:
    """
    Bicubic interpolation of a timm pos_embed (1, 1+g*g, D) to a new grid size,
    keeping the cls position, matching timm's resample_abs_pos_embed.
    """
    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    old_grid = int(round(patch_pos.shape[1] ** 0.5))
    if old_grid == new_grid:
        return pos_embed
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(1, old_grid, old_grid, d)
    grid = jax.image.resize(jnp.asarray(grid), (1, new_grid, new_grid, d), method="bicubic")
    grid = np.asarray(grid).reshape(1, new_grid * new_grid, d)
    return np.concatenate([cls_pos, grid], axis=1)


def import_timm_state_dict(state_dict: dict, module: ViTEncoder) -> dict:
    """
    Convert a timm VisionTransformer torch state_dict (numpy-valued) into this
    module's flax params. Handles pos-embed grid interpolation and NCHW->HWIO
    patch-embed kernel transposition.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: dict = {}
    kernel = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
    p["patch_embed"] = {"kernel": kernel, "bias": sd["patch_embed.proj.bias"]}
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = interpolate_pos_embed(sd["pos_embed"], module.grid_size)
    for i in range(module.depth):
        blk = {}
        pre = f"blocks.{i}."
        blk["norm1"] = {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]}
        blk["norm2"] = {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]}
        blk["qkv"] = {"kernel": sd[pre + "attn.qkv.weight"].T, "bias": sd[pre + "attn.qkv.bias"]}
        blk["proj"] = {
            "kernel": sd[pre + "attn.proj.weight"].T,
            "bias": sd[pre + "attn.proj.bias"],
        }
        blk["fc1"] = {"kernel": sd[pre + "mlp.fc1.weight"].T, "bias": sd[pre + "mlp.fc1.bias"]}
        blk["fc2"] = {"kernel": sd[pre + "mlp.fc2.weight"].T, "bias": sd[pre + "mlp.fc2.bias"]}
        if module.layerscale_init is not None:
            blk["ls1_gamma"] = sd[pre + "ls1.gamma"]
            blk["ls2_gamma"] = sd[pre + "ls2.gamma"]
        p[f"block_{i}"] = blk
    return p
