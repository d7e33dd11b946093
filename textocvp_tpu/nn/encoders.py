"""
Image encoders (reference src/models/EncodersDecoders/encoders.py).

All encoders are NHWC and batched over ``B*T`` frames in one call — the
stage-1 recurrence only needs per-frame features, so the conv/ViT FLOPs run as
one large MXU-friendly batch instead of a per-frame Python loop.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import ConvBlock
from textocvp_tpu.nn.vit import ViTEncoder, VIT_CONFIGS

ENCODERS = [
    "ConvEncoder",
    "ConvEncoder128",
    "ResNet",
    "vit_small_patch16_224_dino",
    "vit_small_patch8_224_dino",
    "vit_base_patch16_224_dino",
    "vit_base_patch8_224_dino",
    "vit_small_patch14_dinov2",
    "vit_base_patch14_dinov2",
]


class SimpleConvEncoder(nn.Module):
    """Stack of same-resolution conv blocks (reference encoders.py:99-159)."""

    hidden_dims: Sequence[int] = (64, 64, 64, 64)
    kernel_size: int = 5
    stride: int = 1
    batch_norm: bool = False
    downsample_encoder: bool = False
    downsample: int = 2
    dtype: Any = jnp.float32

    @property
    def out_features(self) -> int:
        return self.hidden_dims[-1]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h_dim in enumerate(self.hidden_dims):
            pool = (
                self.downsample
                if self.downsample_encoder and i < len(self.hidden_dims) - 1
                else None
            )
            x = ConvBlock(
                out_channels=h_dim,
                kernel_size=self.kernel_size,
                stride=self.stride,
                batch_norm=bool(self.batch_norm),
                max_pool=pool,
                activation=True,
                dtype=self.dtype,
            )(x, train=train)
        return x


class ConvEncoder128(nn.Module):
    """Conv encoder for 128x128 inputs: stride-2 first layer, no final act
    (reference encoders.py:163-199)."""

    dtype: Any = jnp.float32
    out_features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = ConvBlock(
                out_channels=64,
                kernel_size=5,
                stride=2 if i == 0 else 1,
                activation=i < 3,
                dtype=self.dtype,
            )(x, train=train)
        return x


class ResNetBasicBlock(nn.Module):
    """Pre-activation-free BasicBlock with GroupNorm (ResNet-34 style)."""

    channels: int
    stride: int = 1
    num_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype)(y)
        if self.stride != 1 or residual.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = nn.GroupNorm(num_groups=self.num_groups,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet34SAVi(nn.Module):
    """ResNet-34 feature encoder as modified for SAVi / SAVi++.

    The reference registers ``"ResNet"`` in its encoder list
    (src/models/EncodersDecoders/encoders.py:16) but never wires it into the
    factory (the branch falls through to ``NotImplementedError`` at :89), and
    its ``resnet34_savi`` constructor (timm_encoders.py:100-119) carries a
    latent bug (``norm_layer=layers.GroupNorm **kwargs``). This module is the
    working realisation of what that code describes: BasicBlock [3, 4, 6, 3],
    GroupNorm instead of BatchNorm, and a stride-1 stem conv + stride-1
    maxpool so only the stage transitions downsample (overall /8 instead of
    the classification ResNet's /32) — the SAVi++ recipe.

    Config note: inside SAVi, ``encoder_params.resolution`` must be the
    FEATURE resolution, i.e. image_size / 8 (e.g. ``[8, 8]`` for 64x64
    inputs) — the position embedding is built at that size. The stride-1
    ConvEncoder configs use the image resolution only because those encoders
    don't downsample. Integration-tested in tests/test_models.py.
    """

    num_groups: int = 32
    dtype: Any = jnp.float32

    # (channels, num_blocks, first_stride) per stage — ResNet-34 geometry
    STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))

    @property
    def out_features(self) -> int:
        return self.STAGES[-1][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # GroupNorm has no train/eval distinction
        # Stem: 7x7/stride-1 conv (SAVi mod of the usual stride 2)
        x = nn.Conv(64, (7, 7), strides=(1, 1), padding=3, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype)(x)
        x = nn.relu(x)
        # 3x3 maxpool, stride 1 (SAVi mod of the usual stride 2)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        for channels, blocks, first_stride in self.STAGES:
            for i in range(blocks):
                x = ResNetBasicBlock(
                    channels=channels,
                    stride=first_stride if i == 0 else 1,
                    num_groups=self.num_groups,
                    dtype=self.dtype,
                )(x)
        return x


def get_encoder(encoder: dict, dtype=jnp.float32) -> tuple[nn.Module, int]:
    """
    Encoder factory (reference encoders.py:27-95). Returns (module, out_features).
    """
    name = encoder["encoder_name"]
    params = dict(encoder.get("encoder_params", {}))
    if name not in ENCODERS:
        raise ValueError(f"Unknown encoder_name {name!r}. Use one of {ENCODERS}")

    if name == "ConvEncoder":
        mod = SimpleConvEncoder(
            hidden_dims=tuple(params.get("num_channels", (64, 64, 64, 64))),
            kernel_size=params.get("kernel_size", 5),
            stride=params.get("stride", 1),
            batch_norm=bool(params.get("batch_norm") or False),
            downsample_encoder=params.get("downsample_encoder", False),
            downsample=params.get("downsample", 2),
            dtype=dtype,
        )
        return mod, mod.out_features
    if name == "ConvEncoder128":
        mod = ConvEncoder128(dtype=dtype)
        return mod, mod.out_features
    if name == "ResNet":
        mod = ResNet34SAVi(num_groups=params.get("num_groups", 32), dtype=dtype)
        return mod, mod.out_features

    # ViT variants
    cfg = VIT_CONFIGS[name]
    img_size = params.get("img_size")
    if img_size is None:
        raise KeyError(f"'img_size' must be provided for ViT encoder {name!r}")
    mod = ViTEncoder(
        img_size=img_size,
        patch_size=cfg["patch_size"],
        embed_dim=cfg["embed_dim"],
        depth=params.get("num_blocks") or params.get("encoder_num_blocks") or cfg["depth"],
        num_heads=cfg["num_heads"],
        layerscale_init=cfg.get("layerscale_init"),
        dtype=dtype,
    )
    return mod, cfg["embed_dim"]
