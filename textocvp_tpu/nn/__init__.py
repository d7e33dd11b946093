from textocvp_tpu.nn.blocks import (
    AdaptedEncoderBlock,
    ConvBlock,
    LearnedPositionalEncoding1D,
    MLP,
    MultiHeadCrossAttention,
    MultiHeadSelfAttention,
    SlotPositionalEncoding,
    SoftPositionEmbed,
    TemporalPositionalEncoding,
    TorchStyleEncoderLayer,
    TransformerBlock,
    TransformerDecoderBlock,
    build_grid,
)
from textocvp_tpu.nn.initializers import LearnedInit, LearnedRandomInit, get_initializer
