"""Unit tests for block-level semantics that parity depends on."""

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.nn.blocks import (
    SlotPositionalEncoding,
    SoftPositionEmbed,
    TemporalPositionalEncoding,
    build_grid,
    sinusoid_table,
    upsample_nearest,
)


def test_build_grid_reference_semantics():
    """4-channel grid: (y, x, 1-y, 1-x) gradients in [-1, 1], 'ij' indexing
    (reference model_utils.py:12-34)."""
    g = build_grid((4, 6))
    assert g.shape == (4, 6, 4)
    np.testing.assert_allclose(g[0, 0], [-1, -1, 2, 2], atol=1e-6)
    np.testing.assert_allclose(g[-1, -1], [1, 1, 0, 0], atol=1e-6)
    # channel 0 varies along rows, channel 1 along cols
    assert np.allclose(g[:, 0, 0], np.linspace(-1, 1, 4))
    assert np.allclose(g[0, :, 1], np.linspace(-1, 1, 6))
    np.testing.assert_allclose(g[..., 2], 1 - g[..., 0], atol=1e-6)


def test_soft_position_embed_adds_projection():
    mod = SoftPositionEmbed(hidden_size=8, resolution=(4, 4))
    x = jnp.zeros((2, 4, 4, 8))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    pos = mod.apply(params, method="pos_map")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(pos), atol=1e-6)


def test_temporal_pe_is_flipped():
    """The newest frame must receive pe[0] regardless of window length
    (reference model_blocks.py:376)."""
    mod = TemporalPositionalEncoding(d_model=8, max_len=6, mode="sinusoid")
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 8)))
    table = sinusoid_table(6, 8)
    for t in (2, 4):
        out = mod.apply(params, jnp.zeros((1, t, 2, 8)))
        # newest (last) timestep gets pe[0]
        np.testing.assert_allclose(np.asarray(out[0, -1, 0]), table[0], atol=1e-6)
        # oldest gets pe[t-1]
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), table[t - 1], atol=1e-6)


def test_slot_pe_is_not_flipped_and_shared_across_slots():
    mod = SlotPositionalEncoding(d_model=8, max_len=6, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 8)))
    out = mod.apply(params, jnp.zeros((1, 3, 2, 8)))
    table = sinusoid_table(6, 8)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), table[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 2, 1]), table[2], atol=1e-6)
    # shared across slots of a frame (permutation equivariance)
    np.testing.assert_allclose(np.asarray(out[0, 1, 0]), np.asarray(out[0, 1, 1]), atol=1e-6)


def test_learned_temporal_pe_table_orientation():
    mod = TemporalPositionalEncoding(d_model=8, max_len=5, mode="learned")
    x = jnp.zeros((1, 3, 2, 8))
    params = mod.init(jax.random.PRNGKey(0), x)
    pe = np.asarray(params["params"]["pe"])
    out = np.asarray(mod.apply(params, x))
    np.testing.assert_allclose(out[0, -1, 0], pe[0], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0], pe[2], atol=1e-6)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(upsample_nearest(x, 2))
    assert y.shape == (1, 4, 4, 1)
    assert (y[0, :2, :2, 0] == 0).all()
    assert (y[0, 2:, 2:, 0] == 3).all()


def test_resnet34_savi_encoder():
    """Working 'ResNet' encoder option (the reference registers it at
    encoders.py:16 but never wires it; timm_encoders.py:100-119 is its broken
    constructor). SAVi geometry: stride-1 stem => only stage transitions
    downsample, overall /8, 512 features."""
    from textocvp_tpu.nn.encoders import get_encoder

    mod, feats = get_encoder({"encoder_name": "ResNet", "encoder_params": {}})
    assert feats == 512
    x = jnp.ones((2, 32, 32, 3))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, v: mod.apply(p, v))(params, x)
    assert out.shape == (2, 4, 4, 512)
    # GroupNorm, not BatchNorm: no batch statistics collections exist
    assert set(params.keys()) == {"params"}
    # ResNet-34 block count: 2 convs per block * (3+4+6+3) + stem + 3 downsample
    n_convs = sum(1 for p in jax.tree_util.tree_leaves_with_path(params)
                  if any(getattr(k, "key", None) is not None and "Conv" in str(k.key)
                         for k in p[0]) and p[1].ndim == 4)
    assert n_convs == 2 * 16 + 1 + 3
