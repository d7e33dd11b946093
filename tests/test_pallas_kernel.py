"""Fused Pallas slot-attention kernel vs the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from textocvp_tpu.ops.slot_attention import SlotAttention


@pytest.fixture(scope="module")
def setup():
    mod = SlotAttention(dim_feats=32, dim_slots=32, num_slots=8, mlp_hidden=64)
    inputs = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    slots = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    params = mod.init(jax.random.PRNGKey(0), inputs, slots, num_iters=1)
    return mod, params, inputs, slots


def test_pallas_gradients_match_xla(setup):
    """Custom VJP (recompute via the functional XLA twin) must produce the
    same gradients as the plain XLA path — enables use_pallas in training."""
    mod, params, inputs, slots = setup
    pallas_mod = SlotAttention(dim_feats=32, dim_slots=32, num_slots=8,
                               mlp_hidden=64, impl="pallas")

    def loss_xla(p):
        out, _ = mod.apply(p, inputs, slots, num_iters=2)
        return jnp.sum(out ** 2)

    def loss_pallas(p):
        with pltpu.force_tpu_interpret_mode():
            out, _ = pallas_mod.apply(p, inputs, slots, num_iters=2)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_xla)(params)
    g_pl = jax.grad(loss_pallas)(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pl = jax.tree_util.tree_leaves(g_pl)
    for a, b in zip(flat_ref, flat_pl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("num_iters", [1, 3])
def test_pallas_matches_xla(setup, num_iters):
    mod, params, inputs, slots = setup
    ref_out, ref_attn = mod.apply(params, inputs, slots, num_iters=num_iters)

    pallas_mod = SlotAttention(dim_feats=32, dim_slots=32, num_slots=8,
                               mlp_hidden=64, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out, attn = pallas_mod.apply(params, inputs, slots, num_iters=num_iters)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn), rtol=1e-4, atol=1e-5)
