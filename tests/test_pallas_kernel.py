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
