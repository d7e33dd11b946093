"""Slot attention correctness: reference-semantics checks against a plain
numpy implementation, plus invariants (permutation equivariance, attention
normalization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.ops.slot_attention import SlotAttention


def _layernorm(x, scale, bias, eps=1e-3):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _gru_cell(x, h, params):
    """Numpy GRU matching flax GRUCell param layout."""
    def dense(p, v):
        y = v @ p["kernel"]
        if "bias" in p:
            y = y + p["bias"]
        return y

    r = jax.nn.sigmoid(dense(params["ir"], x) + dense(params["hr"], h))
    z = jax.nn.sigmoid(dense(params["iz"], x) + dense(params["hz"], h))
    n = np.tanh(dense(params["in"], x) + r * dense(params["hn"], h))
    return (1 - z) * n + z * h


def _numpy_slot_attention(inputs, slots, p, num_iters, dim_feats, eps=1e-8):
    """Direct transcription of the reference algorithm (attention.py:67-112)."""
    scale = dim_feats ** -0.5
    x = _layernorm(inputs, p["norm_input"]["scale"], p["norm_input"]["bias"])
    k = x @ p["to_k"]["kernel"] + p["to_k"]["bias"]
    v = x @ p["to_v"]["kernel"] + p["to_v"]["bias"]
    attn_out = None
    for _ in range(num_iters):
        slots_prev = slots
        s_n = _layernorm(slots, p["norm_slot"]["scale"], p["norm_slot"]["bias"])
        q = s_n @ p["to_q"]["kernel"] + p["to_q"]["bias"]
        dots = np.einsum("bsd,bnd->bsn", q, k) * scale
        e = np.exp(dots - dots.max(axis=1, keepdims=True))
        attn = e / e.sum(axis=1, keepdims=True) + eps
        attn_out = attn
        attn = attn / attn.sum(axis=-1, keepdims=True)
        updates = np.einsum("bsn,bnd->bsd", attn, v)
        b, s, d = slots.shape
        h = _gru_cell(updates.reshape(-1, d), slots_prev.reshape(-1, d), p["gru"])
        slots = np.asarray(h).reshape(b, s, d)
        s_m = _layernorm(slots, p["norm_mlp"]["scale"], p["norm_mlp"]["bias"])
        hidden = np.maximum(s_m @ p["mlp"]["w0"] + p["mlp"]["b0"], 0)
        slots = slots + hidden @ p["mlp"]["w1"] + p["mlp"]["b1"]
    return slots, attn_out


def _extract(params):
    """Flatten flax SlotAttention params into the numpy layout used above."""
    p = params["params"]
    gru = p["gru"]
    return {
        "norm_input": {"scale": np.asarray(p["norm_input"]["scale"]),
                       "bias": np.asarray(p["norm_input"]["bias"])},
        "norm_slot": {"scale": np.asarray(p["norm_slot"]["scale"]),
                      "bias": np.asarray(p["norm_slot"]["bias"])},
        "norm_mlp": {"scale": np.asarray(p["norm_mlp"]["scale"]),
                     "bias": np.asarray(p["norm_mlp"]["bias"])},
        "to_q": {"kernel": np.asarray(p["to_q"]["kernel"]), "bias": np.asarray(p["to_q"]["bias"])},
        "to_k": {"kernel": np.asarray(p["to_k"]["kernel"]), "bias": np.asarray(p["to_k"]["bias"])},
        "to_v": {"kernel": np.asarray(p["to_v"]["kernel"]), "bias": np.asarray(p["to_v"]["bias"])},
        "gru": {
            "ir": {"kernel": np.asarray(gru["ir"]["kernel"]), "bias": np.asarray(gru["ir"]["bias"])},
            "iz": {"kernel": np.asarray(gru["iz"]["kernel"]), "bias": np.asarray(gru["iz"]["bias"])},
            "in": {"kernel": np.asarray(gru["in"]["kernel"]), "bias": np.asarray(gru["in"]["bias"])},
            "hr": {"kernel": np.asarray(gru["hr"]["kernel"])},
            "hz": {"kernel": np.asarray(gru["hz"]["kernel"])},
            "hn": {"kernel": np.asarray(gru["hn"]["kernel"]), "bias": np.asarray(gru["hn"]["bias"])},
        },
        "mlp": {
            "w0": np.asarray(p["mlp"]["Dense_0"]["kernel"]),
            "b0": np.asarray(p["mlp"]["Dense_0"]["bias"]),
            "w1": np.asarray(p["mlp"]["Dense_1"]["kernel"]),
            "b1": np.asarray(p["mlp"]["Dense_1"]["bias"]),
        },
    }


@pytest.fixture(scope="module")
def sa_setup():
    mod = SlotAttention(dim_feats=32, dim_slots=16, num_slots=4, mlp_hidden=24)
    key = jax.random.PRNGKey(0)
    inputs = jax.random.normal(jax.random.PRNGKey(1), (2, 25, 32))
    slots = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16))
    params = mod.init(key, inputs, slots, num_iters=1)
    return mod, params, inputs, slots


def test_matches_numpy_reference(sa_setup):
    mod, params, inputs, slots = sa_setup
    for n_iters in (1, 3):
        out, attn = mod.apply(params, inputs, slots, num_iters=n_iters)
        ref_out, ref_attn = _numpy_slot_attention(
            np.asarray(inputs), np.asarray(slots), _extract(params), n_iters, dim_feats=32
        )
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(attn), ref_attn, rtol=1e-3, atol=1e-4)


def test_attention_softmax_over_slots(sa_setup):
    mod, params, inputs, slots = sa_setup
    _, attn = mod.apply(params, inputs, slots, num_iters=2)
    # softmax across the SLOT dim (+eps): columns sum to ~1 over slots
    sums = np.asarray(attn).sum(axis=1)
    np.testing.assert_allclose(sums, np.ones_like(sums), rtol=1e-4, atol=1e-5)


def test_slot_permutation_equivariance(sa_setup):
    mod, params, inputs, slots = sa_setup
    out, _ = mod.apply(params, inputs, slots, num_iters=2)
    perm = jnp.asarray([2, 0, 3, 1])
    out_p, _ = mod.apply(params, inputs, slots[:, perm], num_iters=2)
    np.testing.assert_allclose(np.asarray(out[:, perm]), np.asarray(out_p), rtol=1e-4, atol=1e-5)


def test_jit_matches_eager(sa_setup):
    mod, params, inputs, slots = sa_setup
    eager, _ = mod.apply(params, inputs, slots, num_iters=2)
    jitted = jax.jit(lambda p, i, s: mod.apply(p, i, s, num_iters=2)[0])(params, inputs, slots)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6)
