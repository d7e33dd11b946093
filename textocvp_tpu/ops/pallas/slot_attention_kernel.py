"""
Fused Pallas TPU kernel for the slot-attention refinement loop.

One program per batch element keeps K/V resident in VMEM across ALL
refinement iterations and fuses the entire chain — LayerNorm, q projection,
softmax-over-slots, weighted-mean renormalization, attention-weighted V, GRU
cell and residual MLP — into a single kernel, eliminating the HBM round-trips
between the many small ops the XLA path emits per iteration
(reference algorithm: src/models/Blocks/attention.py:67-112).

Shapes (per program): k, v (N, D); slots (S, D) with S ~ 8-10, D ~ 128,
N up to 4096 (64x64 locations). The (S, D) slot tile is a single fp32
register tile; the (S, N) attention matrix and both matmuls
((S,D)x(D,N) and (S,N)x(N,D)) map directly onto the MXU.

Forward-only: training uses the XLA path (autodiff through the fused kernel
is future work); inference/benchmark paths enable it via the `tpu.use_pallas`
config flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm(x, scale, bias, eps=1e-3):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _slot_attention_kernel(
    # inputs
    k_ref, v_ref, slots_ref,
    ns_scale_ref, ns_bias_ref, nm_scale_ref, nm_bias_ref,
    q_w_ref, q_b_ref,
    gru_ir_w_ref, gru_ir_b_ref, gru_iz_w_ref, gru_iz_b_ref,
    gru_in_w_ref, gru_in_b_ref,
    gru_hr_w_ref, gru_hz_w_ref, gru_hn_w_ref, gru_hn_b_ref,
    mlp_w0_ref, mlp_b0_ref, mlp_w1_ref, mlp_b1_ref,
    # outputs
    slots_out_ref, attn_out_ref,
    *, num_iters: int, scale: float, epsilon: float,
):
    k = k_ref[0]  # (N, D)
    v = v_ref[0]
    slots = slots_ref[0]  # (S, D)

    for _ in range(num_iters):
        slots_prev = slots
        s_n = _layernorm(slots, ns_scale_ref[:], ns_bias_ref[:])
        q = jnp.dot(s_n, q_w_ref[:], preferred_element_type=jnp.float32) + q_b_ref[:]

        # dots (S, N); softmax over the SLOT dim (axis 0) — slots compete
        dots = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dots = dots - jnp.max(dots, axis=0, keepdims=True)
        attn = jnp.exp(dots)
        attn = attn / jnp.sum(attn, axis=0, keepdims=True) + epsilon
        attn_out_ref[0] = attn
        w = attn / jnp.sum(attn, axis=1, keepdims=True)

        updates = jnp.dot(w, v, preferred_element_type=jnp.float32)  # (S, D)

        # GRU cell: x = updates, h = slots_prev (flax GRUCell layout)
        r = jax.nn.sigmoid(
            jnp.dot(updates, gru_ir_w_ref[:], preferred_element_type=jnp.float32)
            + gru_ir_b_ref[:]
            + jnp.dot(slots_prev, gru_hr_w_ref[:], preferred_element_type=jnp.float32)
        )
        z = jax.nn.sigmoid(
            jnp.dot(updates, gru_iz_w_ref[:], preferred_element_type=jnp.float32)
            + gru_iz_b_ref[:]
            + jnp.dot(slots_prev, gru_hz_w_ref[:], preferred_element_type=jnp.float32)
        )
        n = jnp.tanh(
            jnp.dot(updates, gru_in_w_ref[:], preferred_element_type=jnp.float32)
            + gru_in_b_ref[:]
            + r * (jnp.dot(slots_prev, gru_hn_w_ref[:], preferred_element_type=jnp.float32)
                   + gru_hn_b_ref[:])
        )
        slots = (1.0 - z) * n + z * slots_prev

        # residual MLP
        s_m = _layernorm(slots, nm_scale_ref[:], nm_bias_ref[:])
        h = jnp.maximum(
            jnp.dot(s_m, mlp_w0_ref[:], preferred_element_type=jnp.float32) + mlp_b0_ref[:],
            0.0,
        )
        slots = slots + jnp.dot(h, mlp_w1_ref[:], preferred_element_type=jnp.float32) \
            + mlp_b1_ref[:]

    slots_out_ref[0] = slots


def _xla_iterations(k, v, slots, params, num_iters: int, scale: float, epsilon: float):
    """Functional XLA twin of the fused kernel (identical math, batched jnp
    ops) — used as the differentiable surrogate in the custom VJP."""

    def dense(p, x):
        y = jnp.einsum("...d,df->...f", x, jnp.asarray(p["kernel"], jnp.float32))
        if "bias" in p:
            y = y + jnp.asarray(p["bias"], jnp.float32)
        return y

    def ln(p, x, eps=1e-3):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * jnp.asarray(
            p["scale"], jnp.float32) + jnp.asarray(p["bias"], jnp.float32)

    gru = params["gru"]
    attn_out = None
    for _ in range(num_iters):
        slots_prev = slots
        q = dense(params["to_q"], ln(params["norm_slot"], slots))
        dots = jnp.einsum("bsd,bnd->bsn", q, k) * scale
        attn = jax.nn.softmax(dots, axis=1) + epsilon
        attn_out = attn
        w = attn / jnp.sum(attn, axis=-1, keepdims=True)
        updates = jnp.einsum("bsn,bnd->bsd", w, v)
        r = jax.nn.sigmoid(dense(gru["ir"], updates) + dense(gru["hr"], slots_prev))
        z = jax.nn.sigmoid(dense(gru["iz"], updates) + dense(gru["hz"], slots_prev))
        n = jnp.tanh(dense(gru["in"], updates) + r * dense(gru["hn"], slots_prev))
        slots = (1.0 - z) * n + z * slots_prev
        h = jax.nn.relu(dense(params["mlp"]["Dense_0"], ln(params["norm_mlp"], slots)))
        slots = slots + dense(params["mlp"]["Dense_1"], h)
    return slots, attn_out


def slot_attention_iterations(
    k: jax.Array, v: jax.Array, slots: jax.Array, num_iters: int,
    params: dict, scale: float, epsilon: float = 1e-8,
) -> tuple[jax.Array, jax.Array]:
    """
    Fused refinement: k, v (B, N, D), slots (B, S, D) -> (slots, attn) with
    attn (B, S, N), matching SlotAttention.iterate's XLA path bit-for-bit up
    to float accumulation order. Differentiable: the backward pass recomputes
    through the functional XLA twin (custom VJP), so ``use_pallas`` works in
    training too (at rematerialization cost).
    """
    in_dtype = slots.dtype
    out, attn = _fused(
        k.astype(jnp.float32), v.astype(jnp.float32), slots.astype(jnp.float32),
        jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params),
        num_iters, scale, epsilon,
    )
    return out.astype(in_dtype), attn.astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(k, v, slots, params, num_iters, scale, epsilon):
    return _pallas_forward(k, v, slots, params, num_iters, scale, epsilon)


def _fused_fwd(k, v, slots, params, num_iters, scale, epsilon):
    out = _pallas_forward(k, v, slots, params, num_iters, scale, epsilon)
    return out, (k, v, slots, params)


def _fused_bwd(num_iters, scale, epsilon, residuals, g):
    k, v, slots, params = residuals
    _, vjp = jax.vjp(
        lambda k_, v_, s_, p_: _xla_iterations(k_, v_, s_, p_, num_iters, scale, epsilon),
        k, v, slots, params,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _pallas_forward(
    k: jax.Array, v: jax.Array, slots: jax.Array,
    params: dict, num_iters: int, scale: float, epsilon: float,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch the fused TPU kernel (no autodiff rules of its own)."""
    b, n, d = k.shape
    s = slots.shape[1]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)

    gru = params["gru"]
    weights = [
        f32(params["norm_slot"]["scale"]), f32(params["norm_slot"]["bias"]),
        f32(params["norm_mlp"]["scale"]), f32(params["norm_mlp"]["bias"]),
        f32(params["to_q"]["kernel"]), f32(params["to_q"]["bias"]),
        f32(gru["ir"]["kernel"]), f32(gru["ir"]["bias"]),
        f32(gru["iz"]["kernel"]), f32(gru["iz"]["bias"]),
        f32(gru["in"]["kernel"]), f32(gru["in"]["bias"]),
        f32(gru["hr"]["kernel"]), f32(gru["hz"]["kernel"]),
        f32(gru["hn"]["kernel"]), f32(gru["hn"]["bias"]),
        f32(params["mlp"]["Dense_0"]["kernel"]), f32(params["mlp"]["Dense_0"]["bias"]),
        f32(params["mlp"]["Dense_1"]["kernel"]), f32(params["mlp"]["Dense_1"]["bias"]),
    ]

    batch_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _slot_attention_kernel, num_iters=num_iters, scale=scale, epsilon=epsilon
    )
    out_slots, out_attn = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[batch_spec((n, d)), batch_spec((n, d)), batch_spec((s, d))]
        + [full_spec] * len(weights),
        out_specs=(batch_spec((s, d)), batch_spec((s, n))),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, d), jnp.float32),
            jax.ShapeDtypeStruct((b, s, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # grid blocks are double-buffered by the pipeline: k and v blocks
            # need 2x(N*D) each; weights/outputs add ~2 MB more
            vmem_limit_bytes=min(
                14 * 1024 * 1024,
                4 * (2 * n * d + 2 * s * n + s * d) * 4
                + sum(int(w.size) for w in weights) * 8 + 3 * 1024 * 1024,
            ),
        ),
    )(
        k.astype(jnp.float32), v.astype(jnp.float32), slots.astype(jnp.float32), *weights
    )
    return out_slots.astype(slots.dtype), out_attn.astype(slots.dtype)
