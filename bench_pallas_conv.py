#!/usr/bin/env python
"""
Go/no-go probe for a Pallas fused decoder-tail kernel: a single 5x5 64->64
conv (the SAVi ConvDecoder tail layer, reference decoders.py:52-125) written
as an even/odd column-packed matmul chain, A/B'd against XLA's conv at the
exact flagship decode shape (9728 frames of 64x64x64, bf16).

The packing: NHWC (64, 64, 64) reshaped to (64, 32, 128) puts two adjacent
image columns in one 128-lane vector. A 5x5 conv then becomes 15 accumulated
(2048, 128) @ (128, 128) matmuls — MXU-dense in every dimension — indexed by
(dh in -2..2) x (column-pair shift in -1..1), with the even/odd output
parities occupying lane halves. The packed output IS the next layer's packed
input (both are plain reshapes), so chaining layers needs no relayout.
FLOP overhead vs the mathematical conv: 1.2x (50 of the 60 weight blocks are
nonzero).

If the Pallas single conv >= XLA's conv throughput here, a fused 3-conv tail
kernel eliminates the inter-layer HBM round-trips on top; if it loses, the
fused kernel cannot win and the negative gets documented.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_conv5_weights(w, dtype=jnp.bfloat16):
    """(5,5,64,64) HWIO -> (15, 128, 128): blocks indexed by (dh, dj) with
    input lane-halves = input column parity and output lane-halves = output
    column parity."""
    w = np.asarray(w, np.float32)
    wp = np.zeros((5, 3, 128, 128), np.float32)
    for dh in range(5):
        for vi, dj in enumerate((-1, 0, 1)):
            for hi in range(2):
                for p in range(2):
                    dw = 2 * dj + hi - p + 2
                    if 0 <= dw <= 4:
                        wp[dh, vi, hi * 64:(hi + 1) * 64, p * 64:(p + 1) * 64] = w[dh, dw]
    return jnp.asarray(wp.reshape(15, 128, 128), dtype)


def _conv5_frame(x, w_ref, b_ref, relu: bool, form: str, out_dtype):
    """One packed frame (64, 32, 128) -> (64, 32, 128)."""
    xpad = jnp.pad(x, ((2, 2), (0, 0), (0, 0)))          # h zero-pad
    xm = jnp.pad(xpad[:, :31], ((0, 0), (1, 0), (0, 0)))  # column-pair -1
    xp = jnp.pad(xpad[:, 1:], ((0, 0), (0, 1), (0, 0)))   # column-pair +1
    views = (xm.reshape(2176, 128), xpad.reshape(2176, 128),
             xp.reshape(2176, 128))
    if form == "dots15":
        acc = jnp.zeros((2048, 128), jnp.float32)
        i = 0
        for dh in range(5):
            s = dh * 32
            for v in views:
                acc = acc + jnp.dot(v[s:s + 2048], w_ref[i],
                                    preferred_element_type=jnp.float32)
                i += 1
    elif form == "dots3":
        # K-pack the 5 dh slices per view -> 3 dots of (2048, 640)
        acc = jnp.zeros((2048, 128), jnp.float32)
        for vi, v in enumerate(views):
            kv = jnp.concatenate([v[dh * 32:dh * 32 + 2048] for dh in range(5)],
                                 axis=1)  # (2048, 640)
            wv = jnp.concatenate([w_ref[dh * 3 + vi] for dh in range(5)], axis=0)
            acc = acc + jnp.dot(kv, wv, preferred_element_type=jnp.float32)
    else:  # dot1: one (2048, 1920) im2col dot
        kv = jnp.concatenate(
            [v[dh * 32:dh * 32 + 2048] for dh in range(5) for v in views],
            axis=1)  # (2048, 1920) — order (dh major, view minor) = w index dh*3+vi
        wv = jnp.concatenate([w_ref[i] for i in range(15)], axis=0)
        acc = jnp.dot(kv, wv, preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype).reshape(64, 32, 128)


def _conv5_kernel(x_ref, w_ref, b_ref, o_ref, *, relu: bool, form: str,
                  frames: int):
    for f in range(frames):
        o_ref[f] = _conv5_frame(x_ref[f], w_ref, b_ref, relu, form,
                                o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "form", "frames"))
def conv5_pallas(x, wp, bp, relu=True, form="dots15", frames=1):
    """x: (N, 64, 64, 64) bf16 NHWC; wp: (15,128,128); bp: (1,128)."""
    n = x.shape[0]
    xp = x.reshape(n, 64, 32, 128)
    out = pl.pallas_call(
        functools.partial(_conv5_kernel, relu=relu, form=form, frames=frames),
        out_shape=jax.ShapeDtypeStruct((n, 64, 32, 128), x.dtype),
        grid=(n // frames,),
        in_specs=[
            pl.BlockSpec((frames, 64, 32, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((15, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((frames, 64, 32, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xp, wp, bp)
    return out.reshape(n, 64, 64, 64)


@functools.partial(jax.jit, static_argnames=("relu", "chunks"))
def conv5_xla(x, w, b, relu=True, chunks=4):
    """Production-form XLA baseline: the conv as a scanned chunk loop with
    constant-ish weights (mirrors ConvDecoder._tail_scanned)."""
    def one(xc):
        y = jax.lax.conv_general_dilated(
            xc, w, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + b.reshape(1, 1, 1, -1)
        return jnp.maximum(y, 0.0) if relu else y

    n = x.shape[0]
    if chunks <= 1:
        return one(x)
    xc = x.reshape(chunks, n // chunks, *x.shape[1:])
    _, y = jax.lax.scan(lambda c, v: (c, one(v)), (), xc, unroll=chunks)
    return y.reshape(n, *y.shape[2:])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[-1, -1]))  # D2H sync (remote-attached runtimes)
    del out
    t0 = time.perf_counter()
    scalars = []
    for _ in range(iters):
        # dispatch a scalar reduction right behind each step so the big
        # output buffer is consumed in FIFO order (keeping all iters' outputs
        # alive OOMs HBM at the flagship shape)
        scalars.append(jnp.sum(fn(*args)[-1, -1]))
    for s in scalars:
        float(s)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4864)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    n = args.frames
    x = (jax.random.normal(key, (n, 64, 64, 64)) * 0.5).astype(dtype)
    w = (jax.random.normal(jax.random.PRNGKey(1), (5, 5, 64, 64))
         * (1.0 / np.sqrt(25 * 64))).astype(dtype)
    b = (jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1).astype(dtype)

    wp = pack_conv5_weights(w, dtype)
    bp = jnp.concatenate([b, b]).reshape(1, 128).astype(dtype)

    # correctness on a small slice
    xs = x[:64]
    ref = conv5_xla(xs, w, b, chunks=1)
    for form in ("dots15", "dots3", "dot1"):
        got = conv5_pallas(xs, wp, bp, form=form)
        err = jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        scale = jnp.max(jnp.abs(ref.astype(jnp.float32)))
        print(f"[{form}] max abs err vs XLA conv: {float(err):.3e} "
              f"(scale {float(scale):.2f})")
        assert float(err) <= 0.05 * float(scale) + 1e-2, "Pallas conv mismatch"

    flops = 2 * 25 * n * 64 * 64 * 64 * 64
    for name, fn, fargs in [
        ("xla flat     ", conv5_xla, (x, w, b, True, 1)),
        ("xla chunk2   ", conv5_xla, (x, w, b, True, 2)),
        ("xla chunk4   ", conv5_xla, (x, w, b, True, 4)),
        ("pallas 15d f1", conv5_pallas, (x, wp, bp, True, "dots15", 1)),
        ("pallas 15d f4", conv5_pallas, (x, wp, bp, True, "dots15", 4)),
        ("pallas 3d  f1", conv5_pallas, (x, wp, bp, True, "dots3", 1)),
        ("pallas 3d  f4", conv5_pallas, (x, wp, bp, True, "dots3", 4)),
        ("pallas 1d  f1", conv5_pallas, (x, wp, bp, True, "dot1", 1)),
        ("pallas 1d  f2", conv5_pallas, (x, wp, bp, True, "dot1", 2)),
    ]:
        dt = timeit(lambda *a: fn(*a), *fargs, iters=args.iters)
        print(f"{name}: {dt * 1e3:8.2f} ms   {flops / dt / 1e12:7.1f} TFLOPS")


if __name__ == "__main__":
    main()
