"""
Slot decoders (reference src/models/EncodersDecoders/decoders.py).

* ``ConvDecoder`` — spatial-broadcast CNN rendering per-slot RGBA, NHWC.
* ``MLPPatchDecoder`` — per-patch MLP predicting ViT features + alpha masks,
  with an optional CNN image head.

Both are batched over ``B*num_slots`` (and, at the model level, over all
frames at once), keeping the MXU busy with one large call.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from textocvp_tpu.nn.blocks import ConvBlock, upsample_bilinear, upsample_nearest, xavier_uniform

DECODERS = ["ConvDecoder", "MLPPatchDecoder"]


class ConvDecoder(nn.Module):
    """
    Fully convolutional decoder: ConvBlocks (hidden_dims traversed in reverse)
    with optional nearest upsampling between them, then a final 3x3 conv to
    ``out_channels`` (RGB + alpha) (reference decoders.py:52-125).

    ``__call__(x)`` is the generic path. :meth:`decode_broadcast` exploits the
    spatial-broadcast structure of the input (a spatially-constant slot tile
    plus a fixed positional map): by linearity of convolution,
    ``conv(tile(s) + P) = expand(conv(tile_small(s))) + conv_nobias(P)``, so
    the first (and FLOP-heaviest, slot_dim-in) conv layer runs on a
    ``(4*pad+1)``-sized tile instead of the full resolution — exact up to
    float reassociation. Requires stride 1 and no batch norm (the stock SAVi
    decoder config).
    """

    hidden_dims: Sequence[int]
    kernel_size: int = 5
    stride: int = 1
    upsample: Optional[int] = None
    out_channels: int = 4
    batch_norm: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks = [
            ConvBlock(
                out_channels=self.hidden_dims[i],
                kernel_size=self.kernel_size,
                stride=self.stride,
                batch_norm=bool(self.batch_norm),
                dtype=self.dtype,
                name=f"ConvBlock_{len(self.hidden_dims) - 1 - i}",
            )
            for i in range(len(self.hidden_dims) - 1, -1, -1)
        ]
        self.final_conv = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=xavier_uniform,
            dtype=self.dtype, name="Conv_0",
        )

    def _tail(self, x, train: bool):
        """Blocks after the first (upsampling applied between blocks exactly
        as in ``__call__``), then the final conv."""
        up = None if (self.upsample is None or self.upsample < 2) else self.upsample
        n = len(self.hidden_dims)
        # after block j (reference index i = n-1-j) upsampling applies iff i > 0
        if up is not None and n - 1 > 0:
            x = upsample_nearest(x, up)
        for j, block in enumerate(self.blocks[1:], start=1):
            x = block(x, train=train)
            if up is not None and (n - 1 - j) > 0:
                x = upsample_nearest(x, up)
        return self.final_conv(x)

    def __call__(self, x, train: bool = False):
        up = None if (self.upsample is None or self.upsample < 2) else self.upsample
        n = len(self.hidden_dims)
        for j, block in enumerate(self.blocks):
            x = block(x, train=train)
            i = n - 1 - j  # reference loop index
            if up is not None and i > 0:
                x = upsample_nearest(x, up)
        return self.final_conv(x)

    def decode_broadcast(self, slots, pos_map, resolution, train: bool = False,
                         expand_impl: str = "concat", tail_chunks: int = 1,
                         tail_remat: bool = False,
                         tail_unroll: Optional[int] = None,
                         quant_scales=None, calibrate: bool = False):
        """
        slots: (N, D) spatially-constant content; pos_map: (H0, W0, D) the
        positional projection added to the broadcast. Equivalent to
        ``__call__(tile(slots) + pos_map)`` with the first conv layer computed
        on a small tile. Falls back to the generic path when the structure
        doesn't apply.

        ``expand_impl`` selects how the small map is expanded to full
        resolution: 'gather' fuses best in inference-only programs but its
        backward is a serialized scatter on TPU; 'concat'
        (slice+broadcast+concat) has a cheap reduction backward — use it
        whenever gradients flow through the decoder.

        ``tail_chunks > 1`` runs the tail convs as a ``lax.scan`` over that
        many batch chunks: on TPU v5e the identical convs sustain ~2.6x the
        TFLOPS as a small-working-set loop body than as one flat multi-GB
        batch (docs/PERFORMANCE.md "decode chunking"). Exact — batch elements
        are independent. The first conv + expand must stay OUTSIDE the scan
        (broadcast/gather ops inside a scan body compile to a pathological
        schedule on the current toolchain — measured 4-6x slower). Ignored
        when it does not divide the batch.

        ``tail_remat`` wraps the scan body in ``jax.checkpoint`` so the
        backward pass recomputes each chunk's tail activations instead of
        materializing them for all chunks at once — required to use chunking
        in TRAINING, where the stacked per-chunk residuals otherwise blow HBM
        (19.0 G vs 15.75 G at the B=64 SAVi step, models/chunked.py).

        ``tail_unroll`` overrides the scan-unroll policy
        (models/chunked.py::pick_tail_unroll) — used by the runtime decode
        autotuner; None = policy.

        ``quant_scales`` (an ``(L,)`` f32 array, L = number of tail convs
        before the final one) switches those convs to int8: activations are
        quantized per-tensor with the given static scales and weights
        per-output-channel inside the traced program (int8 MXU peak is ~2x
        bf16 on v5e — docs/PERFORMANCE.md "int8 decode"). Obtain scales with
        ``calibrate=True``, which runs the bf16 tail on this input and
        returns the per-layer input amaxes instead of images.
        """
        h, w = resolution
        pad = self.kernel_size // 2
        small = 4 * pad + 1
        if (self.stride != 1 or self.batch_norm or h < small or w < small):
            if quant_scales is not None or calibrate:
                raise ValueError(
                    "int8 decode quantization requires the fast-broadcast "
                    "decode structure (stride 1, no batch norm, resolution "
                    f">= {small}px); this decoder falls back to the generic "
                    "path. Unset tpu.decode_quant for this experiment.")
            n = slots.shape[0]
            x = jnp.broadcast_to(slots[:, None, None, :], (n, h, w, slots.shape[-1]))
            return self(x + pos_map[None], train=train)

        conv1 = self.blocks[0].conv
        # content part on a small tile (captures all border patterns)
        n, d = slots.shape
        tile = jnp.broadcast_to(slots[:, None, None, :], (n, small, small, d))
        y_small = conv1(tile)  # includes bias
        # positional part, bias excluded (it is already in y_small)
        y_pos = conv1(pos_map[None]) - jnp.asarray(
            conv1.variables["params"]["bias"], self.dtype)

        # expand the small map: border rows/cols keep their pattern, interior
        # pixels take the center value
        if expand_impl == "gather":
            def idx(full):
                ar = jnp.arange(full)
                return jnp.where(ar < pad, ar,
                                 jnp.where(ar >= full - pad, ar - full + small, 2 * pad))

            expanded = y_small[:, idx(h)][:, :, idx(w)]
        else:
            def expand_axis(y, full, axis):
                top = jax.lax.slice_in_dim(y, 0, pad, axis=axis)
                mid = jax.lax.slice_in_dim(y, 2 * pad, 2 * pad + 1, axis=axis)
                mid_shape = list(mid.shape)
                mid_shape[axis] = full - 2 * pad
                mid = jnp.broadcast_to(mid, mid_shape)
                bot = jax.lax.slice_in_dim(y, small - pad, small, axis=axis)
                return jnp.concatenate([top, mid, bot], axis=axis)

            expanded = expand_axis(expand_axis(y_small, h, axis=1), w, axis=2)

        y1 = expanded + y_pos
        x = jax.nn.relu(y1) if self.blocks[0].activation else y1

        if calibrate:
            return self._tail_amaxes(x)
        if quant_scales is not None and not self.is_initializing():
            # fail fast on a scale/config mismatch: out-of-bounds jnp
            # indexing CLAMPS under jit, so a short vector would silently
            # reuse the last scale for the remaining convs
            expected = len(self.hidden_dims) - 1
            if quant_scales.shape[0] != expected:
                raise ValueError(
                    f"quant_scales has {quant_scales.shape[0]} entries but "
                    f"this ConvDecoder has {expected} hidden tail convs — "
                    "recalibrate for this decoder config")
            # quantized tail always runs the functional form (tail_chunks=1
            # compiles to the flat body) so quality does not depend on the
            # chunking schedule the batch size happens to pick
            chunks = tail_chunks if (tail_chunks > 1
                                     and x.shape[0] % tail_chunks == 0) else 1
            return self._tail_scanned(x, chunks, remat=tail_remat,
                                      unroll=tail_unroll,
                                      quant_scales=quant_scales)
        if (tail_chunks > 1 and x.shape[0] % tail_chunks == 0
                and not self.is_initializing()):
            return self._tail_scanned(x, tail_chunks, remat=tail_remat,
                                      unroll=tail_unroll)
        return self._tail(x, train=train)

    def _tail_pieces(self):
        """Conv params of the tail, pulled from the bound submodules for
        functional application (scan bodies / quantized path)."""
        tail_params = []
        for block in self.blocks[1:]:
            p = block.conv.variables["params"]
            tail_params.append((p["kernel"], p["bias"], block.activation))
        fp = self.final_conv.variables["params"]
        up = None if (self.upsample is None or self.upsample < 2) else self.upsample
        return tail_params, fp, up, len(self.hidden_dims), self.kernel_size // 2

    @staticmethod
    def _quantize_conv(xc, kernel, bias, pad, a_scale):
        """int8 x int8 -> int32 conv with per-tensor activation scale and
        per-output-channel weight scales, dequantized to f32 (+bias).

        The weight quantization is inside the traced program on purpose:
        with const-baked frozen weights XLA folds it at compile time, and
        otherwise it costs one pass over a tiny (k,k,C,C) tensor. The
        activation quantize (round/clip/cast) is elementwise with a STATIC
        scale, so XLA fuses it into the producing op's epilogue — the
        intermediate is written to HBM as int8, halving traffic vs bf16."""
        w = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-30) / 127.0
        w_q = jnp.round(w / w_scale).astype(jnp.int8)
        x_q = jnp.clip(jnp.round(xc.astype(jnp.float32) / a_scale),
                       -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q, w_q, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (a_scale * w_scale) + bias.astype(
            jnp.float32).reshape(1, 1, 1, -1)

    def _tail_amaxes(self, x):
        """bf16 tail walk returning the (L,) per-layer conv-input amaxes used
        to calibrate ``quant_scales`` (L = len(hidden_dims) - 1)."""
        tail_params, fp, up, n, pad = self._tail_pieces()
        amaxes = []
        xc = x
        if up is not None and n - 1 > 0:
            xc = upsample_nearest(xc, up)
        for j, (kernel, bias, activation) in enumerate(tail_params, start=1):
            amaxes.append(jnp.max(jnp.abs(xc.astype(jnp.float32))))
            xc = self._apply_conv(xc, kernel, bias, pad)
            if activation:
                xc = nn.relu(xc)
            if up is not None and (n - 1 - j) > 0:
                xc = upsample_nearest(xc, up)
        return jnp.stack(amaxes)

    def _apply_conv(self, xc, kernel, bias, pad):
        from flax.linen.dtypes import promote_dtype

        xc, kernel, bias = promote_dtype(xc, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            xc, kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.reshape(1, 1, 1, -1)

    def _tail_scanned(self, x, tail_chunks: int, remat: bool = False,
                      unroll: Optional[int] = None, quant_scales=None):
        """``_tail`` as a raw ``lax.scan`` over batch chunks, with the conv
        params pulled from the bound submodules and applied functionally.

        A raw scan is deliberate: the flax ``nn.scan`` lifted transform
        compiles this loop ~2.3x slower on the current TPU toolchain (515 ms
        vs 228 ms at the flagship shape — docs/PERFORMANCE.md "decode
        chunking"). Exactness vs ``_tail`` (values and gradients) is asserted
        by tests/test_chunked_decode.py. Assumes the decode_broadcast
        preconditions (stride 1, no batch norm).

        With ``quant_scales`` the hidden tail convs run int8
        (:meth:`_quantize_conv`); the final conv stays bf16/f32 — it is
        1/16th of the FLOPs and produces the RGBA output whose precision
        the mask softmax consumes."""
        apply_conv = self._apply_conv
        tail_params, fp, up, n, pad = self._tail_pieces()

        def tail_fn(xc):
            # mirrors _tail exactly (upsample placement included)
            if up is not None and n - 1 > 0:
                xc = upsample_nearest(xc, up)
            for j, (kernel, bias, activation) in enumerate(tail_params, start=1):
                if quant_scales is not None:
                    xc = self._quantize_conv(xc, kernel, bias, pad,
                                             quant_scales[j - 1])
                else:
                    xc = apply_conv(xc, kernel, bias, pad)
                if activation:
                    xc = nn.relu(xc)
                if up is not None and (n - 1 - j) > 0:
                    xc = upsample_nearest(xc, up)
            return apply_conv(xc, fp["kernel"], fp["bias"], 1)

        if remat:
            # backward recomputes each chunk's tail instead of storing every
            # chunk's conv activations — makes chunking HBM-viable in training
            tail_fn = jax.checkpoint(tail_fn)

        chunks = x.reshape(tail_chunks, x.shape[0] // tail_chunks, *x.shape[1:])
        # Unroll: explicit caller value (autotuner) > TEXTOCVP_TAIL_UNROLL
        # perf-probe env (bench_decode_probe.py, read at trace time) > policy
        # (models/chunked.py::pick_tail_unroll — only the fully-unrolled
        # 4-chunk form beats the rolled scan on v5e).
        if unroll is None:
            from textocvp_tpu.core.config import env_int

            unroll = env_int("TEXTOCVP_TAIL_UNROLL")
            if unroll is None:
                from textocvp_tpu.models.chunked import pick_tail_unroll

                unroll = pick_tail_unroll(tail_chunks, remat)
        _, y = jax.lax.scan(lambda c, xc: (c, tail_fn(xc)), (), chunks,
                            unroll=min(max(1, unroll), tail_chunks))
        return y.reshape(x.shape[0], *y.shape[2:])


def subpixel_upconv3x3(x, kernel, bias, dtype):
    """``conv3x3_same(upsample_nearest(x, 2))`` computed on the ORIGINAL grid.

    After nearest-x2 upsampling every 3x3 window covers only 2x2 DISTINCT
    source pixels (neighbors are copies), with tap weights summed by output
    parity: row taps for even outputs are [k0, k1+k2] over source rows
    [i-1, i], for odd outputs [k0+k1, k2] over [i, i+1] (same per column).
    The four parity kernels concatenate into ONE 2x2 x Cin x (4*Cout) conv
    on the (1,1)-zero-padded input whose parity slices pixel-shuffle into
    the upsampled-grid result — 16/36 of the naive FLOPs and no 4x-area
    intermediate in HBM, exact up to float summation order. Zero padding
    commutes with nearest upsampling at the borders, so edges match too."""
    k = kernel.astype(jnp.float32)
    t0 = jnp.stack([k[0], k[1] + k[2]], axis=0)  # (2, 3, Cin, Cout)
    t1 = jnp.stack([k[0] + k[1], k[2]], axis=0)

    def col_combine(t):
        g0 = jnp.stack([t[:, 0], t[:, 1] + t[:, 2]], axis=1)  # (2,2,Cin,Cout)
        g1 = jnp.stack([t[:, 0] + t[:, 1], t[:, 2]], axis=1)
        return g0, g1

    g00, g01 = col_combine(t0)
    g10, g11 = col_combine(t1)
    big = jnp.concatenate([g00, g01, g10, g11], axis=-1).astype(dtype)
    b_, h, w, _ = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, big, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, H+1, W+1, 4Cout)
    outs = [y[:, a:h + a, b:w + b, (2 * a + b) * cout:(2 * a + b + 1) * cout]
            for a in (0, 1) for b in (0, 1)]
    z = jnp.stack([jnp.stack(outs[:2], axis=-1),
                   jnp.stack(outs[2:], axis=-1)], axis=-2)  # (B,H,W,C,a,b)
    z = z.transpose(0, 1, 4, 2, 5, 3).reshape(b_, 2 * h, 2 * w, cout)
    return z + bias.astype(z.dtype)


class MLPPatchDecoder(nn.Module):
    """
    Spatial-broadcast MLP patch decoder (reference decoders.py:129-365):
    slots broadcast over patches + learned positional embedding -> per-patch
    MLP -> (features, alpha); softmax over slots renders the patch features;
    optional CNN head upsamples the feature grid to an RGB image.
    """

    num_patches: int
    in_dim: int
    hidden_dim: int
    out_dim: int  # feature dim + 1 (alpha)
    num_layers: int = 4
    initial_layer_norm: bool = False
    reconstruct_images: bool = False
    patch_size: Optional[int] = None
    img_size: Optional[int] = None
    num_layers_cnn: Optional[int] = None
    subpixel_upconv: bool = False  # fold x2 upsamples into the next conv
    fused_slot_mix: bool = False  # slot-reduce BEFORE the final feature dense
    dtype: Any = jnp.float32

    @property
    def patch_grid(self) -> tuple[int, int]:
        g = int(self.num_patches ** 0.5)
        return (g, g)

    def _cnn_plan(self):
        """Static (out_channels, upsample_after) per CNN-head layer — the
        reference's in-loop channel-halving/upsampling schedule
        (decoders.py:325-365) precomputed so setup() and the quantized
        functional walk agree exactly."""
        plan = []
        hidden = self.hidden_dim
        current = self.patch_grid[0]
        for i in range(self.num_layers_cnn):
            grow = ((i + 1) * 2 < self.patch_size) and (current < self.img_size)
            if (i > 0) and grow:
                hidden = hidden // 2
            plan.append((hidden, grow))
            if grow:
                current *= 2
        return plan

    def setup(self):
        self.pos_embed = self.param(
            "pos_embed",
            lambda key, shape: jax.random.normal(key, shape) / (self.in_dim ** 0.5),
            (1, 1, self.num_patches, self.in_dim),
        )
        if self.initial_layer_norm:
            self.initial_ln = nn.LayerNorm(dtype=self.dtype)
        self.mlps = [
            nn.Dense(self.hidden_dim if i < self.num_layers - 1 else self.out_dim,
                     kernel_init=xavier_uniform, dtype=self.dtype, name=f"mlp_{i}")
            for i in range(self.num_layers)
        ]
        if self.reconstruct_images:
            self.cnns = [
                ConvBlock(out_channels=hidden, kernel_size=3, stride=1,
                          batch_norm=True, dtype=self.dtype, name=f"cnn_{i}")
                for i, (hidden, _) in enumerate(self._cnn_plan())
            ]
            self.cnn_final = nn.Conv(3, (3, 3), padding=1,
                                     kernel_init=xavier_uniform, dtype=self.dtype)

    @staticmethod
    def _quantize_dense(x, params, a_scale):
        """int8 x int8 -> int32 dense with per-tensor activation scale and
        per-output-column weight scales, dequantized to f32 (+bias). Same
        design as ConvDecoder._quantize_conv — static scales let the
        quantize fuse into the producer's epilogue."""
        w = params["kernel"].astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-30) / 127.0
        w_q = jnp.round(w / w_scale).astype(jnp.int8)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                       -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (a_scale * w_scale) + params[
            "bias"].astype(jnp.float32)

    @staticmethod
    def _fold_bn(block):
        """Inference-time BatchNorm folded into the preceding conv's affine —
        exact given the running stats (the quantized path has no separate BN
        op to attach to)."""
        p = block.conv.variables["params"]
        bnp = block.bn.variables["params"]
        stats = block.bn.variables["batch_stats"]
        s = bnp["scale"].astype(jnp.float32) / jnp.sqrt(
            stats["var"].astype(jnp.float32) + block.bn.epsilon)
        kernel = p["kernel"].astype(jnp.float32) * s
        bias = (p["bias"].astype(jnp.float32)
                - stats["mean"].astype(jnp.float32)) * s + bnp["bias"].astype(
                    jnp.float32)
        return kernel, bias

    def __call__(self, slots, train: bool = False, quant_scales=None,
                 calibrate: bool = False):
        """
        slots: (B, num_slots, slot_dim). Returns dict with recons_feats
        (B, P, out_dim-1), masks (B, S, 1, gh, gw), recons_imgs
        (B, H, W, 3) or None.

        ``quant_scales`` (an ``(L,)`` f32 array, L = num_layers [+
        num_layers_cnn when reconstructing images]) switches the patch-MLP
        denses and the BN-folded CNN-head convs to int8 (measured 1.62x /
        ~1.3x per op on v5e — docs/PERFORMANCE.md "int8 decode"); the final
        RGB conv stays bf16/f32. ``calibrate=True`` runs the bf16 path and
        returns the (L,) per-layer input amaxes instead of outputs.
        """
        b, s, d = slots.shape
        quant = quant_scales is not None and not self.is_initializing()
        if quant:
            # fail fast on a scale/config mismatch (out-of-bounds jnp
            # indexing clamps under jit instead of raising)
            expected = self.num_layers + (self.num_layers_cnn
                                          if self.reconstruct_images else 0)
            if quant_scales.shape[0] != expected:
                raise ValueError(
                    f"quant_scales has {quant_scales.shape[0]} entries but "
                    f"this MLPPatchDecoder needs {expected} "
                    f"({self.num_layers} MLP + "
                    f"{self.num_layers_cnn if self.reconstruct_images else 0}"
                    " CNN) — recalibrate for this decoder config")
        amaxes = []
        x = jnp.broadcast_to(slots[:, :, None, :], (b, s, self.num_patches, d))
        x = x + jnp.asarray(self.pos_embed, self.dtype)

        if self.initial_layer_norm:
            x = self.initial_ln(x)
        fused = (self.fused_slot_mix and not quant and not calibrate
                 and not self.is_initializing())
        for i, dense in enumerate(self.mlps[:-1] if fused else self.mlps):
            if calibrate:
                amaxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            if quant:
                x = self._quantize_dense(x, dense.variables["params"],
                                         quant_scales[i])
            else:
                x = dense(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        x = x.astype(self.dtype)

        if fused:
            # The slot mix is linear in the final dense's FEATURE columns:
            # sum_s a_s (W_f h_s + b_f) = W_f (sum_s a_s h_s) + b_f (softmax
            # weights sum to 1), and the alpha column is one cheap (h -> 1)
            # dense — so the (out_dim-1)-wide dense runs on the SLOT-REDUCED
            # rows (num_slots x fewer) and the per-slot feature tensor never
            # exists. Same linearity trick as ConvDecoder.decode_broadcast.
            pl = self.mlps[-1].variables["params"]
            k = pl["kernel"].astype(self.dtype)
            bias = pl["bias"].astype(self.dtype)
            alpha = x @ k[:, -1:] + bias[-1]  # (B, S, P, 1)
            alpha = jax.nn.softmax(
                alpha.astype(jnp.float32), axis=1).astype(x.dtype)
            h_mix = jnp.sum(x * alpha, axis=1)  # (B, P, hidden)
            recons_feats = h_mix @ k[:, :-1] + bias[:-1]  # (B, P, out_dim-1)
        else:
            feats, alpha = x[..., :-1], x[..., -1:]
            alpha = jax.nn.softmax(
                alpha.astype(jnp.float32), axis=1).astype(x.dtype)
            recons_feats = jnp.sum(feats * alpha, axis=1)  # (B, P, out_dim-1)
        gh, gw = self.patch_grid
        masks = alpha.reshape(b, s, 1, gh, gw)

        recons_imgs = None
        if self.reconstruct_images:
            recons_imgs = self._conv_patch_decoder(
                recons_feats.reshape(b, gh, gw, self.out_dim - 1),  # NHWC
                train=train,
                quant_scales=quant_scales[self.num_layers:] if quant else None,
                calibrate=calibrate, amaxes=amaxes)
        if calibrate:
            return jnp.stack(amaxes)
        return {"recons_imgs": recons_imgs, "recons_feats": recons_feats, "masks": masks}

    def _conv_patch_decoder(self, x, train: bool = False, quant_scales=None,
                            calibrate: bool = False, amaxes=None):
        """
        CNN head: conv blocks with batch norm, x2 nearest upsampling while the
        spatial size is below img_size and (i+1)*2 < patch_size, halving the
        channel count after the first upsample (reference decoders.py:325-365);
        final 3x3 conv to RGB and bilinear resize to the exact image size.

        With ``quant_scales``: each ConvBlock's conv+BN is folded to one
        affine (:meth:`_fold_bn`) and run int8 via ConvDecoder._quantize_conv;
        ReLU and upsample placement unchanged.

        With ``subpixel_upconv`` (bf16 path only): every x2 nearest upsample
        is folded into the FOLLOWING conv via :func:`subpixel_upconv3x3`
        (same math, 4/9 the FLOPs, no 4x-area intermediate); BN and ReLU run
        on the interleaved result exactly as in the plain order.
        """
        subpixel = (self.subpixel_upconv and quant_scales is None
                    and not calibrate and not self.is_initializing())
        pending = False
        for i, (block, (_, grow)) in enumerate(zip(self.cnns, self._cnn_plan())):
            if calibrate:
                amaxes.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
            if quant_scales is not None:
                kernel, bias = self._fold_bn(block)
                x = nn.relu(ConvDecoder._quantize_conv(
                    x, kernel, bias, 1, quant_scales[i]))
            elif pending:
                p = block.conv.variables["params"]
                x = subpixel_upconv3x3(x, p["kernel"], p["bias"], self.dtype)
                if block.batch_norm:
                    x = block.bn(x, use_running_average=not train)
                x = nn.relu(x)
            else:
                x = block(x, train=train)
            pending = grow and subpixel
            if grow and not pending:
                x = upsample_nearest(x, 2)
        if calibrate:
            return None
        if pending:
            p = self.cnn_final.variables["params"]
            x = subpixel_upconv3x3(x, p["kernel"], p["bias"], self.dtype)
        else:
            x = self.cnn_final(x)
        if x.shape[1] != self.img_size:
            x = upsample_bilinear(x, (self.img_size, self.img_size))
        return x


def get_decoder(decoder: dict, dtype=jnp.float32) -> nn.Module:
    """Decoder factory (reference decoders.py:20-48)."""
    name = decoder["decoder_name"]
    params = dict(decoder.get("decoder_params", {}))
    if name not in DECODERS:
        raise ValueError(f"Unknown decoder_name {name!r}. Use one of {DECODERS}")
    if name == "ConvDecoder":
        return ConvDecoder(
            hidden_dims=tuple(params["num_channels"]),
            kernel_size=params.get("kernel_size", 5),
            stride=params.get("stride", 1),
            upsample=params.get("upsample"),
            batch_norm=bool(params.get("batch_norm") or False),
            dtype=dtype,
        )
    return MLPPatchDecoder(
        num_patches=params["num_patches"],
        in_dim=params["in_dim"],
        hidden_dim=params["hidden_dim"],
        out_dim=params["out_dim"],
        num_layers=params.get("num_layers", 4),
        initial_layer_norm=params.get("initial_layer_norm", False),
        reconstruct_images=params.get("reconstruct_images", False),
        patch_size=params.get("patch_size"),
        img_size=params.get("img_size"),
        num_layers_cnn=params.get("num_layers_cnn"),
        subpixel_upconv=bool(params.get("subpixel_upconv", False)),
        fused_slot_mix=bool(params.get("fused_slot_mix", False)),
        dtype=dtype,
    )
