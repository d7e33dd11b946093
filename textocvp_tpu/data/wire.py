"""
uint8-on-the-wire: host→device video transport in uint8, normalized on-device.

The reference ships float32 video batches to the GPU (torch DataLoader +
``.to(device)``, /root/reference/src/data/load_data.py:53-74) — fine over
PCIe, but 4x the bytes of the uint8 the PNG/mp4 decoders produce. On TPU the
host→device hop is the narrow link (on this build machine it is a network
tunnel: 216 MB float32 CLIPort batch = 3.4 s, the same batch as uint8 =
0.19 s — measured in docs/PERFORMANCE.md "Host input pipeline"), and the
float conversion itself costs ~1.8 s/batch of host CPU the loader workers
need for decode. So the TPU-native contract is: datasets/loader keep frames
uint8 end-to-end (``uint8_output=True`` / config ``dataset.uint8_wire``),
and every jitted step normalizes on-device through :func:`as_float_video`.

Exactness: both wires normalize as ``uint8.astype(float32) * float32(1/255)``
— ONE float32 multiply. The multiply form (not ``/255``) is deliberate: XLA
strength-reduces a division by a constant into a reciprocal multiply, so a
host-side division and the compiled device program disagree by 1 ulp on ~half
the values; with both sides multiplying by the same reciprocal constant the
two wires produce bit-identical model inputs (pinned by
tests/test_uint8_wire.py). Every host decode path in data/datasets.py uses
the same constant for the same reason.
"""

from __future__ import annotations

import numpy as np

# float32(1/255): the one normalization constant both wires share (see above)
INV255 = np.float32(1.0 / 255.0)


def as_float_video(x):
    """Normalize a uint8 video batch to float32 [0, 1]; pass floats through.

    Safe under ``jit`` (the dtype test is resolved at trace time — the float
    path traces to a no-op) and on host numpy/np arrays alike. Every jitted
    train/valid/eval/serve step calls this first, so both wire dtypes are
    accepted everywhere.
    """
    if x.dtype == np.uint8:
        if isinstance(x, np.ndarray):
            return x.astype(np.float32) * INV255
        import jax.numpy as jnp

        return x.astype(jnp.float32) * INV255
    return x


def to_uint8_frames(frames: np.ndarray) -> np.ndarray:
    """Invert the ``k/255`` float normalization back to uint8 (host side).

    Exact for any frame that came from a uint8 decoder (all of them do:
    PNG/JPEG/mp4 pixels are k/255 with k integral), so converting a float
    pipeline output back to the wire format is lossless. Used by the slow
    dataset branches that do not have a native uint8 read path.
    """
    if frames.dtype == np.uint8:
        return frames
    return np.round(frames * 255.0).astype(np.uint8)
