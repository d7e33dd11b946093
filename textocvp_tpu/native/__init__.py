"""Native (C++) host-side helpers for the data pipeline.

The TPU compute path is JAX/XLA; this package holds the *host* runtime's
native layer — currently `imgio`, a libpng decode + PIL-bit-exact bilinear
resize used by the dataset loaders (reference behavior:
/root/reference/src/data/CLIPort.py:100-106, Cater.py:144-147).

The shared library is built on demand with the system toolchain
(`build()`, or `scripts/build_native.sh`); every consumer falls back to the
PIL path transparently when it is unavailable, and because the native resize
is bit-exact with PIL.BILINEAR the fallback cannot change numerics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imgio.cpp")
_LIB_PATH = os.path.join(_DIR, f"_imgio_py{sys.version_info.major}{sys.version_info.minor}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def build(verbose: bool = False) -> bool:
    """Compile imgio.cpp into the package directory. Returns True on success.

    Compiles to a process-unique temp path and os.rename()s into place so
    concurrent builders (e.g. DataLoader process workers) never dlopen a
    partially written .so."""
    tmp_path = f"{_LIB_PATH}.tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp_path, _SRC, "-lpng", "-lz",
    ]
    try:
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            return False
        try:
            os.rename(tmp_path, _LIB_PATH)  # atomic on the same filesystem
        except OSError:
            # lost a rename race: fine if a concurrent builder won
            return os.path.exists(_LIB_PATH)
        return True
    finally:
        # every failure path leaves tmp_path behind; a successful rename
        # removes it, making this unlink a no-op
        try:
            os.unlink(tmp_path)
        except OSError:
            pass


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.imgio_png_size.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.imgio_png_size.restype = ctypes.c_int
    lib.imgio_decode_png_rgb.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.imgio_decode_png_rgb.restype = ctypes.c_int
    lib.imgio_resize_bilinear_rgb.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.imgio_resize_bilinear_rgb.restype = ctypes.c_int
    lib.imgio_decode_png_rgb_resized.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.imgio_decode_png_rgb_resized.restype = ctypes.c_int
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    """Load (building once if needed) the native library; None if unavailable.

    Auto-build is gated behind TEXTOCVP_NATIVE_IMGIO != "0"; a failed attempt
    is remembered so the PIL fallback costs one check, not a compile retry."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("TEXTOCVP_NATIVE_IMGIO", "1") == "0":
            _load_failed = True
            return None
        if not os.path.exists(_LIB_PATH) and not build():
            _load_failed = True
            return None
        try:
            _lib = _bind(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None
        return _lib


def available() -> bool:
    return _get_lib() is not None


def png_size(data: bytes) -> Optional[tuple]:
    """(height, width) of PNG bytes without decoding; None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.imgio_png_size(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_png_rgb(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes to an (h, w, 3) uint8 array; None if unavailable/failed."""
    lib = _get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.imgio_png_size(data, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.imgio_decode_png_rgb(data, len(data),
                                  out.ctypes.data_as(ctypes.c_void_p),
                                  h.value, w.value)
    return out if rc == 0 else None


def resize_bilinear_rgb(img: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """PIL-BILINEAR-bit-exact resize of an (h, w, 3) uint8 array."""
    lib = _get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    rc = lib.imgio_resize_bilinear_rgb(
        img.ctypes.data_as(ctypes.c_void_p), img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.c_void_p), out_h, out_w)
    return out if rc == 0 else None


def decode_png_rgb_resized(data: bytes, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Fused PNG decode + resize to (out_h, out_w, 3) uint8; None on failure."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    rc = lib.imgio_decode_png_rgb_resized(
        data, len(data), out_h, out_w, out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None
