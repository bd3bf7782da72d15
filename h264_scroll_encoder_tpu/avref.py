"""Independent third-party conformance oracle (libavcodec / libx264).

The reference validates every stream with a real decoder — trans_resizer
self-verifies via `system("ffmpeg -v error ... -f null -")`
(trans_resizer.c:2176-2186) and the scroll-encoder test pipeline decodes
and extracts frames (scripts/test_encoder.sh:82-91) — and sources donor
streams from the real x264 encoder (scripts/generate_refs.sh:20-44).
This module restores both capabilities through the system libavcodec,
wrapped by native/avref.c:

  decode_pictures(data)  -> ([Picture], n_decoder_errors)
  encode_x264(frames)    -> Annex-B bytes (baseline/CAVLC donor stream)

Unlike verify.py / pixel_oracle.py (self-written against the spec), the
decoder here shares no code with the emitters, so agreement is genuine
third-party conformance.  Gated: `available()` is False when the system
libraries are missing, and tests that need the oracle skip.
"""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

from .pixel_oracle import Picture

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libh264tpu_avref.so"


@functools.lru_cache(maxsize=1)
def load_library(build: bool = True):
    """Load (building if needed) the avref library; None when the system
    libavcodec/libx264 toolchain is unavailable."""
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "avref"],
                           capture_output=True, check=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        # A stale binary built against a different libavcodec ABI: rebuild
        # once instead of silently disabling the oracle.
        if not build:
            return None
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "clean-avref"],
                           capture_output=True, check=True)
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "avref"],
                           capture_output=True, check=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
        except (OSError, subprocess.CalledProcessError):
            return None
    lib.avref_decode.restype = ctypes.c_int
    lib.avref_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.avref_encode_x264.restype = ctypes.c_long
    lib.avref_encode_x264.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    lib.avref_version.restype = ctypes.c_uint
    return lib


def available() -> bool:
    return load_library() is not None


def decode_yuv(data: bytes, max_frames: int = 4096):
    """Decode Annex-B bytes -> (yuv u8[nframes, w*h*3//2], w, h, nerrors).

    nerrors counts decoder-reported problems (send/receive failures and
    AV_LOG_ERROR messages) — 0 is the `ffmpeg -v error` clean-decode
    criterion the reference's scripts assert.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("libavcodec oracle unavailable")
    src = np.frombuffer(data, np.uint8)
    # Size the initial buffer from the compressed input (generous 64x
    # expansion, min 64 frames of 720p) instead of the absolute
    # max_frames worst case (~5.7 GB): -4 (buffer too small) grows and
    # retries, so the rare long/large stream still decodes.
    cap = min(max(len(data) * 64, 64 * 1280 * 720 * 3 // 2),
              max_frames * 1280 * 720 * 3 // 2)
    while True:
        out = np.empty(cap, np.uint8)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        ne = ctypes.c_int(0)
        n = lib.avref_decode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(ne))
        if n == -4 and cap < (1 << 33):
            cap = min(cap * 4, 1 << 33)
            continue
        break
    if n < 0:
        raise RuntimeError(f"avref_decode failed: {n}")
    fsz = w.value * h.value * 3 // 2
    return (out[: n * fsz].reshape(n, fsz).copy() if n else
            np.empty((0, 0), np.uint8)), w.value, h.value, ne.value


def decode_pictures(data: bytes):
    """Annex-B bytes -> ([pixel_oracle.Picture], n_decoder_errors)."""
    yuv, w, h, nerrors = decode_yuv(data)
    pics = []
    for row in yuv:
        y = row[: w * h].reshape(h, w)
        cb = row[w * h: w * h * 5 // 4].reshape(h // 2, w // 2)
        cr = row[w * h * 5 // 4:].reshape(h // 2, w // 2)
        pics.append(Picture(y, cb, cr))
    return pics, nerrors


def encode_x264(frames, qp: int = 20, keyint: int = 1, refs: int = 1,
                extra_params: str = "") -> bytes:
    """Encode Pictures/YUV frames with the real x264 encoder.

    Pinned to the reference donor contract (generate_refs.sh:20-44 /
    test_encoder.sh:43-58): baseline profile => CAVLC + no B-frames;
    keyint=1 => every frame IDR.  `frames` is a list of Picture or of
    (y, cb, cr) uint8 plane triples.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("libx264 encoder unavailable")
    planes = []
    for f in frames:
        y, cb, cr = ((f.y, f.cb, f.cr) if isinstance(f, Picture) else f)
        planes.append(np.concatenate(
            [np.asarray(p, np.uint8).ravel() for p in (y, cb, cr)]))
    h, w = (frames[0].y.shape if isinstance(frames[0], Picture)
            else np.asarray(frames[0][0]).shape)
    yuv = np.concatenate(planes)
    cap = max(1 << 20, yuv.size * 2)
    out = np.empty(cap, np.uint8)
    n = lib.avref_encode_x264(
        yuv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, len(frames), qp, keyint, refs,
        extra_params.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n <= 0:
        raise RuntimeError(f"avref_encode_x264 failed: {n}")
    return out[:n].tobytes()
