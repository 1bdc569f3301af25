"""Deterministic image codec — the sandbox stand-in for real decoders.

The north-star payload checks (BASELINE.json input_hint) need decode
validity, declared-vs-actual dimensions, and PSNR against a reference
decode.  This container has no PIL/libjpeg/ffmpeg, so the engine ships
a self-contained deterministic codec with the same *interface* a real
decoder would have; the Spark-side plumbing (binary column, Arrow
batches, schema, partitioning) is identical either way.

Production swap: implement ``decode(buf) -> (ok, fmt, w, h, pixels)``
with PIL/turbojpeg behind the same signature and pass it to
``image_checks.payload_violations(decoder=...)``.

Wire format (little-endian):
    magic  b'FIMG'           4 bytes
    fmt    u8                0=jpeg 1=png 2=webp
    w, h   u16 each
    seed   u64               pixel-content seed
    crc32  u32               of the compressed payload
    payload zlib(pixels u8[h,w,3])

"Lossy" formats (jpeg, webp) quantize pixels to multiples of 4 at
encode — max error 2/channel → PSNR ≈ 45 dB vs the exact reference,
comfortably above the 40 dB gate; png is lossless.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

MAGIC = b"FIMG"
FMT_CODES = {"jpeg": 0, "png": 1, "webp": 2}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}
LOSSY = {"jpeg", "webp"}
_HDR = struct.Struct("<4sBHHQI")


# counter-based pixel generator (murmur3 32-bit finalizer): fully
# vectorizable with NO per-image RNG-object construction (a numpy
# Philox Generator costs ~50µs/image just to set up — measured) and
# 32-bit ops throughout (this numpy build's uint64 multiply is a ~45x
# slower scalar path — measured).  image_checks batches the generation
# across every image in an Arrow batch in one pass.
_GOLD32 = np.uint32(2654435761)
_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_IDX32 = np.arange(1 << 16, dtype=np.uint32)  # covers any w*h*3 here


def _mix32(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint32(16)
    x *= _C1
    x ^= x >> np.uint32(13)
    x *= _C2
    x ^= x >> np.uint32(16)
    return x


def ref_bytes_flat(counters: np.ndarray) -> np.ndarray:
    """uint8 stream for an arbitrary uint32 counter array — the
    batched primitive image_checks uses to regenerate MANY images'
    reference pixels in one vectorized pass."""
    return (_mix32(counters) & np.uint32(0xFF)).astype(np.uint8)


def seed32(seed: int) -> np.uint32:
    return np.uint32((seed * 2654435761) & 0xFFFFFFFF)


def ref_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """The reference decode: the exact pixel array an uncorrupted
    image with this seed should contain (deterministic, so executors
    can regenerate it without any side data)."""
    n = w * h * 3
    counters = _IDX32[:n] + seed32(seed)
    return ref_bytes_flat(counters).reshape(h, w, 3)


def encode(
    seed: int,
    w: int,
    h: int,
    fmt: str,
    noise_amp: int = 0,
) -> bytes:
    """Encode the deterministic image for ``seed``; ``noise_amp`` adds
    a deterministic pixel perturbation (for injecting PSNR failures)."""
    px = ref_pixels(seed, w, h).astype(np.int16)
    if noise_amp:
        n = w * h * 3
        counters = _IDX32[:n] + seed32(seed ^ 0xA5A5A5A5) + np.uint32(1)
        noise = (
            ref_bytes_flat(counters).astype(np.int16) % (2 * noise_amp + 1)
        ) - noise_amp
        px = px + noise.reshape(px.shape)
    if fmt in LOSSY:
        px = (px // 4) * 4
    px = np.clip(px, 0, 255).astype(np.uint8)
    payload = zlib.compress(px.tobytes(), level=1)
    hdr = _HDR.pack(MAGIC, FMT_CODES[fmt], w, h, seed & 0xFFFFFFFFFFFFFFFF,
                    zlib.crc32(payload) & 0xFFFFFFFF)
    return hdr + payload


def decode(buf: Optional[bytes]) -> Tuple[bool, Optional[str], int, int, Optional[np.ndarray]]:
    """→ (ok, fmt, w, h, pixels). ok=False on any structural damage
    (bad magic, short header, CRC mismatch, payload corruption)."""
    if buf is None or len(buf) < _HDR.size:
        return False, None, 0, 0, None
    try:
        magic, fmt_code, w, h, seed, crc = _HDR.unpack_from(buf, 0)
    except struct.error:
        return False, None, 0, 0, None
    if magic != MAGIC or fmt_code not in FMT_NAMES:
        return False, None, 0, 0, None
    payload = bytes(buf[_HDR.size:])
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        return False, FMT_NAMES[fmt_code], w, h, None
    try:
        raw = zlib.decompress(payload)
    except zlib.error:
        return False, FMT_NAMES[fmt_code], w, h, None
    if len(raw) != w * h * 3:
        return False, FMT_NAMES[fmt_code], w, h, None
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return True, FMT_NAMES[fmt_code], w, h, px


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
