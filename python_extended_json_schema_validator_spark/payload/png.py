"""Vendored pure-stdlib PNG codec (zlib + struct + numpy — no Pillow).

Round-6 twin of the round-5 stdlib ``wave`` adapter: a REAL container
format the image battery can decode in EVERY environment, so the
payload pipeline exercises true parsing (magic, chunk framing, CRCs,
inflate, scanline defilter) even where native imaging libraries are
absent.  Production installs still prefer Pillow through the same
seam (adapters.auto_image_decoder: Pillow → stdlib-png → fake).

Supported: 8-bit-per-sample, non-interlaced PNG in all five color
types (gray, RGB, palette, gray+alpha, RGBA) with all five scanline
filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).  Rejected loudly
(decode returns not-ok): 1/2/4/16-bit depths, Adam7 interlace, bad
CRC, truncated chunks, inflate errors.  Alpha is dropped like
Pillow's ``convert("RGB")`` (channel discard, no compositing).

The encoder writes canonical filter-0 RGB/gray/RGBA rows — used by
tests and fixture builders to produce real PNGs without Pillow.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _defilter(
    raw: bytes, h: int, stride: int, bpp: int
) -> np.ndarray:
    """Undo per-scanline filtering → (h, stride) uint8.  Up/None rows
    vectorize; Sub/Average/Paeth carry a left-byte dependency and run
    a per-byte loop (test-scale images; production uses Pillow)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rowlen = stride + 1
    for y in range(h):
        f = raw[y * rowlen]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * rowlen + 1
        ).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode(
    buf: Optional[bytes],
) -> Tuple[bool, Optional[str], int, int, Optional[np.ndarray]]:
    """codec.decode-signature PNG decode: ``(ok, 'png', w, h,
    pixels[h, w, 3] uint8)``; (False, None, 0, 0, None) on anything
    malformed or unsupported."""
    if not buf:
        return False, None, 0, 0, None
    data = bytes(buf)
    if data[:8] != _MAGIC:
        return False, None, 0, 0, None
    try:
        pos = 8
        ihdr = None
        idat = bytearray()
        plte = None
        while pos + 12 <= len(data):
            (length,), ctype = (
                struct.unpack(">I", data[pos : pos + 4]),
                data[pos + 4 : pos + 8],
            )
            chunk = data[pos + 8 : pos + 8 + length]
            if len(chunk) != length:
                raise ValueError("truncated chunk")
            (crc,) = struct.unpack(
                ">I", data[pos + 8 + length : pos + 12 + length]
            )
            if (zlib.crc32(ctype + chunk) & 0xFFFFFFFF) != crc:
                raise ValueError("chunk crc mismatch")
            pos += 12 + length
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", chunk)
            elif ctype == b"PLTE":
                plte = chunk
            elif ctype == b"IDAT":
                idat += chunk
            elif ctype == b"IEND":
                break
        if ihdr is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        w, h, depth, color, comp, filt, interlace = ihdr
        if (
            depth != 8
            or comp != 0
            or filt != 0
            or interlace != 0
            or color not in _CHANNELS
            or w == 0
            or h == 0
        ):
            raise ValueError("unsupported PNG shape")
        ch = _CHANNELS[color]
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError("bad decompressed length")
        px = _defilter(raw, h, stride, ch).reshape(h, w, ch)
        if color == 2:  # RGB
            rgb = px
        elif color == 6:  # RGBA: drop alpha (Pillow convert("RGB"))
            rgb = px[:, :, :3]
        elif color == 0:  # gray
            rgb = np.repeat(px, 3, axis=2)
        elif color == 4:  # gray+alpha
            rgb = np.repeat(px[:, :, :1], 3, axis=2)
        else:  # palette
            if plte is None or len(plte) % 3:
                raise ValueError("palette image without PLTE")
            table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            idx = px[:, :, 0]
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("palette index out of range")
            rgb = table[idx]
        return True, "png", int(w), int(h), np.ascontiguousarray(rgb)
    except (ValueError, zlib.error, struct.error, OverflowError):
        return False, None, 0, 0, None


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode(px: np.ndarray, level: int = 6) -> bytes:
    """Canonical PNG bytes from uint8 pixels: (h, w, 3) → RGB,
    (h, w, 4) → RGBA, (h, w) → grayscale; filter 0 rows, one IDAT."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        color, ch = 0, 1
        body = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color, ch = 2, 3
        body = px
    elif px.ndim == 3 and px.shape[2] == 4:
        color, ch = 6, 4
        body = px
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = body.shape[:2]
    stride = w * ch
    raw = bytearray()
    flat = body.reshape(h, stride)
    for y in range(h):
        raw.append(0)
        raw += flat[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )
