"""Optional REAL-codec adapters behind the documented decode seams.

The sandbox ships deterministic fake codecs (payload/codec.py FIMG
images, pipeline/multimodal.py FAUD/FVID containers) because the
native decode libraries are not installed here.  Production installs
that have Pillow / soundfile get real media decoding through the SAME
seam signatures — auto-detected at import time, no engine changes:

- image: ``decode(buf) -> (ok, fmt, w, h, pixels[h,w,3] uint8)``
  consumed by ``image_checks.payload_violations(decoder=...)``;
- audio: ``decode(buf) -> (sample_rate, samples float64 mono in
  [-1,1])`` (raise ValueError on malformed) consumed by
  ``multimodal.audio_features(decoder=...)``.

``auto_image_decoder()`` / ``auto_audio_decoder()`` return the real
adapter when its library imports, else the deterministic fake — so the
same pipeline code validates real media in production and stays
hermetic in CI.
"""

from __future__ import annotations

import io
from typing import Callable, Optional, Tuple

import numpy as np

from . import codec as fake_image_codec
from ..pipeline.multimodal import decode_audio_fake as fake_audio_decode  # noqa: F401  (re-export: the fake in the seam signature)


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def soundfile_available() -> bool:
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def pil_decode(
    buf: Optional[bytes],
) -> Tuple[bool, Optional[str], int, int, Optional[np.ndarray]]:
    """Pillow-backed image decode with the codec.decode signature.
    fmt comes back lowercase ('jpeg'/'png'/'webp'), pixels as RGB
    uint8 [h, w, 3] — exactly what the Arrow battery consumes."""
    from PIL import Image, UnidentifiedImageError

    if not buf:
        return False, None, 0, 0, None
    try:
        with Image.open(io.BytesIO(bytes(buf))) as im:
            fmt = (im.format or "").lower()
            rgb = im.convert("RGB")
            px = np.asarray(rgb, dtype=np.uint8)
            h, w = px.shape[:2]
            return True, fmt, w, h, px
    except (UnidentifiedImageError, OSError, ValueError):
        return False, None, 0, 0, None


def soundfile_decode(buf: Optional[bytes]) -> Tuple[int, np.ndarray]:
    """libsndfile-backed audio decode: any container soundfile reads
    (wav/flac/ogg) → (rate, mono float64).  Raises ValueError on
    malformed input (the audio_features contract)."""
    import soundfile as sf

    if not buf:
        raise ValueError("empty clip")
    try:
        data, rate = sf.read(io.BytesIO(bytes(buf)), dtype="float64")
    except Exception as e:  # sf.LibsndfileError subclasses RuntimeError
        raise ValueError(f"undecodable clip: {e}")
    if data.ndim > 1:
        data = data.mean(axis=1)
    if rate == 0 or data.size == 0:
        raise ValueError("empty/zero-rate clip")
    return int(rate), data


def wave_decode(buf: Optional[bytes]) -> Tuple[int, np.ndarray]:
    """Stdlib-``wave`` backed decode for UNCOMPRESSED RIFF/WAVE PCM —
    a REAL container format with no external dependency, so one
    real-codec path runs in every environment (round-5 item; the
    sandbox lacks Pillow/soundfile).  8/16/32-bit integer PCM →
    (rate, mono float64 in [-1, 1]); raises ValueError on malformed
    input (the audio_features contract)."""
    import wave as _wave

    if not buf:
        raise ValueError("empty clip")
    try:
        with _wave.open(io.BytesIO(bytes(buf)), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            nframes = w.getnframes()
            raw = w.readframes(nframes)
    except (_wave.Error, EOFError, OSError) as e:
        raise ValueError(f"undecodable clip: {e}")
    if rate == 0 or nframes == 0 or nch == 0:
        raise ValueError("empty/zero-rate clip")
    if width == 1:
        # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        x = x[: (x.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    if x.size == 0:
        raise ValueError("empty clip")
    return int(rate), x


def wave_or_fake_decode(buf: Optional[bytes]) -> Tuple[int, np.ndarray]:
    """Container-dispatched fallback decoder: RIFF/WAVE magic → the
    stdlib ``wave`` parser, anything else → the deterministic FAUD
    fake — so pipelines mix real WAV clips and synthetic fixtures
    through ONE seam without soundfile installed."""
    if buf and bytes(buf[:4]) == b"RIFF":
        return wave_decode(buf)
    return fake_audio_decode(buf)


def png_or_fake_decode(
    buf: Optional[bytes],
) -> Tuple[bool, Optional[str], int, int, Optional[np.ndarray]]:
    """Container-dispatched image fallback (round-6 twin of
    wave_or_fake_decode): PNG magic → the vendored pure-stdlib PNG
    parser (payload/png.py — real chunk framing, CRCs, inflate,
    defilter), anything else → the deterministic FIMG fake — so the
    image battery decodes a REAL container in every environment."""
    if buf and bytes(buf[:8]) == b"\x89PNG\r\n\x1a\n":
        from . import png as _png

        return _png.decode(buf)
    return fake_image_codec.decode(buf)


def auto_image_decoder() -> Callable:
    return pil_decode if pil_available() else png_or_fake_decode


def auto_audio_decoder() -> Callable:
    return soundfile_decode if soundfile_available() else wave_or_fake_decode
