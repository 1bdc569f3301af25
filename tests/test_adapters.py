"""Codec-adapter seam: real decoders (Pillow / soundfile) slot into
the same decode signatures as the deterministic fakes, auto-detected
at call time.  In this container the libraries are absent, so the
real-codec cases SKIP and the auto-detectors must fall back to the
fakes; on a production install the same tests exercise real media."""

import numpy as np
import pytest

from python_extended_json_schema_validator_spark.payload import (
    adapters,
    codec,
)
from python_extended_json_schema_validator_spark.pipeline import (
    multimodal as mm,
)


def test_auto_detectors_match_availability():
    if adapters.pil_available():
        assert adapters.auto_image_decoder() is adapters.pil_decode
    else:
        # no Pillow → the hybrid seam: real stdlib PNG parsing for
        # PNG containers, deterministic fake for FIMG fixtures
        assert adapters.auto_image_decoder() is adapters.png_or_fake_decode
    if adapters.soundfile_available():
        assert adapters.auto_audio_decoder() is adapters.soundfile_decode
    else:
        # no soundfile → the hybrid seam: real stdlib WAV parsing for
        # RIFF containers, deterministic fake for FAUD fixtures
        assert adapters.auto_audio_decoder() is adapters.wave_or_fake_decode


def test_fake_audio_decode_seam_contract():
    buf = mm.encode_audio(3, 2000, 8000)
    rate, x = adapters.fake_audio_decode(buf)
    assert rate == 8000 and x.size == 2000
    assert x.dtype == np.float64 and np.max(np.abs(x)) <= 1.0
    for bad in (None, b"", b"WAT?", mm.encode_audio(3, 2000, 8000)[:6]):
        with pytest.raises(ValueError):
            adapters.fake_audio_decode(bad)


def test_audio_features_with_explicit_seam(spark):
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "audio_id": [f"a{int(k)}" for k in pdf["id"]],
                    "bytes": [
                        mm.encode_audio(int(k), 1000, 8000) if k < 3 else b"junk"
                        for k in pdf["id"]
                    ],
                }
            )

    clips = spark.range(0, 5, 1, 2).mapInPandas(
        gen, "audio_id string, bytes binary"
    )
    out = mm.audio_features(clips, decoder=adapters.auto_audio_decoder())
    rows = {r["audio_id"]: r for r in out.collect()}
    assert len(rows) == 5
    assert rows["a0"]["sample_rate"] == 8000
    assert rows["a4"]["sample_rate"] is None  # junk → nulled, task lives


def test_image_decode_real_container_any_backend():
    """A REAL PNG container decodes through the auto seam on EVERY
    environment: Pillow when installed, the vendored stdlib codec
    otherwise (round 6 — this test replaced the last importorskip)."""
    from python_extended_json_schema_validator_spark.payload import png

    px = np.zeros((12, 16, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    px[3:7, 2:9, 1] = 55
    buf = png.encode(px)
    dec = adapters.auto_image_decoder()
    ok, fmt, w, h, got = dec(buf)
    assert ok and fmt == "png" and (w, h) == (16, 12)
    assert np.array_equal(got, px)
    assert dec(b"not an image")[0] is False
    # cross-check: if Pillow IS present, the vendored codec must agree
    # with it on the same bytes
    if adapters.pil_available():
        ok2, fmt2, w2, h2, got2 = png.decode(buf)
        assert ok2 and (fmt2, w2, h2) == (fmt, w, h)
        assert np.array_equal(got2, got)


def _make_wav(x: np.ndarray, rate: int, nch: int = 1,
              width: int = 2) -> bytes:
    """Stdlib-wave WAV writer (no external dep) for roundtrips."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        else:
            pcm = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8)
        w.writeframes(pcm.tobytes())
    return bio.getvalue()


def test_wav_container_decode_roundtrip():
    # REAL container path, always runnable: uncompressed RIFF/WAVE PCM
    # through the stdlib parser (round 5 — previously every real-codec
    # test skipped in this sandbox)
    x = (0.25 * np.sin(np.linspace(0, 40, 4000))).astype(np.float64)
    rate, got = adapters.wave_decode(_make_wav(x, 8000))
    assert rate == 8000 and got.size == 4000
    assert np.max(np.abs(got - x)) < 1e-3  # 16-bit quantization only
    # stereo downmixes to mono
    st = np.stack([x, -x], axis=1).reshape(-1)
    rate2, got2 = adapters.wave_decode(_make_wav(st, 8000, nch=2))
    assert got2.size == 4000 and np.max(np.abs(got2)) < 1e-3
    # 8-bit unsigned leg
    rate3, got3 = adapters.wave_decode(_make_wav(x, 4000, width=1))
    assert rate3 == 4000 and np.max(np.abs(got3 - x)) < 2e-2
    for bad in (None, b"", b"not audio", _make_wav(x, 8000)[:20]):
        with pytest.raises(ValueError):
            adapters.wave_decode(bad)


def test_wave_or_fake_dispatch(spark):
    import pandas as pd

    x = (0.5 * np.sin(np.linspace(0, 20, 800))).astype(np.float64)
    wav = _make_wav(x, 8000)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "audio_id": [f"a{int(k)}" for k in pdf["id"]],
                    "bytes": [
                        wav if k == 0
                        else mm.encode_audio(int(k), 1000, 16000) if k < 3
                        else b"junk"
                        for k in pdf["id"]
                    ],
                }
            )

    clips = spark.range(0, 4, 1, 2).mapInPandas(
        gen, "audio_id string, bytes binary"
    )
    # one seam, three container fates: real WAV, FAUD fake, junk
    out = mm.audio_features(clips, decoder=adapters.wave_or_fake_decode)
    rows = {r["audio_id"]: r for r in out.collect()}
    assert rows["a0"]["sample_rate"] == 8000
    assert rows["a0"]["duration_s"] == pytest.approx(0.1)
    assert rows["a1"]["sample_rate"] == 16000
    assert rows["a3"]["sample_rate"] is None  # junk → nulled, task lives


def test_audio_decode_real_container_any_backend():
    """The WAV container decodes through WHICHEVER real backend this
    environment has — soundfile when installed, the stdlib wave parser
    otherwise — so this test never skips (round 5: the real-codec
    seam is exercised in every environment)."""
    x = (0.25 * np.sin(np.linspace(0, 40, 4000))).astype(np.float64)
    wav = _make_wav(x, 8000)
    decoder = adapters.auto_audio_decoder()
    rate, got = decoder(wav)
    assert rate == 8000 and got.size == 4000
    assert np.max(np.abs(got - x)) < 1e-3
    if adapters.soundfile_available():
        rate2, got2 = adapters.soundfile_decode(wav)
        assert rate2 == 8000 and got2.size == 4000
        with pytest.raises(ValueError):
            adapters.soundfile_decode(b"not audio")


# ------------------------------------------------------------------ #
# Vendored stdlib PNG codec (payload/png.py, round 6)                 #
# ------------------------------------------------------------------ #

from python_extended_json_schema_validator_spark.payload import png as pngmod


def _rng_px(h, w, ch, seed=5):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a if ch > 1 else a[:, :, 0]


def _filter_row(ftype, line, prev, bpp):
    """Forward PNG filtering (RFC 2083 §6) — the test's independent
    reference for building non-filter-0 fixtures."""
    out = bytearray([ftype])
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((line[i] - pred) & 0xFF)
    return bytes(out)


def _manual_png(px, color, filters, plte=None):
    import struct
    import zlib

    h, w = px.shape[:2]
    ch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * ch)
    raw = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        line = list(int(v) for v in flat[y])
        raw += _filter_row(filters[y % len(filters)], line, prev, ch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + pngmod._chunk(b"IHDR", ihdr)
    if plte is not None:
        out += pngmod._chunk(b"PLTE", plte)
    out += pngmod._chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + pngmod._chunk(b"IEND", b"")


def test_png_roundtrip_color_types():
    rgb = _rng_px(9, 7, 3)
    ok, fmt, w, h, got = pngmod.decode(pngmod.encode(rgb))
    assert ok and fmt == "png" and (w, h) == (7, 9)
    assert np.array_equal(got, rgb)

    gray = _rng_px(5, 11, 1, seed=9)
    ok, _, w, h, got = pngmod.decode(pngmod.encode(gray))
    assert ok and (w, h) == (11, 5)
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = _rng_px(6, 4, 4, seed=3)
    ok, _, w, h, got = pngmod.decode(pngmod.encode(rgba))
    assert ok and (w, h) == (4, 6)
    assert np.array_equal(got, rgba[:, :, :3])  # alpha dropped


def test_png_all_filter_types_defilter():
    px = _rng_px(10, 6, 3, seed=11)
    # one fixture per filter, plus a mixed-rows one
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        buf = _manual_png(px, 2, filters)
        ok, fmt, w, h, got = pngmod.decode(buf)
        assert ok, filters
        assert np.array_equal(got, px), filters


def test_png_palette():
    table = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    buf = _manual_png(idx[:, :, None], 3, [0], plte=table.tobytes())
    ok, _, w, h, got = pngmod.decode(buf)
    assert ok and (w, h) == (4, 2)
    assert np.array_equal(got, table[idx])
    # out-of-range palette index → not ok
    bad = _manual_png(
        np.full((2, 2, 1), 9, np.uint8), 3, [0], plte=table.tobytes()
    )
    assert pngmod.decode(bad)[0] is False


def test_png_rejects_malformed():
    import struct
    import zlib

    good = pngmod.encode(_rng_px(4, 4, 3))
    assert pngmod.decode(None)[0] is False
    assert pngmod.decode(b"")[0] is False
    assert pngmod.decode(b"JUNKJUNKJUNK")[0] is False
    assert pngmod.decode(good[:20])[0] is False  # truncated
    # flip one IDAT byte → CRC mismatch
    corrupt = bytearray(good)
    corrupt[45] ^= 0xFF
    assert pngmod.decode(bytes(corrupt))[0] is False
    # 16-bit depth and interlace are rejected loudly, not mis-decoded
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    b16 = (
        b"\x89PNG\r\n\x1a\n"
        + pngmod._chunk(b"IHDR", ihdr16)
        + pngmod._chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + pngmod._chunk(b"IEND", b"")
    )
    assert pngmod.decode(b16)[0] is False
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bi = (
        b"\x89PNG\r\n\x1a\n"
        + pngmod._chunk(b"IHDR", ihdr_i)
        + pngmod._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
        + pngmod._chunk(b"IEND", b"")
    )
    assert pngmod.decode(bi)[0] is False


def test_png_through_image_battery(spark):
    """Real PNG payloads through the SPARK battery (mapInPandas seam):
    declared-vs-actual geometry checks fire on real container bytes
    with no imaging library installed."""
    import pandas as pd

    from python_extended_json_schema_validator_spark.payload import (
        image_checks,
    )

    px = _rng_px(8, 10, 3, seed=21)

    def gen(batches):
        for pdf in batches:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                if k == 0:  # clean
                    rows.append(("i0", pngmod.encode(px), 10, 8, "png"))
                elif k == 1:  # wrong declared width
                    rows.append(("i1", pngmod.encode(px), 99, 8, "png"))
                elif k == 2:  # wrong declared format
                    rows.append(("i2", pngmod.encode(px), 10, 8, "jpeg"))
                else:  # undecodable
                    rows.append((f"i{k}", b"garbage", 10, 8, "png"))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    imgs = spark.range(0, 4, 1, 2).mapInPandas(
        gen, "image_id string, bytes binary, w int, h int, fmt string"
    )
    # seed_from_header=False: real containers carry no FIMG seed, so
    # the PSNR-vs-synthetic-reference leg does not apply
    out = image_checks.payload_violations(
        imgs, decoder=adapters.png_or_fake_decode, seed_from_header=False
    )
    got = {(r.row_id, r.reason) for r in out.collect()}
    assert got == {("i1", "dims"), ("i2", "fmt"), ("i3", "decode")}
