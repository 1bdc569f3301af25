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
        assert adapters.auto_image_decoder() is codec.decode
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


def test_pil_decode_roundtrip():
    PIL = pytest.importorskip("PIL")  # noqa: F841  (absent in sandbox)
    import io

    from PIL import Image

    px = np.zeros((12, 16, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    bio = io.BytesIO()
    Image.fromarray(px).save(bio, format="PNG")
    ok, fmt, w, h, got = adapters.pil_decode(bio.getvalue())
    assert ok and fmt == "png" and (w, h) == (16, 12)
    assert np.array_equal(got, px)
    assert adapters.pil_decode(b"not an image")[0] is False


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
