"""Audio fingerprint near-dup (pipeline/multimodal.py): band-occupancy
fingerprint invariances, the NULL-on-undecodable contract, and the
banded pair join on the audio modality."""

import numpy as np
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.payload import phash
from python_extended_json_schema_validator_spark.pipeline import multimodal as mm


def _chord(freqs, gain=0.5, noise_seed=1, n=8000, rate=8000):
    rng = np.random.Generator(np.random.Philox(noise_seed))
    t = np.arange(n, dtype=np.float64)
    x = np.zeros(n)
    for f in freqs:
        x += 0.1 * np.sin(2 * np.pi * f * t / rate)
    x = gain * x + 0.02 * rng.standard_normal(n)
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    return pcm.astype(np.float64) / 32768.0


FREQS_A = [62.5 * s + 31.25 for s in (5, 11, 19, 23, 31, 40, 47, 55)]
FREQS_B = [62.5 * s + 31.25 for s in (6, 12, 20, 24, 32, 41, 48, 56)]


def test_fingerprint_gain_and_noise_invariant():
    a = mm.audio_fingerprint64(8000, _chord(FREQS_A, gain=0.5, noise_seed=1))
    b = mm.audio_fingerprint64(8000, _chord(FREQS_A, gain=0.3, noise_seed=99))
    assert phash.hamming64(a, b) == 0
    c = mm.audio_fingerprint64(8000, _chord(FREQS_B))
    assert phash.hamming64(a, c) >= 2


def test_fingerprint_too_short_raises():
    import pytest

    with pytest.raises(ValueError):
        mm.audio_fingerprint64(8000, np.zeros(16))


def test_fingerprints_null_on_undecodable(spark):
    good = mm.encode_audio(5)
    df = spark.createDataFrame(
        [("a", bytes(good)), ("bad", b"nope")],
        "audio_id string, bytes binary",
    )
    got = {r.audio_id: (r.afp, r.decode_ok)
           for r in mm.audio_fingerprints(df).collect()}
    assert got["a"][1] is True and got["a"][0] is not None
    assert got["bad"] == (None, False)


def test_audio_near_duplicates_pairs(spark):
    keys = spark.range(1, 31).select(F.col("id").alias("k"))
    clips = mm.neardup_audio_from_keys(keys)
    sig = mm.audio_fingerprints(clips)
    pairs = mm.audio_near_duplicates(sig).collect()
    want = {(f"aud{k-1:08d}", f"aud{k:08d}")
            for k in range(3, 31) if k % 7 == 3}
    assert {(p.doc_a, p.doc_b) for p in pairs} == want
    assert all(p.hamming == 0 for p in pairs)


def test_video_near_duplicates_votes(spark):
    """Video modality: per-frame phash voting — injected rebuilds
    match on every frame; min_shared_frames suppresses single-frame
    coincidences."""
    keys = spark.range(1, 31).select(F.col("id").alias("k"))
    vids = mm.neardup_videos_from_keys(keys)
    pairs = mm.video_near_duplicates(vids).collect()
    want = {
        (f"vid{k-1:08d}", f"vid{k:08d}", 3 + ((k - 1) % 3))
        for k in range(3, 31) if k % 7 == 3
    }
    assert {(p.video_a, p.video_b, p.shared_frames) for p in pairs} == want
    # a high threshold suppresses everything on this corpus
    none = mm.video_near_duplicates(vids, min_shared_frames=7).count()
    assert none == 0


def test_fingerprint_resample_invariant():
    """The band mapping is physical-frequency (uses rate): the same
    chord rendered at 16 kHz fingerprints identically to 8 kHz."""
    a8 = mm.audio_fingerprint64(8000, _chord(FREQS_A, n=8000, rate=8000))
    a16 = mm.audio_fingerprint64(16000, _chord(FREQS_A, n=16000, rate=16000))
    assert phash.hamming64(a8, a16) == 0


def test_video_vote_counts_distinct_frames_not_pairs(spark):
    """A static scene repeated inside one video must not inflate the
    vote past min_shared_frames when only ONE frame truly matches."""
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        VID_MAGIC,
    )
    import struct as st

    from python_extended_json_schema_validator_spark.payload import codec

    frame = codec.encode(500, 16, 12, "png")
    other1 = codec.encode(501, 16, 12, "png")
    other2 = codec.encode(502, 16, 12, "png")

    def vid(frames):
        out = [VID_MAGIC, st.pack("<I", len(frames))]
        for fr in frames:
            out.append(st.pack("<I", len(fr)))
            out.append(fr)
        return b"".join(out)

    rows = [
        ("A", vid([frame, other1])),          # one copy of the scene
        ("B", vid([frame, frame, other2])),   # static scene twice
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    # raw pair count would be 2 (A's frame × B's two copies) — the
    # distinct-side vote is 1, below the default threshold
    assert mm.video_near_duplicates(df).count() == 0
    got = mm.video_near_duplicates(df, min_shared_frames=1).collect()
    assert [(r.video_a, r.video_b, r.shared_frames) for r in got] == [
        ("A", "B", 1)
    ]


def test_video_ids_with_hash_chars_survive(spark):
    """Video ids containing '#' must round-trip the composite frame
    id (fixed-width numeric prefix, no separator)."""
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        encode_video,
    )

    rows = [
        ("ep#1", bytes(encode_video(7, 3))),
        ("ep#2", bytes(encode_video(7, 3, noise_amp=2))),  # near-dup
        ("ep#3", bytes(encode_video(99, 3))),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = mm.video_near_duplicates(df).collect()
    assert [(r.video_a, r.video_b, r.shared_frames) for r in got] == [
        ("ep#1", "ep#2", 3)
    ]
