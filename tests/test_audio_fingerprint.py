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
    from python_extended_json_schema_validator_spark.pipeline import (
        multimodal as mmv,
    )

    keys = spark.range(1, 31).select(F.col("id").alias("k"))
    vids = mmv.neardup_videos_from_keys(keys)
    pairs = mmv.video_near_duplicates(vids).collect()
    want = {
        (f"vid{k-1:08d}", f"vid{k:08d}", 3 + ((k - 1) % 3))
        for k in range(3, 31) if k % 7 == 3
    }
    assert {(p.video_a, p.video_b, p.shared_frames) for p in pairs} == want
    # a high threshold suppresses everything on this corpus
    none = mmv.video_near_duplicates(vids, min_shared_frames=7).count()
    assert none == 0
