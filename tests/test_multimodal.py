"""Multimodal plumbing: video frame sampling, audio features, resize."""

import numpy as np
import pytest

from python_extended_json_schema_validator_spark.payload import codec as imgcodec
from python_extended_json_schema_validator_spark.pipeline import multimodal as mm


@pytest.fixture(scope="module")
def videos(spark):
    rows = [(f"v{i}", mm.encode_video(i, n_frames=6)) for i in range(3)]
    return spark.createDataFrame(rows, "video_id string, bytes binary")


@pytest.fixture(scope="module")
def audios(spark):
    rows = [(f"a{i}", mm.encode_audio(i, n_samples=4000, rate=8000)) for i in range(3)]
    rows.append(("bad", b"NOPE"))
    return spark.createDataFrame(rows, "audio_id string, bytes binary")


def test_frame_sampling(spark, videos):
    frames = mm.sample_frames(videos, every_k=2).collect()
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r.video_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 2, 4] for v in by_vid.values())
    assert len(by_vid) == 3
    f0 = next(r for r in frames if r.video_id == "v1" and r.frame_idx == 0)
    ok, fmt, w, h, px = imgcodec.decode(bytes(f0.frame_bytes))
    assert ok and (w, h) == (16, 12)
    assert np.array_equal(px, imgcodec.ref_pixels(1000, 16, 12))


def test_audio_features(spark, audios):
    feats = {r.audio_id: r for r in mm.audio_features(audios).collect()}
    a0 = feats["a0"]
    assert a0.sample_rate == 8000
    assert abs(a0.duration_s - 0.5) < 1e-9
    # 0.5 amplitude sine → RMS ≈ 0.354 (+ small noise)
    assert 0.3 < a0.rms < 0.42
    # 100 Hz for 0.5 s → ~100 zero crossings
    assert 80 <= a0.zero_crossings <= 400
    assert feats["bad"].rms is None


def test_resize_roundtrip(spark):
    rows = [("i1", imgcodec.encode(7, 20, 10, "png"))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = mm.resize_images(df, out_w=10, out_h=5).collect()[0]
    assert (out.w, out.h) == (10, 5)
    ok, fmt, w, h, px = imgcodec.decode(bytes(out.bytes))
    assert ok and px.shape == (5, 10, 3)
    # nearest-neighbor: resized[0,0] == original[0,0]
    orig = imgcodec.ref_pixels(7, 20, 10)
    assert np.array_equal(px[0, 0], orig[0, 0])
