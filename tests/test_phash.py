"""Perceptual-hash (DCT pHash) battery: hash invariances, the
declared-vs-actual check, the 64-bit banded hamming join, and the
survivors tail on the image modality (payload/phash.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.payload import codec, phash, synth
from python_extended_json_schema_validator_spark.pipeline import dedup


def _img(seed, w=24, h=20, fmt="png", noise=0):
    return codec.decode(codec.encode(seed, w, h, fmt, noise_amp=noise))[4]


def test_phash64_deterministic_and_noise_robust():
    px = _img(11)
    h0 = phash.phash64(px)
    assert h0 == phash.phash64(px.copy())
    # mild noise / lossy re-encode: few bits move
    noisy = _img(11, noise=2)
    assert phash.hamming64(h0, phash.phash64(noisy)) <= 4
    lossy = _img(11, fmt="jpeg")
    assert phash.hamming64(h0, phash.phash64(lossy)) <= 4
    # unrelated content: far apart
    other = _img(12)
    assert phash.hamming64(h0, phash.phash64(other)) >= 10


def test_phash64_resize_independent_of_source_dims():
    # same content family at different dims hashes CLOSE only when the
    # pixel field is actually the same 2-D signal — a reshape of the
    # same stream to different dims is different content
    a = phash.phash64(_img(5, w=16, h=12))
    b = phash.phash64(_img(5, w=20, h=12))
    assert phash.hamming64(a, b) >= 8


def test_phash_batch_matches_scalar():
    pxs = [_img(s) for s in (1, 2, 3)]
    batch = phash.phash_batch([phash._gray32(p) for p in pxs])
    assert [int(b) for b in batch] == [phash.phash64(p) for p in pxs]


def test_bitstring_roundtrip_including_negative(spark):
    # hashes with bit 63 set are negative longs — the bit string must
    # render them unsigned, and the chunked conv in the banded join
    # must reassemble the same 64 bits
    vals = [0, 1, -1, 2**63 - 1, -2**63, 123456789123456789,
            -987654321987654321]
    df = spark.createDataFrame([(v,) for v in vals], "h long")
    got = df.select(phash.phash_bitstring(F.col("h")).alias("b")).collect()
    for v, row in zip(vals, got):
        assert len(row.b) == 64
        assert int(row.b, 2) == v & 0xFFFFFFFFFFFFFFFF


def test_phash_violations_flags_only_corrupted(spark):
    rows = []
    for seed in range(1, 9):
        px = _img(seed)
        true_h = phash.phash64(px)
        declared = true_h ^ synth.PHASH_FLIP_MASK if seed % 3 == 0 else true_h
        rows.append((f"i{seed}", bytes(codec.encode(seed, 24, 20, "png")),
                     declared))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, phash long")
    viol = phash.phash_violations(df).collect()
    assert {v.row_id for v in viol} == {"i3", "i6"}
    assert all(v.constraint_id == "payload:phash" and v.reason == "phash"
               for v in viol)
    assert all("hamming=16" in v.observed_value for v in viol)


def test_phash_violations_skips_null_declared_and_undecodable(spark):
    good = bytes(codec.encode(1, 24, 20, "png"))
    df = spark.createDataFrame(
        [("a", good, None), ("b", b"junk", 12345)],
        "image_id string, bytes binary, phash long",
    )
    assert phash.phash_violations(df).count() == 0


def test_signatures_keep_undecodable_rows_with_null(spark):
    df = spark.createDataFrame(
        [("a", bytes(codec.encode(1, 24, 20, "png"))), ("b", b"junk")],
        "image_id string, bytes binary",
    )
    got = {r.image_id: (r.phash_dct, r.decode_ok)
           for r in phash.phash_signatures(df).collect()}
    assert got["a"][1] is True and got["a"][0] is not None
    assert got["b"] == (None, False)


def test_near_duplicates_recall_and_precision(spark):
    # corpus: 30 bases + near-dup of base 7 (noise) + far corruption
    rows = [(f"d{s:02d}", bytes(codec.encode(s, 24, 20, "png")))
            for s in range(1, 31)]
    rows.append(("d07n", bytes(codec.encode(7, 24, 20, "webp", noise_amp=2))))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    sig = phash.phash_signatures(df)
    pairs = phash.phash_near_duplicates(sig).collect()
    assert {(p.doc_a, p.doc_b) for p in pairs} == {("d07", "d07n")}
    assert all(p.hamming <= phash.NEAR_MAX_HAMMING for p in pairs)


def test_survivors_tail_on_image_pairs(spark):
    rows = []
    for s in range(1, 16):
        rows.append((s, bytes(codec.encode(s, 24, 20, "png"))))
    # 101/102 near-dups of base 3 → component {3, 101, 102}
    rows.append((101, bytes(codec.encode(3, 24, 20, "jpeg", noise_amp=2))))
    rows.append((102, bytes(codec.encode(3, 24, 20, "webp", noise_amp=1))))
    df = spark.createDataFrame(rows, "img_k long, bytes binary")
    sig = phash.phash_signatures(df, row_id="img_k")
    sig = sig.select(F.col("img_k").cast("long").alias("img_k"), "phash_dct")
    pairs = phash.phash_near_duplicates(sig, id_col="img_k")
    out = dedup.survivors_from_pairs(pairs, sig.select("img_k"),
                                     id_col="img_k")
    got = {r.img_k: (r.component, r.is_survivor) for r in out.collect()}
    assert got[3] == (3, True)
    assert got[101] == (3, False)
    assert got[102] == (3, False)
    assert all(v == (k, True) for k, v in got.items() if k not in (3, 101, 102))


def test_neardup_generator_rules(spark):
    keys = spark.range(1, 31).select(F.col("id").alias("k"))
    img = synth.neardup_images_from_keys(keys).collect()
    by_id = {r.image_id: r for r in img}
    assert len(by_id) == 30
    # near-dup rows carry the SOURCE row's dims
    r10 = by_id["img00000010"]  # 10 % 7 == 3 → source 9
    assert (r10.w, r10.h) == (8 + 9 % 25, 8 + 9 % 17)
    # declared phash: true hash except k % 13 == 6 (flipped 16 bits)
    for r in img:
        k = int(r.image_id[3:])
        actual = phash.phash64(codec.decode(bytes(r.bytes))[4])
        if k % 13 == 6:
            assert phash.hamming64(r.phash, actual) == 16
        else:
            assert r.phash == actual


def test_phash_violations_null_in_batch_does_not_corrupt_others(spark):
    """Regression: a nullable long column reaches pandas as float64,
    whose round-trip corrupts 2^63-scale hashes — one NULL declared
    row in a batch must not poison the other rows' comparisons (the
    declared hash now crosses the Arrow boundary as a string)."""
    # pick seeds whose true hash provably corrupts under float64
    rows, picked = [], 0
    for seed in range(1, 200):
        px = _img(seed)
        h = phash.phash64(px)
        if phash.hamming64(h, int(float(h))) > phash.CHECK_MAX_HAMMING:
            rows.append((f"i{seed}", bytes(codec.encode(seed, 24, 20, "png")), h))
            picked += 1
            if picked == 4:
                break
    assert picked == 4, "generator no longer produces float-fragile hashes"
    rows.append(("nullrow", bytes(codec.encode(999, 24, 20, "png")), None))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, phash long"
    ).coalesce(1)  # one batch: the NULL shares it with every other row
    assert phash.phash_violations(df).count() == 0


def test_phash_violations_duplicate_ids_align_positionally(spark):
    """Regression: declared values must pair with their own row, not
    be keyed by row id — duplicate ids with different bytes/declared
    each check against their own hash."""
    a = bytes(codec.encode(1, 24, 20, "png"))
    b = bytes(codec.encode(2, 24, 20, "png"))
    ha = phash.phash64(codec.decode(a)[4])
    hb = phash.phash64(codec.decode(b)[4])
    clean = spark.createDataFrame(
        [("x", a, ha), ("x", b, hb)],
        "image_id string, bytes binary, phash long",
    ).coalesce(1)
    assert phash.phash_violations(clean).count() == 0
    one_bad = spark.createDataFrame(
        [("x", a, ha), ("x", b, hb ^ synth.PHASH_FLIP_MASK)],
        "image_id string, bytes binary, phash long",
    ).coalesce(1)
    viol = phash.phash_violations(one_bad).collect()
    assert len(viol) == 1 and "hamming=16" in viol[0].observed_value


def test_banded_pairs_match_brute_force_on_random_hashes(spark):
    """Property: banded_hamming_pairs returns EXACTLY the brute-force
    pair set within τ, for random 64-bit signatures plus planted
    near-pairs (seeded, deterministic)."""
    import itertools
    import random

    rng = random.Random(42)
    hashes = {}
    for i in range(40):
        hashes[f"r{i:02d}"] = rng.getrandbits(64)
    # planted near pairs: flip ≤ τ random bits
    base_ids = list(hashes)[:6]
    for j, bid in enumerate(base_ids):
        h = hashes[bid]
        for bit in rng.sample(range(64), j):  # j flips: 0..5
            h ^= 1 << bit
        hashes[f"p{j:02d}"] = h

    tau = 6
    brute = set()
    for (a, ha), (b, hb) in itertools.combinations(sorted(hashes.items()), 2):
        if bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1") <= tau:
            brute.add((a, b))

    def to_long(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(k, to_long(v)) for k, v in hashes.items()],
        "image_id string, phash_dct long",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in phash.phash_near_duplicates(df, max_hamming=tau).collect()
    }
    assert got == brute, (got - brute, brute - got)
    assert len(brute) >= 6  # the planted pairs actually exercised it


def test_validate_images_with_phash_leg(spark):
    """with_phash=True folds the perceptual-hash check into the
    unified battery (on a corpus whose declared phash IS the true
    hash, only the injected flips flag)."""
    from python_extended_json_schema_validator_spark.payload.validate import (
        validate_images,
    )

    keys = spark.range(1, 31).select(F.col("id").alias("k"))
    img = synth.neardup_images_from_keys(keys).select(
        "image_id", "bytes", "w", "h", "fmt", "phash",
        F.concat(F.lit("caption for image "), "image_id").alias("caption"),
        F.lit("p0").alias("part"),
    )
    viol = validate_images(img, synth.formats_dim(spark), with_phash=True)
    ph = viol.where(F.col("constraint_id") == "payload:phash").collect()
    # k % 13 == 6 within 1..30 → {6, 19}
    assert {v.row_id for v in ph} == {"img00000006", "img00000019"}
    # default stays OFF: no phash rows
    off = validate_images(img, synth.formats_dim(spark))
    assert off.where(F.col("constraint_id") == "payload:phash").count() == 0
