"""Cross-increment VISUAL near-dup ledger (PhashLedger): 64-bit DCT
signatures persist across increments so increment N+1's images are
checked against everything accepted so far without re-reading prior
pixels — block-key candidates, EXACT hamming verification against the
stored signatures, materialize-before-append crash ordering, and the
run_resumable wiring."""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.payload import codec, synth
from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
    PhashLedger,
    cross_increment_phash_duplicates,
)


def _imgs(spark, rows):
    """rows: (image_id, seed, noise)"""
    data = [
        (iid, bytes(codec.encode(seed, 24, 20, "png", noise_amp=noise)))
        for iid, seed, noise in rows
    ]
    return spark.createDataFrame(data, "image_id string, bytes binary")


BASE = [("a1", 1, 0), ("a2", 2, 0), ("a3", 3, 0)]
MUTANTS = [
    ("b1", 1, 2),   # visual near-dup of a1 (same pixels + noise)
    ("b2", 2, 1),   # near-dup of a2
    ("b3", 99, 0),  # fresh content — must not match anything
]


def test_two_increment_visual_near_dups(spark, tmp_path):
    led = PhashLedger(str(tmp_path / "led"))
    v1 = cross_increment_phash_duplicates(_imgs(spark, BASE), "image_id", led)
    # empty ledger → no verdicts; materialize-before-append means no
    # self-collision
    assert v1.count() == 0
    v2 = cross_increment_phash_duplicates(
        _imgs(spark, MUTANTS), "image_id", led, update=False
    )
    got = {(r.doc_new, r.doc_prior): r.hamming for r in v2.collect()}
    assert ("b1", "a1") in got and ("b2", "a2") in got
    assert all(k[0] != "b3" for k in got), got
    assert all(0 <= h <= led.max_hamming for h in got.values())


def test_exact_resend_hits_at_hamming_zero(spark, tmp_path):
    led = PhashLedger(str(tmp_path / "led"))
    cross_increment_phash_duplicates(_imgs(spark, BASE), "image_id", led)
    resend = cross_increment_phash_duplicates(
        _imgs(spark, [("r1", 2, 0)]), "image_id", led, update=False
    ).collect()
    assert {(r.doc_new, r.doc_prior, r.hamming) for r in resend} == {
        ("r1", "a2", 0)
    }


def test_update_false_leaves_ledger_untouched(spark, tmp_path):
    led = PhashLedger(str(tmp_path / "led"))
    cross_increment_phash_duplicates(_imgs(spark, BASE), "image_id", led)
    n_a = cross_increment_phash_duplicates(
        _imgs(spark, MUTANTS), "image_id", led, update=False
    ).count()
    n_b = cross_increment_phash_duplicates(
        _imgs(spark, MUTANTS), "image_id", led, update=False
    ).count()
    assert n_a == n_b > 0
    # with update=True the mutants register; a third increment near
    # seed 1 now collides with BOTH worlds
    cross_increment_phash_duplicates(_imgs(spark, MUTANTS), "image_id", led)
    v3 = cross_increment_phash_duplicates(
        _imgs(spark, [("c1", 1, 1)]), "image_id", led, update=False
    )
    priors = {r.doc_prior for r in v3.collect()}
    assert "a1" in priors and "b1" in priors


def test_undecodable_rows_never_enter_the_ledger(spark, tmp_path):
    led = PhashLedger(str(tmp_path / "led"))
    rows = [("a1", bytes(codec.encode(1, 24, 20, "png"))), ("bad", b"junk")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    cross_increment_phash_duplicates(df, "image_id", led)
    sigs = led.sigs_dim(spark)
    assert {r.doc for r in sigs.collect()} == {"a1"}


def test_run_resumable_with_phash_ledger(spark, tmp_path):
    """Two increments through run_resumable: increment 2's visual
    near-dups of increment 1 flag as neardup:phash violations, and
    the append ordering (after manifest commit) holds."""
    from python_extended_json_schema_validator_spark.manifest import (
        PartitionManifest,
        run_resumable,
    )

    led = PhashLedger(str(tmp_path / "led"))
    man = PartitionManifest(str(tmp_path / "man"))
    formats = synth.formats_dim(spark)

    def table(rows, part):
        base = _imgs(spark, rows)
        return base.select(
            "image_id", "bytes",
            F.lit(24).alias("w"), F.lit(20).alias("h"),
            F.lit("png").alias("fmt"),
            F.concat(F.lit("caption for image "), "image_id").alias("caption"),
            F.monotonically_increasing_id().alias("phash"),
            F.lit(part).alias("part"),
        )

    v1, m1, _ = run_resumable(
        table(BASE, "p0"), formats, man, phash_ledger=led
    )
    assert v1.where(F.col("constraint_id") == "neardup:phash").count() == 0

    inc2 = table(MUTANTS, "p1")
    v2, m2, _ = run_resumable(inc2, formats, man, phash_ledger=led)
    nd = {
        (r.row_id, r.observed_value)
        for r in v2.where(
            F.col("constraint_id") == "neardup:phash"
        ).collect()
    }
    assert {r[0] for r in nd} == {"b1", "b2"}
    assert all(r.reason == "near_duplicate" for r in v2.where(
        F.col("constraint_id") == "neardup:phash").collect())
    # observed carries "prior @ hamming"
    assert any(o.startswith("a1 @ ") for _rid, o in nd)


def test_stateful_visual_dups_streaming(spark, tmp_path):
    """Streaming mirror of the ledger: two availableNow runs over one
    checkpoint — batch 2 emits twins (hamming 0) and near-dups against
    batch 1's state, and a resume never re-emits batch-1 pairs."""
    from python_extended_json_schema_validator_spark.streaming.incremental import (
        stateful_visual_dups,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    inc1 = _imgs(spark, [("a1", 1, 0), ("a2", 2, 0), ("a3", 3, 0),
                         ("a4", 1, 2)])   # a4 = near-dup of a1, same batch
    inc2 = _imgs(spark, [("b1", 1, 1),    # near a1 AND a4 (and twin-ish)
                         ("b9", 77, 0)])  # fresh

    def run(inc):
        inc.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "image_id string, bytes binary"
        ).parquet(src)
        q = (
            stateful_visual_dups(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.doc_new, r.doc_prior, r.hamming)
            for r in spark.read.schema(
                "doc_new string, doc_prior string, hamming int"
            ).parquet(out).collect()
        }

    first = run(inc1)
    # in-batch: a4 pairs with a1 (sorted order → a1 is prior)
    assert {(n, p) for n, p, _h in first} == {("a4", "a1")}

    both = run(inc2)
    new = both - first
    got_pairs = {(n, p) for n, p, _h in new}
    # b1 collides with a1's family, never with a2/a3/b9
    assert ("b1", "a1") in got_pairs and ("b1", "a4") in got_pairs
    assert all(n == "b1" for n, _p in got_pairs), got_pairs
    assert all(h <= 6 for _n, _p, h in new)
    # batch-1 emissions were NOT duplicated by the resume
    assert first <= both and len(both) == len(first) + len(new)


def test_stateful_visual_dups_never_self_pairs(spark, tmp_path):
    """Duplicate image_ids in one batch must not emit (X, X, 0)
    self-pair rows; each occurrence still registers (a later
    different doc pairs against the id once per registration,
    collapsed by the caller's distinct)."""
    from python_extended_json_schema_validator_spark.streaming.incremental import (
        stateful_visual_dups,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dup_batch = _imgs(spark, [("x", 1, 0), ("x", 1, 0), ("y", 1, 1)])
    dup_batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "image_id string, bytes binary"
    ).parquet(src)
    q = (
        stateful_visual_dups(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.schema(
        "doc_new string, doc_prior string, hamming int"
    ).parquet(out).collect()
    assert all(r.doc_new != r.doc_prior for r in rows), rows
    assert {(r.doc_new, r.doc_prior) for r in rows} == {("y", "x")}


def test_phash_ledger_params_pinned(spark, tmp_path):
    """max_hamming persists to meta on first record; a drifted reopen
    raises; a data-bearing pre-pinning root (sigs without meta) is
    rejected instead of silently re-certified (review findings)."""
    import shutil

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        PhashLedger,
    )

    root = str(tmp_path / "pl")
    led = PhashLedger(root, max_hamming=4)
    sig = spark.createDataFrame(
        [("a", 5), ("b", 6)], "doc string, phash long"
    )
    led.record(sig)
    assert PhashLedger(root, max_hamming=4).sigs_dim(spark).count() == 2
    with pytest.raises(ValueError, match="max_hamming"):
        PhashLedger(root, max_hamming=6).blocks_dim(spark)
    # simulate a pre-pinning root: drop the meta dir
    shutil.rmtree(f"{root}/meta")
    with pytest.raises(ValueError, match="pre-pinning"):
        PhashLedger(root, max_hamming=4).sigs_dim(spark)
