"""Cross-increment near-dup ledger (pipeline/incremental_neardup.py,
round 6): MinHash sketches persist across increments so increment
N+1's documents are checked against everything accepted so far
WITHOUT re-reading prior text — band-bucket candidates, signature-
estimated Jaccard, and the materialize-before-append crash ordering.
"""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
    MinHashLedger,
    cross_increment_near_duplicates,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


BASE = [
    ("a1", "the quick brown fox jumps over the lazy dog tonight"),
    ("a2", "pack my box with five dozen liquor jugs right now"),
    ("a3", "completely unrelated text about spark physical plans here"),
]
MUTANTS = [
    # near-dup of a1 (one appended token)
    ("b1", "the quick brown fox jumps over the lazy dog tonight extra"),
    # near-dup of a2
    ("b2", "pack my box with five dozen liquor jugs right now extra"),
    # fresh text — must NOT match anything
    ("b3", "totally novel content with no overlap whatsoever in it"),
]


def test_two_increment_near_dups(spark, tmp_path):
    led = MinHashLedger(str(tmp_path / "led"), num_hashes=8)
    v1 = cross_increment_near_duplicates(
        _docs(spark, BASE), "doc_id", led, bands=4
    )
    # first increment: empty ledger → no verdicts, and the
    # materialize-before-append ordering means no self-collision
    assert v1.count() == 0
    v2 = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id", led, bands=4, update=False
    )
    got = {(r.doc_new, r.doc_prior): r.est_jaccard for r in v2.collect()}
    assert ("b1", "a1") in got and ("b2", "a2") in got
    assert all(k[0] != "b3" for k in got), got
    # the estimator is a fraction of 8 agreeing components
    assert all(0 < v <= 1 and round(v * 8) == v * 8 for v in got.values())


def test_update_false_leaves_ledger_untouched(spark, tmp_path):
    led = MinHashLedger(str(tmp_path / "led"), num_hashes=8)
    cross_increment_near_duplicates(_docs(spark, BASE), "doc_id", led)
    # probe with update=False twice: identical results (no growth)
    v_a = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id", led, update=False
    ).count()
    v_b = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id", led, update=False
    ).count()
    assert v_a == v_b > 0
    # with update=True the mutants register; a THIRD increment of the
    # same mutants now collides with them
    cross_increment_near_duplicates(_docs(spark, MUTANTS), "doc_id", led)
    v3 = cross_increment_near_duplicates(
        _docs(spark, [("c1", MUTANTS[0][1])]), "doc_id", led, update=False
    )
    priors = {r.doc_prior for r in v3.collect()}
    assert "b1" in priors  # recorded by increment 2
    assert "a1" in priors  # still held from increment 1


def test_ledger_params_pinned_at_creation(spark, tmp_path):
    """num_hashes/bands are LEDGER properties (ADVICE r06): they
    persist to <root>/meta on first record, and a ledger reopened
    with different parameters — or probed with an explicit bands
    override that conflicts — fails loudly instead of silently
    losing recall / corrupting est_jaccard."""
    root = str(tmp_path / "led")
    led = MinHashLedger(root, num_hashes=8, bands=4)
    cross_increment_near_duplicates(_docs(spark, BASE), "doc_id", led)

    # explicit per-call bands conflicting with the pinned value
    with pytest.raises(ValueError, match="pinned"):
        cross_increment_near_duplicates(
            _docs(spark, MUTANTS), "doc_id", led, bands=8, update=False
        )
    # reopen with drifted num_hashes (the hardcoded read schema would
    # otherwise yield NULL h-columns silently)
    with pytest.raises(ValueError, match="num_hashes, bands"):
        MinHashLedger(root, num_hashes=16).sigs_dim(spark)
    # reopen with drifted bands
    with pytest.raises(ValueError, match=r"\(8, 4\)"):
        cross_increment_near_duplicates(
            _docs(spark, MUTANTS), "doc_id",
            MinHashLedger(root, num_hashes=8, bands=2), update=False,
        )
    # the matching reopen still works end-to-end
    v = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id",
        MinHashLedger(root, num_hashes=8, bands=4), update=False,
    )
    assert v.count() > 0


def test_min_est_jaccard_filters(spark, tmp_path):
    led = MinHashLedger(str(tmp_path / "led"), num_hashes=8)
    cross_increment_near_duplicates(_docs(spark, BASE), "doc_id", led)
    loose = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id", led, update=False,
        min_est_jaccard=0.0,
    )
    strict = cross_increment_near_duplicates(
        _docs(spark, MUTANTS), "doc_id", led, update=False,
        min_est_jaccard=1.01,  # impossible → empty
    )
    assert loose.count() > 0
    assert strict.count() == 0


# ---------------------------------------------------------------------------
# round 7: audio + video ledger families
# ---------------------------------------------------------------------------


def _av_keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_audio_ledger_two_increments(spark, tmp_path):
    """Inc2's k=10 clip reuses inc1's k=9 chord (the F12 rule) →
    fingerprint hamming 0 against history; inc1 probes the empty
    ledger → zero rows; update=False probes must not grow it."""
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        AudioLedger,
        cross_increment_audio_duplicates,
    )
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_audio_from_keys,
    )

    led = AudioLedger(str(tmp_path / "aud"))
    inc1 = neardup_audio_from_keys(_av_keys(spark, 1, 10))
    v1 = cross_increment_audio_duplicates(
        inc1, "audio_id", led, audio_col="bytes"
    )
    assert v1.count() == 0

    inc2 = neardup_audio_from_keys(_av_keys(spark, 10, 17))
    v2 = cross_increment_audio_duplicates(
        inc2, "audio_id", led, audio_col="bytes", update=False
    )
    got = {(r.doc_new, r.doc_prior, r.hamming) for r in v2.collect()}
    assert got == {("aud00000010", "aud00000009", 0)}, got
    # update=False left the ledger at inc1's 9 clips
    assert led.sigs_dim(spark).count() == 9


def test_video_ledger_vote_and_threshold(spark, tmp_path):
    """Inc2's k=10 video rebuilds k=9's 3 frames with ±2 noise →
    every frame matches → shared_frames = 3; min_shared_frames above
    the vote suppresses the pair (probe-side filter, ledger
    threshold-agnostic)."""
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        VideoLedger,
        cross_increment_video_duplicates,
    )
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_videos_from_keys,
    )

    led = VideoLedger(str(tmp_path / "vid"))
    inc1 = neardup_videos_from_keys(_av_keys(spark, 1, 10))
    v1 = cross_increment_video_duplicates(
        inc1, "video_id", led, video_col="bytes"
    )
    assert v1.count() == 0

    inc2 = neardup_videos_from_keys(_av_keys(spark, 10, 17))
    v2 = cross_increment_video_duplicates(
        inc2, "video_id", led, video_col="bytes", update=False
    )
    got = {
        (r.video_new, r.video_prior, r.shared_frames) for r in v2.collect()
    }
    # source k=9 has 3 + (9 % 3) = 3 frames
    assert got == {("vid00000010", "vid00000009", 3)}, got
    # a vote floor above the frame count suppresses the pair
    v3 = cross_increment_video_duplicates(
        inc2, "video_id", led, video_col="bytes",
        min_shared_frames=4, update=False,
    )
    assert v3.count() == 0


def test_embedding_ledger_two_increments(spark, tmp_path):
    """Fifth modality: identical vectors re-sent in increment 2 hit
    their increment-1 twin at cos 1.0 (identical sign patterns agree
    on every bucket table); orthogonal vectors never verify.  Ledger
    parameters are pinned at creation (meta file) like the MinHash
    family."""
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        EmbeddingLedger,
        cross_increment_embedding_duplicates,
    )

    def onehot(i):
        return [1.0 if j == i else 0.0 for j in range(6)]

    inc1 = spark.createDataFrame(
        [(f"e{i}", onehot(i)) for i in range(4)],
        "vec_id string, embedding array<double>",
    )
    led = EmbeddingLedger(str(tmp_path / "emb"), dim=6)
    v1 = cross_increment_embedding_duplicates(inc1, "vec_id", led)
    assert v1.count() == 0  # empty ledger

    inc2 = spark.createDataFrame(
        [("n2", onehot(2)), ("n5", onehot(5))],
        "vec_id string, embedding array<double>",
    )
    v2 = cross_increment_embedding_duplicates(
        inc2, "vec_id", led, update=False
    )
    got = {(r.doc_new, r.doc_prior, round(r.cos, 6)) for r in v2.collect()}
    assert got == {("n2", "e2", 1.0)}, got  # onehot(5) has no twin
    assert led.vecs_dim(spark).count() == 4  # update=False: no growth

    # parameter drift fails loudly (persisted meta)
    with pytest.raises(ValueError, match="dim, bits, tables, seed"):
        EmbeddingLedger(str(tmp_path / "emb"), dim=6, bits=16).vecs_dim(
            spark
        )
