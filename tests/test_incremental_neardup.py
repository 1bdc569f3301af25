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
    with pytest.raises(ValueError, match="num_hashes=8"):
        MinHashLedger(root, num_hashes=16).sigs_dim(spark)
    # reopen with drifted bands
    with pytest.raises(ValueError, match="bands=4"):
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
