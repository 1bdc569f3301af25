"""Incremental curation (pipeline/curation.py): the composed
quality → exact → near-dup → quota chain across INCREMENTS, over the
KeyLedger / MinHashLedger / QuotaLedger families.  Registration-order
near-dup semantics (earlier string id holds; module docstring)."""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.manifest import KeyLedger
from python_extended_json_schema_validator_spark.pipeline.curation import (
    QuotaLedger,
    curate_increment,
)
from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
    MinHashLedger,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string"
    )


INC1 = [
    ("a1", "t1 t2 t3 t4 t5 x1", "A"),
    ("a2", "u1 u2 u3 u4 u5 u6 u7", "A"),
    ("a3", "short one", "A"),                      # quality (< 5 toks)
    ("a4", "t1  t2 t3 t4 t5   x1", "A"),           # normalized == a1
    ("a5", "u1 u2 u3 u4 u5 u6 u7 extra", "A"),     # near-dup of a2
]
INC2 = [
    ("b1", "t1 t2 t3 t4 t5 x1", "A"),              # exact vs history
    ("b2", "u1 u2 u3 u4 u5 u6 u7 other", "A"),     # near vs history
    ("b3", "v1 v2 v3 v4 v5 v6 v7 v8 v9", "A"),     # fresh, lang A full
    ("b4", "w1 w2 w3 w4 w5 w6", "B"),              # fresh, lang B open
]


@pytest.fixture()
def ledgers(tmp_path):
    return (
        KeyLedger(root=str(tmp_path / "keys")),
        MinHashLedger(str(tmp_path / "nd"), num_hashes=8, bands=4),
        QuotaLedger(str(tmp_path / "quota")),
    )


def _run(spark, rows, ledgers, **kw):
    kl, nl, ql = ledgers
    out = curate_increment(
        _docs(spark, rows), "doc_id", kl, nl, ql,
        min_tokens=5, threshold=0.5, quota=2, **kw,
    )
    return {r.doc: r.status for r in out.collect()}


def test_two_increment_curation(spark, ledgers):
    s1 = _run(spark, INC1, ledgers)
    assert s1 == {
        "a1": "kept",
        "a2": "kept",        # quota 2 for lang A: a2 (longest) + a1
        "a3": "quality",
        "a4": "exact_dup",   # later id drops (registration order)
        "a5": "near_dup",    # a2 < a5 holds
    }, s1

    s2 = _run(spark, INC2, ledgers, update=False)
    assert s2 == {
        "b1": "exact_dup",   # fingerprint recorded by increment 1
        "b2": "near_dup",    # sketch match vs increment 1's a2
        "b3": "quota",       # lang A budget consumed by increment 1
        "b4": "kept",        # lang B untouched
    }, s2


def test_update_false_records_nothing(spark, ledgers):
    kl, nl, ql = ledgers
    _run(spark, INC1, ledgers, update=False)
    assert kl.dim(spark, "curation", "text_fp") is None
    assert nl.sigs_dim(spark) is None
    assert ql.kept_counts(spark) is None


def test_ledger_state_after_update(spark, ledgers):
    kl, nl, ql = ledgers
    _run(spark, INC1, ledgers)
    # q1 = 4 quality-passing docs, 3 distinct fingerprints (a4 == a1)
    assert kl.dim(spark, "curation", "text_fp").count() == 3
    # q2 sketches: a1, a2, a5 (a4 exact-dropped) — near-dups ARE
    # recorded (seen content)
    assert nl.sigs_dim(spark).count() == 3
    # quota counts: lang A kept 2
    counts = {r.lang: r.kept for r in ql.kept_counts(spark).collect()}
    assert counts == {"A": 2}


def test_null_text_is_quality_failure(spark, ledgers):
    """NULL text → 0 tokens → 'quality' (review finding: it used to
    fall out of both branches and coalesce to a false 'quota')."""
    rows = INC1 + [("a9", None, "A")]
    s = _run(spark, rows, ledgers, update=False)
    assert s["a9"] == "quality", s
