"""HLL cardinality ledger: per-group sketch snapshots, cross-increment
novelty screening, merge algebra, crash ordering, run_resumable wiring.

The reference's uniqueness checks are exact and in-memory
(extensible_validator key worlds); the cardinality SCREEN — "did this
increment contribute new values at all?" answered from O(groups) bytes
of sketch state — is the 10^12-row capability layered in front of the
exact KeyLedger path.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline.cardinality_ledger import (
    HllLedger,
    cross_increment_cardinality,
    record_sketches,
)


@pytest.fixture()
def ledger():
    with tempfile.TemporaryDirectory() as d:
        yield HllLedger(root=f"{d}/hll")


def _inc(spark, n, fn):
    """n rows of (g, v) via a pure-column value expression."""
    return spark.range(n).select(
        F.when(F.col("id") < n // 2, "a").otherwise("b").alias("g"),
        fn(F.col("id")).cast("string").alias("v"),
    )


def test_screen_estimates_exact_at_small_cardinality(spark, ledger):
    """At a few hundred distinct values the DataSketches HLL sketch is
    still in its exact (coupon) regime, so every estimate equals the
    true count and the novelty algebra is exact end-to-end."""
    # inc1: group a has 100 distinct over 200 rows, b has 50 over 200
    inc1 = _inc(
        spark, 400,
        lambda id: F.when(id < 200, id % 100).otherwise(id % 50),
    )
    r1 = {
        r.g: r
        for r in cross_increment_cardinality(
            inc1, ledger, "t", "v", ["g"]
        ).collect()
    }
    assert (r1["a"].est_distinct_inc, r1["a"].est_before) == (100, 0)
    assert (r1["a"].est_after, r1["a"].est_novel) == (100, 100)
    assert r1["a"].novelty == pytest.approx(0.5)
    assert not r1["a"].collapsed  # 0.5 < 0.5 is False — boundary holds
    assert (r1["b"].est_distinct_inc, r1["b"].novelty) == (50, 0.25)
    assert r1["b"].collapsed

    # inc2: a re-sends the SAME 100 values (novelty 0 — collapse);
    # b sends 200 entirely new values (novelty 1.0)
    inc2 = _inc(
        spark, 400,
        lambda id: F.when(id < 200, id % 100).otherwise(id % 200 + 10_000),
    )
    r2 = {
        r.g: r
        for r in cross_increment_cardinality(
            inc2, ledger, "t", "v", ["g"]
        ).collect()
    }
    assert (r2["a"].est_before, r2["a"].est_after) == (100, 100)
    assert (r2["a"].est_novel, r2["a"].novelty) == (0, 0.0)
    assert r2["a"].collapsed
    assert (r2["b"].est_before, r2["b"].est_after) == (50, 250)
    assert r2["b"].novelty == pytest.approx(1.0)
    assert not r2["b"].collapsed


def test_incremental_union_equals_one_shot_sketch(spark, ledger):
    """Register-wise max: N increment sketches unioned == one sketch
    of the concatenated data — the cumulative baseline never degrades
    with increment count."""
    inc1 = _inc(spark, 300, lambda id: id % 120)
    inc2 = _inc(spark, 300, lambda id: id % 177 + 60)
    record_sketches(inc1, ledger, "t", "v", ["g"])
    record_sketches(inc2, ledger, "t", "v", ["g"])
    merged = {
        r.g: r
        for r in ledger.cumulative(spark, "t", "v", ["g"])
        .select("g", F.hll_sketch_estimate("__hll").alias("est"), "__n_rows")
        .collect()
    }
    oneshot = {
        r.g: r
        for r in ledger.sketch(
            inc1.unionByName(inc2), "v", ["g"]
        )
        .select("g", F.hll_sketch_estimate("__hll").alias("est"))
        .collect()
    }
    for g in ("a", "b"):
        assert merged[g].est == oneshot[g].est
        assert merged[g]["__n_rows"] == 300


def test_first_increment_of_duplicates_still_flags(spark, ledger):
    """No baseline: novelty degrades to within-increment distinctness,
    so a first increment of near-pure duplicates collapses anyway."""
    dups = spark.range(500).select(
        F.lit("a").alias("g"), (F.col("id") % 3).cast("string").alias("v")
    )
    row = cross_increment_cardinality(
        dups, ledger, "t", "v", ["g"], update=False
    ).first()
    assert row.est_distinct_inc == 3 and row.est_before == 0
    assert row.collapsed


def test_all_null_group_collapses_with_empty_sketch(spark, ledger):
    """A group whose values are ALL NULL yields an EMPTY sketch (the
    agg skips nulls — Spark returns a zero-estimate sketch, not SQL
    NULL): estimate 0, novelty 0.0, collapsed True — an increment
    contributing no non-null values IS a cardinality collapse, and the
    verdict is a real boolean a downstream ``.where`` keeps.  The
    empty sketch is recorded and unions cleanly next increment."""
    mixed = spark.range(100).select(
        F.when(F.col("id") < 50, "ok").otherwise("nulls").alias("g"),
        F.when(F.col("id") < 50, F.col("id").cast("string")).alias("v"),
    )
    rows = {
        r.g: r
        for r in cross_increment_cardinality(
            mixed, ledger, "t", "v", ["g"]
        ).collect()
    }
    assert rows["nulls"].est_distinct_inc == 0
    assert rows["nulls"].novelty == 0.0
    assert rows["nulls"].collapsed is True
    assert rows["ok"].est_distinct_inc == 50
    # both groups recorded; the empty sketch unions without error
    snap = {
        r.g: r
        for r in ledger.cumulative(spark, "t", "v", ["g"])
        .select("g", F.hll_sketch_estimate("__hll").alias("est"))
        .collect()
    }
    assert snap["nulls"].est == 0 and snap["ok"].est == 50


def test_empty_append_never_poisons_next_seq(spark, ledger):
    """Recording an EMPTY increment writes a zero-row part file;
    max(__seq) over it is NULL — next_seq must coalesce to keep the
    ledger appendable (review finding: None + 1 raised TypeError and
    bricked the ledger until hand-deleted)."""
    empty = spark.range(0).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("v")
    )
    record_sketches(empty, ledger, "t", "v", ["g"])
    assert ledger.next_seq(spark, "t", "v") == 1  # no non-empty snapshot yet
    inc = _inc(spark, 50, lambda id: id)
    record_sketches(inc, ledger, "t", "v", ["g"])
    assert ledger.next_seq(spark, "t", "v") == 2


def test_crash_ordering_and_update_flag(spark, ledger):
    inc = _inc(spark, 100, lambda id: id)
    assert ledger.next_seq(spark, "t", "v") == 1
    cross_increment_cardinality(inc, ledger, "t", "v", ["g"], update=False)
    assert ledger.next_seq(spark, "t", "v") == 1  # screen-only: no append
    cross_increment_cardinality(inc, ledger, "t", "v", ["g"], update=True)
    assert ledger.next_seq(spark, "t", "v") == 2
    # ungrouped screen works too (global cardinality)
    glob = cross_increment_cardinality(
        inc, ledger, "t2", "v", (), update=True
    ).first()
    assert glob.est_distinct_inc == 100 and glob.novelty == pytest.approx(1.0)
    # ungrouped WITH a baseline (1x1 broadcast cross join): a full
    # re-send collapses globally
    glob2 = cross_increment_cardinality(
        inc, ledger, "t2", "v", (), update=False
    ).first()
    assert (glob2.est_before, glob2.est_novel) == (100, 0)
    assert glob2.collapsed


def test_screen_plan_is_broadcast_and_python_free(spark, ledger):
    """The scale contract: the baseline join broadcasts O(groups)
    sketch rows (never a shuffled join against history) and the whole
    screen runs JVM-side — no Python stages anywhere."""
    inc = _inc(spark, 200, lambda id: id % 80)
    record_sketches(inc, ledger, "t", "v", ["g"])
    plan = cross_increment_cardinality(
        inc, ledger, "t", "v", ["g"], update=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert bad not in plan


def test_run_resumable_hll_family(spark):
    """run_resumable carries the 4th ledger family: an increment whose
    caption values are all re-sends of increment 1 flags ONE
    cardinality_collapse violation; a fresh-valued increment does not.
    The sketch append lands after the manifest commit (same crash
    ordering as the other families)."""
    import tempfile as tf

    from python_extended_json_schema_validator_spark.manifest import (
        PartitionManifest,
        run_resumable,
    )
    from python_extended_json_schema_validator_spark.payload import synth

    with tf.TemporaryDirectory() as d:
        manifest = PartitionManifest(path=f"{d}/man")
        hled = HllLedger(root=f"{d}/hll")
        formats = synth.formats_dim(spark)
        cap = F.concat(
            F.lit("cap"),
            (F.substring("image_id", 4, 8).cast("int") % 200).cast("string"),
        )

        inc1 = (
            synth.images_from_range(spark, 200, partitions=2)
            .withColumn("part", F.lit("a"))
            .withColumn("caption", cap)
            .cache()
        )
        v1, _, _ = run_resumable(
            inc1, formats, manifest,
            hll_ledger=hled, hll_column="caption",
        )
        assert v1.where("reason = 'cardinality_collapse'").count() == 0
        assert hled.next_seq(spark, "images", "caption") == 2

        # increment 2: new image ids / partition, but every caption is
        # an inc1 re-send → novelty ≈ 0 → one (all)-row violation
        inc2 = (
            synth.images_from_range(spark, 400, partitions=2)
            .where("image_id > 'img00000200'")
            .withColumn("part", F.lit("b"))
            .withColumn("caption", cap)
            .cache()
        )
        v2, _, _ = run_resumable(
            inc2, formats, manifest,
            hll_ledger=hled, hll_column="caption",
        )
        cv = v2.where("reason = 'cardinality_collapse'").collect()
        assert len(cv) == 1
        assert cv[0].constraint_id == "hll:caption"
        assert cv[0].row_id == "(all)"
        # the synth generator mutates 2 image_ids for its injected
        # uniqueness violations, so 2 of 200 captions are genuinely
        # novel — novelty ~0.01, decisively below the 0.5 threshold
        assert float(cv[0].observed_value) <= 0.05
        assert cv[0].path == "/caption"
        assert hled.next_seq(spark, "images", "caption") == 3
