"""Cross-increment CARDINALITY screening: a persisted per-group
HyperLogLog sketch ledger (round 6, fourth increment-ledger family).

The exact uniqueness path (manifest.KeyLedger) answers "WHICH rows
collide with prior increments" — but it does so with an equi-join
against every key ever recorded, O(total distinct) state.  Long
before a user needs the offending row ids, they need the cheap
screen: "did this increment actually contribute new values, or is it
mostly re-sent data?"  (The reference's uniqueness checks are exact
and in-memory — extensible_validator keeps per-key-world sets for the
whole run; a cross-run cardinality SCREEN has no reference analogue
and is the 10^12-row capability this engine adds.)

This ledger answers that in O(groups) bytes: each accepted increment
records one HyperLogLog sketch per group (Spark's built-in Apache
DataSketches HLL — ``hll_sketch_agg``, a few KB per group, rows and
keys never persisted), and increment N+1's novelty is computed by
UNIONING sketches (``hll_union``) — no join against history at all:

    est_before  = estimate(union of all prior sketches)
    est_after   = estimate(prior ∪ this increment)
    est_novel   = est_after − est_before      # new distinct values
    novelty     = est_novel / n_rows           # 1.0 = all-new data
    dup_rate    = 1 − distinct_inc / n_rows    # within-increment

A ``cardinality_collapse`` verdict (novelty below threshold) flags an
increment that is mostly values the pipeline has already seen — the
signal to run (or skip!) the exact KeyLedger path.  HLL union is
exact sketch algebra (register-wise max): merging N increment
sketches is bit-identical to sketching the concatenated data, so the
cumulative estimate never degrades with increment count, and
sketching is insertion-order-independent, so estimates are
deterministic under any partitioning (the property the oracle
contract rests on).

Accuracy: lgConfigK=12 (the Spark default) gives a relative standard
error of about 1.04/sqrt(2^12) ~= 1.6%; the contract query asserts a
conservative 5% bound against exact distinct counts recomputed by
DuckDB.  At 10^12 rows the grouped sketch aggregation is one
partial-merge shuffle of ~KB sketches (map-side combine does the
heavy lifting), the ledger read is O(groups x increments) tiny rows
that broadcast, and nothing ever re-reads prior data.

Same SnapshotFS/parquet seam and crash ordering as the other three
ledgers (Key / MinHash / Quantile): verdicts materialize BEFORE the
increment's own sketch is appended, so a crash loses one increment's
sketches (bounded novelty over-estimate next run) and can never make
an increment collide with itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..manifest import LocalFS, SnapshotFS

#: Spark's hll_sketch_agg default; kept explicit so ledger writers and
#: readers can never drift apart (hll_union with different lgConfigK
#: would raise unless allowDifferentLgConfigK, which silently degrades
#: to the coarser sketch — we forbid it instead).
LG_CONFIG_K = 12


@dataclass
class HllLedger:
    """Append-only per-(table, column) cardinality snapshots:
    (``__seq`` long, group cols…, ``__hll`` binary, ``__n_rows`` long),
    parquet behind the SnapshotFS seam with pinned-file-list reads."""

    root: str
    fs: SnapshotFS = field(default_factory=LocalFS)
    lg_config_k: int = LG_CONFIG_K

    def _path(self, table: str, column: str) -> str:
        return f"{self.root}/{table}/{column}"

    def _read(
        self, spark: SparkSession, table: str, column: str
    ) -> Optional[DataFrame]:
        files = self.fs.list_files(self._path(table, column))
        if not files:
            return None
        return spark.read.parquet(*files)

    def sketch(
        self, df: DataFrame, column: str, group_by: Sequence[str] = ()
    ) -> DataFrame:
        """(group cols…, __hll, __n_rows) for one increment — ONE
        grouped aggregation; the shuffle carries per-group sketches
        (~KB) after map-side partial merge, never values."""
        return df.groupBy(*group_by).agg(
            F.hll_sketch_agg(column, self.lg_config_k).alias("__hll"),
            F.count(F.lit(1)).alias("__n_rows"),
        )

    def cumulative(
        self, spark: SparkSession, table: str, column: str,
        group_by: Sequence[str] = (),
    ) -> Optional[DataFrame]:
        """All prior increments merged per group:
        (group cols…, __hll, __n_rows).  Register-wise max makes this
        bit-identical to sketching the concatenation, so the baseline
        never degrades with increment count; the input is
        O(groups × increments) tiny rows and the result broadcasts."""
        snap = self._read(spark, table, column)
        if snap is None:
            return None
        return snap.groupBy(*group_by).agg(
            F.hll_union_agg("__hll", False).alias("__hll"),
            F.sum("__n_rows").alias("__n_rows"),
        )

    def next_seq(self, spark: SparkSession, table: str, column: str) -> int:
        snap = self._read(spark, table, column)
        if snap is None:
            return 1
        # coalesce: a directory holding only zero-row part files (an
        # empty increment was recorded) yields max(__seq) = NULL —
        # without the default, None + 1 would poison the ledger for
        # every later append (same guard as manifest.record's seq)
        return (
            snap.agg(F.coalesce(F.max("__seq"), F.lit(0)).alias("m"))
            .first()
            .m
            + 1
        )

    def record(
        self, sketches: DataFrame, table: str, column: str, seq: int
    ) -> None:
        """Append one increment's (group…, __hll, __n_rows) rows under
        ``__seq``.  Production swap point: ``.writeTo(...).append()``
        on an Iceberg table makes this atomic with the manifest
        commit (see manifest.run_resumable's ordering comment)."""
        sketches.where(F.col("__hll").isNotNull()).select(
            F.lit(seq).cast("long").alias("__seq"), "*"
        ).write.mode("append").parquet(self._path(table, column))


def cross_increment_cardinality(
    df: DataFrame,
    ledger: HllLedger,
    table: str,
    column: str,
    group_by: Sequence[str] = (),
    novelty_threshold: float = 0.5,
    update: bool = True,
) -> DataFrame:
    """Per-group cardinality screen of this increment vs everything
    the ledger has seen: (group cols…, n_rows, est_distinct_inc,
    est_before, est_after, est_novel, novelty, collapsed).

    ``collapsed`` fires when novelty (new-distinct per row) falls
    below ``novelty_threshold`` — the increment is mostly values
    prior increments already contributed.  On the FIRST increment
    (no baseline) est_before = 0 and novelty is within-increment
    distinctness, so a first increment of pure duplicates still
    flags.

    Plan shape: one grouped sketch agg over the increment + one
    broadcast join against O(groups) merged baseline rows + pure
    column algebra on estimates.  Prior increments' rows are never
    re-read; nothing here scales with history except the tiny
    snapshot table.  ``update=True`` then appends this increment's
    sketches (AFTER the verdicts materialize — the family-wide crash
    ordering) and returns the verdicts persisted; ``update=False``
    returns a LAZY frame (screening has exactly one consumer then —
    nothing to share, nothing to leak)."""
    spark = df.sparkSession
    if update:
        # the sketch frame is O(groups) rows but its lineage is a
        # full scan of the increment — persist it so the verdicts and
        # the ledger append share ONE scan (the survivors-fix lesson:
        # never re-execute a corpus-sized lineage for a second
        # consumer)
        inc = ledger.sketch(df, column, group_by).persist()
    else:
        # screen-only: the sketch frame has exactly one consumer, so
        # there is nothing to share — stay lazy (callers sequencing
        # their own append use screen_sketches on a frame THEY manage)
        inc = ledger.sketch(df, column, group_by)
    try:
        out = screen_sketches(
            inc, ledger, table, column, group_by, novelty_threshold
        )
        if update:
            # materialize (and keep, for the caller) BEFORE the
            # sketch append lands — the family-wide crash ordering;
            # recomputation stays safe regardless: the baseline plan
            # is pinned to the pre-append file list
            out = out.persist()
            out.count()
            ledger.record(
                inc, table, column,
                ledger.next_seq(spark, table, column),
            )
        return out
    finally:
        if update:
            inc.unpersist()


def screen_sketches(
    inc: DataFrame,
    ledger: HllLedger,
    table: str,
    column: str,
    group_by: Sequence[str] = (),
    novelty_threshold: float = 0.5,
) -> DataFrame:
    """The LAZY screen over an already-built sketch frame
    (``ledger.sketch`` output) — the composable core of
    cross_increment_cardinality, exposed so callers that must
    sequence the ledger append themselves (manifest.run_resumable)
    can compute verdicts and append from ONE sketch frame instead of
    re-scanning the increment."""
    spark = inc.sparkSession
    base = ledger.cumulative(spark, table, column, group_by)
    if base is None:
        merged = inc.select(
            *group_by,
            F.col("__n_rows").alias("n_rows"),
            F.col("__hll").alias("__inc_hll"),
            F.lit(None).cast("binary").alias("__base_hll"),
        )
    else:
        b = base.select(
            *group_by, F.col("__hll").alias("__base_hll")
        )
        i = inc.select(
            *group_by,
            F.col("__n_rows").alias("n_rows"),
            F.col("__hll").alias("__inc_hll"),
        )
        if group_by:
            merged = i.join(F.broadcast(b), list(group_by), "left")
        else:
            # ungrouped: both sides are single-row global aggregates —
            # a bounded 1x1 cross join, never a cartesian product
            merged = i.crossJoin(F.broadcast(b))
    est_inc = F.hll_sketch_estimate("__inc_hll")
    est_before = F.when(
        F.col("__base_hll").isNull(), F.lit(0)
    ).otherwise(F.hll_sketch_estimate("__base_hll"))
    est_after = F.when(
        F.col("__base_hll").isNull(), est_inc
    ).otherwise(
        F.hll_sketch_estimate(
            F.hll_union("__inc_hll", "__base_hll", False)
        )
    )
    return (
        merged.select(
            *group_by,
            "n_rows",
            est_inc.alias("est_distinct_inc"),
            est_before.alias("est_before"),
            est_after.alias("est_after"),
        )
        .withColumn(
            "est_novel", F.col("est_after") - F.col("est_before")
        )
        .withColumn(
            "novelty",
            F.when(
                F.col("n_rows") > 0,
                F.col("est_novel") / F.col("n_rows"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            # never-null verdict: an empty increment (n_rows 0 — e.g.
            # a resume where nothing is pending) or a group whose
            # values are all NULL (null sketch → null novelty) has
            # nothing to screen — not collapsed
            "collapsed",
            (F.col("n_rows") > 0)
            & F.coalesce(
                F.col("novelty") < F.lit(novelty_threshold),
                F.lit(False),
            ),
        )
    )


def record_sketches(
    df: DataFrame,
    ledger: HllLedger,
    table: str,
    column: str,
    group_by: Sequence[str] = (),
) -> None:
    """Record an increment's sketches without screening — for callers
    sequencing ledger appends after other commits (the
    manifest.run_resumable ordering)."""
    ledger.record(
        ledger.sketch(df, column, group_by),
        table,
        column,
        ledger.next_seq(df.sparkSession, table, column),
    )
