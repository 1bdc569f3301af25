"""Completed-partition manifest: resumable validation with
per-partition lineage + metrics (north rule: "resumable from a
checkpointed Iceberg manifest of completed partitions with
per-partition lineage and metrics").

Sandbox note: no Iceberg runtime jar is available here, so the
manifest is an append-only parquet directory with the same semantics
as an Iceberg snapshot-append (atomic at file granularity, idempotent
via run_id + latest-wins read).  In production, swap ``_read``/
``record`` for an Iceberg table (``.writeTo(...).append()``) — the
engine-facing API is unchanged.

Resume shape: the pending-work filter is a LEFT ANTI join of the scan
against the (tiny, broadcast) completed-partition set — partition
pruning happens at the source when the table is partitioned by the
scope column, so completed partitions are never even read.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "partition string, run_id string, seq long, n_rows long, n_failed long, "
    "n_violations long, status string"
)


@dataclass
class PartitionManifest:
    path: str

    def _exists(self) -> bool:
        return os.path.exists(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Full lineage: every recorded (partition, run) attempt."""
        if not self._exists():
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        return spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)

    def completed(self, spark: SparkSession) -> DataFrame:
        """Latest-wins set of partitions whose latest record is 'ok'."""
        m = self.read(spark)
        latest = m.groupBy("partition").agg(F.max("seq").alias("seq"))
        return (
            m.join(latest, ["partition", "seq"])
            .where(F.col("status") == "ok")
            .select("partition")
        )

    def filter_pending(
        self, df: DataFrame, scope_col: str
    ) -> DataFrame:
        """Rows of partitions not yet completed — the resume filter."""
        done = self.completed(df.sparkSession)
        return df.join(
            F.broadcast(done),
            df[scope_col] == done["partition"],
            "left_anti",
        )

    def record(
        self,
        metrics: DataFrame,
        run_id: Optional[str] = None,
        status: str = "ok",
    ) -> str:
        """Append per-partition metrics (lineage row per partition per
        run).  metrics: (partition, n_rows, n_failed, n_violations).
        Returns the run_id."""
        rid = run_id or uuid.uuid4().hex[:12]
        spark = metrics.sparkSession
        prev = self.read(spark)
        seq = prev.agg(F.coalesce(F.max("seq"), F.lit(0)).alias("m")).first().m + 1
        out = metrics.select(
            F.col("partition").cast("string"),
            F.lit(rid).alias("run_id"),
            F.lit(seq).cast("long").alias("seq"),
            F.col("n_rows").cast("long"),
            F.col("n_failed").cast("long"),
            F.col("n_violations").cast("long"),
            F.lit(status).alias("status"),
        )
        out.write.mode("append").parquet(self.path)
        return rid


def partition_metrics(
    df: DataFrame,
    violations: DataFrame,
    row_id: str,
    scope_col: str,
) -> DataFrame:
    """Per-partition lineage metrics: row count, failed-row count,
    violation count — one aggregation over rows plus one over
    violations, joined on partition.

    Attribution rule: a violation is attributed to EVERY partition
    holding a row with that row_id — so a duplicate-PK violation
    implicates both partitions containing the colliding id, and
    sum(n_violations) can exceed count(violations) when ids repeat
    across partitions (they can't on a clean table)."""
    ids = df.select(
        F.col(row_id).cast("string").alias("row_id"),
        F.col(scope_col).cast("string").alias("partition"),
    )
    vio = violations.select("row_id").join(ids, "row_id")
    per_row = (
        vio.groupBy("partition")
        .agg(
            F.countDistinct("row_id").alias("n_failed"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )
    base = ids.groupBy("partition").agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        base.join(per_row, "partition", "left")
        .select(
            "partition",
            "n_rows",
            F.coalesce("n_failed", F.lit(0)).alias("n_failed"),
            F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        )
    )


def run_resumable(
    images: DataFrame,
    formats: DataFrame,
    manifest: PartitionManifest,
    scope_col: str = "part",
    row_id: str = "image_id",
    run_id: Optional[str] = None,
):
    """One resumable validation increment over the north-star table:
    validates only pending partitions, records their lineage/metrics,
    returns (violations_df, metrics_df, run_id).

    Semantics note: uniqueness/referential constraints are evaluated
    WITHIN the pending increment (cross-increment duplicates need the
    key dimensions persisted — see key_dimension — exactly as the
    reference's key worlds persist across files within one run)."""
    from .payload.validate import validate_images

    pending = manifest.filter_pending(images, scope_col)
    # violations are consumed twice (metrics + caller) and are tiny
    # relative to the input — persist instead of re-validating
    violations = validate_images(pending, formats).persist()
    metrics = partition_metrics(pending, violations, row_id, scope_col)
    rid = manifest.record(metrics, run_id=run_id)
    return violations, metrics, rid
