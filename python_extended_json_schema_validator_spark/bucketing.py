"""Bucketed key dimensions: shuffle-free referential checks for
REPEATED validation runs over the same huge dimension.

At 10^12 rows the FK anti-join's dim side (DISTINCT canonical keys of
the referenced table) can itself be billions of keys — too big to
broadcast, so every validation run pays a sort-merge shuffle of BOTH
sides.  When the same dimension is probed run after run (nightly
validation of new increments against a stable reference table), the
classic fix is to persist both sides bucketed by the join key: Spark
then plans the join with NO Exchange on the bucketed side(s).

This module materializes a key dimension as a bucketed table
(``bucketBy(n, "__key")``) and probes it; tests/test_plans.py asserts
the executed plan contains no shuffle on the bucketed dim side.
Pair with manifest.KeyLedger for the incremental-uniqueness analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checks import referential, uniqueness
from .spec import ForeignKeySpec, KeySpec, TableSpec


def write_bucketed_dim(
    df: DataFrame,
    spec: TableSpec,
    ks: KeySpec,
    table_name: str,
    buckets: int = 32,
) -> None:
    """Materialize the key dimension of (spec, ks) as a bucketed,
    sorted managed table — the run-to-run join target."""
    dim = uniqueness.key_dimension(df, spec, ks)
    (
        dim.write.mode("overwrite")
        .bucketBy(buckets, "__key")
        .sortBy("__key")
        .saveAsTable(table_name)
    )


def bucketed_referential_violations(
    fact_df: DataFrame,
    fact_spec: TableSpec,
    fk: ForeignKeySpec,
    dim_table: str,
    kind: str = "fk",
) -> DataFrame:
    """FK violations probing a PRE-BUCKETED dimension table: the dim
    side reads bucketed (no Exchange — its scan already reports
    hashpartitioning on __key), and EnsureRequirements shuffles ONLY
    the fact side to the bucket count (zero shuffles total if the fact
    table is itself stored bucketed on the key).

    Dangling semantics are not evaluated here (a persisted dim implies
    declared, populated key worlds — this is the steady-state scale
    path, not the bootstrap one)."""
    spark = fact_df.sparkSession
    dim = spark.table(dim_table)
    fkt = referential.fk_tuples(fact_df, fact_spec, fk)
    cid = f"{kind}:{fact_spec.name}.{fk.label}"
    from . import errors

    return fkt.join(dim, "__key", "left_anti").select(
        F.lit(cid).alias("constraint_id"),
        F.lit(errors.STALE_FK).alias("reason"),
        F.col("__row_id").alias("row_id"),
        F.col("__observed").alias("observed_value"),
        F.lit("/" + ",".join(fk.members)).alias("path"),
    )
