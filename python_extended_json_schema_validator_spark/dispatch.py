"""Schema dispatch (SURVEY.md §2.2 P1): route rows of a heterogeneous
document table to per-schema validation plans.

The reference probes each document for its schema id via JSONPath over
``@schema | _schema | $schema`` (extensible_validator.py:113-115,
1130-1139) and validates against that schema; documents with no id get
``no_id``, unknown ids get ``schema_unknown`` (:278-304,1348-1353).
Guess mode tries every schema and keeps the first that validates
(:1229-1340).

Spark-first: schema dispatch degenerates to *plan selection* — one
filtered branch per declared schema id, each branch running its spec's
compiled checks; the branches union into one violations DataFrame.
One scan per schema (Catalyst merges the filters into the scan), no
per-row Python.
"""

from __future__ import annotations

from functools import reduce
from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .engine import ValidationEngine
from .spec import TableSpec

#: the reference's default probe order (extensible_validator.py:113-115)
DEFAULT_ID_COLUMNS = ("@schema", "_schema", "$schema")

NO_ID = "no_id"
SCHEMA_UNKNOWN = "schema_unknown"


def probe_schema_id(
    df: DataFrame, id_columns: Sequence[str] = DEFAULT_ID_COLUMNS
) -> Column:
    """First non-null of the probe columns that exist in the schema —
    the columnar form of the JSONPath probe (first match wins)."""
    present = [c for c in id_columns if c in df.columns]
    if not present:
        return F.lit(None).cast("string")
    return F.coalesce(*[F.col(f"`{c}`").cast("string") for c in present])


class SchemaDispatcher:
    """Validate a mixed-schema document table: each row is routed to
    the TableSpec named by its schema id."""

    def __init__(
        self,
        specs: Dict[str, TableSpec],
        id_columns: Sequence[str] = DEFAULT_ID_COLUMNS,
        row_id: str = "file",
    ):
        self.specs = dict(specs)
        self.id_columns = tuple(id_columns)
        self.row_id = row_id

    def validate(self, df: DataFrame) -> DataFrame:
        sid = probe_schema_id(df, self.id_columns)
        rid = F.col(self.row_id).cast("string")

        frames = []
        # routing errors (reasons mirror the reference, :278-304)
        frames.append(
            df.where(sid.isNull()).select(
                F.lit("dispatch").alias("constraint_id"),
                F.lit(NO_ID).alias("reason"),
                rid.alias("row_id"),
                F.lit(None).cast("string").alias("observed_value"),
                F.lit("/").alias("path"),
            )
        )
        known = list(self.specs)
        frames.append(
            df.where(sid.isNotNull() & ~sid.isin(known)).select(
                F.lit("dispatch").alias("constraint_id"),
                F.lit(SCHEMA_UNKNOWN).alias("reason"),
                rid.alias("row_id"),
                sid.alias("observed_value"),
                F.lit("/").alias("path"),
            )
        )
        # one branch per schema id — plan selection, not interpretation
        for schema_id, spec in self.specs.items():
            sub = df.where(sid == schema_id)
            res = ValidationEngine([spec]).validate({spec.name: sub})
            frames.append(res.violations)
        return reduce(lambda a, b: a.unionByName(b), frames)

    def guess(self, df: DataFrame) -> DataFrame:
        """Guess mode (P1, :1229-1340): no declared id — a row is
        assigned the first spec (in declaration order) whose row-level
        battery it passes; rows matching none are schema_unknown.
        Returns df + ``__matched_schema`` column."""
        from .checks import row_checks

        matched = F.lit(None).cast("string")
        for schema_id, spec in self.specs.items():
            compiled = row_checks.compile_battery(
                spec.checks, formats=spec.custom_formats
            )
            ok = row_checks.pass1_ok(compiled)
            matched = F.when(
                matched.isNull() & ok, F.lit(schema_id)
            ).otherwise(matched)
        return df.withColumn("__matched_schema", matched)
