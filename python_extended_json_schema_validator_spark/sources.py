"""Document sources (SURVEY.md §2.1 S3-S6): directory/file ingest,
array shredding, and in-memory documents — as distributed reads.

The reference walks directories and parses one JSON/YAML document per
file (extensible_validator.py:931-968,1014-1053), optionally shredding
top-level arrays into one entry per element with synthetic names
``f [i]`` (--iter-arrays, :976-1013).  Spark-first translation:

- a *file* becomes a row; ``file`` column = input_file_name();
- parse errors become a corrupt-record column instead of aborting
  (the reference appends a per-file parse error and continues);
- array shredding is posexplode (S5) with the reference's exact
  synthetic-name format;
- in-memory entries are just createDataFrame (S6).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_documents(
    spark: SparkSession,
    path: str,
    schema: Optional[str] = None,
    multiline: bool = True,
) -> DataFrame:
    """One row per JSON document file (or per line when
    multiline=False).  Unparseable documents land in ``_corrupt``
    instead of failing the read — mirroring the reference's per-file
    parse-error entries (extensible_validator.py:1032-1053)."""
    reader = (
        spark.read.option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
    )
    if schema is not None:
        reader = reader.schema(schema + ", _corrupt string")
    df = reader.json(path)
    return df.withColumn("file", F.input_file_name())


def shred_arrays(
    df: DataFrame, array_col: str, file_col: str = "file"
) -> DataFrame:
    """--iter-arrays (S5): one row per array element, synthetic file
    name ``f [i]`` (reference names shredded entries exactly so,
    extensible_validator.py:997-1001)."""
    pos, elem = "__pos", "__elem"
    out = df.select(
        F.col(file_col),
        F.posexplode(F.col(array_col)).alias(pos, elem),
    )
    return out.select(
        F.concat(F.col(file_col), F.lit(" ["), F.col(pos), F.lit("]")).alias(
            file_col
        ),
        F.col(elem).alias("doc"),
    )


def in_memory_documents(spark: SparkSession, entries, schema=None) -> DataFrame:
    """S6: pre-parsed documents as a DataFrame (the library entry
    point's in-memory path, extensible_validator.py:929-930)."""
    return spark.createDataFrame(entries, schema)
