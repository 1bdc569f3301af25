"""Adaptive scan-parallelism guard for expensive Arrow stages.

Payload batteries (image decode, DCT phash, shredding) do ~100× more
CPU per byte than columnar SQL, so their parallelism must track the
CLUSTER, not the input's split count — a 20 MB cached corpus packs
into 2 input splits and would run a 32-core box at 2 cores.  The
payload docstrings prescribe a salting repartition before such stages;
this helper makes it adaptive and deterministic:

- wide inputs (>= the cluster's cores in partitions) pass through
  untouched — at production scale the scan already parallelises and no
  extra shuffle is paid;
- narrow inputs are hash-repartitioned on the caller's key columns to
  ``defaultParallelism`` partitions.  Hash on a real key, never
  ``rand()`` — retried map tasks must reproduce the same row→partition
  assignment (SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning edge cases
        return df
    if nparts >= target:
        return df
    return df.repartition(target, *key_cols)
