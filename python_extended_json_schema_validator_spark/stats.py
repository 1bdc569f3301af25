"""Column-statistics pass (north star: per-column null rate, min/max,
cardinality, quantiles computed in a SINGLE grouped-by-partition pass).

The reference has no statistics machinery at all — this is the
scale-path addition BASELINE.json mandates.  Design:

- ``profile``: ONE ``groupBy(partition).agg(...)`` computing every
  requested statistic for every column in a single shuffle — never
  one job per column.  Exact variant (count/min/max/count_distinct)
  for oracle parity; ``approx=True`` swaps exact distinct counts for
  ``approx_count_distinct`` (HyperLogLog++, constant memory — the
  only sane choice at 10^12 rows).
- ``quantile_sketch``: t-digest-style quantiles per group via a
  two-level Arrow-batched aggregation (see tdigest.py).
- ``salted_group_count``: two-stage aggregation for skewed keys —
  stage 1 groups on (key, salt) so a hot key spreads over
  ``n_salts`` partitions with map-side partial aggregation, stage 2
  merges the partials.  Identical result to a direct groupBy; bounded
  per-partition state at any skew.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _plabel(p: float) -> str:
    """Collision-free quantile column label: p50, p99, p99_9 (naive
    int(p*100) collapses 0.99 and 0.999 to the same name)."""
    return "p" + f"{p * 100:g}".replace(".", "_")


def profile(
    df: DataFrame,
    group_by: Sequence[str],
    columns: Sequence[str],
    approx_distinct: bool = False,
    distinct_rsd: float = 0.05,
) -> DataFrame:
    """Per-group column profile in one aggregation pass.

    Output columns per profiled column c:
      ``{c}_nulls, {c}_min, {c}_max, {c}_distinct``
    plus ``n_rows`` — all computed in a single shuffle on group_by.
    """
    aggs: List[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}_nulls"))
        aggs.append(F.min(col).alias(f"{c}_min"))
        aggs.append(F.max(col).alias(f"{c}_max"))
        if approx_distinct:
            aggs.append(
                F.approx_count_distinct(col, rsd=distinct_rsd).alias(f"{c}_distinct")
            )
        else:
            aggs.append(F.countDistinct(col).alias(f"{c}_distinct"))
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def null_rates(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Global null rate per column, one pass, one row out."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(
            (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / F.count(F.lit(1)))
            .alias(f"{c}_null_rate")
        )
    return df.agg(*aggs)


def salted_group_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 32
) -> DataFrame:
    """Two-stage skew-proof ``groupBy(keys).count()``.

    Stage 1 partially aggregates on (keys, salt) — the salt is a
    deterministic hash of the FULL ROW CONTENT spread over ``n_salts``
    buckets (content-hashing, not monotonically_increasing_id, keeps
    the salt stable across shuffle-block recomputation: a re-run map
    task re-salts rows identically, so partial fetch + retry cannot
    double-count), so a key owning billions of rows produces up to
    ``n_salts`` partials instead of one giant reduce partition.
    Stage 2 sums the partials per key.  Result is bit-identical to
    ``df.groupBy(keys).count()``.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return stage1.groupBy(*keys).agg(F.sum("__partial").alias("count"))


def exact_quantiles(
    df: DataFrame,
    group_by: Sequence[str],
    column: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact per-group quantiles via the built-in sort-based
    ``percentile`` — fine at test scale; at 10^12 rows use
    tdigest.quantile_sketch instead."""
    aggs = [
        F.percentile(F.col(column), F.lit(p)).alias(_plabel(p)) for p in probs
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def approx_quantiles(
    df: DataFrame,
    group_by: Sequence[str],
    column: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Greenwald-Khanna approximate per-group quantiles
    (``approx_percentile`` — mergeable sketch, the built-in scale
    path; tdigest.py provides the pandas-UDAF t-digest the north star
    names)."""
    aggs = [
        F.percentile_approx(F.col(column), F.lit(p), F.lit(accuracy)).alias(
            _plabel(p)
        )
        for p in probs
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


DECILES = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def decile_drift(
    current: DataFrame,
    baseline: DataFrame,
    group_by: Sequence[str],
    column: str,
    threshold: float = 0.1,
    probs: Sequence[float] = DECILES,
    approx: bool = False,
) -> DataFrame:
    """Distribution-drift check (the north star's 'value-distribution
    assertions' / 'quantiles for w/h/phash drift'): per group, the
    normalized maximum quantile shift between a CURRENT batch and a
    BASELINE snapshot::

        shift = max_p |q_current(p) - q_baseline(p)|
                      / (q_baseline(0.9) - q_baseline(0.1))

    → (group_by…, shift double, drifted boolean).  A location or
    scale change in any part of the distribution moves at least one
    decile; normalizing by the baseline's inter-decile range makes
    the threshold unit-free (0.1 ⇒ a shift of 10% of the bulk range).

    Scale shape: two grouped aggregations (one per side — map-side
    partial agg, shuffle carries only (group, 9 doubles)) and ONE
    broadcast join on the tiny per-group quantile frames; the row data
    never joins.  ``approx=True`` swaps the exact sort-based
    ``percentile`` for the mergeable t-digest sketch
    (tdigest.quantile_sketch) — the 10^12-row path, same interface,
    same downstream algebra.  With ``approx=False`` the whole check is
    replicable bit-for-bit in SQL (quantile_cont ⇔ percentile, proven
    by the quantiles_exact oracle), so the driver hash-checks it —
    see __spark_entry__.q_drift_check.
    """
    if approx:
        from .tdigest import quantile_sketch

        qc = quantile_sketch(current, group_by, column, tuple(probs))
        qb = quantile_sketch(baseline, group_by, column, tuple(probs))
    else:
        qc = exact_quantiles(current, group_by, column, probs)
        qb = exact_quantiles(baseline, group_by, column, probs)
    return quantile_shift(qc, qb, group_by, probs, threshold)


def quantile_shift(
    qc: DataFrame,
    qb: DataFrame,
    group_by: Sequence[str],
    probs: Sequence[float] = DECILES,
    threshold: float = 0.1,
) -> DataFrame:
    """The compare half of decile_drift, over PRECOMPUTED per-group
    quantile frames (columns: group_by…, p10..p90) — shared with the
    cross-increment drift ledger, where the baseline side comes from a
    persisted snapshot instead of a live aggregation."""
    labels = [_plabel(p) for p in probs]
    qc = qc.select(*group_by, *[F.col(l).alias(f"c_{l}") for l in labels])
    qb = qb.select(*group_by, *[F.col(l).alias(f"b_{l}") for l in labels])
    j = (
        qc.join(F.broadcast(qb), list(group_by))
        if group_by
        else qc.crossJoin(F.broadcast(qb))  # both sides are 1 row
    )
    lo, hi = _plabel(min(probs)), _plabel(max(probs))
    scale = F.nullif(F.col(f"b_{hi}") - F.col(f"b_{lo}"), F.lit(0.0))
    shifts = [
        F.abs(F.col(f"c_{l}") - F.col(f"b_{l}")) / scale for l in labels
    ]
    shift = F.greatest(*shifts) if len(shifts) > 1 else shifts[0]
    return j.select(
        *group_by,
        shift.alias("shift"),
        (shift > F.lit(threshold)).alias("drifted"),
    )


def drift_violations(
    current: DataFrame,
    baseline: DataFrame,
    group_by: Sequence[str],
    column: str,
    threshold: float = 0.1,
    probs: Sequence[float] = DECILES,
    approx: bool = False,
) -> DataFrame:
    """Engine-shaped violation rows for drifted groups:
    (constraint_id, reason='distribution_drift', row_id=group key,
    observed_value=shift)."""
    d = decile_drift(
        current, baseline, group_by, column, threshold, probs, approx
    )
    key = (
        F.concat_ws("|", *[F.col(g).cast("string") for g in group_by])
        if group_by
        else F.lit("(all)")
    )
    return d.where(F.col("drifted")).select(
        F.lit(f"drift:{column}").alias("constraint_id"),
        F.lit("distribution_drift").alias("reason"),
        key.alias("row_id"),
        F.col("shift").cast("string").alias("observed_value"),
    )
