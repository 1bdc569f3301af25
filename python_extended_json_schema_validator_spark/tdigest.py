"""Mergeable t-digest-style quantile sketch as a two-level Arrow
aggregation — the north star's "t-digest quantiles for w/h/phash
drift" computed without ever materializing a group's values in one
place.

Shape (the part that matters at 10^12 rows):
  stage 1  mapInPandas: each *input partition* folds its rows into one
           compact digest per group → (group, means[], weights[]).
           State per partition is O(max_centroids), not O(rows).
  stage 2  groupBy(group).applyInPandas: merge the per-partition
           digests (weighted-centroid merge + re-compression) and
           interpolate the requested quantiles.
So the shuffle moves only digests (≈ max_centroids × 16 bytes per
group per partition) — the classic partial+final UDAF split, built
from public mapInPandas/applyInPandas APIs since PySpark has no
custom-UDAF registration.

The compression uses the t-digest scale-function idea (smaller bins
near the tails): centroid capacity ∝ q(1-q).  Error is ~1/max_centroids
at the median and tighter at the tails; exactness tests bound it
against sort-based percentiles.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _compress(means: np.ndarray, weights: np.ndarray, max_centroids: int):
    """Merge sorted centroids into ≤ max_centroids, with capacity
    proportional to the t-digest scale function q(1-q) so tails stay
    sharp."""
    if len(means) <= max_centroids:
        order = np.argsort(means, kind="stable")
        return means[order], weights[order]
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: List[float] = []
    out_w: List[float] = []
    cum = 0.0
    cur_m, cur_w = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = (cum + cur_w / 2.0) / total
        # scale function q(1-q) sharpens tails; the 0.25 floor bounds
        # the centroid count at ~2x max_centroids (pure q(1-q) would
        # diverge into singleton centroids at the extremes)
        cap = max(total * max(4.0 * q * (1.0 - q), 0.25) / max_centroids, 1.0)
        if cur_w + w <= cap:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantiles(means: np.ndarray, weights: np.ndarray, probs: Sequence[float]):
    """Interpolated quantiles from a centroid set (midpoint rule)."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total == 0:
        return [float("nan")] * len(probs)
    # centroid midpoints in cumulative-weight space
    cum = np.cumsum(weights) - weights / 2.0
    qs = cum / total
    out = []
    for p in probs:
        if p <= qs[0]:
            out.append(float(means[0]))
        elif p >= qs[-1]:
            out.append(float(means[-1]))
        else:
            out.append(float(np.interp(p, qs, means)))
    return out


def _plabel(p: float) -> str:
    """Collision-free quantile label (p99 vs p99_9) — shared shape
    with stats._plabel."""
    return "p" + f"{p * 100:g}".replace(".", "_")


def quantile_sketch(
    df: DataFrame,
    group_by: Sequence[str],
    column: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    max_centroids: int = 128,
) -> DataFrame:
    """Per-group approximate quantiles via the two-level digest.
    Output: group_by columns + p{25,50,75,...} doubles."""
    gcols = list(group_by)
    partial_schema = T.StructType(
        [df.schema[g] for g in gcols]
        + [
            T.StructField("__means", T.ArrayType(T.DoubleType()), False),
            T.StructField("__weights", T.ArrayType(T.DoubleType()), False),
        ]
    )

    src = df.select(*gcols, F.col(column).cast("double").alias("__v")).where(
        F.col("__v").isNotNull()
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fold ALL batches of this partition into one digest per group
        acc: dict = {}
        for pdf in batches:
            # pandas groupby([]) raises "No group keys passed!" — the
            # global (ungrouped) sketch folds the whole chunk as one
            # group, like stats.exact_quantiles(group_by=[])
            groups = (
                pdf.groupby(gcols, sort=False, dropna=False)
                if gcols
                else [((), pdf)]
            )
            for key, sub in groups:
                if not isinstance(key, tuple):
                    key = (key,)
                v = sub["__v"].to_numpy(dtype=np.float64)
                m, w = acc.get(key, (np.empty(0), np.empty(0)))
                m = np.concatenate([m, v])
                w = np.concatenate([w, np.ones_like(v)])
                acc[key] = _compress(m, w, max_centroids)
        rows = {g: [] for g in gcols}
        means_col, weights_col = [], []
        for key, (m, w) in acc.items():
            for g, kv in zip(gcols, key):
                rows[g].append(kv)
            means_col.append(m.tolist())
            weights_col.append(w.tolist())
        out = pd.DataFrame(rows)
        # object dtype so Arrow sees python lists, not a 2-D ndarray
        out["__means"] = pd.Series(means_col, dtype=object)
        out["__weights"] = pd.Series(weights_col, dtype=object)
        yield out

    partials = src.mapInPandas(partial, schema=partial_schema)

    out_fields = [df.schema[g] for g in gcols] + [
        T.StructField(_plabel(p), T.DoubleType(), True) for p in probs
    ]
    out_schema = T.StructType(out_fields)

    # no type hints: a PARTIAL hint set makes pyspark's eval-type
    # inference warn on every call (it requires hints on all params
    # or none — group_ops.py:295)
    def final(key, pdf):
        m = np.concatenate([np.asarray(x) for x in pdf["__means"]])
        w = np.concatenate([np.asarray(x) for x in pdf["__weights"]])
        m, w = _compress(m, w, 2 * max_centroids)
        vals = _quantiles(m, w, probs)
        row = {g: [k] for g, k in zip(gcols, key)}
        for p, v in zip(probs, vals):
            row[_plabel(p)] = [v]
        return pd.DataFrame(row)

    return partials.groupBy(*gcols).applyInPandas(final, schema=out_schema)
