"""t-digest quantile sketch: accuracy vs exact sort-based percentiles
on uniform and heavily skewed data, and merge correctness across many
partitions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.tdigest import (
    _compress,
    _quantiles,
    quantile_sketch,
)


def test_compress_bounds_centroids():
    rng = np.random.default_rng(0)
    m = rng.normal(size=10000)
    w = np.ones_like(m)
    cm, cw = _compress(m, w, 128)
    assert len(cm) <= 2 * 128  # capacity rule keeps it near the target
    assert abs(cw.sum() - 10000) < 1e-6  # weight conserved
    assert np.all(np.diff(cm) >= 0)


def test_quantiles_of_known_distribution():
    m = np.arange(1.0, 101.0)  # 1..100, weight 1
    w = np.ones_like(m)
    q = _quantiles(m, w, [0.5])
    assert abs(q[0] - 50.5) < 1.0


@pytest.mark.parametrize("dist", ["uniform", "skewed"])
def test_sketch_vs_exact(spark, dist):
    n = 50000
    rng = np.random.default_rng(42)
    vals = (
        rng.uniform(0, 1000, n)
        if dist == "uniform"
        else rng.lognormal(0, 2.0, n) * (1 + 999 * (rng.uniform(size=n) < 0.001))
    )
    groups = rng.integers(0, 3, n)
    df = spark.createDataFrame(
        [(int(g), float(v)) for g, v in zip(groups, vals)], "g long, v double"
    ).repartition(16)  # force many partial digests
    got = {
        r.g: (r.p25, r.p50, r.p75)
        for r in quantile_sketch(df, ["g"], "v", (0.25, 0.5, 0.75)).collect()
    }
    for g in range(3):
        sub = np.sort(vals[groups == g])
        for p, est in zip((0.25, 0.5, 0.75), got[g]):
            exact = float(np.quantile(sub, p))
            spread = sub[-1] - sub[0]
            # rank error: the estimated quantile's true rank must be
            # within 2% of the requested rank
            rank = np.searchsorted(sub, est) / len(sub)
            assert abs(rank - p) < 0.02, (dist, g, p, est, exact)


def test_sketch_single_value_groups(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "g long, v double")
    got = {r.g: r.p50 for r in quantile_sketch(df, ["g"], "v", (0.5,)).collect()}
    assert got == {1: 5.0, 2: 7.0}
