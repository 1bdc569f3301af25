"""Distribution-drift check (north star: 'value-distribution
assertions' / 'quantiles for w/h/phash drift'): decile_drift +
drift_violations, exact and t-digest paths."""

import random

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import stats


@pytest.fixture(scope="module")
def frames(spark):
    rng = random.Random(11)
    rows = [
        (i, "g1" if i % 2 == 0 else "g2", rng.gauss(100.0, 10.0))
        for i in range(4000)
    ]
    base = spark.createDataFrame(rows, "id long, g string, v double")
    # current: g1 shifted by +3 sigma, g2 unchanged
    cur = base.withColumn(
        "v", F.when(F.col("g") == "g1", F.col("v") + 30.0).otherwise(F.col("v"))
    )
    return base, cur


def test_shifted_group_flagged_stable_group_clean(frames):
    base, cur = frames
    out = {r["g"]: r for r in
           stats.decile_drift(cur, base, ["g"], "v", threshold=0.1).collect()}
    assert out["g1"]["drifted"] is True
    # +30 on a ~±13 inter-decile range → shift ≈ 30/52 ≈ 0.58
    assert out["g1"]["shift"] > 0.4
    assert out["g2"]["drifted"] is False
    assert out["g2"]["shift"] < 0.05  # same rows → identical quantiles


def test_identical_distributions_zero_shift(frames):
    base, _ = frames
    out = stats.decile_drift(base, base, ["g"], "v").collect()
    assert all(r["shift"] == 0.0 and not r["drifted"] for r in out)


def test_tdigest_path_agrees_on_verdicts(frames):
    base, cur = frames
    exact = {r["g"]: r["drifted"] for r in
             stats.decile_drift(cur, base, ["g"], "v").collect()}
    approx = {r["g"]: r["drifted"] for r in
              stats.decile_drift(cur, base, ["g"], "v", approx=True).collect()}
    assert exact == approx == {"g1": True, "g2": False}


def test_drift_violation_rows(frames):
    base, cur = frames
    rows = stats.drift_violations(cur, base, ["g"], "v").collect()
    assert [(r.constraint_id, r.reason, r.row_id) for r in rows] == [
        ("drift:v", "distribution_drift", "g1")
    ]


def test_scale_change_detected(spark):
    rng = random.Random(7)
    base = spark.createDataFrame(
        [(i, rng.gauss(0.0, 1.0)) for i in range(4000)], "id long, v double"
    )
    cur = base.withColumn("v", F.col("v") * 3.0)  # variance blow-up, mean ~0
    out = stats.decile_drift(cur, base, [], "v").collect()
    assert len(out) == 1 and out[0]["drifted"] is True


def test_constant_baseline_null_scale(spark):
    """Zero inter-decile range (constant baseline) → NULL shift, no
    crash, not drifted (NULL > threshold is NULL → False after
    where)."""
    base = spark.createDataFrame([(i, 5.0) for i in range(100)],
                                 "id long, v double")
    cur = base.withColumn("v", F.col("v") + 1.0)
    out = stats.decile_drift(cur, base, [], "v").collect()
    assert out[0]["shift"] is None
    assert len(stats.drift_violations(cur, base, [], "v").collect()) == 0
