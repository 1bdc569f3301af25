"""r08: the bounded per-group quota (salted partial top-n before the
exact window — the round-7 verdict's skew item) must be output-
identical to the plain single-window form and must show the
pre-aggregation in the plan."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_extended_json_schema_validator_spark.pipeline import sampling


def _corpus(spark, n=3000, hot_frac=0.8, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        lang = "en" if rng.random() < hot_frac else rng.choice(
            ["fr", "de", "es", "it"]
        )
        # deliberate score TIES (scores drawn from a small range) —
        # the doc_id tiebreak must keep the kept set deterministic
        rows.append((i, lang, rng.randrange(50)))
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def _plain(df, n):
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


@pytest.mark.parametrize("n", [1, 7, 40])
def test_bounded_quota_matches_plain_window(spark, n):
    df = _corpus(spark)
    bounded = sampling.top_n_per_group(
        df, ["lang"], "n_chars", n, tiebreak="doc_id"
    )
    plain = _plain(df, n)
    got = sorted(map(tuple, bounded.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want


def test_bounded_quota_plan_has_partial_stage(spark):
    df = _corpus(spark, n=500)
    bounded = sampling.top_n_per_group(
        df, ["lang"], "n_chars", 5, tiebreak="doc_id"
    )
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    # two Window exec nodes: the salted partial top-n + the exact one
    assert plan.count("Window [") >= 2, plan
    assert "xxhash64" in plan, plan
    # both literal-bounded windows get Spark's map-side group limit —
    # the partial top-k BEFORE the exchange that bounds reducer input
    assert "WindowGroupLimit" in plan and ", Partial" in plan, plan


def test_no_tiebreak_keeps_single_window(spark):
    df = _corpus(spark, n=500)
    out = sampling.top_n_per_group(df, ["lang"], "n_chars", 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1, plan
