"""Skewed-key dedup strategy bench: one key holds `skew` of all rows
(the north-star's low-cardinality phash scenario).  Compares the
'window' strategy (per-key sort → the hot key serializes in ONE task)
against the skew-proof 'agg' strategy (two hash aggregations with
map-side partial combine — bounded state at any skew).

Run: python3 tools/skew_bench.py [--rows 5000000] [--skew 0.2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import KeySpec, TableSpec
from python_extended_json_schema_validator_spark.checks import uniqueness


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--skew", type=float, default=0.2)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one hot key = `skew` of rows, the rest spread over 1M keys
    df = (
        spark.range(0, args.rows, 1, args.cpus * 4)
        .select(
            F.col("id").cast("string").alias("rid"),
            F.when(
                (F.col("id") % 100) < int(args.skew * 100), F.lit("HOTKEY")
            )
            .otherwise((F.col("id") % 1_000_000).cast("string"))
            .alias("k"),
        )
        .persist()
    )
    df.count()  # materialize input out of the timed region

    spec = TableSpec(name="t", row_id="rid", unique=[KeySpec(("k",))])
    ks = spec.unique[0]

    timings = {}
    counts = {}
    for strat in ("window", "agg"):
        t0 = time.time()
        out = uniqueness.dup_violations(df, spec, ks, "dup_unique", "unique",
                                        strategy=strat)
        counts[strat] = out.count()
        timings[strat] = round(time.time() - t0, 2)

    assert counts["window"] == counts["agg"], counts
    print(
        json.dumps(
            {
                "metric": "skewed dedup wall time",
                "rows": args.rows,
                "skew": args.skew,
                "cpus": args.cpus,
                "violations": counts["agg"],
                "window_sec": timings["window"],
                "agg_sec": timings["agg"],
                "speedup": round(timings["window"] / timings["agg"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
