"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

The flagship number is images/sec through the full north-star
validation suite (engine constraints + payload decode battery +
caption check) — BASELINE.json's "validated images/sec" metric.

Usage:
    python3 bench.py                 # driver entry point
    python3 bench.py --cpus 8        # override parallelism (scaling runs)
    python3 bench.py --queries image_suite,unique_atomic
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# extras: secondary operators, timed separately (per-query numbers in
# `extra_queries` stay round-over-round comparable)
EXTRA_QUERIES = [
    "schema_ingest",
    "key_array_fanout",
    "ann_lsh",
    "drift_check",
    "ann_ivf",
    "repetition_stats",
    "image_drift",
    "phash_neardup",
]

# flagship suite: RE-BASELINED round 5 (documented in BASELINE.md) —
# combinator_checks / simhash_pairs / dedup_components promoted from
# extras so regressions in the heaviest round-3/4 operators move the
# headline `value`.  r04 headline (11 queries) ≈ r05 `value` minus the
# three promoted rows; per-query timings remain directly comparable.
BENCH_QUERIES = [
    "image_suite",
    "row_checks",
    "unique_atomic",
    "pk_compound",
    "fk_revocation",
    "fk_clean",
    "jk_index",
    "limit_scope",
    "missing_member",
    "partition_verdicts",
    "stats_profile",
    "combinator_checks",
    "simhash_pairs",
    "dedup_components",
]


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("validation-engine-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: bigger is NOT better here — a 48g heap makes the JVM
        # allocate into fresh lazily-faulted pages instead of GC-reusing
        # warm ones, degrading Arrow-heavy stages 5-10x at 32 threads
        # (measured in this sandbox).  8g keeps GC in hot pages.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # payload (image-decode) stages do ~100x more CPU per byte than
        # columnar SQL, so bytes-based input splits must be small or a
        # 343MB table collapses to ~5 tasks (measured): 16m keeps every
        # core fed without over-fragmenting pure-SQL scans
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_SPLIT", "16m"))
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES))
    ap.add_argument("--runs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [q for q in args.queries.split(",") if q in qs]

    # Warmup pass: run every query once so the measured pass reflects
    # steady-state throughput (C2-compiled codegen, reused Python
    # workers, cached parquet footers) — the regime a long-running
    # cluster job actually operates in — rather than single-JVM
    # first-minute warmup, which at sf0.1 dwarfs the actual work.
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        qs[name](spark, args.sf_dir).count()

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Median-of-N (default 3): this box's single-run walls for
    # IDENTICAL code vary up to ~3x per query (image_suite 3.2-9.5 s
    # band, BASELINE.md interleave tables), so a single-sample record
    # is hostage to host noise.  Runs ALTERNATE over the full query
    # list (pass 1: q1..qn, pass 2: q1..qn, ...) so a host-load burst
    # degrades one pass of every query instead of every run of one
    # query — the same decorrelation the interleave protocol uses.
    runs: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for _pass in range(args.runs):
        for name in names:
            t0 = time.time()
            n = qs[name](spark, args.sf_dir).count()
            runs[name].append(round(time.time() - t0, 3))
            rows[name] = n
    timings = {n: round(statistics.median(ts), 3) for n, ts in runs.items()}

    extra_names = [q for q in EXTRA_QUERIES if q in qs and q not in names]
    extra_runs: dict[str, list[float]] = {n: [] for n in extra_names}
    for name in extra_names:
        qs[name](spark, args.sf_dir).count()  # warmup
    for _pass in range(args.runs):
        for name in extra_names:
            t0 = time.time()
            rows[name] = qs[name](spark, args.sf_dir).count()
            extra_runs[name].append(round(time.time() - t0, 3))
    extras = {n: round(statistics.median(ts), 3) for n, ts in extra_runs.items()}

    total = round(sum(timings.values()), 3)
    n_images = spark.read.parquet(f"{args.sf_dir}/part.parquet").count()
    images_per_sec = (
        round(n_images / timings["image_suite"], 1) if "image_suite" in timings else None
    )
    # at sf0.1 the image table is only 20k rows, so images/sec is
    # overhead-bound; surface the 1.5M-image scaling-run throughput
    # (tools/scaling_bench.py, BENCH_SCALING.json) when available
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            scaling = json.load(f)
    # ≥1M-doc clustering-path evidence (tools/components_bench.py):
    # iterations-to-convergence + per-iteration wall at 1.5M nodes
    components = None
    comp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_COMPONENTS.json")
    if os.path.exists(comp_path):
        with open(comp_path) as f:
            components = json.load(f)
    # Round-6 fix (BENCH_r05 "parsed": null): the driver's tail
    # capture is FIXED-SIZE and truncates from the LEFT, so the final
    # line must stay compact or its opening brace is cut off and the
    # record unparseable.  The contract line carries the headline +
    # per-query timings + compact scaling evidence; everything bulky
    # (raw run arrays, violation row counts, clustering detail) goes
    # to BENCH_DETAIL.json alongside.
    detail = {
        "runs_per_query": args.runs,
        "query_runs": runs,           # raw per-pass walls (medians in
        "extra_query_runs": extra_runs,  # the contract line)
        "extra_queries": extras,
        "scaling_run": scaling,
        "components_run": components,
        "violation_rows": rows,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # only a FULL flagship run may overwrite the committed detail
    # record — a --queries subset run would silently clobber it with
    # partial rows (this happened in round 6)
    if set(names) == set(BENCH_QUERIES):
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    scaling_brief = None
    if scaling:
        scaling_brief = {
            k: scaling.get(k)
            for k in (
                "n_images",
                "low_cpus",
                "low_images_per_sec",
                "high_cpus",
                "high_images_per_sec",
                "scaling_efficiency",
                "pass",
            )
        }
    line = json.dumps(
        {
            "metric": "validation suite wall time (flagship: validated images/sec over full engine+payload suite)",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "extra_queries": extras,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cpus": args.cpus,
            "n_images": n_images,
            "images_per_sec": images_per_sec,
            "scaling": scaling_brief,
            "detail": "BENCH_DETAIL.json",
        }
    )
    if len(line) > 1900:  # driver tail window is 2000 chars (measured
        # from BENCH_r04/r05: r04's 2000-char tail parsed, r05's
        # left-truncated at 2000 and did not)
        line = json.dumps(
            {
                "metric": "validation suite wall time (flagship: validated images/sec over full engine+payload suite)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": args.cpus,
                "images_per_sec": images_per_sec,
                "scaling": scaling_brief,
                "detail": "BENCH_DETAIL.json",
            }
        )
    sys.stdout.flush()
    print(line, flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
