"""Round-8 profiling harness (bench.py is frozen — this is the §1
noop-sink / plan-capture companion).

Per query it records:
- build_s:   wall for constructing the DataFrame (driver-side Python,
             includes any eager work: collects, checkpoints, k-means)
- count_s:   wall for .count() on the built frame (median of N)
- jobs:      Spark jobs fired per full pass (build + count), via job
             group tracking — the fixed-overhead proxy at sf0.1
- plan:      .explain('formatted'), written to plans/r08/<q>_<tag>.txt

Usage: python3 tools/profile_r08.py [--tag before] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ALL_QUERIES = [
    "image_suite", "row_checks", "unique_atomic", "pk_compound",
    "fk_revocation", "fk_clean", "jk_index", "limit_scope",
    "missing_member", "partition_verdicts", "stats_profile",
    "combinator_checks", "simhash_pairs", "dedup_components",
    "schema_ingest", "key_array_fanout", "ann_lsh", "drift_check",
    "ann_ivf", "repetition_stats", "image_drift", "phash_neardup",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=",".join(ALL_QUERIES))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod

    spark = bench.build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [q for q in args.queries.split(",") if q in qs]

    plans_dir = os.path.join(HERE, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same discipline as bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    for n in names:
        qs[n](spark, args.sf_dir).count()

    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        builds, counts, jobs_per_pass = [], [], []
        for p in range(args.runs):
            group = f"r08-{name}-{p}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t1 = time.time()
            df.count()
            t2 = time.time()
            spark.sparkContext.setJobGroup(None, None)
            builds.append(round(t1 - t0, 3))
            counts.append(round(t2 - t1, 3))
            jobs_per_pass.append(len(tracker.getJobIdsForGroup(group)))
        if not args.no_plans:
            df = qs[name](spark, args.sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(plan)
        out[name] = {
            "build_s": builds,
            "count_s": counts,
            "build_med": round(statistics.median(builds), 3),
            "count_med": round(statistics.median(counts), 3),
            "total_med": round(statistics.median(
                [b + c for b, c in zip(builds, counts)]), 3),
            "jobs": jobs_per_pass,
        }
        print(f"{name:22s} build={out[name]['build_med']:6.3f} "
              f"count={out[name]['count_med']:6.3f} "
              f"jobs={jobs_per_pass}", flush=True)
    with open(os.path.join(HERE, f"PROFILE_r08_{args.tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    total = sum(v["total_med"] for v in out.values())
    print(f"TOTAL (build+count medians): {total:.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
