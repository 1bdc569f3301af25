"""Throughput + scaling evidence for the dynamic-document ingestion
path (suite.validate_json_table): N synthetic JSON documents stored
one-per-row, dispatched by JVM get_json_object, shredded by the Arrow
mapInPandas pass, validated by the engine (checks + unique world +
FK against a second schema).

Run: python3 tools/ingest_bench.py [--n 2000000] [--low 2] [--high 8]
Prints one JSON line and writes BENCH_INGEST.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/spark_graft_ingest_v1/docs"

GEN = r"""
import os, sys
sys.path.insert(0, {repo!r})
from bench import build_session
spark = build_session(32)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
if not os.path.exists({data!r} + "/_SUCCESS"):
    n = {n}
    df = (
        spark.range(0, n, 1, 128)
        .select(
            F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("file"),
            F.to_json(F.struct(
                F.lit("bench://doc/1.0").alias("@schema"),
                F.col("id").alias("doc_id"),
                F.concat(F.lit("w"), (F.col("id") % 97).cast("string")).alias("word"),
                (F.col("id") % 1000).alias("score"),
                F.concat(F.lit("u"), (F.col("id") % 1000000).cast("string")).alias("owner"),
            )).alias("json"),
        )
    )
    df.write.mode("overwrite").parquet({data!r})
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from bench import build_session
spark = build_session({cpus})
spark.sparkContext.setLogLevel("ERROR")
from python_extended_json_schema_validator_spark.suite import validate_json_table

DOC_SCHEMA = {{
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "bench://doc/1.0",
    "type": "object",
    "required": ["doc_id", "owner"],
    "properties": {{
        "doc_id": {{"type": "integer", "primary_key": True}},
        "word": {{"type": "string", "pattern": "^w[0-9]+$"}},
        "score": {{"type": "integer", "minimum": 5}},
        "owner": {{"type": "string"}},
    }},
    "foreign_keys": [{{"schema_id": "bench://user/1.0", "members": ["owner"]}}],
}}
USER_SCHEMA = {{
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "bench://user/1.0",
    "type": "object",
    "properties": {{"uid": {{"type": "string", "primary_key": True}}}},
}}

docs = spark.read.parquet({data!r})
from pyspark.sql import functions as F
users = spark.range(0, 1000000, 1, 32).select(
    F.concat(F.lit("user-"), F.col("id").cast("string")).alias("file"),
    F.to_json(F.struct(
        F.lit("bench://user/1.0").alias("@schema"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid"),
    )).alias("json"),
)
inp = docs.unionByName(users)

def run():
    res, _ = validate_json_table(
        spark, [("doc.json", DOC_SCHEMA), ("user.json", USER_SCHEMA)], inp
    )
    return res.violations.count()

run()  # warmup
times = []
for _ in range(3):
    t0 = time.time()
    nv = run()
    times.append(time.time() - t0)
times.sort()
print(json.dumps({{"cpus": {cpus}, "sec": times[1], "all": times, "n_viol": nv}}))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    args = ap.parse_args()

    subprocess.run(
        [sys.executable, "-c", GEN.format(repo=REPO, n=args.n, data=DATA)],
        check=True, timeout=1800,
    )
    res = {}
    for cpus in (args.low, args.high):
        out = subprocess.run(
            [sys.executable, "-c",
             CHILD.format(repo=REPO, cpus=cpus, data=DATA)],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, out.stderr[-2000:]
        res[cpus] = json.loads(lines[-1])

    total = args.n + 1_000_000  # docs + users
    lo, hi = res[args.low], res[args.high]
    tput_lo, tput_hi = total / lo["sec"], total / hi["sec"]
    eff = (tput_hi / tput_lo) / (args.high / args.low)
    result = {
        "metric": "dynamic-JSON ingestion+validation docs/sec",
        "n_docs": total,
        "low_cpus": args.low, "low_sec": round(lo["sec"], 2),
        "low_docs_per_sec": round(tput_lo, 1),
        "high_cpus": args.high, "high_sec": round(hi["sec"], 2),
        "high_docs_per_sec": round(tput_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "violations": hi["n_viol"],
    }
    print(json.dumps(result))
    with open(f"{REPO}/BENCH_INGEST.json", "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
