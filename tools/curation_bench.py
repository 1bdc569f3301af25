"""corpus_curation at 1M docs: the composed training-set build
(quality gate → exact dedup → MinHash-LSH near-dup survivors →
per-language quota) measured END TO END, not just per stage.

The oracle query (q_corpus_curation) proves the chain's semantics at
sf0.01/sf0.1; this records the composed throughput at the 1M-doc
scale where each STAGE already has individual evidence
(components_bench survivors_at_scale, ingest_bench, skew_bench) but
the composition did not.  Corpus mix at n=1M:

- every 11th doc is SHORT (5 tokens < the 10-token gate) → ~9%
  quality-dropped before any expensive stage (the gate is first
  precisely so dedup never reads junk);
- the mod-(n/2) token generator makes doc i and i+n/2 EXACT twins
  (~45% exact-dup rate after the gate) → the fingerprint window
  drops them before shingling;
- every 89th surviving doc repeats 9 of its neighbor's 12 tokens
  (Jaccard ≈ 0.6 > the 0.5 threshold) → a real near-dup population
  for the LSH + verify + components chain;
- lang = l0..l4, quota = top 50k per lang by n_chars.

Run: python3 tools/curation_bench.py [--docs 1000000] [--cpus 16]
Writes BENCH_CURATION.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import dedup, sampling
from python_extended_json_schema_validator_spark.pipeline.text import token_count


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def corpus(spark: SparkSession, n: int, id_offset: int = 0,
           half: int = None) -> DataFrame:
    """Texts derive from the BASE id (0..n), doc_id = base +
    id_offset — so corpus(m, offset) regenerates the same texts as
    corpus(n≥m)'s first m docs under fresh ids (exact re-sends for
    the incremental phase).  ``half`` pins the exact-twin token
    space; pass increment 1's value when generating re-sends."""
    if half is None:
        half = n // 2
    # neighbor-stream near-dups: doc 89k draws 9 of 12 tokens from
    # doc 89k+1's stream (token slots 0-8 shifted), Jaccard 9/15 = 0.6
    near = F.col("id") % 89 == 0
    toks = []
    for j in range(12):
        base = F.when(near & F.lit(j < 9), F.col("id") + 1).otherwise(
            F.col("id")
        )
        toks.append(
            F.concat(
                F.lit(f"w{j}_"), ((base * (j + 3)) % half).cast("string")
            )
        )
    short = F.col("id") % 11 == 0
    text = F.when(short, F.concat_ws(" ", *toks[:5])).otherwise(
        F.concat_ws(" ", *toks)
    )
    return spark.range(0, n, 1, 64).select(
        (F.col("id") + id_offset).alias("doc_id"),
        text.alias("text"),
        F.concat(F.lit("l"), (F.col("id") % 5).cast("string")).alias("lang"),
    )


def run(spark: SparkSession, n_docs: int, quota: int) -> dict:
    docs = corpus(spark, n_docs)
    walls: dict[str, float] = {}
    t_all = time.time()

    t0 = time.time()
    scored = docs.withColumn("n_toks", token_count(F.col("text")))
    q1 = scored.where(F.col("n_toks") >= 10).persist()
    n_q1 = q1.count()
    walls["quality_gate"] = round(time.time() - t0, 2)

    t0 = time.time()
    ex_dups = dedup.exact_duplicates(q1, "doc_id").select(
        F.col("dup_id").alias("doc_id")
    )
    q2 = q1.join(ex_dups, "doc_id", "left_anti").persist()
    n_q2 = q2.count()
    walls["exact_dedup"] = round(time.time() - t0, 2)

    t0 = time.time()
    st: dict = {}
    surv = dedup.dedup_survivors(
        q2, "doc_id", k=3, num_hashes=8, bands=4, threshold=0.5, stats=st
    ).persist()
    n_kept_nd = surv.where(F.col("is_survivor")).count()
    walls["neardup_survivors"] = round(time.time() - t0, 2)

    t0 = time.time()
    q3 = (
        q2.join(
            surv.where(F.col("is_survivor")).select("doc_id"),
            "doc_id", "left_semi",
        )
        .withColumn("n_chars", F.length("text"))
    )
    kept = sampling.top_n_per_group(
        q3.select("doc_id", "lang", "n_chars"), ["lang"], "n_chars",
        n=quota, tiebreak="doc_id",
    )
    n_kept = kept.count()
    walls["quota"] = round(time.time() - t0, 2)

    wall = round(time.time() - t_all, 2)
    q1.unpersist(); q2.unpersist(); surv.unpersist()

    # terminal statuses must PARTITION the corpus — the same
    # invariant the oracle hashes at sf0.01
    assert n_q1 <= n_docs and n_q2 <= n_q1 and n_kept_nd <= n_q2
    assert n_kept <= n_kept_nd
    return {
        "n_docs": n_docs,
        "wall_sec": wall,
        "docs_per_sec": round(n_docs / wall, 1),
        "stage_walls": walls,
        "counts": {
            "input": n_docs,
            "after_quality": n_q1,
            "after_exact": n_q2,
            "after_neardup": n_kept_nd,
            "kept": n_kept,
        },
        "components_converged": st.get("converged"),
    }


def run_incremental(
    spark: SparkSession, n: int, m: int, quota: int
) -> dict:
    """The INCREMENTAL chain (pipeline/curation.curate_increment) at
    scale: record increment 1 (n docs — fingerprints, sketches, kept
    counts), then curate a probe increment of m docs against that
    history WITHOUT re-reading it: the probe re-sends increment 1's
    first m texts under fresh ids, odd base ids mutated with an
    appended token (near-dups), even kept byte-equal (exact dups) —
    so ~every quality-passing probe doc must flag against history."""
    import tempfile

    from python_extended_json_schema_validator_spark.manifest import (
        KeyLedger,
    )
    from python_extended_json_schema_validator_spark.pipeline.curation import (
        QuotaLedger,
        curate_increment,
    )
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        MinHashLedger,
    )

    root = tempfile.mkdtemp(prefix="cur_inc_bench")
    kl = KeyLedger(root=f"{root}/keys")
    nl = MinHashLedger(f"{root}/nd", num_hashes=8, bands=4)
    ql = QuotaLedger(f"{root}/quota")

    inc1 = corpus(spark, n)
    t0 = time.time()
    s1 = curate_increment(
        inc1, "doc_id", kl, nl, ql,
        min_tokens=10, threshold=0.5, quota=quota,
    )
    c1 = {r.status: r.n for r in
          s1.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    rec_wall = time.time() - t0

    probe = corpus(spark, m, id_offset=n, half=n // 2).withColumn(
        "text",
        F.when(
            (F.col("doc_id") - n) % 2 == 1,
            F.concat(F.col("text"), F.lit(" zz extra")),
        ).otherwise(F.col("text")),
    )
    t0 = time.time()
    s2 = curate_increment(
        probe, "doc_id", kl, nl, ql,
        min_tokens=10, threshold=0.5, quota=quota, update=False,
    )
    c2 = {r.status: r.n for r in
          s2.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()}
    probe_wall = time.time() - t0
    # every quality-passing probe doc has a byte-identical or
    # one-token-mutated twin in history — kept must be ~zero
    flagged = c2.get("exact_dup", 0) + c2.get("near_dup", 0)
    assert flagged >= (m - c2.get("quality", 0)) * 0.95, c2
    return {
        "inc1_docs": n,
        "record_wall_sec": round(rec_wall, 2),
        "record_docs_per_sec": round(n / rec_wall, 1),
        "inc1_statuses": c1,
        "probe_docs": m,
        "probe_wall_sec": round(probe_wall, 2),
        "probe_docs_per_sec": round(m / probe_wall, 1),
        "probe_statuses": c2,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--quota", type=int, default=50_000)
    args = ap.parse_args()
    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, args.docs, args.quota)
    out["cpus"] = args.cpus
    out["incremental"] = run_incremental(
        spark, args.docs, args.docs // 10, args.quota
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_CURATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
