"""Scale evidence for the CLUSTERING path (round-5 item 4): run
connected_components and simhash pair generation at ≥1M docs,
recording iterations-to-convergence, per-iteration wall, and
throughput — the strict-convergence raise must never fire.

Graph shape mirrors a real near-dup candidate graph: mostly tiny
clusters (pairs/stars from banded LSH joins) plus a controlled band
of longer chains (the worst case for label propagation — components
collapse one hop per iteration along a chain).

SimHash runs over synthetic 12-token texts derived from the id by
column algebra (no corpus needed); duplicate pairs are injected every
97th doc (same token stream as its neighbor) so the pair stage has
real work to verify.

Run: python3 tools/components_bench.py [--nodes 1500000] [--docs 1500000]
Writes BENCH_COMPONENTS.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import dedup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def components_at_scale(spark: SparkSession, n_nodes: int) -> dict:
    """Label propagation over n_nodes with ~34% of nodes in small
    stars (size ≤ 4) and 1% in chains of length 8 (diameter driver)."""
    ids = spark.range(0, n_nodes, 1, 64).select(F.col("id"))
    # stars: nodes with id%10 in (1,2,3) attach to their decade head
    stars = (
        spark.range(0, n_nodes, 1, 64)
        .where((F.col("id") % 10).isin(1, 2, 3))
        .select(
            F.col("id").alias("src"),
            (F.col("id") - (F.col("id") % 10)).alias("dst"),
        )
    )
    # chains: in each block of 800, ids 0..7 form a path 0-1-2-...-7
    chains = (
        spark.range(0, n_nodes, 1, 64)
        .where(((F.col("id") % 800) < 7))
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    edges = stars.unionByName(chains)
    stats: dict = {}
    t0 = time.time()
    comp = dedup.connected_components(
        edges, ids, max_iter=25, strict=True, stats=stats
    )
    # one full materialization: count of non-singleton components
    n_clustered = (
        comp.groupBy("component").count().where(F.col("count") > 1).count()
    )
    wall = time.time() - t0
    return {
        "n_nodes": n_nodes,
        "n_edges": edges.count(),
        "n_multi_components": n_clustered,
        "wall_sec": round(wall, 2),
        "iterations": stats["iterations"],
        "iter_secs": stats["iter_secs"],
        "converged": stats["converged"],
        "nodes_per_sec": round(n_nodes / wall, 1),
    }


def simhash_at_scale(spark: SparkSession, n_docs: int,
                     positions: int = 64) -> dict:
    """simhash signatures + pigeonhole pair generation over n_docs
    synthetic 12-token texts; every 97th doc repeats its neighbor's
    token stream (true near-dup pairs to find).

    positions=64 is the SCALE setting: with max_hamming=2 the
    pigeonhole blocks are ~21 bits → ~2M buckets, keeping candidate
    counts linear at millions of docs.  A 32-bit signature at 1.5M
    docs has only ~2k buckets per block → ~500M candidate pairs —
    quadratic blowup, exactly what simhash_near_duplicates' docstring
    warns the `positions` knob exists for."""
    base = F.when(
        F.col("id") % 97 == 0, F.col("id") + 1
    ).otherwise(F.col("id"))
    toks = [
        F.concat(F.lit(f"w{j}_"),
                 ((base * (j + 3)) % 500000).cast("string"))
        for j in range(12)
    ]
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
    )
    t0 = time.time()
    pairs = dedup.simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=2, positions=positions
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    return {
        "n_docs": n_docs,
        "positions": positions,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def star_ab_at_scale(spark: SparkSession, n_nodes: int) -> dict:
    """Round-6 A/B (verdict #7): plain label propagation vs the
    large-star/small-star variant.

    Phase 1 — EQUAL OUTPUT on the realistic near-dup graph shape
    (same generator as components_at_scale): both algorithms, same
    labels (checked via count + component-sum fingerprint), walls
    side by side.  Phase 2 — the worst case plain propagation cannot
    touch: ONE chain across n_nodes (diameter = n_nodes).  Plain
    raises its strict guard at max_iter=25 (documented, recorded);
    star converges in O(log² n) rounds and must label every node 0."""
    # phase 1: shallow near-dup shape at the round-5 record's 1.5M
    # cardinality (keeps the numbers comparable); phase 2 = n_nodes
    shallow_n = min(n_nodes, 1_500_000)
    ids = spark.range(0, shallow_n, 1, 64).select(F.col("id"))
    stars = (
        spark.range(0, shallow_n, 1, 64)
        .where((F.col("id") % 10).isin(1, 2, 3))
        .select(
            F.col("id").alias("src"),
            (F.col("id") - (F.col("id") % 10)).alias("dst"),
        )
    )
    chains = (
        spark.range(0, shallow_n, 1, 64)
        .where(((F.col("id") % 800) < 7))
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    edges = stars.unionByName(chains)

    def _fingerprint(comp):
        row = comp.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("component")).alias("s"),
            F.sum(F.hash("id", "component").cast("long")).alias("h"),
        ).first()
        return (row.n, row.s, row.h)

    plain_stats: dict = {}
    t0 = time.time()
    fp_plain = _fingerprint(
        dedup.connected_components(
            edges, ids, max_iter=25, strict=True, stats=plain_stats
        )
    )
    plain_wall = time.time() - t0
    star_stats: dict = {}
    t0 = time.time()
    fp_star = _fingerprint(
        dedup.connected_components_star(edges, ids, stats=star_stats)
    )
    star_wall = time.time() - t0
    assert fp_plain == fp_star, (fp_plain, fp_star)
    hyb_stats: dict = {}
    t0 = time.time()
    fp_hyb = _fingerprint(
        dedup.connected_components_hybrid(edges, ids, stats=hyb_stats)
    )
    hyb_wall = time.time() - t0
    assert fp_plain == fp_hyb, (fp_plain, fp_hyb)

    # phase 2: one n_nodes-long chain — worst-case diameter
    deep_ids = spark.range(0, n_nodes, 1, 64).select(F.col("id"))
    deep_edges = (
        spark.range(0, n_nodes - 1, 1, 64)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    plain_raises = False
    try:
        dedup.connected_components(
            deep_edges, deep_ids, max_iter=25, strict=True
        ).limit(1).count()
    except RuntimeError:
        plain_raises = True
    deep_stats: dict = {}
    t0 = time.time()
    deep = dedup.connected_components_star(
        deep_edges, deep_ids, stats=deep_stats
    )
    n_bad = deep.where(F.col("component") != 0).count()
    deep_wall = time.time() - t0
    assert n_bad == 0, f"{n_bad} nodes not labeled 0 on the chain"
    # hybrid on the same worst case: its plain phase contracts the
    # chain plain_iters-fold, then star finishes the quotient — must
    # converge AND label every node 0
    deep_hyb_stats: dict = {}
    t0 = time.time()
    deep_hyb = dedup.connected_components_hybrid(
        deep_edges, deep_ids, stats=deep_hyb_stats
    )
    n_bad_hyb = deep_hyb.where(F.col("component") != 0).count()
    deep_hyb_wall = time.time() - t0
    assert n_bad_hyb == 0, f"hybrid: {n_bad_hyb} nodes not labeled 0"
    assert deep_hyb_stats["converged"]
    return {
        "shallow": {
            "n_nodes": shallow_n,
            "plain_wall_sec": round(plain_wall, 2),
            "plain_iterations": plain_stats["iterations"],
            "star_wall_sec": round(star_wall, 2),
            "star_iterations": star_stats["iterations"],
            "hybrid_wall_sec": round(hyb_wall, 2),
            "hybrid_star_iterations": hyb_stats["star_iterations"],
            "equal_output": True,
            "winner": "plain" if plain_wall <= star_wall else "star",
        },
        "deep_chain": {
            "n_nodes": n_nodes,
            "diameter": n_nodes - 1,
            "plain_raises_at_max_iter_25": plain_raises,
            "star_wall_sec": round(deep_wall, 2),
            "star_iterations": deep_stats["iterations"],
            "star_converged": deep_stats["converged"],
            "hybrid_wall_sec": round(deep_hyb_wall, 2),
            "hybrid_star_iterations": deep_hyb_stats["star_iterations"],
            "hybrid_converged": deep_hyb_stats["converged"],
            # honest contraction record: a pure chain keeps
            # ~n - plain_iters labels (one hop per plain round)
            "hybrid_quotient_nodes": deep_hyb_stats.get("quotient_nodes"),
            "all_labels_zero": True,
        },
    }


def survivors_at_scale(spark: SparkSession, n_docs: int) -> dict:
    """End-to-end dedup_survivors (minhash LSH → Jaccard verify →
    hybrid components → survivor flags) over n_docs synthetic
    12-token texts.  Dup structure at n_docs=1M: the mod-500000
    token generator makes doc i and doc i+500000 EXACT twins (50%
    dup rate — a heavy-dup corpus), and every 97th doc additionally
    repeats its neighbor's stream, merging {97k, 97k+1, 97k+500001}
    into one 3-doc family while stranding {97k+500000} as a
    singleton — so the expected keep-set at 1M is exactly 500,000
    (2 components per 97-family, 1 per plain twin pair; verified).
    Checks the invariants (one row per doc, survivors = distinct
    components) and records wall + docs/sec."""
    base = F.when(
        F.col("id") % 97 == 0, F.col("id") + 1
    ).otherwise(F.col("id"))
    toks = [
        F.concat(F.lit(f"w{j}_"),
                 ((base * (j + 3)) % 500000).cast("string"))
        for j in range(12)
    ]
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *toks).alias("text"),
    )
    st: dict = {}
    t0 = time.time()
    out = dedup.dedup_survivors(
        docs, "doc_id", threshold=0.7, stats=st
    ).persist()
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_survivor").cast("long")).alias("kept"),
        F.countDistinct("component").alias("ncomp"),
    ).first()
    wall = time.time() - t0
    out.unpersist()
    assert row.n == n_docs, (row.n, n_docs)
    assert row.kept == row.ncomp  # one survivor per component, always
    return {
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "kept": row.kept,
        "dropped": int(n_docs - row.kept),
        "plain_converged": st["plain_converged"],
        "star_iterations": st.get("star_iterations", 0),
        "converged": st["converged"],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_500_000)
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--star-nodes", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", choices=["components", "simhash", "both",
                                       "star_ab", "survivors"],
                    default="both")
    args = ap.parse_args()

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out_path = f"{REPO}/BENCH_COMPONENTS.json"
    result = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            result = json.load(f)
    result["metric"] = "clustering-path scale evidence (components + simhash)"
    result["cpus"] = args.cpus
    if args.only in ("components", "both"):
        result["components"] = components_at_scale(spark, args.nodes)
    if args.only in ("simhash", "both"):
        result["simhash"] = simhash_at_scale(spark, args.docs)
    if args.only == "star_ab":
        result["star_ab"] = star_ab_at_scale(spark, args.star_nodes)
    if args.only == "survivors":
        result["survivors"] = survivors_at_scale(spark, args.docs)
    print(json.dumps(result))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
