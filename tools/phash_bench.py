"""Scale evidence for the perceptual-hash path (payload/phash.py):
signature (decode + DCT) throughput and the banded hamming join at
≥100k images, with the ``max_hamming`` knob demonstrated as the scale
control the same way simhash's ``positions`` is.

Block-width arithmetic (64-bit hash, pigeonhole banding into
``max_hamming + 1`` blocks):
  τ=6 → 7 blocks × ~9 bits → 512 buckets/block — fine at corpus
        scale (≤~100k), quadratic blowup beyond (bucket size n/512);
  τ=4 → 5 blocks × ~13 bits → 8192 buckets/block — candidate volume
        drops ~250×; still catches every injected pair (measured pair
        hamming ≤ 4, margin to the ≥10-bit background).

Corpus = synth.neardup_images_from_keys over 1..N (the F12 injection
rules): near-dup pairs at k%7==3, declared-phash flips at k%13==6, so
recall and the check verdicts are exactly predictable.

Run: python3 tools/phash_bench.py [--images 500000] [--cpus 16]
Writes BENCH_PHASH.json and prints one JSON line.
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def corpus(spark: SparkSession, n: int, cpus: int) -> "tuple[object, float]":
    """Generate-once parquet cache of the F12 corpus at size n."""
    from python_extended_json_schema_validator_spark.payload import synth

    path = f"/tmp/phash_bench_imgs_{n}"
    gen_s = 0.0
    if not os.path.exists(f"{path}/_SUCCESS"):
        t0 = time.time()
        keys = spark.range(1, n + 1, 1, cpus * 4).select(
            F.col("id").alias("k")
        )
        synth.neardup_images_from_keys(keys).write.mode("overwrite").parquet(
            path
        )
        gen_s = round(time.time() - t0, 1)
    return spark.read.parquet(path), gen_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--tau", type=int, default=4,
                    help="max_hamming for the scale join (blocks = τ+1)")
    ap.add_argument("--trap-images", type=int, default=100_000,
                    help="corpus size for the τ=6 default-knob run "
                         "(9-bit blocks; quadratic past ~100k)")
    args = ap.parse_args()

    from python_extended_json_schema_validator_spark.payload import phash

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "metric": "phash_path_scale",
        "images": args.images,
        "cpus": args.cpus,
    }

    img, gen_s = corpus(spark, args.images, args.cpus)
    out["gen_s"] = gen_s

    # 1. signature throughput: decode + batched DCT, map-only
    # (one warmup pass first — JVM/Arrow/page-cache warmth, same
    # protocol as scaling_bench)
    phash.phash_signatures(img).count()
    t0 = time.time()
    n_sigs = phash.phash_signatures(img).where(
        F.col("phash_dct").isNotNull()
    ).count()
    sig_s = time.time() - t0
    out["signatures"] = {
        "rows": n_sigs,
        "wall_s": round(sig_s, 1),
        "imgs_per_s": int(n_sigs / sig_s),
    }

    # 2. declared-vs-actual check battery (fused recompute + compare)
    t0 = time.time()
    n_viol = phash.phash_violations(img).count()
    chk_s = time.time() - t0
    expected_viol = sum(1 for k in range(1, args.images + 1) if k % 13 == 6)
    out["check"] = {
        "violations": n_viol,
        "expected": expected_viol,
        "exact": n_viol == expected_viol,
        "wall_s": round(chk_s, 1),
        "imgs_per_s": int(args.images / chk_s),
    }

    # 3a. exact hamming histogram over the injected pairs (adjacent-id
    #     self-join — no banding involved) — pins the tail the τ knob
    #     trades against
    sig = phash.phash_signatures(img).select(
        F.col("image_id").substr(4, 8).cast("long").alias("k"),
        "phash_dct",
    )
    hist_rows = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("b.k") == F.col("a.k") + 1)
            & ((F.col("a.k") + 1) % 7 == 3),
        )
        .select(
            F.bit_count(
                F.col("a.phash_dct").bitwiseXOR(F.col("b.phash_dct"))
            ).cast("int").alias("h")
        )
        .groupBy("h")
        .count()
        .orderBy("h")
        .collect()
    )
    out["pair_hamming_hist"] = {int(r.h): int(r["count"]) for r in hist_rows}

    # 3b. banded join at scale with the τ knob (τ+1 wider blocks)
    expected_pairs = sum(
        1 for k in range(3, args.images + 1) if k % 7 == 3
    )
    t0 = time.time()
    pairs = phash.phash_near_duplicates(
        phash.phash_signatures(img), max_hamming=args.tau
    )
    injected = pairs.where(
        (F.col("doc_b").substr(4, 8).cast("long")
         - F.col("doc_a").substr(4, 8).cast("long") == 1)
        & (F.col("doc_b").substr(4, 8).cast("long") % 7 == 3)
    ).count()
    n_pairs = pairs.count()
    join_s = time.time() - t0
    out["banded_join"] = {
        "tau": args.tau,
        "block_bits": 64 // (args.tau + 1),
        "pairs": n_pairs,
        "injected_expected": expected_pairs,
        "injected_found": injected,
        "recall": (
            round(injected / expected_pairs, 6) if expected_pairs else None
        ),
        "extras": n_pairs - injected,
        "wall_s": round(join_s, 1),
    }

    # 4. the default-knob (τ=6, 9-bit blocks) at a size where it is
    #    still healthy — the corpus-scale regime the oracle queries use
    if args.trap_images:
        timg, tgen = corpus(spark, args.trap_images, args.cpus)
        t0 = time.time()
        tpairs = phash.phash_near_duplicates(phash.phash_signatures(timg))
        tn = tpairs.count()
        t6_s = time.time() - t0
        out["tau6_corpus_scale"] = {
            "images": args.trap_images,
            "gen_s": tgen,
            "pairs": tn,
            "wall_s": round(t6_s, 1),
            "note": "9-bit blocks; candidate volume grows (n/512)^2 "
                    "per bucket — tighten tau past ~100k images",
        }

    with open(f"{REPO}/BENCH_PHASH.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
