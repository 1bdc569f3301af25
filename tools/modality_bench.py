"""Scale evidence for the audio and video near-dup modalities:
fingerprint / frame-vote throughput and the banded pair joins at
100k+ documents, with exact recall gates against the injected pair
sets (the F12 arithmetic, so expected counts are closed-form).

Run: python3 tools/modality_bench.py [--audio 200000] [--video 100000]
Writes BENCH_MODALITY.json and prints one JSON line.
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


def _cached(spark, path, build):
    if not os.path.exists(f"{path}/_SUCCESS"):
        t0 = time.time()
        build().write.mode("overwrite").parquet(path)
        gen_s = round(time.time() - t0, 1)
    else:
        gen_s = 0.0
    return spark.read.parquet(path), gen_s


def expected_pairs(n: int) -> int:
    return sum(1 for k in range(3, n + 1) if k % 7 == 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", type=int, default=200_000)
    ap.add_argument("--video", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from python_extended_json_schema_validator_spark.pipeline import multimodal as mm

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "audio/video near-dup modality scale", "cpus": args.cpus}

    if args.audio:
        n = args.audio
        clips, gen_s = _cached(
            spark, f"/tmp/modality_bench_audio_{n}",
            lambda: mm.neardup_audio_from_keys(
                spark.range(1, n + 1, 1, args.cpus * 4).select(
                    F.col("id").alias("k")
                )
            ),
        )
        mm.audio_fingerprints(clips).count()  # warmup
        t0 = time.time()
        n_sig = mm.audio_fingerprints(clips).where(
            F.col("afp").isNotNull()
        ).count()
        sig_s = time.time() - t0
        t0 = time.time()
        pairs = mm.audio_near_duplicates(mm.audio_fingerprints(clips))
        ka = F.substring("doc_a", 4, 8).cast("long")
        kb = F.substring("doc_b", 4, 8).cast("long")
        injected = pairs.where(
            (kb - ka == 1) & (kb % 7 == 3) & (kb >= 3)
        ).count()
        n_pairs = pairs.count()
        join_s = time.time() - t0
        exp = expected_pairs(n)
        out["audio"] = {
            "clips": n,
            "gen_s": gen_s,
            "fingerprint_wall_s": round(sig_s, 1),
            "clips_per_s": int(n_sig / sig_s),
            "pairs": n_pairs,
            "injected_expected": exp,
            "injected_found": injected,
            "recall_1": injected == exp,
            # extras at ≥100k clips are genuine band-pattern
            # coincidences (same/1-bit occupied-band sets — clips
            # that DO sound alike in this feature space), ~parts
            # per billion of the pair space
            "extras": n_pairs - injected,
            "pair_join_wall_s": round(join_s, 1),
        }
        assert injected == exp, (injected, exp)

    if args.video:
        n = args.video
        vids, gen_s = _cached(
            spark, f"/tmp/modality_bench_video_{n}",
            lambda: mm.neardup_videos_from_keys(
                spark.range(1, n + 1, 1, args.cpus * 4).select(
                    F.col("id").alias("k")
                )
            ),
        )
        n_frames = vids.select(
            F.sum(F.lit(3) + F.pmod(
                F.when(
                    (F.substring("video_id", 4, 8).cast("long") % 7 == 3)
                    & (F.substring("video_id", 4, 8).cast("long") >= 3),
                    F.substring("video_id", 4, 8).cast("long") - 1,
                ).otherwise(F.substring("video_id", 4, 8).cast("long")),
                F.lit(3),
            ))
        ).first()[0]
        t0 = time.time()
        vpairs = mm.video_near_duplicates(vids)
        n_vpairs = vpairs.count()
        vote_s = time.time() - t0
        exp = expected_pairs(n)
        out["video"] = {
            "videos": n,
            "frames": int(n_frames),
            "gen_s": gen_s,
            "pairs": n_vpairs,
            "expected_pairs": exp,
            "exact_recall": n_vpairs == exp,
            "pipeline_wall_s": round(vote_s, 1),
            "videos_per_s": int(n / vote_s),
        }
        assert n_vpairs == exp, (n_vpairs, exp)

    with open(f"{REPO}/BENCH_MODALITY.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
