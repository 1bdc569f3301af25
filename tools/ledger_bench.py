"""Scale evidence for the ROUND-6 increment ledgers: record a
1M-document increment's MinHash sketches, then probe a 100k-doc
second increment (10% crafted near-dups of increment 1) against the
ledger — wall, candidate counts, and throughput for both phases,
plus the drift ledger at the same cardinality.

Texts are synthetic 12-token streams derived from the id by column
algebra (same generator family as tools/components_bench.py); every
10th probe doc repeats an increment-1 doc's token stream with one
appended token, so the banded join has real cross-increment work.
NOTE the generator's mod-500000 token space also makes ids that
differ by exactly 500k EXACT duplicates — at 1M recorded docs each
probe id has two such partners in increment 1 (p-500k, p-1M), so the
measured 1M-run hit count (~2 per probe doc) is the ledger finding
every wrap-around duplicate, not noise (assertion only lower-bounds
with the crafted mirrors).

Run: python3 tools/ledger_bench.py [--docs 1000000] [--probe 100000]
Writes BENCH_LEDGER.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline.drift_ledger import (
    QuantileLedger,
    cross_increment_drift,
)
from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
    MinHashLedger,
    cross_increment_near_duplicates,
)

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


def _texts(spark: SparkSession, lo: int, hi: int, mirror_every=None):
    """12-token synthetic docs for ids [lo, hi); with mirror_every=m,
    every m-th doc repeats doc (id - lo)'s token stream from the BASE
    range plus one extra token (a crafted cross-increment near-dup)."""
    base = F.col("id")
    if mirror_every:
        base = F.when(
            F.col("id") % mirror_every == 0, F.col("id") - F.lit(lo)
        ).otherwise(F.col("id"))
    toks = [
        F.concat(F.lit(f"w{j}_"), ((base * (j + 3)) % 500000).cast("string"))
        for j in range(12)
    ]
    text = F.concat_ws(" ", *toks)
    if mirror_every:
        text = F.when(
            F.col("id") % mirror_every == 0,
            F.concat(text, F.lit(" extramark")),
        ).otherwise(text)
    return spark.range(lo, hi, 1, 64).select(
        F.col("id").cast("string").alias("doc_id"), text.alias("text")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--probe", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--phash-docs", type=int, default=500_000,
                    help="image count for the phash-ledger phase "
                         "(corpus cache shared with phash_bench)")
    ap.add_argument("--phash-tau", type=int, default=4,
                    help="ledger hamming budget: τ=6 (9-bit block "
                         "keys) is measured quadratic at this ledger "
                         "size (287 s for a 50k probe vs 500k "
                         "ledger); τ=4 (12-bit keys) is the "
                         "documented scale setting — twins at "
                         "hamming 0 are caught at ANY τ")
    ap.add_argument("--audio-docs", type=int, default=200_000,
                    help="clip count for the audio-ledger phase "
                         "(0 = skip)")
    ap.add_argument("--video-docs", type=int, default=50_000,
                    help="video count for the video-ledger phase "
                         "(0 = skip)")
    ap.add_argument("--embed-docs", type=int, default=1_000_000,
                    help="vector count for the embedding-ledger "
                         "phase (0 = skip)")
    ap.add_argument("--embed-dim", type=int, default=64)
    args = ap.parse_args()

    spark = build_session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ledger_bench")

    # phase 1: record increment 1's sketches
    nd = MinHashLedger(f"{root}/nd", num_hashes=8)
    inc1 = _texts(spark, 0, args.docs)
    t0 = time.time()
    v1 = cross_increment_near_duplicates(inc1, "doc_id", nd, bands=4)
    n_v1 = v1.count()
    rec_wall = time.time() - t0

    # phase 2: probe increment 2 (10% mirrors) against the ledger
    inc2 = _texts(
        spark, args.docs, args.docs + args.probe, mirror_every=10
    )
    t0 = time.time()
    v2 = cross_increment_near_duplicates(
        inc2, "doc_id", nd, bands=4, update=False, min_est_jaccard=0.5
    )
    n_hits = v2.count()
    probe_wall = time.time() - t0

    # drift ledger at the same cardinality (one long column)
    dl = QuantileLedger(f"{root}/drift")
    nums1 = spark.range(0, args.docs, 1, 64).select(
        (F.col("id") % 997).cast("double").alias("x")
    )
    t0 = time.time()
    cross_increment_drift(nums1, dl, "t", "x")
    snap_wall = time.time() - t0
    nums2 = spark.range(0, args.docs, 1, 64).select(
        ((F.col("id") % 997) + 500).cast("double").alias("x")
    )
    t0 = time.time()
    drifted = (
        cross_increment_drift(nums2, dl, "t", "x", update=False)
        .first()
    )
    drift_wall = time.time() - t0

    # HLL cardinality ledger at the same cardinality: record a 1M-row
    # increment's per-group sketches (16 groups, 600k distinct values
    # — deep in HLL estimation mode, past the exact coupon regime),
    # then screen a full re-send increment (novelty ~0 → collapsed)
    from python_extended_json_schema_validator_spark.pipeline.cardinality_ledger import (
        HllLedger,
        cross_increment_cardinality,
    )

    hl = HllLedger(f"{root}/hll")
    n_distinct = max(args.docs * 3 // 5, 1)
    vals1 = spark.range(0, args.docs, 1, 64).select(
        (F.col("id") % 16).cast("string").alias("g"),
        (F.col("id") % n_distinct).cast("string").alias("v"),
    )
    t0 = time.time()
    h1 = cross_increment_cardinality(vals1, hl, "t", "v", ["g"])
    h1.count()
    hll_rec_wall = time.time() - t0
    # estimate accuracy vs the exact per-group distinct sum computed
    # from the SAME frame (a value recurring across groups counts once
    # per group on both sides — honest for any --docs, unlike
    # comparing against the global n_distinct)
    est_total = h1.agg(F.sum("est_distinct_inc")).first()[0]
    exact_total = (
        vals1.groupBy("g")
        .agg(F.countDistinct("v").alias("x"))
        .agg(F.sum("x"))
        .first()[0]
    )
    n_groups = vals1.select("g").distinct().count()
    t0 = time.time()
    h2 = cross_increment_cardinality(
        vals1, hl, "t", "v", ["g"], update=False
    )
    n_collapsed = h2.where("collapsed").count()
    hll_screen_wall = time.time() - t0

    # exact-vs-screen A/B on the SAME re-send increment: the exact
    # KeyLedger path (row-level verdicts — distinct over all recorded
    # keys + a semi-join against the increment, state O(total
    # distinct)) vs the HLL screen (group-level verdict, state
    # O(groups) sketch bytes).  At this cardinality the wall gap is
    # modest; the structural gap is the state each carries to 10^12.
    from python_extended_json_schema_validator_spark.manifest import (
        KeyLedger,
    )

    kl = KeyLedger(f"{root}/keys")
    t0 = time.time()
    kl.record(vals1.select(F.col("v").alias("__key")), "t", "v")
    key_rec_wall = time.time() - t0
    t0 = time.time()
    kdim = kl.dim(spark, "t", "v")
    n_exact_dups = (
        vals1.join(kdim, vals1["v"] == kdim["__key"], "left_semi").count()
    )
    key_probe_wall = time.time() - t0

    # phash ledger (the 5th family, image modality): record N images'
    # 64-bit DCT signatures + block keys, then probe a 10% re-send
    # (every probe image is a pixel-identical twin of an increment-1
    # row → ≥1 exact hit each, hamming verified against the stored
    # longs — prior pixels never re-read)
    from python_extended_json_schema_validator_spark.payload import synth
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        PhashLedger,
        cross_increment_phash_duplicates,
    )

    img_path = f"/tmp/phash_bench_imgs_{args.phash_docs}"
    if not os.path.exists(f"{img_path}/_SUCCESS"):
        keys = spark.range(1, args.phash_docs + 1, 1, args.cpus * 4).select(
            F.col("id").alias("k")
        )
        synth.neardup_images_from_keys(keys).write.mode(
            "overwrite"
        ).parquet(img_path)
    imgs = spark.read.parquet(img_path)
    pl = PhashLedger(f"{root}/phash", max_hamming=args.phash_tau)
    t0 = time.time()
    pv1 = cross_increment_phash_duplicates(imgs, "image_id", pl)
    n_pv1 = pv1.count()
    ph_rec_wall = time.time() - t0
    probe_imgs = imgs.where(
        F.substring("image_id", 4, 8).cast("long") % 10 == 7
    ).select(
        F.concat(F.lit("re"), F.col("image_id")).alias("image_id"),
        "bytes",
    )
    n_probe_imgs = probe_imgs.count()
    t0 = time.time()
    pv2 = cross_increment_phash_duplicates(
        probe_imgs, "image_id", pl, update=False
    ).persist()  # probe-only results are caller-cached (r08 contract)
    ph_hits = pv2.count()
    ph_exact = pv2.where("hamming = 0").count()
    # the stated guarantee is PER PROBE: every probe image has a
    # pixel-identical twin in increment 1, so every probe must have
    # ≥1 exact (hamming 0) hit — gate on distinct probes, not the
    # aggregate (exact hits have multiplicity via hamming-0 flanks)
    ph_probes_with_exact = (
        pv2.where("hamming = 0").select("doc_new").distinct().count()
    )
    ph_probe_wall = time.time() - t0

    # audio + video ledgers (round 7, 6th/7th families): same
    # record-then-probe-a-10%-re-send shape as phash — every probe
    # clip/video is byte-identical to an increment-1 row, so every
    # probe must hit its twin (audio: hamming 0; video: vote = the
    # source's full frame count)
    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        AudioLedger,
        VideoLedger,
        cross_increment_audio_duplicates,
        cross_increment_video_duplicates,
    )
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_audio_from_keys,
        neardup_videos_from_keys,
    )

    audio_res = None
    if args.audio_docs:
        keys = spark.range(1, args.audio_docs + 1, 1, args.cpus * 4).select(
            F.col("id").alias("k")
        )
        clips = neardup_audio_from_keys(keys)
        al = AudioLedger(f"{root}/audio")
        t0 = time.time()
        av1 = cross_increment_audio_duplicates(
            clips, "audio_id", al, audio_col="bytes"
        )
        n_av1 = av1.count()
        a_rec_wall = time.time() - t0
        probe_clips = clips.where(
            F.substring("audio_id", 4, 8).cast("long") % 10 == 7
        ).select(
            F.concat(F.lit("re"), F.col("audio_id")).alias("audio_id"),
            "bytes",
        )
        n_probe_clips = probe_clips.count()
        t0 = time.time()
        av2 = cross_increment_audio_duplicates(
            probe_clips, "audio_id", al, audio_col="bytes", update=False
        ).persist()  # probe-only results are caller-cached (r08 contract)
        a_hits = av2.count()
        a_probes_with_exact = (
            av2.where("hamming = 0").select("doc_new").distinct().count()
        )
        a_probe_wall = time.time() - t0
        assert n_av1 == 0, "audio increment 1 must not self-collide"
        assert a_probes_with_exact == n_probe_clips, (
            a_probes_with_exact, n_probe_clips)
        audio_res = {
            "inc1_clips": args.audio_docs,
            "record_wall_sec": round(a_rec_wall, 2),
            "record_clips_per_sec": round(args.audio_docs / a_rec_wall, 1),
            "probe_clips": n_probe_clips,
            "probe_hits": a_hits,
            "probes_with_exact_twin": a_probes_with_exact,
            "probe_wall_sec": round(a_probe_wall, 2),
            "probe_clips_per_sec": round(n_probe_clips / a_probe_wall, 1),
        }

    video_res = None
    if args.video_docs:
        keys = spark.range(1, args.video_docs + 1, 1, args.cpus * 4).select(
            F.col("id").alias("k")
        )
        vids = neardup_videos_from_keys(keys)
        vl = VideoLedger(f"{root}/video")
        t0 = time.time()
        vv1 = cross_increment_video_duplicates(
            vids, "video_id", vl, video_col="bytes"
        )
        n_vv1 = vv1.count()
        v_rec_wall = time.time() - t0
        probe_vids = vids.where(
            F.substring("video_id", 4, 8).cast("long") % 10 == 7
        ).select(
            F.concat(F.lit("re"), F.col("video_id")).alias("video_id"),
            "bytes",
        )
        n_probe_vids = probe_vids.count()
        t0 = time.time()
        vv2 = cross_increment_video_duplicates(
            probe_vids, "video_id", vl, video_col="bytes", update=False
        ).persist()  # probe-only results are caller-cached (r08 contract)
        v_hits = vv2.count()
        # vote floor: every probe's twin pair carries the source's
        # FULL frame count (3..5) — gate per probe
        v_probes_with_twin = (
            vv2.where("shared_frames >= 3")
            .select("video_new").distinct().count()
        )
        v_probe_wall = time.time() - t0
        assert n_vv1 == 0, "video increment 1 must not self-collide"
        assert v_probes_with_twin == n_probe_vids, (
            v_probes_with_twin, n_probe_vids)
        video_res = {
            "inc1_videos": args.video_docs,
            "record_wall_sec": round(v_rec_wall, 2),
            "record_videos_per_sec": round(args.video_docs / v_rec_wall, 1),
            "probe_videos": n_probe_vids,
            "probe_hits": v_hits,
            "probes_with_full_frame_vote": v_probes_with_twin,
            "probe_wall_sec": round(v_probe_wall, 2),
            "probe_videos_per_sec": round(n_probe_vids / v_probe_wall, 1),
        }

    # embedding ledger (round 7, the 5th modality family): record N
    # synthetic 64-dim vectors + their seeded-plane buckets, probe a
    # 10% re-send — identical vectors agree on every bucket table, so
    # every probe must hit its twin at cos 1.0.  bits=16 here: the
    # bucket count must scale with the ledger size (the embedding
    # analogue of the simhash positions knob — 8-bit tables at 1M
    # rows would put ~4k rows in every bucket and the probe join
    # would blow up to ~10^9 candidates; 16-bit tables keep it ~10^6)
    embed_res = None
    if args.embed_docs:
        from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
            EmbeddingLedger,
            cross_increment_embedding_duplicates,
        )

        dim = args.embed_dim

        # hash-derived pseudo-random coordinates: independent-ish
        # uniform dims concentrate pairwise cosine near 0, so the
        # probe's hits are exactly the re-sent twins (a sin-curve
        # generator was measured pathologically dense — ~160 genuine
        # cos≥0.95 neighbors per probe — which benchmarks the corpus,
        # not the ledger)
        def vec_expr(idc):
            return F.array(
                *[
                    F.pmod(F.hash(idc, F.lit(j)), F.lit(2000)).cast(
                        "double"
                    ) / 1000.0 - 1.0
                    for j in range(dim)
                ]
            )

        base = spark.range(1, args.embed_docs + 1, 1, args.cpus * 4)
        vecs = base.select(
            F.concat(F.lit("v"), F.col("id").cast("string")).alias(
                "vec_id"
            ),
            vec_expr(F.col("id")).alias("embedding"),
        )
        el = EmbeddingLedger(f"{root}/embed", dim=dim, bits=16, tables=4)
        t0 = time.time()
        ev1 = cross_increment_embedding_duplicates(vecs, "vec_id", el)
        n_ev1 = ev1.count()
        e_rec_wall = time.time() - t0
        probe_vecs = base.where(F.col("id") % 10 == 7).select(
            F.concat(F.lit("rev"), F.col("id").cast("string")).alias(
                "vec_id"
            ),
            vec_expr(F.col("id")).alias("embedding"),
        )
        n_probe_vecs = probe_vecs.count()
        t0 = time.time()
        ev2 = cross_increment_embedding_duplicates(
            probe_vecs, "vec_id", el, update=False
        ).persist()  # probe-only results are caller-cached (r08 contract)
        e_hits = ev2.count()
        e_twins = (
            ev2.where("cos >= 0.999999")
            .select("doc_new").distinct().count()
        )
        e_probe_wall = time.time() - t0
        assert n_ev1 == 0, "embedding increment 1 must not self-collide"
        assert e_twins == n_probe_vecs, (e_twins, n_probe_vecs)
        embed_res = {
            "inc1_vectors": args.embed_docs,
            "dim": dim,
            "bits": 16,
            "tables": 4,
            "record_wall_sec": round(e_rec_wall, 2),
            "record_vecs_per_sec": round(args.embed_docs / e_rec_wall, 1),
            "probe_vectors": n_probe_vecs,
            "probe_hits": e_hits,
            "probes_with_exact_twin": e_twins,
            "probe_wall_sec": round(e_probe_wall, 2),
            "probe_vecs_per_sec": round(n_probe_vecs / e_probe_wall, 1),
        }

    result = {
        "metric": "increment-ledger scale evidence (minhash sketch + drift + hll cardinality + phash)",
        "cpus": args.cpus,
        "neardup": {
            "inc1_docs": args.docs,
            "inc1_self_verdicts": n_v1,  # must be 0
            "record_wall_sec": round(rec_wall, 2),
            "record_docs_per_sec": round(args.docs / rec_wall, 1),
            "probe_docs": args.probe,
            "probe_hits_est_ge_0.5": n_hits,
            "expected_min_hits": args.probe // 10,
            "probe_wall_sec": round(probe_wall, 2),
            "probe_docs_per_sec": round(args.probe / probe_wall, 1),
        },
        "drift": {
            "rows": args.docs,
            "snapshot_wall_sec": round(snap_wall, 2),
            "compare_wall_sec": round(drift_wall, 2),
            "drifted": bool(drifted.drifted),
            "shift": round(drifted.shift, 4),
        },
        "hll": {
            "rows": args.docs,
            "groups": n_groups,
            "exact_group_distinct_sum": int(exact_total),
            "est_group_distinct_sum": int(est_total),
            "est_rel_err": round(abs(est_total - exact_total) / exact_total, 4),
            "record_wall_sec": round(hll_rec_wall, 2),
            "record_rows_per_sec": round(args.docs / hll_rec_wall, 1),
            "resend_screen_wall_sec": round(hll_screen_wall, 2),
            "resend_groups_collapsed": n_collapsed,
        },
        "phash": {
            "inc1_images": args.phash_docs,
            "tau": args.phash_tau,
            "inc1_self_verdicts": n_pv1,  # must be 0
            "record_wall_sec": round(ph_rec_wall, 2),
            "record_imgs_per_sec": round(args.phash_docs / ph_rec_wall, 1),
            "probe_images": n_probe_imgs,
            "probe_hits": ph_hits,
            "probe_exact_hits": ph_exact,
            "probes_with_exact_twin": ph_probes_with_exact,
            "probe_wall_sec": round(ph_probe_wall, 2),
            "probe_imgs_per_sec": round(n_probe_imgs / ph_probe_wall, 1),
        },
        "audio": audio_res,
        "video": video_res,
        "embedding": embed_res,
        "exact_vs_screen": {
            "key_record_wall_sec": round(key_rec_wall, 2),
            "key_probe_wall_sec": round(key_probe_wall, 2),
            "exact_dup_rows": n_exact_dups,
            "hll_screen_wall_sec": round(hll_screen_wall, 2),
            "probe_speedup": round(key_probe_wall / hll_screen_wall, 2),
            "exact_state": "O(total distinct keys) parquet rows",
            "screen_state": "O(groups) sketch KB",
        },
    }
    assert n_v1 == 0, "first increment must not self-collide"
    assert n_hits >= args.probe // 10, (n_hits, args.probe // 10)
    assert drifted.drifted
    assert abs(est_total - exact_total) / exact_total <= 0.05
    assert n_collapsed == n_groups, (n_collapsed, n_groups)
    assert n_pv1 == 0, "phash increment 1 must not self-collide"
    assert ph_probes_with_exact == n_probe_imgs, (
        ph_probes_with_exact, n_probe_imgs)
    print(json.dumps(result))
    with open(f"{REPO}/BENCH_LEDGER.json", "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
