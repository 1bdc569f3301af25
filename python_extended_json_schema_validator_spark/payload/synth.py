"""Deterministic synthetic image+caption tables (FIXTURES.md F11, the
north-star input shape: image_id string, bytes binary, w int, h int,
fmt string, caption string, phash long) with violations injected at
known keys, so an independent oracle can predict the exact violation
set without decoding anything.

Injection rules, keyed on integer k (the source key, e.g. p_partkey);
all arithmetic is SQL-expressible so the DuckDB oracle can replicate:

  corrupt bytes        k % 97 == 0     → payload:decode
  declared w = -w      k % 101 == 0    → check:w:minimum + payload:dims
  declared w = w+1     k % 89 == 0     → payload:dims       (unless %101 too)
  pixel noise ±16      k % 83 == 0     → payload:psnr (≈29 dB < 40)
  caption mutated      k % 79 == 0     → payload:caption
  declared fmt 'tiff'  k % 103 == 0    → fk stale (formats dim) + payload:fmt
  duplicate image_id   k % 73 == 0 (k≥73) → id of row k-1 → dup_pk
  duplicate phash      k % 71 == 0 (k≥71) → phash of row k-3 → dup_unique

Base attributes:
  w = 8 + k % 25, h = 8 + k % 17, fmt = [jpeg,png,webp][k % 3]
  image_id = 'img' + lpad(k', 8)  (zero-padded so string order ==
  numeric order — dedup-window tiebreaks match SQL oracles)
  phash = (k'' * 2654435761) % 1000000007   (injective for k < 10^9)
  caption = 'caption for image ' + image_id
  partition col part = 'p' + k % 16

Generation is distributed ``mapInPandas`` over the source keys —
scales to any row count, no driver-side data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("part", T.StringType(), True),
    ]
)

FMTS = ["jpeg", "png", "webp"]
PHASH_MULT = 2654435761
PHASH_MOD = 1000000007


def _img_id(k: int) -> str:
    kk = k - 1 if (k % 73 == 0 and k >= 73) else k
    return f"img{kk:08d}"


def _phash(k: int) -> int:
    src = k - 3 if (k % 71 == 0 and k >= 71) else k
    return (src * PHASH_MULT) % PHASH_MOD


def _gen_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = {c.name: [] for c in IMAGES_SCHEMA.fields}
    for k in pdf["k"]:
        k = int(k)
        w = 8 + k % 25
        h = 8 + k % 17
        base_fmt = FMTS[k % 3]
        noise = 16 if k % 83 == 0 else 0
        buf = bytearray(codec.encode(k, w, h, base_fmt, noise_amp=noise))
        if k % 97 == 0:  # corrupt: flip a payload byte → CRC mismatch
            buf[-1] ^= 0xFF
        if k % 101 == 0:
            declared_w = -w
        elif k % 89 == 0:
            declared_w = w + 1
        else:
            declared_w = w
        declared_fmt = "tiff" if k % 103 == 0 else base_fmt
        iid = _img_id(k)
        caption = f"caption for image {iid}"
        if k % 79 == 0:
            caption += " MUTATED"
        rows["image_id"].append(iid)
        rows["bytes"].append(bytes(buf))
        rows["w"].append(declared_w)
        rows["h"].append(h)
        rows["fmt"].append(declared_fmt)
        rows["caption"].append(caption)
        rows["phash"].append(_phash(k))
        rows["part"].append(f"p{k % 16}")
    return pd.DataFrame(rows)


def images_from_keys(keys_df: DataFrame) -> DataFrame:
    """keys_df: one column ``k`` (long). Round-robin repartition first
    so image cost (∝ w*h) never clusters — the salting step the north
    star asks for ahead of payload UDFs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf)

    return keys_df.mapInPandas(gen, schema=IMAGES_SCHEMA)


def images_from_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    keys = part.select(F.col("p_partkey").cast("long").alias("k"))
    return images_from_keys(keys)


def images_from_range(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Arbitrary-size bench table: keys 1..n."""
    return images_from_keys(
        spark.range(1, n + 1, 1, partitions).select(F.col("id").alias("k"))
    )


def formats_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(f,) for f in FMTS], "fmt string")


# ---------------------------------------------------------------------------
# Near-duplicate corpus (perceptual-hash battery)
# ---------------------------------------------------------------------------
#
# A second deterministic corpus for the pHash leg (payload/phash.py),
# separate from the main injection table so its rules stay independent
# and SQL-replicable:
#
#   near-dup pair      k % 7 == 3 (k≥3) → pixels regenerated from row
#                      k-1's seed AND dims, with deterministic ±2
#                      noise — (k-1, k) is a visual near-duplicate
#                      pair (declared dims stay the actual dims)
#   corrupt phash      k % 13 == 6 → declared phash = true recomputed
#                      phash XOR PHASH_FLIP_MASK (16 flipped bits) →
#                      payload:phash
#   otherwise          declared phash = true recomputed phash (the
#                      DCT hash of the row's own encoded bytes)
#
# fmt = FMTS[k % 3] always — a near-dup row usually re-encodes its
# source under a DIFFERENT codec (lossy↔lossless), so the pair also
# exercises re-encode robustness.  Measured hamming margins over this
# generator at sf0.01 AND sf0.1: injected pairs ≤ 4 bits, every other
# pair ≥ 10 bits (phash.NEAR_MAX_HAMMING = 6 splits them).

NEARDUP_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

PHASH_FLIP_MASK = 0xFFFF << 16
NEARDUP_NOISE = 2


def _neardup_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    from . import phash as phash_mod

    rows = {c.name: [] for c in NEARDUP_SCHEMA.fields}
    grays = []
    for k in pdf["k"]:
        k = int(k)
        if k % 7 == 3 and k >= 3:
            src = k - 1
            w, h = 8 + src % 25, 8 + src % 17
            buf = codec.encode(src, w, h, FMTS[k % 3], noise_amp=NEARDUP_NOISE)
        else:
            w, h = 8 + k % 25, 8 + k % 17
            buf = codec.encode(k, w, h, FMTS[k % 3], noise_amp=0)
        ok, _fmt, _w, _h, px = codec.decode(buf)
        assert ok, "neardup generator produced an undecodable image"
        grays.append(phash_mod._gray32(px))
        rows["image_id"].append(f"img{k:08d}")
        rows["bytes"].append(bytes(buf))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append(FMTS[k % 3])
    sigs = phash_mod.phash_batch(grays)
    for k, sig in zip(pdf["k"], sigs):
        k = int(k)
        declared = int(sig)
        if k % 13 == 6:
            declared ^= PHASH_FLIP_MASK
        rows["phash"].append(declared)
    return pd.DataFrame(rows)


def neardup_images_from_keys(keys_df: DataFrame) -> DataFrame:
    """keys_df: one column ``k`` (long) — the contiguous source keys
    (near-dup rows reference key k-1, so gaps would orphan pairs)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _neardup_batch(pdf)

    return keys_df.mapInPandas(gen, schema=NEARDUP_SCHEMA)


def materialize_neardup_images(
    spark: SparkSession,
    sf_dir: str,
    cache_root: str = "/tmp/spark_graft_neardup_v2",
) -> DataFrame:
    """Generate-once cache of the near-dup corpus for this sf (keys =
    p_partkey, contiguous 1..N) — the three phash queries share it."""
    import os

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"{cache_root}/{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        part = spark.read.parquet(f"{sf_dir}/part.parquet")
        keys = part.select(F.col("p_partkey").cast("long").alias("k"))
        neardup_images_from_keys(keys).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def materialize_images(
    spark: SparkSession, sf_dir: str, cache_root: str = "/tmp/spark_graft_images_v2"
) -> DataFrame:
    """Generate-once, validate-many: writes the synthetic image table
    for this sf to parquet (partitioned by ``part``) and returns a
    reader over it.  Validation benchmarks then measure scanning +
    validating a STORED table — the north-star setup — instead of
    paying deterministic re-encoding once per plan branch."""
    import os

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"{cache_root}/{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        images_from_part(spark, sf_dir).write.mode("overwrite").partitionBy(
            "part"
        ).parquet(path)
    return spark.read.parquet(path)


def attach_av_columns(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Deterministic ``audio`` / ``video`` payload columns for the
    A/V ledger drive (round 7): clip/video content is keyed by the
    integer embedded in the image id (``'img' + lpad(k, 8)``), reusing
    the F12 near-dup corpora (pipeline.multimodal.neardup_*_from_keys)
    so k % 7 == 3 rows carry content that near-duplicates row k-1's.
    In production these columns arrive WITH the table; this helper
    exists so the spark-submit ``--ledgers --av`` cycle and tests can
    exercise the audio/video ledger families on the north-star synth
    table.  Scale shape: two co-partitioned equi-joins on the derived
    key — payloads ride only their own join, nothing wider."""
    from ..pipeline import multimodal

    # guard the key derivation with a FORMAT check (ADVICE r07): only
    # 'img' + 8 digits parses to a join key — an arbitrary id whose
    # characters 4-11 happen to be numeric must get NULL payloads via
    # the LEFT join, not silently attach the wrong clip
    img_k = F.when(
        F.col(id_col).rlike("^img[0-9]{8}$"),
        F.substring(F.col(id_col), 4, 8).cast("long"),
    )
    keys = images.select(img_k.alias("k")).where(
        F.col("k").isNotNull()
    ).distinct()
    aud = multimodal.neardup_audio_from_keys(keys).select(
        F.substring("audio_id", 4, 8).cast("long").alias("k"),
        F.col("bytes").alias("audio"),
    )
    vid = multimodal.neardup_videos_from_keys(keys).select(
        F.substring("video_id", 4, 8).cast("long").alias("k"),
        F.col("bytes").alias("video"),
    )
    # LEFT joins (review finding): a row whose id does not parse as
    # 'img'+8digits must stay IN the validated table (with NULL
    # payloads the decode batteries flag or skip) — an inner join
    # would silently drop it from validation entirely
    out = images.withColumn("__k", img_k)
    out = out.join(aud, out["__k"] == aud["k"], "left").drop("k")
    return out.join(vid, out["__k"] == vid["k"], "left").drop("k", "__k")
