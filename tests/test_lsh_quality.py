"""Recall / bucket-quality guarantees for the similarity family:

- SimHash pigeonhole banding: recall 1.0 for hamming ≤ max_hamming —
  including pairs whose differing bits ALL fall inside one block (the
  failure mode of naive fixed-prefix blocking).
- Random-hyperplane LSH: near-duplicate queries recover their source
  vector (recall@1), and Gaussian-plane buckets are not pathologically
  hot.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import dedup, similarity


# ---------------------------------------------------------------------------
# SimHash banding
# ---------------------------------------------------------------------------


def test_simhash_banding_catches_same_block_diffs(spark):
    """Signatures differing ONLY in the first two positions: a naive
    first-half block join can never pair them; pigeonhole banding
    must (they agree exactly on blocks 2 and 3)."""
    sigs = [
        ("a", "1100000000000000"),
        ("b", "0000000000000000"),  # diff bits 1,2 → hamming 2
        ("c", "1111111111111111"),  # far from both
    ]
    sh = spark.createDataFrame(sigs, "doc string, simhash string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs_from_signatures(sh, max_hamming=2).collect()
    }
    assert got == {("a", "b", 2)}


def test_simhash_banding_recall_is_total(spark):
    """Exhaustive: all 4-bit signatures, max_hamming=2 — banded pairs
    must equal brute-force all-pairs with hamming ≤ 2."""
    sigs = [(f"d{i:02d}", format(i, "04b")) for i in range(16)]
    sh = spark.createDataFrame(sigs, "doc string, simhash string")
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs_from_signatures(
            sh, max_hamming=2, positions=4
        ).collect()
    }
    want = {
        (a_id, b_id)
        for i, (a_id, a_s) in enumerate(sigs)
        for (b_id, b_s) in sigs[i + 1:]
        if sum(x != y for x, y in zip(a_s, b_s)) <= 2
    }
    assert got == want


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_lsh_neardup_recall_at_1(spark, embeddings):
    """Perturbed copies (cos ≈ 0.995 to their source) must find the
    source as top-1 through the multi-table LSH with DEFAULT knobs —
    the near-duplicate workload LSH exists for."""
    rng = random.Random(7)
    base = embeddings.limit(30).collect()
    noisy = []
    for r in base:
        v = [float(x) for x in r.embedding]
        nrm = math.sqrt(sum(x * x for x in v))
        noisy.append(
            (r.vec_id + 100000, [x + rng.gauss(0, 0.05 * nrm / math.sqrt(len(v))) for x in v])
        )
    queries = spark.createDataFrame(noisy, "vec_id long, embedding array<double>")
    corpus = embeddings.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    got = similarity.lsh_topk(corpus, queries, k=1)
    hits = (
        got.where(F.col("rank") == 1)
        .where(F.col("neighbor_id") == F.col("query_id") - 100000)
        .count()
    )
    assert hits / len(noisy) >= 0.9, f"recall@1 = {hits}/{len(noisy)}"


def test_lsh_bucket_sizes_bounded(spark, embeddings):
    """Gaussian hyperplanes must not produce a hot bucket holding most
    of the corpus (the failure mode of raw leading-dim sign buckets on
    correlated embeddings): no (table, bucket) may hold > 40% of rows
    with 8 planes."""
    dim = len(embeddings.select("embedding").first()[0])
    planes = similarity.random_hyperplanes(dim, bits=8, tables=4, seed=42)
    b = similarity._multi_table_buckets(
        embeddings, "doc", "embedding", "vec_id", planes
    )
    n = embeddings.count()
    hot = (
        b.groupBy("tbl", "bucket")
        .count()
        .agg(F.max("count").alias("mx"))
        .first()
        .mx
    )
    assert hot <= 0.4 * n, f"hot bucket {hot}/{n}"


def test_lsh_topk_subset_of_brute_force_quality(spark, embeddings):
    """Approximate top-k cosines can't exceed the exact ones, and with
    generous knobs (3 bits × 12 tables) recall@5 on even RANDOM
    vectors (weak neighbors — the hard case) stays usable (≥ 0.5)."""
    corpus = embeddings
    queries = embeddings.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(
            corpus, queries, k=5, bits=3, tables=12
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@5 = {recall}"


def test_simhash_64bit_signatures(spark):
    """Regression (review finding): positions=64 signatures with the
    MSB set must not overflow the integer conversion — hamming runs on
    32-bit chunks."""
    sigs = [
        ("a", "1" + "0" * 63),
        ("b", "0" * 64),                 # hamming 1 from a
        ("c", "1" + "0" * 62 + "1"),     # hamming 1 from a, 2 from b
    ]
    sh = spark.createDataFrame(sigs, "doc string, simhash string")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_pairs_from_signatures(
            sh, max_hamming=2, positions=64
        ).collect()
    }
    assert got == {("a", "b", 1), ("a", "c", 1), ("b", "c", 2)}


def test_cosine_zero_norm_vectors_dont_crash(spark):
    """Regression (review finding): an all-zeros embedding must not
    abort the job under ANSI DIVIDE_BY_ZERO — zero-norm vectors rank
    last (NULL cosine)."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.where(F.col("vec_id") == 1)
    got = {
        (r.neighbor_id, r.rank)
        for r in similarity.brute_force_topk(corpus, queries, k=2).collect()
    }
    assert got == {(2, 1), (3, 2)}  # zero vector present but ranked last


def test_simhash_wide_positions_independent_bits(spark):
    """Regression (review finding): positions > 32 draw from fresh
    hash material — not constant zeros (which would degenerate one
    pigeonhole block into an all-pairs join)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    sh = dedup.simhash(df, "doc_id", positions=64).collect()
    for r in sh:
        assert len(r.simhash) == 64
        # the upper half must not be all '0' for both docs
    uppers = {r.simhash[32:] for r in sh}
    assert uppers != {"0" * 32}
