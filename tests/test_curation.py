"""End-to-end corpus curation composition (the q_corpus_curation
pipeline): quality gate → exact dedup → near-dup survivors → per-group
quota, verified on a hand-computable corpus where each stage's outcome
is known."""

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import dedup, sampling
from python_extended_json_schema_validator_spark.pipeline.text import token_count


def _curate(corpus, min_toks=5, quota=2):
    scored = corpus.withColumn("n_toks", token_count(F.col("text")))
    q1 = scored.where(F.col("n_toks") >= min_toks)
    ex = dedup.exact_duplicates(q1, "doc_id").select(
        F.col("dup_id").alias("doc_id"))
    q2 = q1.join(ex, "doc_id", "left_anti")
    surv = dedup.dedup_survivors(q2, "doc_id", k=3, num_hashes=8,
                                 bands=4, threshold=0.5)
    q3 = q2.join(surv.where(F.col("is_survivor")).select("doc_id"),
                 "doc_id", "left_semi").withColumn("n_chars", F.length("text"))
    kept = sampling.top_n_per_group(
        q3.select("doc_id", "lang", "n_chars"), ["lang"], "n_chars",
        n=quota, tiebreak="doc_id").select("doc_id")
    st = (scored.where(F.col("n_toks") < min_toks)
          .select("doc_id", F.lit("quality").alias("st"))
          .unionByName(ex.select("doc_id", F.lit("exact_dup").alias("st")))
          .unionByName(surv.where(~F.col("is_survivor"))
                       .select("doc_id", F.lit("near_dup").alias("st")))
          .unionByName(kept.select("doc_id", F.lit("kept").alias("st"))))
    return {
        r.doc_id: r.status
        for r in corpus.select("doc_id").join(st, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("st"), F.lit("quota"))
                .alias("status")).collect()
    }


def test_each_stage_claims_its_rows(spark):
    long_a = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "too short", "en"),                      # quality (2 < 5 toks)
        (2, long_a, "en"),                           # survivor, longest → kept
        (3, "  ALPHA beta   gamma delta epsilon zeta eta theta ", "en"),
        # 3 normalizes to long_a → exact_dup of 2
        (4, long_a + " tail", "en"),                 # near-dup of 2 → near_dup
        (5, "one two three four five six seven", "en"),   # kept (quota 2)
        (6, "uno dos tres cuatro cinco seis", "en"),      # quota (3rd longest)
        (7, "un deux trois quatre cinq six sept huit", "fr"),  # kept
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = _curate(corpus)
    assert got == {
        1: "quality", 2: "kept", 3: "exact_dup", 4: "near_dup",
        5: "kept", 6: "quota", 7: "kept",
    }, got


def test_stage_order_matters_exact_dups_never_reach_the_chain(spark):
    """An exact dup removed at stage 2 must not resurface as a
    near-dup non-survivor (the anti-join hand-off)."""
    t = "alpha beta gamma delta epsilon zeta eta theta iota"
    corpus = spark.createDataFrame(
        [(1, t, "en"), (2, t, "en"), (3, t + " tail", "en")],
        "doc_id long, text string, lang string",
    )
    got = _curate(corpus)
    assert got == {1: "kept", 2: "exact_dup", 3: "near_dup"}, got
