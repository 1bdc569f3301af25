"""Training-data pipeline operators: dedup family, text analysis,
similarity search — hand-computable expectations on tiny corpora."""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.pipeline import (
    dedup,
    similarity,
    text as textops,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "THE  quick   brown fox jumps over the lazy dog"),  # exact dup (normalized)
    (3, "the quick brown fox jumps over the sleepy dog"),  # near dup (1 word)
    (4, "completely different content about spark engines"),
    (5, "el rapido zorro marron salta sobre el perro"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    out = dedup.exact_duplicates(docs, "doc_id").collect()
    assert len(out) == 1
    assert (out[0].dup_id, out[0].survivor_id) == (2, 1)


def test_word_shingles(spark, docs):
    sh = dedup.word_shingles(docs.where("doc_id=1"), "doc_id", k=3)
    got = {r.shingle for r in sh.collect()}
    assert "the quick brown" in got
    assert "lazy dog" not in got  # k=3 shingles only
    assert len(got) == 7  # 9 tokens -> 7 trigrams, all distinct


def test_minhash_near_duplicates(spark, docs):
    out = dedup.minhash_near_duplicates(
        docs, "doc_id", threshold=0.5, num_hashes=8, bands=4
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in out}
    # 1-2 identical after normalization → jaccard 1.0
    assert pairs.get((1, 2)) == 1.0
    # 1-3 share most shingles; 4 and 5 pair with nobody
    for (a, b) in pairs:
        assert {a, b} <= {1, 2, 3}


def test_jaccard_values(spark, docs):
    sh = dedup.word_shingles(docs, "doc_id", k=3)
    pairs = spark.createDataFrame([(1, 3)], "doc_a long, doc_b long")
    out = dedup.jaccard_on_pairs(pairs, sh).collect()[0]
    # 9 tokens, 7 trigrams each; the changed 8th word breaks the last
    # 2 trigrams → 5 shared, union 9
    assert out.sz_a == 7 and out.sz_b == 7 and out.inter == 5
    assert abs(out.jaccard - 5 / 9) < 1e-9


def test_simhash(spark, docs):
    sh = {r.doc: r.simhash for r in dedup.simhash(docs, "doc_id").collect()}
    assert sh[1] == sh[2]  # same tokens → same simhash
    assert len(sh[1]) == 16 and set(sh[1]) <= {"0", "1"}
    ham13 = sum(a != b for a, b in zip(sh[1], sh[3]))
    ham14 = sum(a != b for a, b in zip(sh[1], sh[4]))
    assert ham13 <= ham14  # near-dup closer than unrelated


def test_simhash_near_duplicates(spark, docs):
    out = dedup.simhash_near_duplicates(docs, "doc_id", max_hamming=0)
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (1, 2) in got


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "  "), (3, "a b  c"), (4, "don't stop-me now")],
        "id long, text string",
    )
    got = {
        r.id: (r.tc, r.bc)
        for r in df.select(
            "id",
            textops.token_count(F.col("text")).alias("tc"),
            textops.bpe_ish_token_count(F.col("text")).alias("bc"),
        ).collect()
    }
    assert got[1] == (2, 2)
    assert got[2][0] == 0
    assert got[3][0] == 3
    assert got[4][0] == 3  # whitespace tokens
    assert got[4][1] == 7  # don ' t stop - me now


def test_lang_id(spark, docs):
    out = {r.doc_id: r.lang_pred for r in textops.lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[5] == "es"
    assert out[4] == "und"  # no stopword markers at all → undetermined


def test_quality_features(spark, docs):
    row = textops.quality_features(docs.where("doc_id=1")).collect()[0]
    assert row.n_tokens == 9
    assert row.en_stop_hits == 2  # 'the' twice
    assert 0 < row.alpha_ratio < 1


def test_ngram_repetition_hand_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a b"),          # words: a×2,b → top 2/3, dup 2/3
            (2, "x"),              # one word: no bigrams at all
            (3, "   "),            # no words: absent from both levels
            (4, "c d c d c"),      # bigrams: "c d"×2,"d c"×2 → top 0.5, dup 1.0
        ],
        "doc_id long, text string",
    )
    w = {r.doc_id: r for r in textops.ngram_repetition(df, n=1).collect()}
    assert w[1].n_grams == 3 and w[1].distinct_grams == 2
    assert abs(w[1].top_ngram_frac - 2 / 3) < 1e-12
    assert abs(w[1].dup_ngram_frac - 2 / 3) < 1e-12
    assert w[2].n_grams == 1 and w[2].dup_ngram_frac == 0.0
    assert 3 not in w

    b = {r.doc_id: r for r in textops.ngram_repetition(df, n=2).collect()}
    assert b[1].n_grams == 2  # "a a", "a b"
    assert b[1].top_ngram_frac == 0.5 and b[1].dup_ngram_frac == 0.0
    assert 2 not in b and 3 not in b
    assert b[4].n_grams == 4
    assert b[4].top_ngram_frac == 0.5 and b[4].dup_ngram_frac == 1.0

    # joined convenience: NULLs where a level is absent
    feats = {r.doc_id: r for r in textops.repetition_features(df).collect()}
    assert feats[2].n_words == 1 and feats[2].top_bigram_frac is None
    assert feats[3].n_words is None and feats[3].dup_word_frac is None


def test_fingerprint_normalization(spark, docs):
    fps = {r.doc_id: r.fp for r in textops.fingerprint(docs).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_brute_force_topk(spark, vecs):
    out = similarity.brute_force_topk(vecs, vecs.where("vec_id=1"), k=2).collect()
    ranked = sorted([(r.rank, r.neighbor_id) for r in out])
    assert ranked == [(1, 2), (2, 3)]  # cos: 2≈0.994, 3=0, 4=-1


def test_lsh_topk_same_bucket(spark, vecs):
    # vecs 1,2 share sign bucket (4 bits): both non-negative leading dims
    out = similarity.lsh_topk(vecs, vecs.where("vec_id=1"), k=2, bits=4).collect()
    ids = {r.neighbor_id for r in out}
    assert 2 in ids
    assert 4 not in ids  # different sign bucket → pruned


def test_cosine_near_duplicates(spark, vecs):
    # 1-2: cos = 0.9/sqrt(0.82) ≈ 0.9939
    out = similarity.cosine_near_duplicates(vecs, threshold=0.99, bits=4).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2)}
    out2 = similarity.cosine_near_duplicates(vecs, threshold=0.995, bits=4).collect()
    assert {(r.doc_a, r.doc_b) for r in out2} == set()


def test_connected_components_chains_and_singletons(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )  # chain {1,2,3}, pair {5,6}, singletons {4}, {7}
    out = {r.id: r.component
           for r in dedup.connected_components(edges, ids).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}

    # a longer chain exercises multi-iteration propagation
    ids2 = spark.createDataFrame([(i,) for i in range(10)], "id long")
    edges2 = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    out2 = {r.id: r.component
            for r in dedup.connected_components(edges2, ids2).collect()}
    assert set(out2.values()) == {0}


def test_connected_components_unconverged_raises(spark):
    """A chain longer than max_iter hops cannot converge — strict mode
    must raise instead of silently returning split components
    (VERDICT/ADVICE round-3); strict=False keeps the coarsening."""
    import pytest

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, ids, max_iter=2)
    out = {r.id: r.component
           for r in dedup.connected_components(
               edges, ids, max_iter=2, strict=False).collect()}
    # partial labels are a valid coarsening: min label survives, and
    # every label is a member of the true (single) component
    assert out[0] == 0 and set(out) == set(range(n))
    # enough iterations -> converges and strict passes again
    full = {r.id: r.component
            for r in dedup.connected_components(
                edges, ids, max_iter=n).collect()}
    assert set(full.values()) == {0}


def test_deterministic_sample_stability(spark):
    from python_extended_json_schema_validator_spark.pipeline import sampling

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    kept1 = {r.doc_id for r in
             sampling.deterministic_sample(df, ["doc_id"], 0.25).collect()}
    # partitioning-invariant: same rows survive any repartition
    kept2 = {r.doc_id for r in sampling.deterministic_sample(
        df.repartition(17), ["doc_id"], 0.25).collect()}
    assert kept1 == kept2
    assert 0.20 < len(kept1) / 2000 < 0.30
    # different salt draws an independent sample
    kept3 = {r.doc_id for r in sampling.deterministic_sample(
        df, ["doc_id"], 0.25, salt="other").collect()}
    assert kept3 != kept1
    # edges
    assert sampling.deterministic_sample(df, ["doc_id"], 0.0).count() == 0
    assert sampling.deterministic_sample(df, ["doc_id"], 1.0).count() == 2000


def test_top_n_per_group_with_ties(spark):
    from python_extended_json_schema_validator_spark.pipeline import sampling

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 10), ("a", 3, 9), ("b", 4, 5)],
        "g string, id long, score long",
    )
    out = sampling.top_n_per_group(df, ["g"], "score", n=2, tiebreak="id")
    got = {(r.g, r.id) for r in out.collect()}
    # tie at 10 broken by id asc -> ids 1,2 kept; 3 cut
    assert got == {("a", 1), ("a", 2), ("b", 4)}


def test_connected_components_exact_last_iteration_no_raise(spark):
    """Round-4 review: a graph converging EXACTLY on the final allowed
    iteration must not raise in strict mode — exhaustion with the last
    iteration still moving labels is decided by one extra probe."""
    ids = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {r.id: r.component
           for r in dedup.connected_components(edges, ids, max_iter=2).collect()}
    assert set(out.values()) == {0}
