"""Driver contract: entry / queries / oracle_sql.

Each query constructs constraint specs, runs them through
ValidationEngine (python_extended_json_schema_validator_spark), and
returns the violations / verdicts / stats DataFrame.  The oracle SQL
reproduces the same semantics in ANSI SQL for DuckDB.

Column-name + ordering notes:
- row_id is always a STRING (the engine casts); oracles CAST AS VARCHAR.
- dedup windows order by the STRING row_id, so oracles use
  ROW_NUMBER() ... ORDER BY CAST(expr AS VARCHAR) to match.
- composite observed values are compact JSON arrays ('[1,2]',
  '["a","b"]') — oracles concatenate the same literal form.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import (
    ColumnCheck,
    ForeignKeySpec,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark.providers import InlineProvider
from python_extended_json_schema_validator_spark import stats as stats_mod

SF_DEFAULT = "/root/testdata/sf0.001"

VIOL_COLS = ["constraint_id", "reason", "row_id", "observed_value"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _viol(res) -> DataFrame:
    return res.violations.select(*VIOL_COLS)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_row_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 battery over part: minimum/maximum/enum/maxLength +
    exclusive bounds, const, pattern, minItems (derived array col)."""
    part = _t(spark, sf_dir, "part").withColumn(
        "name_words", F.split(F.col("p_name"), " ")
    )
    spec = TableSpec(
        name="part",
        row_id="p_partkey",
        checks=[
            ColumnCheck(column="p_size", minimum=5, maximum=45),
            ColumnCheck(column="p_brand", enum=tuple(f"Brand#{i}" for i in range(1, 25))),
            ColumnCheck(column="p_name", max_length=11, required=True),
            ColumnCheck(column="p_retailprice", exclusive_minimum=910.0),
            ColumnCheck(column="p_type", pattern="^[A-Z]+$"),
            ColumnCheck(column="name_words", min_items=2),
        ],
    )
    res = ValidationEngine([spec]).validate({"part": part})
    return _viol(res)


def q_unique_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: unique(o_custkey) over orders — deterministic min-row_id
    survivor, every later row blamed dup_unique."""
    spec = TableSpec(
        name="orders", row_id="o_orderkey", unique=[KeySpec(("o_custkey",))]
    )
    res = ValidationEngine([spec]).validate({"orders": _t(spark, sf_dir, "orders")})
    return _viol(res)


def q_pk_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: compound primary_key(l_partkey,l_suppkey) over lineitem;
    observed value = canonical JSON array."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "li_id", (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    spec = TableSpec(
        name="lineitem",
        row_id="li_id",
        primary_keys=[KeySpec(("l_partkey", "l_suppkey"))],
    )
    res = ValidationEngine([spec]).validate({"lineitem": li})
    return _viol(res)


def q_fk_revocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+J2: customers failing pass 1 (negative acctbal) have their
    PKs revoked; orders referencing them go stale_fk."""
    specs = [
        TableSpec(
            name="customer",
            row_id="c_custkey",
            checks=[ColumnCheck(column="c_acctbal", minimum=0.0)],
            primary_keys=[KeySpec(("c_custkey",))],
        ),
        TableSpec(
            name="orders",
            row_id="o_orderkey",
            foreign_keys=[ForeignKeySpec(("o_custkey",), ref_table="customer")],
        ),
    ]
    res = ValidationEngine(specs).validate(
        {
            "customer": _t(spark, sf_dir, "customer"),
            "orders": _t(spark, sf_dir, "orders"),
        }
    )
    return _viol(res)


def q_fk_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 on clean data: lineitem FKs to part and supplier — zero
    violations expected (parity on the empty set matters too)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "li_id", (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    specs = [
        TableSpec(name="part", row_id="p_partkey", primary_keys=[KeySpec(("p_partkey",))]),
        TableSpec(
            name="supplier", row_id="s_suppkey", primary_keys=[KeySpec(("s_suppkey",))]
        ),
        TableSpec(
            name="lineitem",
            row_id="li_id",
            foreign_keys=[
                ForeignKeySpec(("l_partkey",), ref_table="part"),
                ForeignKeySpec(("l_suppkey",), ref_table="supplier"),
            ],
        ),
    ]
    res = ValidationEngine(specs).validate(
        {
            "part": _t(spark, sf_dir, "part"),
            "supplier": _t(spark, sf_dir, "supplier"),
            "lineitem": li,
        }
    )
    return _viol(res)


def q_jk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+J3: index over urgent orders' custkeys (duplicates allowed);
    join_keys from customer — customers with no urgent order are
    stale_jk."""
    urgent = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    specs = [
        TableSpec(
            name="orders",
            row_id="o_orderkey",
            indexes=[KeySpec(("o_custkey",), name="urgent_cust")],
        ),
        TableSpec(
            name="customer",
            row_id="c_custkey",
            join_keys=[ForeignKeySpec(("c_custkey",), ref_table="orders")],
        ),
    ]
    res = ValidationEngine(specs).validate(
        {"orders": urgent, "customer": _t(spark, sf_dir, "customer")}
    )
    return _viol(res)


def q_limit_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: unique(l_partkey) scoped per l_returnflag — duplicates
    across scopes are fine, within a scope blamed."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "li_id", (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    spec = TableSpec(
        name="lineitem",
        row_id="li_id",
        scope_col="l_returnflag",
        unique=[KeySpec(("l_partkey",), limit_scope=True)],
    )
    res = ValidationEngine([spec]).validate({"lineitem": li})
    return _viol(res)


def q_missing_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.3.5 missing-member exclusion: rows whose key member is NULL
    contribute no key (here: priority 3-MEDIUM nulled out)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_prio_n", F.expr("nullif(o_orderpriority, '3-MEDIUM')")
    )
    spec = TableSpec(
        name="orders",
        row_id="o_orderkey",
        unique=[KeySpec(("o_custkey", "o_prio_n"))],
    )
    res = ValidationEngine([spec]).validate({"orders": o})
    return _viol(res)


def q_dangling_jk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: join_keys to a table that declares NO index worlds → every
    jk row dangles."""
    specs = [
        TableSpec(name="region", row_id="r_regionkey"),  # no index declared
        TableSpec(
            name="nation",
            row_id="n_nationkey",
            join_keys=[ForeignKeySpec(("n_regionkey",), ref_table="region")],
        ),
    ]
    res = ValidationEngine(specs).validate(
        {
            "region": _t(spark, sf_dir, "region"),
            "nation": _t(spark, sf_dir, "nation"),
        }
    )
    return _viol(res)


def q_provider_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: inline-provider-fed PK dimension, dim table absent — FKs
    check against provider keys only (⇔ fk_with_inline)."""
    specs = [
        TableSpec(
            name="region", row_id="r_regionkey", primary_keys=[KeySpec(("r_regionkey",))]
        ),
        TableSpec(
            name="nation",
            row_id="n_nationkey",
            foreign_keys=[ForeignKeySpec(("n_regionkey",), ref_table="region")],
        ),
    ]
    prov = InlineProvider(table="region", keys=[0, 1, 2])
    res = ValidationEngine(specs, providers=[prov]).validate(
        {"nation": _t(spark, sf_dir, "nation")}
    )
    return _viol(res)


def q_provider_remote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: REMOTE-provider-fed PK dimension over a loopback
    ``http.server`` — the reference's exact fetch protocol
    (pk_check.py:157-204) under the oracle hard signal:

    - the GET goes to ``urljoin(base, <last schema-URI segment> + '/')``
      with the configured Accept header; the handler answers 406
      unless the header matches, so a missing/wrong header would
      yield zero keys → every nation dangles → row-count mismatch;
    - the body is newline-split with blank lines dropped ('R0\\nR1\\n
      \\nR2\\n' must produce exactly three keys — a kept blank would
      register a bogus '' key, a broken split one giant key);
    - the FIRST base URL 500s: reference semantics are log-and-skip,
      never fatal, so the keys must still arrive from the second base.

    The fetch is ONE driver-side GET (never per-executor); the server
    is torn down before the returned plan executes.  FK members are a
    derived STRING column ('R' || n_regionkey) because remote key
    lists are text lines — string-typed keys are the only shape the
    protocol can carry."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from python_extended_json_schema_validator_spark.providers import (
        fetch_remote_provider,
    )

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.startswith("/dead/"):
                self.send_error(500, "boom")
                return
            if self.headers.get("Accept") != "text/uri-list":
                self.send_error(406, "bad accept")
                return
            body = b"R0\nR1\n\nR2\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep driver stdout clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        prov = fetch_remote_provider(
            table="region",
            url_bases=[
                f"http://127.0.0.1:{port}/dead/",   # 500 → skipped
                f"http://127.0.0.1:{port}/keys/",   # serves R0/R1/R2
            ],
            accept="text/uri-list",
        )
    finally:
        srv.shutdown()
        srv.server_close()
    nation = _t(spark, sf_dir, "nation").withColumn(
        "n_regioncode", F.concat(F.lit("R"), F.col("n_regionkey"))
    )
    specs = [
        TableSpec(
            name="region",
            row_id="r_regionkey",
            primary_keys=[KeySpec(("r_regioncode",))],
        ),
        TableSpec(
            name="nation",
            row_id="n_nationkey",
            foreign_keys=[
                ForeignKeySpec(("n_regioncode",), ref_table="region")
            ],
        ),
    ]
    res = ValidationEngine(specs, providers=[prov]).validate(
        {"nation": nation}
    )
    return _viol(res)


def q_partition_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star per-partition pass/fail ledger (scope = order
    status; check = totalprice cap)."""
    spec = TableSpec(
        name="orders",
        row_id="o_orderkey",
        scope_col="o_orderstatus",
        checks=[ColumnCheck(column="o_totalprice", maximum=300000.0)],
    )
    res = ValidationEngine([spec]).validate({"orders": _t(spark, sf_dir, "orders")})
    pv = res.partition_verdicts("orders")
    return pv.select(
        F.col("partition").alias("scope"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_failed").cast("long").alias("n_failed"),
        F.col("pass").cast("int").alias("pass_flag"),
    )


def q_image_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star flagship: full image+caption validation (engine
    constraints + Arrow-batched payload decode/dims/fmt/PSNR battery +
    column-wise caption equality) over a deterministic synthetic image
    table derived from part keys.  The oracle replicates the injection
    rules arithmetically — it predicts exactly which keys the engine
    must flag WITHOUT decoding anything, so the decode path is being
    checked end-to-end, not mirrored.  observed_value is dropped (PSNR
    magnitudes aren't SQL-expressible)."""
    from python_extended_json_schema_validator_spark.payload import synth
    from python_extended_json_schema_validator_spark.payload.validate import (
        validate_images,
    )

    images = synth.materialize_images(spark, sf_dir)
    viol = validate_images(images, synth.formats_dim(spark))
    return viol.select("constraint_id", "reason", "row_id")


def q_image_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star 'quantiles for w/h/phash drift' ON THE IMAGE TABLE:
    per-fmt decile drift of declared width and phash between a current
    batch (png widths +6 — a resize-pipeline change; jpeg phashes
    compressed into the lower hash half — an encoder change shifting the
    hash distribution) and the baseline.  The metadata columns
    are derived from part keys by the synth injection arithmetic
    (payload/synth.py rules) in PURE column algebra — at 10^12 rows a
    metadata-drift check must never touch `bytes`, so there is no
    decode, no mapInPandas, just two grouped aggregations per metric.
    Oracle recomputes everything from `part` arithmetically."""
    from python_extended_json_schema_validator_spark.payload.synth import (
        PHASH_MOD,
        PHASH_MULT,
    )

    k = F.col("p_partkey")
    w_real = F.lit(8) + k % 25
    w_decl = (
        F.when(k % 101 == 0, -w_real)
        .when(k % 89 == 0, w_real + 1)
        .otherwise(w_real)
    )
    fmt = F.when(k % 103 == 0, F.lit("tiff")).otherwise(
        F.element_at(F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")), (k % 3 + 1).cast("int"))
    )
    ph_src = F.when((k % 71 == 0) & (k >= 71), k - 3).otherwise(k)
    phash = (ph_src * F.lit(PHASH_MULT)) % F.lit(PHASH_MOD)
    img = _t(spark, sf_dir, "part").select(
        fmt.alias("fmt"), w_decl.alias("w"), phash.alias("phash")
    )

    base_w = img.select("fmt", F.col("w").cast("double").alias("val"))
    cur_w = img.select(
        "fmt",
        (
            F.col("w")
            + F.when(F.col("fmt") == "png", F.lit(6)).otherwise(F.lit(0))
        ).cast("double").alias("val"),
    )
    base_p = img.select("fmt", F.col("phash").cast("double").alias("val"))
    cur_p = img.select(
        "fmt",
        F.when(
            F.col("fmt") == "jpeg", F.col("phash") % F.lit(500000003)
        )
        .otherwise(F.col("phash"))
        .cast("double")
        .alias("val"),
    )
    d_w = stats_mod.decile_drift(cur_w, base_w, ["fmt"], "val", threshold=0.1)
    d_p = stats_mod.decile_drift(cur_p, base_p, ["fmt"], "val", threshold=0.1)
    return (
        d_w.select(F.lit("w").alias("metric"), "fmt",
                   F.round("shift", 6).alias("shift"), "drifted")
        .unionByName(
            d_p.select(F.lit("phash").alias("metric"), "fmt",
                       F.round("shift", 6).alias("shift"), "drifted")
        )
    )


def q_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-group column profile (nulls/min/max/distinct)
    — the engine's stats pass with exact distinct for oracle parity."""
    li = _t(spark, sf_dir, "lineitem")
    out = stats_mod.profile(
        li, group_by=["l_returnflag"], columns=["l_quantity", "l_partkey"]
    )
    return out.select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("l_quantity_nulls").cast("long").alias("q_nulls"),
        F.col("l_quantity_min").alias("q_min"),
        F.col("l_quantity_max").alias("q_max"),
        F.col("l_partkey_distinct").cast("long").alias("pk_distinct"),
    )


# ---------------------------------------------------------------------------
# training-pipeline operators (dedup / text / similarity)
# ---------------------------------------------------------------------------


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ injected near-duplicates (doc_id+100000, one token
    appended) — deterministic, SQL-replicable corpus for dedup ops."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    return docs.unionByName(extra)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import text as textops

    docs = _t(spark, sf_dir, "documents")
    out = textops.quality_features(docs)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars_m").cast("long").alias("n_chars_m"),
        F.col("en_stop_hits").cast("long").alias("en_stop_hits"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import text as textops

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = textops.repetition_features(docs)
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("top_word_frac", 6).alias("top_word_frac"),
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        F.round("dup_bigram_frac", 6).alias("dup_bigram_frac"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import text as textops

    docs = _t(spark, sf_dir, "documents")
    return textops.lang_id(docs).select("doc_id", "lang_pred")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import dedup

    # injected docs are EXACT dups (same text) for this query
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return dedup.exact_duplicates(docs.unionByName(extra), "doc_id").select(
        F.col("dup_id").cast("long").alias("dup_id"),
        F.col("survivor_id").cast("long").alias("survivor_id"),
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import dedup

    corpus = _docs_with_near_dups(spark, sf_dir)
    out = dedup.minhash_near_duplicates(
        corpus, "doc_id", k=3, num_hashes=8, bands=4, threshold=0.5
    )
    return out.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup END TO END (dedup.dedup_survivors): the
    dedup_minhash corpus and knobs, composed through verified-pair
    edges → hybrid components → survivor = min id per component.
    One row per doc with (component, is_survivor); the oracle
    recomputes the whole chain — md5 minhash, banded candidates,
    exact Jaccard ≥ 0.5, recursive-CTE components — and the survivor
    flag is id = component in BOTH engines (labels are min reachable
    ids, so the keep-set needs no extra pass)."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    corpus = _docs_with_near_dups(spark, sf_dir)
    out = dedup.dedup_survivors(
        corpus, "doc_id", k=3, num_hashes=8, bands=4, threshold=0.5
    )
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        "is_survivor",
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id").select(
        F.col("doc").cast("long").alias("doc_id"), "simhash"
    )


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5
    ).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def _embed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ clones of vec_id<20 shifted +100000 — the shared
    corpus of embed_neardup and embed_survivors (their oracles must
    stay corpus-identical for the pair contract and the survivors
    contract to agree)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(clones)


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.pipeline import similarity

    out = similarity.cosine_near_duplicates(
        _embed_corpus(spark, sf_dir), threshold=0.95, bits=8, dim=64
    )
    return out.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
    )


def q_embed_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The factored survivors tail (dedup.survivors_from_pairs) fed
    by the EMBEDDING pair generator: the embed_neardup corpus and
    knobs (seeded hyperplane LSH, cosine ≥ 0.95 — full recall on
    this corpus, same contract as embed_neardup), clustered to the
    one-row-per-vector (component, is_survivor) verdict.  Oracle =
    exact cosine pairs → recursive-CTE components → flag, proving
    the pair-source-agnostic tail end-to-end on a second modality."""
    from python_extended_json_schema_validator_spark.pipeline import (
        dedup,
        similarity,
    )

    corpus = _embed_corpus(spark, sf_dir)
    pairs = similarity.cosine_near_duplicates(
        corpus, threshold=0.95, bits=8, dim=64
    )
    out = dedup.survivors_from_pairs(
        pairs,
        corpus.select(F.col("vec_id").cast("long").alias("vec_id")),
        id_col="vec_id",
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("component"),
        "is_survivor",
    )


def _neardup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_extended_json_schema_validator_spark.payload import synth

    return synth.materialize_neardup_images(spark, sf_dir)


def q_phash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-recomputed perceptual hash (payload/phash.py): the
    DCT pHash of the decoded pixels compared to the declared phash
    column in ONE fused map-only Arrow stage.  The near-dup corpus
    (synth.neardup_images_from_keys) declares the TRUE hash except at
    k % 13 == 6, where 16 bits are flipped — so the oracle predicts
    the violation set arithmetically while the engine must actually
    decode + hash every image to find it (hamming budget 8; clean
    rows recompute to hamming 0, the flip sits at 16)."""
    from python_extended_json_schema_validator_spark.payload import phash

    img = _neardup_images(spark, sf_dir)
    return phash.phash_violations(img).select(
        "constraint_id", "reason", "row_id"
    )


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate pairs over recomputed image phash: decode
    → 64-bit DCT signature (map-only) → pigeonhole-banded hamming join
    (τ=6 → 7 blocks, bucketed equi-joins, full-hash verify on integer
    chunks — the SimHash machinery on the image modality).  The
    corpus injects near-dup pairs (k-1, k) at k % 7 == 3 via seed
    reuse + ±2 noise + cross-codec re-encode; measured margins: true
    pairs ≤ 4 bits, every other pair ≥ 10 bits at sf0.01 AND sf0.1,
    so the oracle's arithmetic pair set is exact."""
    from python_extended_json_schema_validator_spark.payload import phash

    img = _neardup_images(spark, sf_dir)
    sig = phash.phash_signatures(img)
    return phash.phash_near_duplicates(sig).select("doc_a", "doc_b")


def q_phash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The factored survivors tail (dedup.survivors_from_pairs) fed by
    the IMAGE pair generator — third modality through the same
    clustering + survivor-flag verdict (after minhash text and
    embedding LSH).  Components here are exactly the injected (k-1,
    k) pairs, so the oracle flags keep = NOT near-dup-row and
    component = k - (k near-dup ? 1 : 0)."""
    from python_extended_json_schema_validator_spark.payload import phash
    from python_extended_json_schema_validator_spark.pipeline import dedup

    img = _neardup_images(spark, sf_dir)
    sig = phash.phash_signatures(img).select(
        F.substring("image_id", 4, 8).cast("long").alias("img_k"),
        "phash_dct",
    )
    pairs = phash.phash_near_duplicates(sig, id_col="img_k")
    out = dedup.survivors_from_pairs(
        pairs, sig.select("img_k"), id_col="img_k"
    )
    return out.select(
        F.col("img_k").cast("long").alias("img_k"),
        F.col("component").cast("long").alias("component"),
        "is_survivor",
    )


def q_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicates — the FOURTH dedup modality (after text
    minhash/simhash, image phash, embedding LSH): decode → 64-bit
    spectral band-occupancy fingerprint (map-only Arrow) → the
    signature-agnostic banded hamming join at τ=1.  The corpus
    injects (k-1, k) pairs at k % 7 == 3 via chord reuse under a gain
    change + fresh noise + int16 re-quantization — byte-different
    clips that sound alike; measured margins: pairs at hamming 0,
    every other pair ≥ 2 at both test scales, so the oracle's
    arithmetic pair set is exact."""
    from python_extended_json_schema_validator_spark.pipeline import (
        multimodal,
    )

    part = _t(spark, sf_dir, "part")
    keys = part.select(F.col("p_partkey").cast("long").alias("k"))
    clips = multimodal.neardup_audio_from_keys(keys)
    sig = multimodal.audio_fingerprints(clips)
    return multimodal.audio_near_duplicates(sig).select("doc_a", "doc_b")


def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicates — the FIFTH dedup modality: frame
    sampling (mapInPandas fan-out) → per-frame DCT phash on composite
    video#frame ids → banded hamming join on FRAME signatures →
    per-video-pair vote.  Near-dup videos (k % 7 == 3) rebuild row
    k-1's frames with ±2 noise, so every frame matches its source
    frame and ``shared_frames`` is exactly the source's frame count —
    the oracle predicts the pair set AND the vote arithmetic
    (3 + ((k-1) % 3))."""
    from python_extended_json_schema_validator_spark.pipeline import (
        multimodal,
    )

    part = _t(spark, sf_dir, "part")
    keys = part.select(F.col("p_partkey").cast("long").alias("k"))
    vids = multimodal.neardup_videos_from_keys(keys)
    return multimodal.video_near_duplicates(vids).select(
        "video_a", "video_b",
        F.col("shared_frames").cast("long").alias("shared_frames"),
    )


def q_stream_visual_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mirror of the phash ledger
    (streaming.incremental.stateful_visual_dups): two availableNow
    runs over one checkpoint — batch 1 is the F12 corpus (its
    injected (k-1, k) near-dup pairs emit in-batch, sorted-order
    prior), batch 2 re-sends the same pixels under 're' ids and must
    emit exactly the in-increment pairs + every twin + both flanks of
    each injected pair AGAINST BATCH 1's STATE, never re-emitting
    batch 1's rows (checkpoint resume).  Per-block duplicate
    emissions are distinct()-ed (documented operator contract)."""
    import tempfile

    from python_extended_json_schema_validator_spark.streaming.incremental import (
        stateful_visual_dups,
    )

    import shutil

    img = _neardup_images(spark, sf_dir)
    inc1 = img.select("image_id", "bytes")
    inc2 = img.select(
        F.concat(F.lit("re"), F.col("image_id")).alias("image_id"),
        "bytes",
    )
    root = tempfile.mkdtemp(prefix="svd_q")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    for inc in (inc1, inc2):
        inc.coalesce(2).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "image_id string, bytes binary"
        ).parquet(src)
        q = (
            stateful_visual_dups(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # the streams are terminated: drop the two corpus copies and the
    # checkpoint now — only the (small) emission sink outlives the
    # query, so repeated gate runs don't accumulate gigabytes
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.schema("doc_new string, doc_prior string, hamming int")
        .parquet(out)
        .select("doc_new", "doc_prior")
        .distinct()
    )


def q_stream_audio_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming mirror of the AUDIO ledger
    (streaming.incremental.stateful_audio_dups — the signature-
    agnostic stateful core under the band-occupancy fingerprint at
    τ=1): two availableNow runs over one checkpoint — batch 1 is the
    F12 audio corpus (injected (k-1, k) chord-reuse pairs emit
    in-batch, sorted-order prior), batch 2 re-sends the same clips
    under 're' ids and must emit its own in-batch pairs + every twin
    + both flanks AGAINST BATCH 1's STATE, never re-emitting batch
    1's rows (checkpoint resume).  Per-block duplicate emissions are
    distinct()-ed (operator contract)."""
    import shutil
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_audio_from_keys,
    )
    from python_extended_json_schema_validator_spark.streaming.incremental import (
        stateful_audio_dups,
    )

    keys = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    )
    clips = neardup_audio_from_keys(keys)
    inc1 = clips.select("audio_id", "bytes")
    inc2 = clips.select(
        F.concat(F.lit("re"), F.col("audio_id")).alias("audio_id"),
        "bytes",
    )
    root = tempfile.mkdtemp(prefix="sad_q")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    for inc in (inc1, inc2):
        inc.coalesce(2).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "audio_id string, bytes binary"
        ).parquet(src)
        q = (
            stateful_audio_dups(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.schema("doc_new string, doc_prior string, hamming int")
        .parquet(out)
        .select("doc_new", "doc_prior")
        .distinct()
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-set BUILD the pipeline operators exist for,
    composed end to end over one corpus: quality gate (token count ≥
    30) → exact dedup (normalized fingerprint, min-id survivor) →
    MinHash-LSH near-dup clustering (the dedup_survivors chain) →
    per-language quality quota (5 longest by n_chars).  One row per
    corpus doc with its terminal status: quality / exact_dup /
    near_dup / quota / kept — the oracle replays every stage in SQL,
    so any interplay bug between stages (filter order, survivor
    leakage across stages) breaks the hash, not just a single
    operator's row set.  Corpus = documents ∪ near-mutants
    (doc_id<30, +100000, ' extra token') ∪ exact-mutants
    (30≤doc_id<45, +200000, byte-identical).  Scale shape = the sum
    of its parts: each stage is an already-audited operator; stages
    hand off narrow (doc_id) sets via anti/semi joins."""
    from python_extended_json_schema_validator_spark.pipeline import (
        dedup,
        sampling,
    )
    from python_extended_json_schema_validator_spark.pipeline.text import (
        token_count,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    near = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang",
    )
    exact = docs.where(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 45)
    ).select((F.col("doc_id") + 200000).alias("doc_id"), "text", "lang")
    corpus = docs.unionByName(near).unionByName(exact)

    scored = corpus.withColumn("n_toks", token_count(F.col("text")))
    q1 = scored.where(F.col("n_toks") >= 30)

    ex_dups = dedup.exact_duplicates(q1, "doc_id").select(
        F.col("dup_id").alias("doc_id")
    )
    q2 = q1.join(ex_dups, "doc_id", "left_anti")

    surv = dedup.dedup_survivors(
        q2, "doc_id", k=3, num_hashes=8, bands=4, threshold=0.5
    )
    q3 = q2.join(
        surv.where(F.col("is_survivor")).select("doc_id"), "doc_id",
        "left_semi",
    ).withColumn("n_chars", F.length("text"))

    kept = sampling.top_n_per_group(
        q3.select("doc_id", "lang", "n_chars"), ["lang"], "n_chars",
        n=5, tiebreak="doc_id",
    ).select("doc_id")

    statuses = (
        scored.where(F.col("n_toks") < 30)
        .select("doc_id", F.lit("quality").alias("st"))
        .unionByName(ex_dups.select("doc_id", F.lit("exact_dup").alias("st")))
        .unionByName(
            surv.where(~F.col("is_survivor"))
            .select("doc_id", F.lit("near_dup").alias("st"))
        )
        .unionByName(kept.select("doc_id", F.lit("kept").alias("st")))
    )
    return (
        corpus.select("doc_id", "lang")
        .join(statuses, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            F.coalesce(F.col("st"), F.lit("quota")).alias("status"),
        )
    )


def q_phash_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment VISUAL near-dup ledger (PhashLedger, the image
    modality of incremental_neardup): increment 1 registers the F12
    corpus's 64-bit DCT signatures + block keys; increment 2 re-sends
    the SAME pixel content under new ids ('re' prefix) — a full
    re-send, the worst ingestion case.  Every inc2 row must collide
    with its inc1 twin (hamming 0: identical bytes → identical hash),
    and rows flanking an injected near-dup pair also collide with the
    partner (hamming ≤ 6, the measured pair ceiling across 500k
    images).  Increment 1 runs against the EMPTY ledger and must
    produce zero rows (materialize-before-append: no self-collision).
    Verification is exact long-XOR bit_count against the stored
    signatures — prior pixels never re-read."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        PhashLedger,
        cross_increment_phash_duplicates,
    )

    img = _neardup_images(spark, sf_dir)
    led = PhashLedger(tempfile.mkdtemp(prefix="phash_led_q"))
    v1 = cross_increment_phash_duplicates(img, "image_id", led)
    inc2 = img.select(
        F.concat(F.lit("re"), F.col("image_id")).alias("image_id"),
        "bytes",
    )
    v2 = cross_increment_phash_duplicates(
        inc2, "image_id", led, update=False
    )
    return v1.unionByName(v2).select("doc_new", "doc_prior")


def q_audio_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment AUDIO near-dup ledger (AudioLedger — the
    phash int64 machinery under the band-occupancy fingerprint,
    τ=1): increment 1 registers the F12 audio corpus; increment 2
    re-sends the SAME clip content under 're' ids.  Every inc2 clip
    collides with its inc1 twin at hamming 0 (identical bytes →
    identical fingerprint), and near-dup rows (k % 7 == 3: chord of
    k-1 at a different gain + fresh noise) also collide with the
    partner's clip in both directions — measured margins put every
    other chord pair ≥ 2 bits apart, so the oracle's arithmetic pair
    set is exact.  Increment 1 runs against the EMPTY ledger → zero
    rows (materialize-before-append)."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        AudioLedger,
        cross_increment_audio_duplicates,
    )
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_audio_from_keys,
    )

    keys = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    )
    clips = neardup_audio_from_keys(keys)
    led = AudioLedger(tempfile.mkdtemp(prefix="audio_led_q"))
    v1 = cross_increment_audio_duplicates(
        clips, "audio_id", led, audio_col="bytes"
    )
    inc2 = clips.select(
        F.concat(F.lit("re"), F.col("audio_id")).alias("audio_id"),
        "bytes",
    )
    v2 = cross_increment_audio_duplicates(
        inc2, "audio_id", led, audio_col="bytes", update=False
    )
    return v1.unionByName(v2).select("doc_new", "doc_prior")


def q_video_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment VIDEO near-dup ledger (VideoLedger: FRAME
    signatures persisted, vote per video pair on probe): increment 2
    re-sends increment 1's video content under 're' ids, so every
    re-sent video matches its twin on EVERY frame (hamming 0) and
    near-dup rows (k % 7 == 3: k-1's frames rebuilt with ±2 noise)
    match the partner too — ``shared_frames`` is exactly the source's
    frame count 3 + (k' % 3), the same vote arithmetic the
    video_neardup oracle pins.  Increment 1 probes the empty ledger →
    zero rows."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        VideoLedger,
        cross_increment_video_duplicates,
    )
    from python_extended_json_schema_validator_spark.pipeline.multimodal import (
        neardup_videos_from_keys,
    )

    keys = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("k")
    )
    vids = neardup_videos_from_keys(keys)
    led = VideoLedger(tempfile.mkdtemp(prefix="video_led_q"))
    v1 = cross_increment_video_duplicates(
        vids, "video_id", led, video_col="bytes"
    )
    inc2 = vids.select(
        F.concat(F.lit("re"), F.col("video_id")).alias("video_id"),
        "bytes",
    )
    v2 = cross_increment_video_duplicates(
        inc2, "video_id", led, video_col="bytes", update=False
    )
    return v1.unionByName(v2).select(
        "video_new", "video_prior",
        F.col("shared_frames").cast("long").alias("shared_frames"),
    )


def q_embedding_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment EMBEDDING near-dup ledger (EmbeddingLedger —
    the fifth and last modality to gain a ledger family): increment 1
    registers every embedding's vector + seeded-plane LSH buckets;
    increment 2 re-sends vec_id < 20 under id+100000.  Identical
    vectors agree on EVERY bucket table (sign pattern is a function
    of the vector), so each re-sent row hits its twin at cos 1.0;
    additional hits are exactly the corpus's cos ≥ 0.95 neighbor
    pairs (the embed_neardup contract set restricted to one re-sent
    endpoint — the oracle-green full-recall LSH regime at this
    corpus).  Exact cosine verification against STORED vectors:
    prior embeddings are fetched by doc, never recomputed."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        EmbeddingLedger,
        cross_increment_embedding_duplicates,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()[0])
    led = EmbeddingLedger(
        tempfile.mkdtemp(prefix="emb_led_q"), dim=dim
    )
    v1 = cross_increment_embedding_duplicates(emb, "vec_id", led)
    inc2 = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    v2 = cross_increment_embedding_duplicates(
        inc2, "vec_id", led, update=False
    )
    return v1.unionByName(v2).select(
        F.col("doc_new").cast("long").alias("doc_new"),
        F.col("doc_prior").cast("long").alias("doc_prior"),
    )


def q_curation_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL curation (pipeline/curation.py) — the corpus
    curation chain composed over the ledger families across two
    increments: increment 1 (documents < 60) is curated and recorded
    (fingerprints, MinHash sketches, per-language kept counts);
    increment 2 (near mutants +100000, exact mutants +200000, fresh
    re-keyed docs +400000) is curated AGAINST THAT HISTORY with
    update=False.  Statuses follow registration-order near-dup
    semantics (earlier string id holds — the engine's uniqueness
    doctrine; the batch components form stays in corpus_curation).
    The oracle replays both increments end to end: tokenizer,
    normalized-fingerprint exact legs (within + vs recorded), the
    md5 minhash signatures and band joins (within + vs recorded
    sketches, m/8 estimator), and the quota windows with increment
    1's kept counts consumed first."""
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

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    inc1 = docs.where(F.col("doc_id") < 60)
    inc2 = (
        docs.where(F.col("doc_id") < 30)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
            "lang",
        )
        .unionByName(
            docs.where(
                (F.col("doc_id") >= 30) & (F.col("doc_id") < 45)
            ).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text", "lang"
            )
        )
        .unionByName(
            docs.where(
                (F.col("doc_id") >= 60) & (F.col("doc_id") < 90)
            ).select(
                (F.col("doc_id") + 400000).alias("doc_id"), "text", "lang"
            )
        )
    )
    root = tempfile.mkdtemp(prefix="cur_led_q")
    kl = KeyLedger(root=f"{root}/keys")
    nl = MinHashLedger(f"{root}/nd", num_hashes=8, bands=4)
    ql = QuotaLedger(f"{root}/quota")
    s1 = curate_increment(
        inc1, "doc_id", kl, nl, ql, min_tokens=30, threshold=0.5, quota=5
    )
    s2 = curate_increment(
        inc2, "doc_id", kl, nl, ql, min_tokens=30, threshold=0.5,
        quota=5, update=False,
    )
    return (
        s1.select(F.lit(1).alias("inc"), "doc", "lang", "status")
        .unionByName(
            s2.select(F.lit(2).alias("inc"), "doc", "lang", "status")
        )
    )


def q_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 schema dispatch: a mixed-schema document table routed to
    per-schema plans via the _schema probe; no_id / schema_unknown
    routing errors included."""
    from python_extended_json_schema_validator_spark.dispatch import SchemaDispatcher

    nation = _t(spark, sf_dir, "nation").select(
        F.lit("geo/nation").alias("_schema"),
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("file"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("long").alias("rk"),
    )
    region = _t(spark, sf_dir, "region").select(
        F.lit("geo/region").alias("_schema"),
        F.concat(F.lit("r"), F.col("r_regionkey")).alias("file"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("long").alias("rk"),
    )
    strays = spark.createDataFrame(
        [(None, "x0", "noid", 0), ("ghost", "x1", "lost", 0)],
        "_schema string, file string, name string, rk long",
    )
    docs = nation.unionByName(region).unionByName(strays)
    disp = SchemaDispatcher(
        {
            "geo/nation": TableSpec(
                name="geo/nation", row_id="file",
                checks=[
                    ColumnCheck(column="name", required=True),
                    ColumnCheck(column="rk", maximum=3),
                ],
            ),
            "geo/region": TableSpec(
                name="geo/region", row_id="file",
                checks=[ColumnCheck(column="name", min_length=5)],
            ),
        },
        row_id="file",
    )
    return disp.validate(docs).select(*VIOL_COLS)


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured documents: extract a member from a JSON payload
    column (⇔ the reference's per-document JSON parsing + member
    extraction) and validate it alongside plain columns."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object(F.col("props"), "$.k").cast("long")
    )
    spec = TableSpec(
        name="events",
        row_id="event_id",
        checks=[
            ColumnCheck(column="k", required=True, minimum=10),
            ColumnCheck(column="event_type", enum=("click", "view", "purchase", "signup")),
        ],
    )
    res = ValidationEngine([spec]).validate({"events": ev})
    return _viol(res)


def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated per-group quantiles (sort-based percentile;
    the scale path is tdigest.quantile_sketch, benched separately)."""
    from python_extended_json_schema_validator_spark import stats as s

    li = _t(spark, sf_dir, "lineitem")
    return s.exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", (0.25, 0.5, 0.75, 0.95)
    ).select("l_returnflag", "p25", "p50", "p75", "p95")


def q_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted group count (skew-proof) — must be
    bit-identical to a plain GROUP BY count."""
    from python_extended_json_schema_validator_spark import stats as s

    li = _t(spark, sf_dir, "lineitem")
    return s.salted_group_count(li, ["l_suppkey"], n_salts=16).select(
        "l_suppkey", F.col("count").cast("long").alias("n")
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (hamming ≤ 2, blocked join) over
    documents + exact clones (doc_id+100000)."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    out = dedup.simhash_near_duplicates(
        docs.unionByName(clones), "doc_id", max_hamming=2
    )
    return out.select(
        F.col("doc_a").cast("long").alias("doc_a"),
        F.col("doc_b").cast("long").alias("doc_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard for a fixed candidate set (all pairs
    among doc_id < 15)."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 15)
    sh = dedup.word_shingles(docs, "doc_id", k=3)
    ids = docs.select(F.col("doc_id").alias("doc_a"))
    ids2 = docs.select(F.col("doc_id").alias("doc_b"))
    pairs = ids.crossJoin(ids2).where(F.col("doc_a") < F.col("doc_b"))
    out = dedup.jaccard_on_pairs(pairs, sh)
    return out.select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.col("inter").cast("long").alias("inter"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed sampling (~25% of documents keyed
    on doc_id): the kept set is a pure function of content, so the
    oracle recomputes the identical md5-prefix filter — and the same
    rows survive a re-run at any cluster size (what df.sample cannot
    promise)."""
    from python_extended_json_schema_validator_spark.pipeline import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = sampling.deterministic_sample(
        docs, ["doc_id"], fraction=0.25, salt="s1"
    )
    return out.select(F.col("doc_id").cast("long"), "lang")


def q_quality_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quality quota: the 5 longest documents per language
    (n_chars desc, doc_id asc tiebreak) — the 'keep N best per
    domain' curation step as ONE window shuffle."""
    from python_extended_json_schema_validator_spark.pipeline import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = sampling.top_n_per_group(
        docs, ["lang"], "n_chars", n=5, tiebreak="doc_id"
    )
    return out.select(
        "lang", F.col("doc_id").cast("long"), F.col("n_chars").cast("long")
    )


def _components_graph(spark: SparkSession, sf_dir: str):
    """The shared near-dup clustering graph used by all three
    connected-components contract queries: corpus = docs <25 plus two
    mutants per doc (one / two appended marker tokens); the edge rule
    is shingle-set symmetric difference ≤ 1, so A—B and B—C are edges
    but A—C (diff 2) is NOT — the component {k, k+100000, k+200000}
    only forms through transitive closure.  The all-pairs candidate
    set is for oracle tractability; at scale edges come from the
    minhash/simhash candidate generators.  Returns (edges, ids)."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 25)
        .select("doc_id", "text")
    )
    b = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq1")).alias("text"),
    )
    c = docs.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq1 zq2")).alias("text"),
    )
    corpus = docs.unionByName(b).unionByName(c)
    sh = dedup.word_shingles(corpus, "doc_id", k=3)
    ids_a = corpus.select(F.col("doc_id").alias("doc_a"))
    ids_b = corpus.select(F.col("doc_id").alias("doc_b"))
    pairs = ids_a.crossJoin(ids_b).where(F.col("doc_a") < F.col("doc_b"))
    jac = dedup.jaccard_on_pairs(pairs, sh)
    edges = jac.where(
        (F.col("sz_a") + F.col("sz_b") - 2 * F.col("inter")) <= 1
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return edges, corpus.select("doc_id")


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING with true transitivity over the shared
    `_components_graph` (see its docstring for the corpus/edge rule).
    The oracle replicates the graph AND the components with a
    recursive CTE (min reachable id per node)."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    edges, ids = _components_graph(spark, sf_dir)
    comp = dedup.connected_components(edges, ids, id_col="doc_id")
    return comp.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


# -- rows-only entries (no SQL-expressible oracle; driver records a
#    weaker rows-only check) ------------------------------------------------


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN top-k.  The pipeline is DETERMINISTIC
    (seeded Gaussian planes, fixed tie-breaks), so unlike most ANN
    this approximate index has an EXACT oracle: the same plane
    literals are embedded into the DuckDB SQL (see oracle_sql), which
    replicates bucket assignment, multi-table candidate union, and
    cosine ranking bit-for-bit on doubles."""
    from python_extended_json_schema_validator_spark.pipeline import similarity

    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(
        emb, emb.where(F.col("vec_id") < 20), k=5, bits=8, tables=4, seed=42,
        dim=64,  # known from the table schema — skips the inference scan
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").cast("long").alias("rank"),
    )


def _ann_lsh_oracle() -> str:
    """DuckDB replication of q_ann_lsh: same seeded planes, same
    bucket/candidate/ranking pipeline, double arithmetic throughout."""
    from python_extended_json_schema_validator_spark.pipeline.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(64, bits=8, tables=4, seed=42)

    def bucket_expr(planes_t) -> str:
        cases = [
            "(CASE WHEN list_dot_product(embedding::DOUBLE[], ["
            + ",".join(repr(x) for x in plane)
            + "]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
            for plane in planes_t
        ]
        return " || ".join(cases)

    def banded(src: str, idc: str) -> str:
        return "\n              UNION ALL\n".join(
            f"              SELECT {idc}, embedding, {t} AS tbl, "
            f"{bucket_expr(pt)} AS bucket FROM {src}"
            for t, pt in enumerate(planes)
        )

    return f"""
        WITH q AS (
          SELECT CAST(vec_id AS BIGINT) AS query_id, embedding
          FROM embeddings WHERE vec_id < 20
        ), c AS (
          SELECT CAST(vec_id AS BIGINT) AS neighbor_id, embedding
          FROM embeddings
        ), qb AS (
{banded("q", "query_id")}
        ), cb AS (
{banded("c", "neighbor_id")}
        ), cand AS (
          SELECT DISTINCT qb.query_id, cb.neighbor_id,
                 qb.embedding AS qe, cb.embedding AS ce
          FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
          WHERE qb.query_id <> cb.neighbor_id
        ), scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qe::DOUBLE[], ce::DOUBLE[])
                 / (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[]))
                    * sqrt(list_dot_product(ce::DOUBLE[], ce::DOUBLE[]))) AS cos
          FROM cand
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 5
    """


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a RECALL-BOUNDED contract: per query, the exact
    top-1 neighbor (computed by the brute-force path, differentially
    validated by the oracle's SQL top-1) plus a boolean asserting the
    IVF retrieval found ≥3 of the exact top-5 (recall@5 ≥ 0.6 — the
    map-only-assignment index at nlist=8/nprobe=3 measures 4-5 hits
    per query on this data; k-means is deterministic so the contract
    is stable).  A recall regression flips recall_ok to false and the
    oracle hash mismatches — the approximate query family is now
    driver-checkable instead of rows-only."""
    from python_extended_json_schema_validator_spark.pipeline import similarity

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    ivf = similarity.ivf_topk(emb, queries, k=5, nlist=8, nprobe=3, iters=3)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    hits = (
        exact.join(
            ivf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    top1 = exact.where(F.col("rank") == 1).select(
        "query_id", F.col("neighbor_id").alias("exact_top1")
    )
    return top1.join(hits, "query_id", "left").select(
        "query_id",
        "exact_top1",
        (F.coalesce(F.col("n_hits"), F.lit(0)) >= 3).alias("recall_ok"),
    )


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest sketch quantiles with an ε-BOUNDED contract:
    per group, the EXACT p25/p50/p75 (Spark `percentile` ⇔ DuckDB
    quantile_cont — the same equivalence quantiles_exact hash-proves)
    plus booleans asserting each t-digest quantile lands within 1% of
    the group's value range of the exact answer.  Sketch drift flips a
    boolean and the oracle hash mismatches."""
    from python_extended_json_schema_validator_spark.tdigest import quantile_sketch

    li = _t(spark, sf_dir, "lineitem")
    probs = (0.25, 0.5, 0.75)
    td = quantile_sketch(li, ["l_returnflag"], "l_extendedprice", probs)
    exact = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25, 0.5, 0.75))"
        ).alias("__ex"),
        (F.max("l_extendedprice") - F.min("l_extendedprice")).alias("__rng"),
    )
    j = td.join(exact, "l_returnflag")
    cols = [F.col("l_returnflag")]
    for i, (p, lbl) in enumerate(zip(probs, ("p25", "p50", "p75"))):
        cols.append(F.col("__ex").getItem(i).alias(f"{lbl}_exact"))
        cols.append(
            (
                F.abs(F.col(lbl) - F.col("__ex").getItem(i))
                <= 0.01 * F.col("__rng")
            ).alias(f"{lbl}_ok")
        )
    return j.select(*cols)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over a deterministic synthetic PCM
    table (multimodal plumbing; fake codec seam), ORACLE-BACKED via the
    contract pattern (same as ann_ivf/tdigest_quantiles): exact
    companion columns the oracle recomputes in SQL (sample_rate,
    duration_s = n_samples/rate) plus Spark-side accuracy verdicts the
    oracle asserts TRUE.  The clip at seed s is 0.5·sin(2π·f·t/rate) +
    0.05·noise with f = 100 + (s%20)·50, so analytically RMS ≈
    √(0.125+0.0025) ≈ 0.357, zero-crossings ≈ f/2 over 0.25 s, peak ∈
    (0.5, 0.8); the Philox stream is fixed per seed, making the bounds
    deterministic (measured: rms ∈ [0.3548, 0.3589], peak ∈ [0.613,
    0.686], zc − f/2 ∈ [−1, 28])."""
    from python_extended_json_schema_validator_spark.pipeline import multimodal as mm
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "audio_id": [f"a{int(k)}" for k in pdf["id"]],
                    "bytes": [mm.encode_audio(int(k), 2000, 8000) for k in pdf["id"]],
                }
            )

    clips = (
        spark.range(0, 50, 1, 4)
        .mapInPandas(gen, "audio_id string, bytes binary")
    )
    feats = mm.audio_features(clips)
    seed = F.regexp_extract(F.col("audio_id"), r"a(\d+)", 1).cast("int")
    freq = F.lit(100.0) + (seed % 20).cast("double") * F.lit(50.0)
    return feats.select(
        "audio_id",
        "sample_rate",
        "duration_s",
        (F.abs(F.col("rms") - F.lit(0.357)) <= F.lit(0.02)).alias("rms_ok"),
        (
            (F.col("zero_crossings") >= freq / 2 - F.lit(10.0))
            & (F.col("zero_crossings") <= freq / 2 + F.lit(60.0))
        ).alias("zc_ok"),
        (
            (F.col("peak") >= F.lit(0.5)) & (F.col("peak") <= F.lit(0.8))
        ).alias("peak_ok"),
    )


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over a deterministic synthetic container
    table (multimodal plumbing)."""
    from python_extended_json_schema_validator_spark.pipeline import multimodal as mm
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "video_id": [f"v{int(k)}" for k in pdf["id"]],
                    "bytes": [mm.encode_video(int(k), n_frames=5) for k in pdf["id"]],
                }
            )

    vids = spark.range(0, 20, 1, 4).mapInPandas(gen, "video_id string, bytes binary")
    return mm.sample_frames(vids, every_k=2).select(
        "video_id", "frame_idx", "w", "h"
    )


def q_key_array_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 array-step fan-out: a primary key over an ARRAY member
    keys every element (GenKeyStrings cartesian, reference
    index_check.py:262-293): >1 values wrap each element alone
    (``["w"]``), exactly 1 value keys as the raw atomic literal, and
    an empty/missing array contributes no key.  Pure column algebra
    (transform/flatten/explode) — no UDFs."""
    part = _t(spark, sf_dir, "part").withColumn(
        "name_words", F.split(F.col("p_name"), " ")
    )
    spec = TableSpec(
        name="part", row_id="p_partkey", primary_keys=[KeySpec(("name_words",))]
    )
    res = ValidationEngine([spec]).validate({"part": part})
    return _viol(res)


def q_schema_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 JSON Schema ingestion end-to-end AT SCALE: a real JSON
    Schema document (draft-07, trigger attributes) is compiled by
    schemas.load_schemas, the documents table is serialized to JSON
    rows and SHREDDED back by the distributed mapInPandas shredder
    (docshred.shred_json_strings — Arrow-batched, map-only), and the
    engine validates the shredded table in json-literal mode: enum /
    pattern / minimum checks plus a named unique key whose world only
    sees pass-1 survivors (revocation)."""
    from python_extended_json_schema_validator_spark.docshred import (
        shred_json_strings,
    )
    from python_extended_json_schema_validator_spark.schemas import load_schemas

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "ingest://documents/1.0",
        "type": "object",
        "required": ["doc_id", "text"],
        "unique": {"members": ["source", "lang"], "name": "src_lang"},
        "properties": {
            "doc_id": {"type": "integer"},
            "lang": {"type": "string", "enum": ["en", "es", "fr", "de"]},
            "source": {"type": "string", "pattern": "^src[0-9]$"},
            "n_chars": {"type": "integer", "minimum": 100},
            "text": {"type": "string", "minLength": 10},
        },
    }
    registry, issues = load_schemas([("inline.json", schema)])
    assert not issues, issues
    cs = registry["ingest://documents/1.0"]
    from python_extended_json_schema_validator_spark.parallel import (
        ensure_parallelism,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("file"),
        F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")).alias(
            "json"
        ),
    )
    # the shredder is CPU-bound Python: fan a narrow scan out to
    # cluster parallelism before the Arrow stage (r08 — the sf0.1
    # documents table is one input split, which serialized the whole
    # shred on a single core)
    shredded = shred_json_strings(ensure_parallelism(docs, "file"), cs)
    res = ValidationEngine([cs.table_spec]).validate({cs.uri: shredded})
    return _viol(res)


def q_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift assertion (north star 'value-distribution
    assertions'): per-group normalized max decile shift between a
    CURRENT batch (R-flag prices scaled 1.5×, injecting drift in one
    group) and the BASELINE.  Exact path — every quantile, shift and
    verdict is recomputed bit-for-bit by the DuckDB oracle
    (quantile_cont ⇔ percentile).  The 10^12-row path is the same
    operator with approx=True (t-digest), verdict-tested in
    tests/test_drift.py."""
    li = _t(spark, sf_dir, "lineitem")
    baseline = li.select("l_returnflag", F.col("l_extendedprice").alias("val"))
    current = li.select(
        "l_returnflag",
        (
            F.col("l_extendedprice")
            * F.when(F.col("l_returnflag") == "R", F.lit(1.5)).otherwise(
                F.lit(1.0)
            )
        ).alias("val"),
    )
    return stats_mod.decile_drift(
        current, baseline, ["l_returnflag"], "val", threshold=0.1
    )


def q_combinator_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive combinator + extended-draft-keyword battery AT
    SCALE (⇔ the reference's jsonschema delegation,
    extensible_validator.py:1163-1194): anyOf / oneOf / not /
    property-form dependencies / uniqueItems over a derived array /
    patternProperties leaf checks / combinators INSIDE items
    subschemas (anyOf/oneOf/not/if-then-else compiled per element via
    forall — element_combinators), all over the shredded documents
    table via the distributed mapInPandas shredder.  Presence
    variation for the dependency check comes from conditionally
    omitted JSON fields (to_json drops NULLs)."""
    from python_extended_json_schema_validator_spark.docshred import (
        shred_json_strings,
    )
    from python_extended_json_schema_validator_spark.schemas import load_schemas

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "comb://documents/1.0",
        "type": "object",
        "properties": {
            "n_chars": {
                "anyOf": [
                    {"type": "integer", "minimum": 300},
                    {"type": "integer", "multipleOf": 7},
                ]
            },
            "lang": {
                "oneOf": [
                    {"enum": ["en", "fr"]},
                    {"enum": ["en", "es", "de"]},
                ]
            },
            "text": {"not": {"type": "string", "maxLength": 100}},
            "words": {"type": "array", "uniqueItems": True},
            "meta": {
                "type": "object",
                "patternProperties": {"^n": {"type": "integer", "minimum": 50}},
            },
            # combinators inside items subschemas — per-element forall
            "tok_lens": {"items": {"anyOf": [{"maximum": 4},
                                             {"multipleOf": 5}]}},
            "toks_one": {"items": {"oneOf": [{"maxLength": 3},
                                             {"pattern": "e"}]}},
            "toks_not": {"items": {"not": {"enum": ["the", "and"]}}},
            "toks_ite": {"items": {"if": {"pattern": "^t"},
                                   "then": {"minLength": 3},
                                   "else": {"maxLength": 10}}},
            # array-of-OBJECTS items subschema (round-4 per-element
            # machinery): aligned sub arrays, element required, keys
            # arrays for additionalProperties:false
            "recs": {"items": {
                "type": "object",
                "properties": {"nc": {"type": "integer", "minimum": 200},
                               "lg": {"type": "string"}},
                "required": ["lg"],
                "additionalProperties": False,
            }},
            # round-5 NESTED arrays: scalar + combinator keywords TWO
            # array levels deep ("ngrams[].ls[]") via the flat-filtered
            # leaf collection (docshred.flat_instances)
            "ngrams": {"items": {
                "type": "object",
                "properties": {"ls": {
                    "type": "array",
                    "items": {
                        "type": "integer",
                        "minimum": 2,
                        "anyOf": [{"maximum": 8}, {"multipleOf": 3}],
                    },
                }},
            }},
        },
        "dependencies": {"alt_src": ["alt_lang"]},
    }
    registry, issues = load_schemas([("inline.json", schema)])
    assert not [i for i in issues if i.severity == "error"], issues
    cs = registry["comb://documents/1.0"]
    words = F.slice(F.split(F.col("text"), " "), 1, 4)
    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("file"),
        F.to_json(
            F.struct(
                "n_chars",
                "lang",
                "text",
                words.alias("words"),
                F.transform(words, F.length).alias("tok_lens"),
                words.alias("toks_one"),
                words.alias("toks_not"),
                words.alias("toks_ite"),
                F.array(
                    F.struct(
                        F.col("n_chars").alias("nc"),
                        F.col("lang").alias("lg"),
                        # same struct type as element 2; NULL xt is
                        # dropped by to_json
                        F.lit(None).cast("string").alias("xt"),
                    ),
                    F.struct(
                        (F.col("n_chars") + 1).alias("nc"),
                        # to_json drops NULL fields → element 2 lacks
                        # lg unless n_chars % 4 == 0 (required fires),
                        # and carries an UNDECLARED xt when
                        # n_chars % 5 == 0 (additionalProperties fires)
                        F.when(
                            F.col("n_chars") % 4 == 0, F.col("lang")
                        ).alias("lg"),
                        F.when(
                            F.col("n_chars") % 5 == 0, F.lit("x")
                        ).alias("xt"),
                    ),
                ).alias("recs"),
                F.array(
                    F.struct(
                        F.transform(words, F.length).alias("ls")
                    ),
                    F.struct(
                        F.array(F.col("n_chars") % 12).alias("ls")
                    ),
                ).alias("ngrams"),
                F.struct(F.col("n_chars").alias("nc")).alias("meta"),
                F.when(F.col("n_chars") % 3 == 0, F.col("source")).alias(
                    "alt_src"
                ),
                F.when(F.col("n_chars") % 5 == 0, F.col("lang")).alias(
                    "alt_lang"
                ),
            )
        ).alias("json"),
    )
    from python_extended_json_schema_validator_spark.parallel import (
        ensure_parallelism,
    )

    # fan the single-split scan out before the CPU-bound shred (r08)
    shredded = shred_json_strings(ensure_parallelism(docs, "file"), cs)
    res = ValidationEngine([cs.table_spec]).validate({cs.uri: shredded})
    return res.violations.select("constraint_id", "reason", "row_id")


def q_library_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 library-verdict escape hatch AT SCALE: items.anyOf with
    OBJECT branches is a shape the compiler cannot express (it records
    a schema_warning), so validate_json_table(library_fallback=True)
    routes this schema's documents through the EXACT jsonschema stack
    the reference runs (extensible_validator.py:1163-1194) in one
    Arrow-batched stage.  The oracle predicts jsonschema's per-element
    anyOf verdicts arithmetically from the documents columns — the
    Python stage is being checked end-to-end, not mirrored."""
    from python_extended_json_schema_validator_spark.suite import (
        validate_json_table,
    )

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "libfb://documents/1.0",
        "type": "object",
        "properties": {
            "recs": {
                "type": "array",
                "items": {
                    "anyOf": [
                        {
                            "type": "object",
                            "properties": {
                                "kind": {"const": "num"},
                                "v": {"type": "integer", "minimum": 100},
                            },
                            "required": ["kind", "v"],
                        },
                        {
                            "type": "object",
                            "properties": {
                                "kind": {"const": "txt"},
                                "s": {"type": "string", "minLength": 3},
                            },
                            "required": ["kind", "s"],
                        },
                    ]
                },
            }
        },
    }
    d = _t(spark, sf_dir, "documents")
    # three elements per doc; to_json drops NULL fields, giving the
    # presence variation the `required` legs need:
    #  e0 {kind:num, v:n_chars}       → fails iff n_chars NULL or <100
    #  e1 {kind:txt, s:source|lang}   → fails iff s is the 2-char lang
    #  e2 {kind:num}|{kind:txt,s:src} → fails iff doc_id%5==0 (v absent)
    e0 = F.struct(
        F.lit("num").alias("kind"),
        F.col("n_chars").alias("v"),
        F.lit(None).cast("string").alias("s"),
    )
    e1 = F.struct(
        F.lit("txt").alias("kind"),
        F.lit(None).cast("long").alias("v"),
        F.when(F.col("doc_id") % 2 == 0, F.col("source"))
        .otherwise(F.col("lang"))
        .alias("s"),
    )
    e2 = F.struct(
        F.when(F.col("doc_id") % 5 == 0, F.lit("num"))
        .otherwise(F.lit("txt"))
        .alias("kind"),
        F.lit(None).cast("long").alias("v"),
        F.when(F.col("doc_id") % 5 != 0, F.col("source")).alias("s"),
    )
    docs = d.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("file"),
        F.to_json(
            F.struct(
                F.lit("libfb://documents/1.0").alias("@schema"),
                F.array(e0, e1, e2).alias("recs"),
            )
        ).alias("json"),
    )
    result, registry = validate_json_table(
        spark, [("s.json", schema)], docs, library_fallback=True
    )
    assert registry["libfb://documents/1.0"].warnings  # fallback active
    return result.violations.select(
        "constraint_id", "reason", "row_id", "path"
    )


def q_fk_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped referential check (fk_check.py:405-411 both-sides scope):
    the dim is orders' custkeys keyed PER o_orderpriority scope with
    pass-1 revocation (o_totalprice >= 50000), the fact is the same
    table probing (scope, custkey) — stale exactly when the fact row's
    scope holds no SURVIVING dim row with that custkey."""
    o = _t(spark, sf_dir, "orders")
    specs = [
        TableSpec(
            name="dim_orders",
            row_id="o_orderkey",
            scope_col="o_orderpriority",
            checks=[ColumnCheck(column="o_totalprice", minimum=50000.0)],
            primary_keys=[
                KeySpec(("o_custkey",), name="scoped_cust", limit_scope=True)
            ],
        ),
        TableSpec(
            name="fact_orders",
            row_id="o_orderkey",
            scope_col="o_orderpriority",
            foreign_keys=[
                ForeignKeySpec(
                    ("o_custkey",), ref_table="dim_orders",
                    refers_to="scoped_cust",
                )
            ],
        ),
    ]
    res = ValidationEngine(specs).validate({"dim_orders": o, "fact_orders": o})
    # keep only the referential branch (the dup_pk/check noise of the
    # dim side is covered by other queries)
    return res.ref_viol["fact_orders"].select(*VIOL_COLS)


def q_fk_dangling_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime dangling (fk_check.py:305-317,453-476): the referenced
    table DECLARES a PK but every row is revoked by pass 1 (an
    impossible minimum), so its key world records zero values and all
    FK rows are dangling_fk — not stale."""
    specs = [
        TableSpec(
            name="customer",
            row_id="c_custkey",
            checks=[ColumnCheck(column="c_acctbal", minimum=1.0e12)],
            primary_keys=[KeySpec(("c_custkey",))],
        ),
        TableSpec(
            name="orders",
            row_id="o_orderkey",
            foreign_keys=[ForeignKeySpec(("o_custkey",), ref_table="customer")],
        ),
    ]
    res = ValidationEngine(specs).validate(
        {
            "customer": _t(spark, sf_dir, "customer"),
            "orders": _t(spark, sf_dir, "orders"),
        }
    )
    return res.ref_viol["orders"].select(*VIOL_COLS)


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 large-star/small-star variant
    (dedup.connected_components_star, Kiveris et al. 2014 — the
    deep-graph path) over EXACTLY the q_dedup_components graph: same
    corpus, same ≤1-symmetric-difference edge rule, same recursive-CTE
    oracle — algorithm-independent labels, so both oracle rows share
    one SQL text.  Proves the star rounds' edge-fixpoint labeling
    hash-matches plain propagation under the driver's hard signal."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    edges, ids = _components_graph(spark, sf_dir)
    comp = dedup.connected_components_star(edges, ids, id_col="doc_id")
    return comp.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )


def q_dedup_components_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid default (dedup.connected_components_hybrid): plain
    min-label rounds, then label-quotient contraction + star on the
    residue.  `plain_iters=1` deliberately under-provisions the plain
    phase so BOTH legs execute under the driver's hard signal (one
    propagation round cannot converge on the 3-chains), and the stats
    dict is asserted to prove the star phase really ran — then the
    composed labels must still hash-match the recursive-CTE oracle
    shared with the plain and star rows."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    edges, ids = _components_graph(spark, sf_dir)
    st: dict = {}
    comp = dedup.connected_components_hybrid(
        edges, ids, id_col="doc_id", plain_iters=1, stats=st
    )
    out = comp.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    )
    if st["plain_converged"] or st["star_iterations"] == 0:
        raise AssertionError(
            "hybrid contract query must exercise the contraction+star "
            f"leg; stats={st}"
        )
    return out


def q_stream_stateful_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch duplicate VIOLATIONS via the custom stateful
    streaming operator (streaming.incremental.stateful_dup_violations,
    applyInPandasWithState): orders stream in as one availableNow
    batch, state holds one survivor row_id per o_custkey (min string
    row_id), and every later registration EMITS (key, row_id,
    survivor).  The oracle recomputes the emissions with a window —
    the operator's state discipline (not just dedup survivors) is
    what the hash checks."""
    import tempfile

    from python_extended_json_schema_validator_spark.streaming.incremental import (
        stateful_dup_violations,
    )

    base = _t(spark, sf_dir, "orders").where(
        F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey")
    root = tempfile.mkdtemp(prefix="sdup_q")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    base.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    dups = stateful_dup_violations(stream, "o_custkey", "o_orderkey")
    q = (
        dups.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        "key string, row_id string, survivor string"
    ).parquet(out)


def q_neardup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment NEAR-dup ledger
    (pipeline/incremental_neardup.py): increment 1 (docs < 30)
    records its MinHash band buckets + signatures; increment 2 (the
    ' extra token' mutants) is checked against the LEDGER ONLY — its
    band collisions with prior sketches, verified by the
    signature-component Jaccard estimator.  The oracle recomputes
    both increments' md5 minhash signatures, the banded candidate
    join, and the component-agreement fraction in SQL (the m/8
    estimate is a dyadic rational — bitwise-stable division).
    Increment 1 itself must emit ZERO rows (empty ledger — and the
    materialize-before-append ordering keeps it from colliding with
    itself)."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
        MinHashLedger,
        cross_increment_near_duplicates,
    )

    base = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    inc1 = base.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    inc2 = base.select(
        (F.col("doc_id") + 100000).cast("string").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    led = MinHashLedger(tempfile.mkdtemp(prefix="nd_ledger"), num_hashes=8)
    v1 = cross_increment_near_duplicates(inc1, "doc_id", led, bands=4)
    v2 = cross_increment_near_duplicates(
        inc2, "doc_id", led, bands=4, update=False
    )
    return v1.unionByName(v2).select(
        F.col("doc_new").cast("long").alias("doc_new"),
        F.col("doc_prior").cast("long").alias("doc_prior"),
        F.col("est_jaccard").cast("double").alias("est_jaccard"),
    )


def q_drift_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment distribution drift
    (pipeline/drift_ledger.py): increment 1 (even o_orderkey) records
    its per-priority o_totalprice decile snapshot; increment 2 (odd,
    with 1-URGENT prices doubled — an injected location shift) is
    checked against the LEDGER baseline only.  Exact percentile ⇔
    quantile_cont is bitwise (quantiles_exact oracle), and the shift
    algebra (abs/sub/div/greatest/nullif) is bitwise-stable, so the
    whole ledger path hash-checks.  Increment 1 emits zero rows (no
    baseline yet; verdicts materialize before its snapshot
    appends)."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.drift_ledger import (
        QuantileLedger,
        cross_increment_drift,
    )

    orders = _t(spark, sf_dir, "orders")
    inc1 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0).select(
        "o_orderpriority", "o_totalprice"
    )
    inc2 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1).select(
        "o_orderpriority",
        (
            F.col("o_totalprice")
            * F.when(F.col("o_orderpriority") == "1-URGENT", 2.0).otherwise(
                1.0
            )
        ).alias("o_totalprice"),
    )
    led = QuantileLedger(tempfile.mkdtemp(prefix="drift_led"))
    v1 = cross_increment_drift(
        inc1, led, "orders", "o_totalprice", ["o_orderpriority"]
    )
    v2 = cross_increment_drift(
        inc2, led, "orders", "o_totalprice", ["o_orderpriority"],
        update=False,
    )
    return v1.unionByName(v2)


def _curation_ledger_oracle() -> str:
    """SQL replay of q_curation_ledger: both increments' full chains
    (tokens → normalized-fingerprint exact → md5-minhash near-dup →
    quota windows), with increment 2's history legs reading increment
    1's recorded sets (q1 fingerprints, q2 sketches, kept counts).
    Composed from per-increment CTE blocks — the minhash/band CTEs
    are the proven neardup_ledger oracle pattern."""

    def chain(tag: str, src: str) -> str:
        # per-increment: quality gate, exact leg (within; the history
        # term is spliced in for inc 2), q2, shingles/signatures/bands
        hist_exact = (
            """OR norm IN (SELECT norm FROM q1_1)""" if tag == "2" else ""
        )
        return f"""
        toks_{tag} AS (
          SELECT doc, lang, text,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                 END AS n_toks
          FROM {src}
        ), q1_{tag} AS (
          SELECT *, trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                      AS norm
          FROM toks_{tag} WHERE n_toks >= 30
        ), exact_dropped_{tag} AS (
          SELECT doc FROM (
            SELECT doc, norm,
                   min(doc) OVER (PARTITION BY norm) AS surv
            FROM q1_{tag}
          ) WHERE doc <> surv {hist_exact}
        ), q2_{tag} AS (
          SELECT * FROM q1_{tag}
          WHERE doc NOT IN (SELECT doc FROM exact_dropped_{tag})
        ), sh_{tag} AS (
          SELECT DISTINCT doc,
                 CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                      ELSE array_to_string(t, ' ') END AS shingle
          FROM (SELECT doc,
                       regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM q2_{tag}),
               LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
        ), sig_{tag} AS (
          SELECT doc,
                 min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                 min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                 min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                 min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
          FROM sh_{tag} GROUP BY doc
        ), bands_{tag} AS (
          SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig_{tag}
          UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig_{tag}
          UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig_{tag}
          UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig_{tag}
        )"""

    est = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(8)
    )

    def tail(tag: str, nd_hist: str, quota_expr: str) -> str:
        # near-dup drop set (within + optional history), q3, quota
        return f"""
        , within_nd_{tag} AS (
          SELECT DISTINCT p.doc_b AS doc
          FROM (SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
                FROM bands_{tag} x JOIN bands_{tag} y
                  ON x.band = y.band AND x.bucket = y.bucket
                 AND x.doc < y.doc) p
          JOIN sig_{tag} a ON a.doc = p.doc_a
          JOIN sig_{tag} b ON b.doc = p.doc_b
          WHERE ({est}) / 8.0 >= 0.5
        ), nd_dropped_{tag} AS (
          SELECT doc FROM within_nd_{tag} {nd_hist}
        ), q3_{tag} AS (
          SELECT doc, lang, length(text) AS n_chars
          FROM q2_{tag}
          WHERE doc NOT IN (SELECT doc FROM nd_dropped_{tag})
        ), kept_{tag} AS (
          SELECT doc FROM (
            SELECT doc, lang,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY n_chars DESC, doc ASC
                   ) AS rn
            FROM q3_{tag}
          ) r
          WHERE rn <= {quota_expr}
        ), statuses_{tag} AS (
          SELECT doc, 'quality' AS status FROM toks_{tag} WHERE n_toks < 30
          UNION ALL SELECT doc, 'exact_dup' FROM exact_dropped_{tag}
          UNION ALL SELECT doc, 'near_dup' FROM nd_dropped_{tag}
          UNION ALL SELECT doc, 'kept' FROM kept_{tag}
        )"""

    nd_hist_2 = f"""
          UNION
          SELECT DISTINCT c.doc_a AS doc
          FROM (SELECT DISTINCT n.doc AS doc_a, p.doc AS doc_b
                FROM bands_2 n JOIN bands_1 p
                  ON n.band = p.band AND n.bucket = p.bucket) c
          JOIN sig_2 a ON a.doc = c.doc_a
          JOIN sig_1 b ON b.doc = c.doc_b
          WHERE ({est}) / 8.0 >= 0.5"""
    quota_2 = (
        "5 - COALESCE((SELECT count(*) FROM kept_1 k "
        "JOIN q3_1 q ON q.doc = k.doc WHERE q.lang = r.lang), 0)"
    )

    return f"""
        WITH inc1 AS (
          SELECT CAST(doc_id AS VARCHAR) AS doc, text, lang
          FROM documents WHERE doc_id < 60
        ), inc2 AS (
          SELECT CAST(doc_id + 100000 AS VARCHAR) AS doc,
                 text || ' extra token' AS text, lang
          FROM documents WHERE doc_id < 30
          UNION ALL
          SELECT CAST(doc_id + 200000 AS VARCHAR), text, lang
          FROM documents WHERE doc_id >= 30 AND doc_id < 45
          UNION ALL
          SELECT CAST(doc_id + 400000 AS VARCHAR), text, lang
          FROM documents WHERE doc_id >= 60 AND doc_id < 90
        ), {chain("1", "inc1")} {tail("1", "", "5")},
        {chain("2", "inc2")} {tail("2", nd_hist_2, quota_2)}
        SELECT 1 AS inc, i.doc, i.lang,
               COALESCE(s.status, 'quota') AS status
        FROM inc1 i LEFT JOIN statuses_1 s ON s.doc = i.doc
        UNION ALL
        SELECT 2, i.doc, i.lang, COALESCE(s.status, 'quota')
        FROM inc2 i LEFT JOIN statuses_2 s ON s.doc = i.doc
    """


def _drift_ledger_oracle() -> str:
    probs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    lbl = lambda p: f"p{int(round(p * 100))}"  # noqa: E731
    bq = ", ".join(
        f"quantile_cont(o_totalprice, {p}) AS b_{lbl(p)}" for p in probs
    )
    inj = (
        "CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice * 2.0 "
        "ELSE o_totalprice END"
    )
    cq = ", ".join(f"quantile_cont({inj}, {p}) AS c_{lbl(p)}" for p in probs)
    shifts = ", ".join(
        f"abs(c_{lbl(p)} - b_{lbl(p)}) / NULLIF(b_p90 - b_p10, 0.0)"
        for p in probs
    )
    return f"""
        WITH b AS (
          SELECT o_orderpriority AS g, {bq}
          FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
        ), c AS (
          SELECT o_orderpriority AS g, {cq}
          FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
        ), j AS (
          SELECT c.g, greatest({shifts}) AS shift
          FROM c JOIN b ON b.g = c.g
        )
        SELECT g AS o_orderpriority, shift, shift > 0.1 AS drifted FROM j
    """


def q_resume_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed resume (manifest.PartitionManifest): increment 1
    validates partitions 0-3 of customer (part = c_custkey % 8) and
    records them 'ok'; partitions 2-3 are then re-recorded 'failed';
    increment 2 resumes over the FULL table and — via the latest-wins
    completed set + broadcast LEFT ANTI pending filter — must validate
    EXACTLY partitions 2-7.  Returns the manifest lineage (partition,
    seq, metrics, status): the oracle predicts every row from the base
    table alone, so a resume filter that re-validates a completed
    partition (or skips a failed one) breaks seq-3's row set, and
    wrong per-partition metrics break the hash.

    North-rule surface: "resumable from a checkpointed manifest of
    completed partitions with per-partition lineage and metrics"."""
    import tempfile

    from python_extended_json_schema_validator_spark.manifest import (
        PartitionManifest,
        partition_metrics,
    )

    base = _t(spark, sf_dir, "customer").withColumn(
        "part", F.pmod(F.col("c_custkey"), F.lit(8)).cast("string")
    )
    spec = TableSpec(
        name="customer",
        row_id="c_custkey",
        checks=[ColumnCheck(column="c_acctbal", minimum=0.0)],
        primary_keys=[KeySpec(("c_custkey",))],
    )
    man = PartitionManifest(tempfile.mkdtemp(prefix="manifest_q"))

    def run(df: DataFrame) -> DataFrame:
        res = ValidationEngine([spec]).validate({"customer": df})
        return partition_metrics(df, res.violations, "c_custkey", "part")

    inc1 = base.where(F.col("part").isin("0", "1", "2", "3"))
    m1 = run(inc1)
    man.record(m1, run_id="inc1")  # seq 1: 0-3 ok
    # partitions 2-3 flagged bad after the fact (latest-wins probe)
    man.record(
        m1.where(F.col("partition").isin("2", "3")),
        run_id="redo",
        status="failed",
    )  # seq 2
    pending = man.filter_pending(base, "part")  # must be parts 2-7
    man.record(run(pending), run_id="inc2")  # seq 3
    return man.read(spark).select(
        "partition", "seq", "n_rows", "n_failed", "n_violations", "status"
    )


def q_ledger_increments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment uniqueness (manifest.KeyLedger): increment 1
    (even o_orderkey) registers its pass-1 survivors' unique(o_custkey)
    keys in the persistent ledger; increment 2 (odd o_orderkey) is
    checked against the ledger — its survivors whose key a PRIOR
    increment holds are dup_unique.  The oracle recomputes increment
    2's verdicts as a semi-join against increment 1's surviving key
    set; rows failing pass 1 (o_totalprice < 5000) neither register
    nor flag, mirroring the engine's revocation semantics
    (cross_increment_dup_violations materializes violations BEFORE the
    ledger append — self-collision would add even-row dups and break
    the hash)."""
    import tempfile

    from python_extended_json_schema_validator_spark.manifest import (
        KeyLedger,
        cross_increment_dup_violations,
    )

    orders = _t(spark, sf_dir, "orders")
    spec = TableSpec(
        name="orders",
        row_id="o_orderkey",
        checks=[ColumnCheck(column="o_totalprice", minimum=5000.0)],
        unique=[KeySpec(("o_custkey",))],
    )
    led = KeyLedger(tempfile.mkdtemp(prefix="ledger_q"))
    inc1 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
    inc2 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)
    v1 = cross_increment_dup_violations(inc1, spec, led)  # registers keys
    v2 = cross_increment_dup_violations(inc2, spec, led, update=False)
    return v1.unionByName(v2).select(*VIOL_COLS)


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-increment cardinality screen (pipeline.cardinality_ledger
    .HllLedger — the 4th increment-ledger family): increment 1 (even
    o_orderkey) records per-priority HLL sketches of o_custkey;
    increment 2 (odd) is screened by sketch UNION — no join against
    increment 1's rows.  ε-bounded contract (same pattern as
    tdigest_quantiles/ann_ivf): exact companions the oracle recomputes
    (COUNT DISTINCT per increment / cumulative / novel) plus Spark-side
    booleans asserting every HLL estimate lands within 5% of exact
    (lgConfigK=12 → ~1.6% RSE; measured ≤1.5% at these ~1.3k-distinct
    groups) and the collapse verdict — which the oracle derives from
    EXACT novelty, valid because measured novelty ≈ 0.22 sits far from
    the 0.5 threshold relative to the sketch error.  Sketch drift or
    a broken union breaks a boolean and the hash."""
    import tempfile

    from python_extended_json_schema_validator_spark.pipeline.cardinality_ledger import (
        HllLedger,
        cross_increment_cardinality,
        record_sketches,
    )

    orders = _t(spark, sf_dir, "orders")
    grp = "o_orderpriority"
    led = HllLedger(tempfile.mkdtemp(prefix="hll_q"))
    inc1 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 0)
    inc2 = orders.where(F.pmod(F.col("o_orderkey"), F.lit(2)) == 1)
    record_sketches(inc1, led, "orders", "o_custkey", [grp])
    scr = cross_increment_cardinality(
        inc2, led, "orders", "o_custkey", [grp], update=False
    )
    ex2 = inc2.groupBy(grp).agg(
        F.countDistinct("o_custkey").alias("exact_inc")
    )
    ex1 = inc1.groupBy(grp).agg(
        F.countDistinct("o_custkey").alias("exact_before")
    )
    exa = orders.groupBy(grp).agg(
        F.countDistinct("o_custkey").alias("exact_after")
    )
    j = scr.join(ex2, grp).join(ex1, grp).join(exa, grp)

    def _ok(est, exact, rel):
        return (
            F.abs(F.col(est) - F.col(exact)) <= rel * F.col(exact)
        )

    return j.select(
        grp,
        "n_rows",
        "exact_inc",
        "exact_before",
        "exact_after",
        (F.col("exact_after") - F.col("exact_before")).alias("exact_novel"),
        _ok("est_distinct_inc", "exact_inc", 0.05).alias("inc_ok"),
        _ok("est_before", "exact_before", 0.05).alias("before_ok"),
        _ok("est_after", "exact_after", 0.05).alias("after_ok"),
        (
            F.abs(
                F.col("est_novel")
                - (F.col("exact_after") - F.col("exact_before"))
            )
            <= 0.05 * F.col("exact_after")
        ).alias("novel_ok"),
        "collapsed",
    )


def q_stream_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental validation over Structured Streaming
    (streaming.incremental.validate_stream_foreach_batch): increment 1
    (c_custkey % 3 != 0) lands as a parquet file and is validated by an
    availableNow foreachBatch run (batch 0); increment 2 lands after
    the first run terminates and a SECOND run over the same checkpoint
    must process ONLY the new file (batch 1).  The oracle derives each
    violation's batch_id from increment membership — a broken
    checkpoint resume that re-validates increment 1 duplicates batch-0
    rows under batch 1 and breaks rows+hash."""
    import tempfile

    from python_extended_json_schema_validator_spark.streaming.incremental import (
        validate_stream_foreach_batch,
    )

    base = _t(spark, sf_dir, "customer")
    root = tempfile.mkdtemp(prefix="stream_q")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"
    spec = TableSpec(
        name="customer",
        row_id="c_custkey",
        checks=[ColumnCheck(column="c_acctbal", minimum=0.0)],
    )
    inc1 = base.where(F.pmod(F.col("c_custkey"), F.lit(3)) != 0)
    inc2 = base.where(F.pmod(F.col("c_custkey"), F.lit(3)) == 0)
    for inc in (inc1, inc2):
        inc.coalesce(1).write.mode("append").parquet(src)
        q = validate_stream_foreach_batch(
            spark.readStream.schema(base.schema).parquet(src),
            spec,
            sink,
            ckpt,
        )
        q.awaitTermination()
    return spark.read.parquet(sink).select(*VIOL_COLS, "batch_id")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the revocation + referential pipeline at sf0.001."""
    return q_fk_revocation(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_checks": q_row_checks,
        "unique_atomic": q_unique_atomic,
        "pk_compound": q_pk_compound,
        "fk_revocation": q_fk_revocation,
        "fk_clean": q_fk_clean,
        "jk_index": q_jk_index,
        "limit_scope": q_limit_scope,
        "missing_member": q_missing_member,
        "dangling_jk": q_dangling_jk,
        "provider_inline": q_provider_inline,
        # round 7: S8 under the hard signal — loopback HTTP fetch with
        # Accept / newline-split / failure-skip semantics observable
        "provider_remote": q_provider_remote,
        "partition_verdicts": q_partition_verdicts,
        "image_suite": q_image_suite,
        "stats_profile": q_stats_profile,
        "text_stats": q_text_stats,
        "repetition_stats": q_repetition_stats,
        "lang_id": q_lang_id,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_survivors": q_dedup_survivors,
        "dedup_simhash": q_dedup_simhash,
        "embed_topk": q_embed_topk,
        "embed_neardup": q_embed_neardup,
        "embed_survivors": q_embed_survivors,
        "dispatch": q_dispatch,
        "events_json": q_events_json,
        "quantiles_exact": q_quantiles_exact,
        "salted_counts": q_salted_counts,
        "simhash_pairs": q_simhash_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_components": q_dedup_components,
        "sample_quota": q_sample_quota,
        "quality_topn": q_quality_topn,
        "key_array_fanout": q_key_array_fanout,
        "schema_ingest": q_schema_ingest,
        "library_fallback": q_library_fallback,
        "fk_scoped": q_fk_scoped,
        "fk_dangling_runtime": q_fk_dangling_runtime,
        "ann_lsh": q_ann_lsh,
        "combinator_checks": q_combinator_checks,
        "drift_check": q_drift_check,
        "image_drift": q_image_drift,
        # contract-bounded approximates: the oracle hash-validates the
        # EXACT companion columns plus an always-true accuracy verdict
        # the Spark side computes (recall@5 ≥ 0.6 / |td−exact| ≤ 1%·range)
        "ann_ivf": q_ann_ivf,
        "tdigest_quantiles": q_tdigest_quantiles,
        # synthetic-codec queries, oracle-backed since round 4: the
        # deterministic containers make frame geometry exactly
        # SQL-recomputable, and audio features follow the contract
        # pattern (exact companions + always-true accuracy verdicts)
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        # round 6: resume / cross-increment / streaming surfaces —
        # the last first-class components without an oracle row
        "resume_manifest": q_resume_manifest,
        "ledger_increments": q_ledger_increments,
        "hll_cardinality": q_hll_cardinality,
        "stream_incremental": q_stream_incremental,
        "dedup_components_star": q_dedup_components_star,
        "dedup_components_hybrid": q_dedup_components_hybrid,
        "stream_stateful_dups": q_stream_stateful_dups,
        "neardup_ledger": q_neardup_ledger,
        "drift_ledger": q_drift_ledger,
        # round 6 continued: the perceptual-hash leg — declared-vs-
        # recomputed DCT pHash, banded visual near-dup pairs, and the
        # survivors tail on the image modality
        "phash_check": q_phash_check,
        "phash_neardup": q_phash_neardup,
        "phash_survivors": q_phash_survivors,
        "phash_ledger": q_phash_ledger,
        "corpus_curation": q_corpus_curation,
        "stream_visual_dups": q_stream_visual_dups,
        "audio_neardup": q_audio_neardup,
        "video_neardup": q_video_neardup,
        # round 7: the audio/video LEDGER families (cross-increment
        # twins of audio_neardup/video_neardup, same machinery as
        # phash_ledger) + the remote PK provider above
        "audio_ledger": q_audio_ledger,
        "video_ledger": q_video_ledger,
        "embedding_ledger": q_embedding_ledger,
        "curation_ledger": q_curation_ledger,
        "stream_audio_dups": q_stream_audio_dups,
    }


LI_ID = "CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)"


def oracle_sql() -> dict[str, str]:
    d = {
        # perceptual-hash leg: every verdict is arithmetic on the
        # synth.neardup_images_from_keys injection rules (keys =
        # p_partkey) — the engine must decode + DCT-hash real bytes
        # to reproduce sets the oracle derives without decoding
        "phash_check": """
            SELECT 'payload:phash' AS constraint_id, 'phash' AS reason,
                   'img' || lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS row_id
            FROM part WHERE p_partkey % 13 = 6
        """,
        "phash_neardup": """
            SELECT 'img' || lpad(CAST(p_partkey - 1 AS VARCHAR), 8, '0') AS doc_a,
                   'img' || lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS doc_b
            FROM part WHERE p_partkey % 7 = 3 AND p_partkey >= 3
        """,
        "phash_survivors": """
            SELECT CAST(p_partkey AS BIGINT) AS img_k,
                   CAST(CASE WHEN p_partkey % 7 = 3 AND p_partkey >= 3
                        THEN p_partkey - 1 ELSE p_partkey END AS BIGINT) AS component,
                   NOT (p_partkey % 7 = 3 AND p_partkey >= 3) AS is_survivor
            FROM part
        """,
        # the full curation build replayed stage by stage: quality
        # gate, normalized exact dedup, the minhash chain (same CTEs
        # as dedup_survivors, over the POST-exact corpus), per-lang
        # quota — terminal status per corpus doc
        "corpus_curation": """
            WITH RECURSIVE corpus AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token', lang
              FROM documents WHERE doc_id < 30
              UNION ALL
              SELECT doc_id + 200000, text, lang
              FROM documents WHERE doc_id >= 30 AND doc_id < 45
            ), toks0 AS (
              SELECT doc_id, lang, text,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS n_toks
              FROM corpus
            ), q1 AS (
              SELECT * FROM toks0 WHERE n_toks >= 30
            ), exact_grp AS (
              SELECT doc_id,
                     min(doc_id) OVER (
                       PARTITION BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                     ) AS surv
              FROM q1
            ), exact_dups AS (
              SELECT doc_id FROM exact_grp WHERE doc_id <> surv
            ), q2 AS (
              SELECT * FROM q1
              WHERE doc_id NOT IN (SELECT doc_id FROM exact_dups)
            ), toks AS (
              SELECT doc_id AS doc,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM q2
            ), sh AS (
              SELECT DISTINCT doc,
                     CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                          ELSE array_to_string(t, ' ') END AS shingle
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
            ), sig AS (
              SELECT doc,
                     min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                     min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                     min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                     min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
              FROM sh GROUP BY doc
            ), bands AS (
              SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig
              UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig
            ), cand AS (
              SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
            ), sizes AS (
              SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
            ), inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS i
              FROM cand p
              JOIN sh sa ON sa.doc = p.doc_a
              JOIN sh sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY p.doc_a, p.doc_b
            ), und AS (
              SELECT p.doc_a, p.doc_b
              FROM cand p
              LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
              JOIN sizes za ON za.doc = p.doc_a
              JOIN sizes zb ON zb.doc = p.doc_b
              WHERE COALESCE(i.i, 0) * 1.0 / (za.sz + zb.sz - COALESCE(i.i, 0)) >= 0.5
            ), edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM und
              UNION ALL
              SELECT doc_b, doc_a FROM und
            ), walk AS (
              SELECT doc AS id, doc AS label FROM toks
              UNION
              SELECT e.dst, w.label
              FROM walk w JOIN edges e ON e.src = w.id
            ), comp AS (
              SELECT id, min(label) AS component FROM walk GROUP BY id
            ), near_dups AS (
              SELECT id AS doc_id FROM comp WHERE id <> component
            ), q3 AS (
              SELECT q2.doc_id, q2.lang, length(q2.text) AS n_chars
              FROM q2
              WHERE q2.doc_id NOT IN (SELECT doc_id FROM near_dups)
            ), ranked AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC
                     ) AS rn
              FROM q3
            ), kept AS (
              SELECT doc_id FROM ranked WHERE rn <= 5
            )
            SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.lang,
                   CASE WHEN t.n_toks < 30 THEN 'quality'
                        WHEN c.doc_id IN (SELECT doc_id FROM exact_dups) THEN 'exact_dup'
                        WHEN c.doc_id IN (SELECT doc_id FROM near_dups) THEN 'near_dup'
                        WHEN c.doc_id IN (SELECT doc_id FROM kept) THEN 'kept'
                        ELSE 'quota' END AS status
            FROM corpus c JOIN toks0 t ON t.doc_id = c.doc_id
        """,
        "audio_neardup": """
            SELECT 'aud' || lpad(CAST(p_partkey - 1 AS VARCHAR), 8, '0') AS doc_a,
                   'aud' || lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS doc_b
            FROM part WHERE p_partkey % 7 = 3 AND p_partkey >= 3
        """,
        "video_neardup": """
            SELECT 'vid' || lpad(CAST(p_partkey - 1 AS VARCHAR), 8, '0') AS video_a,
                   'vid' || lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS video_b,
                   CAST(3 + ((p_partkey - 1) % 3) AS BIGINT) AS shared_frames
            FROM part WHERE p_partkey % 7 = 3 AND p_partkey >= 3
        """,
        # streaming emissions across the two batches: batch-1 in-corpus
        # pairs, then batch-2 in-increment pairs + twins + both flanks
        # against batch-1 state (checkpoint resume must not re-emit)
        "stream_visual_dups": """
            WITH ks AS (SELECT p_partkey AS k FROM part)
            SELECT 'img' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_new,
                   'img' || lpad(CAST(k - 1 AS VARCHAR), 8, '0') AS doc_prior
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'reimg' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'img' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'img' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   'img' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
        """,
        # round 7: streaming audio mirror — identical 5-union shape
        # under the 'aud' prefix (in-batch pairs both batches, twins,
        # both flanks vs batch 1's state)
        "stream_audio_dups": """
            WITH ks AS (SELECT p_partkey AS k FROM part)
            SELECT 'aud' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_new,
                   'aud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0') AS doc_prior
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'reaud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'aud' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'aud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   'aud' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
        """,
        # full re-send increment vs the ledger: twin hits for every
        # row, plus both flanks of each injected near-dup pair
        "phash_ledger": """
            WITH ks AS (SELECT p_partkey AS k FROM part)
            SELECT 'reimg' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_new,
                   'img' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_prior
            FROM ks
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'img' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reimg' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   'img' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
        """,
        # round 7: the audio ledger's pair arithmetic is the same
        # twin + flank set as phash_ledger under the 'aud' prefix
        # (re-sent content → hamming 0; chord reuse → both flanks)
        "audio_ledger": """
            WITH ks AS (SELECT p_partkey AS k FROM part)
            SELECT 'reaud' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_new,
                   'aud' || lpad(CAST(k AS VARCHAR), 8, '0') AS doc_prior
            FROM ks
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'aud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'reaud' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   'aud' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM ks WHERE k % 7 = 3 AND k >= 3
        """,
        # round 7: video ledger — same pair set under 'vid', plus the
        # exact vote: shared_frames = the SOURCE's frame count
        # 3 + (k' % 3), k' = k-1 on near-dup rows (k % 7 = 3)
        "video_ledger": """
            WITH ks AS (SELECT p_partkey AS k FROM part)
            SELECT 'revid' || lpad(CAST(k AS VARCHAR), 8, '0') AS video_new,
                   'vid' || lpad(CAST(k AS VARCHAR), 8, '0') AS video_prior,
                   CAST(3 + ((CASE WHEN k % 7 = 3 AND k >= 3
                                   THEN k - 1 ELSE k END) % 3) AS BIGINT)
                     AS shared_frames
            FROM ks
            UNION ALL
            SELECT 'revid' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   'vid' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   CAST(3 + ((k - 1) % 3) AS BIGINT)
            FROM ks WHERE k % 7 = 3 AND k >= 3
            UNION ALL
            SELECT 'revid' || lpad(CAST(k - 1 AS VARCHAR), 8, '0'),
                   'vid' || lpad(CAST(k AS VARCHAR), 8, '0'),
                   CAST(3 + ((k - 1) % 3) AS BIGINT)
            FROM ks WHERE k % 7 = 3 AND k >= 3
        """,
        # round 7: embedding ledger — re-sent vectors (vec_id < 20,
        # +100000) hit their twin (cos 1.0) plus every cos ≥ 0.95
        # corpus neighbor (the embed_neardup contract regime: LSH
        # candidate recall is total on this corpus, verification
        # exact, so the arithmetic pair set is the found set)
        "embedding_ledger": """
            SELECT CAST(a.vec_id + 100000 AS BIGINT) AS doc_new,
                   CAST(b.vec_id AS BIGINT) AS doc_prior
            FROM embeddings a JOIN embeddings b
              ON list_cosine_similarity(a.embedding, b.embedding) >= 0.95
            WHERE a.vec_id < 20
        """,
        "ann_lsh": _ann_lsh_oracle(),
        # round 6: the stateful streaming dedup operator's emissions —
        # every non-survivor registration, survivor = min string
        # row_id per key (single availableNow batch => one state pass)
        "stream_stateful_dups": """
            SELECT CAST(o_custkey AS VARCHAR) AS key,
                   CAST(o_orderkey AS VARCHAR) AS row_id,
                   mn AS survivor
            FROM (
              SELECT o_orderkey, o_custkey,
                     MIN(CAST(o_orderkey AS VARCHAR))
                       OVER (PARTITION BY o_custkey) AS mn
              FROM orders WHERE o_custkey IS NOT NULL
            ) WHERE CAST(o_orderkey AS VARCHAR) <> mn
        """,
        # round 6: resume lineage — every manifest row predicted from
        # the base table (seq 1: partitions 0-3 ok; seq 2: 2-3 failed;
        # seq 3: latest-wins pending set = 2-7 re/first-validated)
        "resume_manifest": """
            WITH agg AS (
              SELECT CAST(c_custkey % 8 AS VARCHAR) AS "partition",
                     COUNT(*) AS n_rows,
                     COUNT(CASE WHEN c_acctbal IS NOT NULL
                                 AND NOT (c_acctbal >= 0.0) THEN 1 END)
                       AS n_failed,
                     COUNT(CASE WHEN c_acctbal IS NOT NULL
                                 AND NOT (c_acctbal >= 0.0) THEN 1 END)
                       AS n_violations
              FROM customer GROUP BY 1
            )
            SELECT "partition", CAST(1 AS BIGINT) AS seq, n_rows,
                   n_failed, n_violations, 'ok' AS status
            FROM agg WHERE "partition" IN ('0','1','2','3')
            UNION ALL
            SELECT "partition", CAST(2 AS BIGINT), n_rows, n_failed,
                   n_violations, 'failed'
            FROM agg WHERE "partition" IN ('2','3')
            UNION ALL
            SELECT "partition", CAST(3 AS BIGINT), n_rows, n_failed,
                   n_violations, 'ok'
            FROM agg WHERE "partition" IN ('2','3','4','5','6','7')
        """,
        # round 6: increment 2's dup verdicts against increment 1's
        # REGISTERED (surviving) keys, recomputed as a semi-join
        "ledger_increments": """
            SELECT 'unique:o_custkey' AS constraint_id,
                   'dup_unique' AS reason,
                   CAST(o_orderkey AS VARCHAR) AS row_id,
                   CAST(o_custkey AS VARCHAR) AS observed_value
            FROM orders o2
            WHERE o_orderkey % 2 = 1 AND o_custkey IS NOT NULL
              AND (o_totalprice IS NULL OR o_totalprice >= 5000.0)
              AND EXISTS (
                SELECT 1 FROM orders o1
                WHERE o1.o_orderkey % 2 = 0
                  AND o1.o_custkey = o2.o_custkey
                  AND (o1.o_totalprice IS NULL
                       OR o1.o_totalprice >= 5000.0)
              )
        """,
        # round 6: the HLL cardinality screen's exact companions —
        # per-priority COUNT DISTINCT for the increment, the prior
        # baseline, and their union; verdict booleans asserted TRUE
        # (Spark computes them against its own sketch estimates) and
        # the collapse flag derived from EXACT novelty (measured est
        # error ≤1.5% can't bridge the 0.22-vs-0.5 gap)
        "hll_cardinality": """
            WITH e2 AS (
              SELECT o_orderpriority, COUNT(*) AS n_rows,
                     COUNT(DISTINCT o_custkey) AS exact_inc
              FROM orders WHERE o_orderkey % 2 = 1
              GROUP BY o_orderpriority
            ), e1 AS (
              SELECT o_orderpriority,
                     COUNT(DISTINCT o_custkey) AS exact_before
              FROM orders WHERE o_orderkey % 2 = 0
              GROUP BY o_orderpriority
            ), ea AS (
              SELECT o_orderpriority,
                     COUNT(DISTINCT o_custkey) AS exact_after
              FROM orders GROUP BY o_orderpriority
            )
            SELECT e2.o_orderpriority, e2.n_rows, e2.exact_inc,
                   e1.exact_before, ea.exact_after,
                   ea.exact_after - e1.exact_before AS exact_novel,
                   TRUE AS inc_ok, TRUE AS before_ok,
                   TRUE AS after_ok, TRUE AS novel_ok,
                   (CAST(ea.exact_after - e1.exact_before AS DOUBLE)
                    / e2.n_rows) < 0.5 AS collapsed
            FROM e2
            JOIN e1 USING (o_orderpriority)
            JOIN ea USING (o_orderpriority)
        """,
        # round 6: each violation's batch_id follows increment
        # membership — checkpoint re-processing would duplicate rows
        "stream_incremental": """
            SELECT 'check:c_acctbal:minimum' AS constraint_id,
                   'minimum' AS reason,
                   CAST(c_custkey AS VARCHAR) AS row_id,
                   CAST(c_acctbal AS VARCHAR) AS observed_value,
                   CAST(CASE WHEN c_custkey % 3 <> 0 THEN 0 ELSE 1 END
                        AS INTEGER) AS batch_id
            FROM customer
            WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal >= 0.0)
        """,
        "combinator_checks": """
            WITH d AS (
              SELECT 'doc-' || doc_id AS rid, n_chars, lang, text,
                     list_slice(string_split(text, ' '), 1, 4) AS words,
                     (n_chars % 3 = 0) AS has_alt_src,
                     (n_chars % 5 = 0) AS has_alt_lang
              FROM documents
            )
            SELECT 'check:n_chars:anyOf' AS constraint_id,
                   'anyOf' AS reason, rid AS row_id
            FROM d WHERE NOT (n_chars >= 300 OR n_chars % 7 = 0)
            UNION ALL
            SELECT 'check:lang:oneOf', 'oneOf', rid
            FROM d WHERE (CASE WHEN lang IN ('en','fr') THEN 1 ELSE 0 END
                        + CASE WHEN lang IN ('en','es','de') THEN 1 ELSE 0 END)
                       <> 1
            UNION ALL
            SELECT 'check:text:not', 'not', rid
            FROM d WHERE LENGTH(text) <= 100
            UNION ALL
            SELECT 'check:alt_lang:dependencies', 'dependencies', rid
            FROM d WHERE has_alt_src AND NOT has_alt_lang
            UNION ALL
            SELECT 'check:words[]:uniqueItems', 'uniqueItems', rid
            FROM d WHERE len(list_distinct(words)) < len(words)
            UNION ALL
            SELECT 'check:meta#entries:minimum', 'minimum', rid
            FROM d WHERE NOT (n_chars >= 50)
            UNION ALL
            SELECT 'check:tok_lens[]:anyOf', 'anyOf', rid
            FROM d WHERE len(list_filter(
                list_transform(words, w -> length(w)),
                x -> NOT (x <= 4 OR x % 5 = 0))) > 0
            UNION ALL
            SELECT 'check:toks_one[]:oneOf', 'oneOf', rid
            FROM d WHERE len(list_filter(words, w ->
                (CASE WHEN length(w) <= 3 THEN 1 ELSE 0 END
                 + CASE WHEN regexp_matches(w, 'e') THEN 1 ELSE 0 END)
                <> 1)) > 0
            UNION ALL
            SELECT 'check:toks_not[]:not', 'not', rid
            FROM d WHERE len(list_filter(words, w ->
                w IN ('the', 'and'))) > 0
            UNION ALL
            SELECT 'check:toks_ite[]:minLength', 'minLength', rid
            FROM d WHERE len(list_filter(words, w ->
                regexp_matches(w, '^t') AND length(w) < 3)) > 0
            UNION ALL
            SELECT 'check:toks_ite[]:maxLength', 'maxLength', rid
            FROM d WHERE len(list_filter(words, w ->
                NOT regexp_matches(w, '^t') AND length(w) > 10)) > 0
            UNION ALL
            SELECT 'check:recs[].nc:minimum', 'minimum', rid
            FROM d WHERE n_chars < 200
            UNION ALL
            SELECT 'check:recs[].lg:required', 'required', rid
            FROM d WHERE n_chars % 4 <> 0
            UNION ALL
            SELECT 'check:recs[]#keys:additionalProperties',
                   'additionalProperties', rid
            FROM d WHERE n_chars % 5 = 0
            UNION ALL
            SELECT 'check:ngrams[].ls[]:minimum', 'minimum', rid
            FROM d WHERE len(list_filter(
                list_append(list_transform(words, w -> length(w)),
                            n_chars % 12),
                x -> x < 2)) > 0
            UNION ALL
            SELECT 'check:ngrams[].ls[]:anyOf', 'anyOf', rid
            FROM d WHERE len(list_filter(
                list_append(list_transform(words, w -> length(w)),
                            n_chars % 12),
                x -> NOT (x <= 8 OR x % 3 = 0))) > 0
        """,
        "drift_check": """
            WITH cur AS (
              SELECT l_returnflag,
                     l_extendedprice
                       * (CASE WHEN l_returnflag = 'R' THEN 1.5 ELSE 1.0 END)
                       AS val
              FROM lineitem
            ),
            base AS (
              SELECT l_returnflag, l_extendedprice AS val FROM lineitem
            ),
            qc AS (
              SELECT l_returnflag,
                     quantile_cont(val, 0.1) AS c10, quantile_cont(val, 0.2) AS c20,
                     quantile_cont(val, 0.3) AS c30, quantile_cont(val, 0.4) AS c40,
                     quantile_cont(val, 0.5) AS c50, quantile_cont(val, 0.6) AS c60,
                     quantile_cont(val, 0.7) AS c70, quantile_cont(val, 0.8) AS c80,
                     quantile_cont(val, 0.9) AS c90
              FROM cur GROUP BY l_returnflag
            ),
            qb AS (
              SELECT l_returnflag,
                     quantile_cont(val, 0.1) AS b10, quantile_cont(val, 0.2) AS b20,
                     quantile_cont(val, 0.3) AS b30, quantile_cont(val, 0.4) AS b40,
                     quantile_cont(val, 0.5) AS b50, quantile_cont(val, 0.6) AS b60,
                     quantile_cont(val, 0.7) AS b70, quantile_cont(val, 0.8) AS b80,
                     quantile_cont(val, 0.9) AS b90
              FROM base GROUP BY l_returnflag
            ),
            j AS (
              SELECT qc.l_returnflag AS l_returnflag,
                     greatest(
                       abs(c10 - b10) / nullif(b90 - b10, 0.0),
                       abs(c20 - b20) / nullif(b90 - b10, 0.0),
                       abs(c30 - b30) / nullif(b90 - b10, 0.0),
                       abs(c40 - b40) / nullif(b90 - b10, 0.0),
                       abs(c50 - b50) / nullif(b90 - b10, 0.0),
                       abs(c60 - b60) / nullif(b90 - b10, 0.0),
                       abs(c70 - b70) / nullif(b90 - b10, 0.0),
                       abs(c80 - b80) / nullif(b90 - b10, 0.0),
                       abs(c90 - b90) / nullif(b90 - b10, 0.0)
                     ) AS shift
              FROM qc JOIN qb USING (l_returnflag)
            )
            SELECT l_returnflag, shift, shift > 0.1 AS drifted FROM j
        """,
        "image_drift": """
            WITH img AS (
              SELECT CASE WHEN p_partkey % 103 = 0 THEN 'tiff'
                          WHEN p_partkey % 3 = 0 THEN 'jpeg'
                          WHEN p_partkey % 3 = 1 THEN 'png'
                          ELSE 'webp' END AS fmt,
                     CASE WHEN p_partkey % 101 = 0 THEN -(8 + p_partkey % 25)
                          WHEN p_partkey % 89 = 0 THEN 8 + p_partkey % 25 + 1
                          ELSE 8 + p_partkey % 25 END AS w,
                     CASE WHEN p_partkey % 71 = 0 AND p_partkey >= 71
                          THEN ((p_partkey - 3) * 2654435761) % 1000000007
                          ELSE (p_partkey * 2654435761) % 1000000007
                          END AS phash
              FROM part
            ),
            src AS (
              SELECT 'w' AS metric, fmt, CAST(w AS DOUBLE) AS bval,
                     CAST(w + CASE WHEN fmt = 'png' THEN 6 ELSE 0 END
                          AS DOUBLE) AS cval
              FROM img
              UNION ALL
              SELECT 'phash', fmt, CAST(phash AS DOUBLE),
                     CAST(CASE WHEN fmt = 'jpeg'
                               THEN phash % 500000003
                               ELSE phash END AS DOUBLE)
              FROM img
            ),
            q AS (
              SELECT metric, fmt,
                     quantile_cont(bval, 0.1) AS b10, quantile_cont(bval, 0.2) AS b20,
                     quantile_cont(bval, 0.3) AS b30, quantile_cont(bval, 0.4) AS b40,
                     quantile_cont(bval, 0.5) AS b50, quantile_cont(bval, 0.6) AS b60,
                     quantile_cont(bval, 0.7) AS b70, quantile_cont(bval, 0.8) AS b80,
                     quantile_cont(bval, 0.9) AS b90,
                     quantile_cont(cval, 0.1) AS c10, quantile_cont(cval, 0.2) AS c20,
                     quantile_cont(cval, 0.3) AS c30, quantile_cont(cval, 0.4) AS c40,
                     quantile_cont(cval, 0.5) AS c50, quantile_cont(cval, 0.6) AS c60,
                     quantile_cont(cval, 0.7) AS c70, quantile_cont(cval, 0.8) AS c80,
                     quantile_cont(cval, 0.9) AS c90
              FROM src GROUP BY 1, 2
            ),
            j AS (
              SELECT metric, fmt,
                     greatest(
                       abs(c10 - b10) / nullif(b90 - b10, 0.0),
                       abs(c20 - b20) / nullif(b90 - b10, 0.0),
                       abs(c30 - b30) / nullif(b90 - b10, 0.0),
                       abs(c40 - b40) / nullif(b90 - b10, 0.0),
                       abs(c50 - b50) / nullif(b90 - b10, 0.0),
                       abs(c60 - b60) / nullif(b90 - b10, 0.0),
                       abs(c70 - b70) / nullif(b90 - b10, 0.0),
                       abs(c80 - b80) / nullif(b90 - b10, 0.0),
                       abs(c90 - b90) / nullif(b90 - b10, 0.0)
                     ) AS shift
              FROM q
            )
            SELECT metric, fmt, round(shift, 6) AS shift,
                   shift > 0.1 AS drifted
            FROM j
        """,
        "ann_ivf": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings),
                 scored AS (
                   SELECT query_id, neighbor_id,
                          list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                   FROM q, c WHERE query_id <> neighbor_id
                 )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(neighbor_id AS BIGINT) AS exact_top1,
                   TRUE AS recall_ok
            FROM (
              SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rnk
              FROM scored
            ) WHERE rnk = 1
        """,
        "tdigest_quantiles": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25_exact,
                   TRUE AS p25_ok,
                   quantile_cont(l_extendedprice, 0.5) AS p50_exact,
                   TRUE AS p50_ok,
                   quantile_cont(l_extendedprice, 0.75) AS p75_exact,
                   TRUE AS p75_ok
            FROM lineitem GROUP BY l_returnflag
        """,
        "fk_scoped": """
            SELECT 'fk:fact_orders.o_custkey->dim_orders.scoped_cust' AS constraint_id,
                   'stale_fk' AS reason,
                   CAST(f.o_orderkey AS VARCHAR) AS row_id,
                   CAST(f.o_custkey AS VARCHAR) AS observed_value
            FROM orders f
            WHERE f.o_custkey IS NOT NULL
              AND NOT EXISTS (
                SELECT 1 FROM orders d
                WHERE d.o_orderpriority = f.o_orderpriority
                  AND d.o_custkey = f.o_custkey
                  AND d.o_totalprice >= 50000.0
              )
        """,
        "fk_dangling_runtime": """
            SELECT 'fk:orders.o_custkey->customer' AS constraint_id,
                   'dangling_fk' AS reason,
                   CAST(o_orderkey AS VARCHAR) AS row_id,
                   CAST(o_custkey AS VARCHAR) AS observed_value
            FROM orders WHERE o_custkey IS NOT NULL
        """,
        "key_array_fanout": """
            WITH w AS (
              SELECT CAST(p_partkey AS VARCHAR) AS rid,
                     len(string_split(p_name, ' ')) AS n,
                     unnest(string_split(p_name, ' ')) AS word
              FROM part WHERE p_name IS NOT NULL
            ), k AS (
              SELECT rid,
                     CASE WHEN n = 1 THEN '"' || word || '"'
                          ELSE '["' || word || '"]' END AS key,
                     CASE WHEN n = 1 THEN word
                          ELSE '["' || word || '"]' END AS obs
              FROM w
            ), r AS (
              SELECT rid, key, obs,
                     ROW_NUMBER() OVER (PARTITION BY key ORDER BY rid) AS rn
              FROM k
            )
            SELECT 'pk:name_words' AS constraint_id, 'dup_pk' AS reason,
                   rid AS row_id, obs AS observed_value
            FROM r WHERE rn > 1
        """,
        "schema_ingest": """
            WITH survivors AS (
              SELECT 'doc-' || doc_id AS rid, source, lang
              FROM documents
              WHERE lang IN ('en','es','fr','de')
                AND regexp_matches(source, '^src[0-9]$')
                AND n_chars >= 100
            )
            SELECT 'check:lang:enum' AS constraint_id, 'enum' AS reason,
                   'doc-' || doc_id AS row_id,
                   '"' || lang || '"' AS observed_value
            FROM documents
            WHERE lang IS NOT NULL AND lang NOT IN ('en','es','fr','de')
            UNION ALL
            SELECT 'check:source:pattern', 'pattern', 'doc-' || doc_id,
                   '"' || source || '"'
            FROM documents
            WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]$')
            UNION ALL
            SELECT 'check:n_chars:minimum', 'minimum', 'doc-' || doc_id,
                   CAST(n_chars AS VARCHAR)
            FROM documents
            WHERE n_chars IS NOT NULL AND NOT (n_chars >= 100)
            UNION ALL
            -- registration-time dup semantics (round 5, [verified]
            -- reference probes): EVERY doc's registration errors when
            -- an earlier SURVIVING doc holds the key — including docs
            -- that themselves fail row checks (forget runs after)
            SELECT 'unique:src_lang', 'dup_unique', r.rid,
                   '["' || r.source || '","' || r.lang || '"]'
            FROM (
              SELECT 'doc-' || doc_id AS rid, source, lang
              FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL
            ) r
            WHERE EXISTS (
              SELECT 1 FROM survivors s
              WHERE s.source = r.source AND s.lang = r.lang
                AND s.rid < r.rid
            )
        """,
        "library_fallback": """
            WITH d AS (
              SELECT 'doc-' || doc_id AS rid, doc_id, n_chars, lang,
                     source
              FROM documents
            )
            -- jsonschema emits ONE anyOf error per failing element
            -- (items descent), path '/recs/<i>' — predicted
            -- arithmetically from the element-construction rules
            SELECT 'lib:anyOf' AS constraint_id, 'anyOf' AS reason,
                   rid AS row_id, '/recs/0' AS path
            FROM d WHERE n_chars IS NULL OR n_chars < 100
            UNION ALL
            SELECT 'lib:anyOf', 'anyOf', rid, '/recs/1'
            FROM d
            WHERE (CASE WHEN doc_id % 2 = 0 THEN source ELSE lang END)
                    IS NULL
               OR length(CASE WHEN doc_id % 2 = 0 THEN source
                              ELSE lang END) < 3
            UNION ALL
            SELECT 'lib:anyOf', 'anyOf', rid, '/recs/2'
            FROM d
            WHERE doc_id % 5 = 0 OR source IS NULL
               OR length(source) < 3
        """,
        "row_checks": f"""
            SELECT 'check:p_size:minimum' AS constraint_id, 'minimum' AS reason,
                   CAST(p_partkey AS VARCHAR) AS row_id, CAST(p_size AS VARCHAR) AS observed_value
            FROM part WHERE p_size IS NOT NULL AND NOT (p_size >= 5)
            UNION ALL
            SELECT 'check:p_size:maximum', 'maximum', CAST(p_partkey AS VARCHAR), CAST(p_size AS VARCHAR)
            FROM part WHERE p_size IS NOT NULL AND NOT (p_size <= 45)
            UNION ALL
            SELECT 'check:p_brand:enum', 'enum', CAST(p_partkey AS VARCHAR), p_brand
            FROM part WHERE p_brand IS NOT NULL
              AND p_brand NOT IN ({",".join(repr(f"Brand#{i}") for i in range(1, 25))})
            UNION ALL
            SELECT 'check:p_name:maxLength', 'maxLength', CAST(p_partkey AS VARCHAR), p_name
            FROM part WHERE p_name IS NOT NULL AND NOT (LENGTH(p_name) <= 11)
            UNION ALL
            SELECT 'check:p_name:required', 'required', CAST(p_partkey AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM part WHERE p_name IS NULL
            UNION ALL
            SELECT 'check:p_retailprice:exclusiveMinimum', 'exclusiveMinimum',
                   CAST(p_partkey AS VARCHAR), CAST(p_retailprice AS VARCHAR)
            FROM part WHERE p_retailprice IS NOT NULL AND NOT (p_retailprice > 910.0)
            UNION ALL
            SELECT 'check:p_type:pattern', 'pattern', CAST(p_partkey AS VARCHAR), p_type
            FROM part WHERE p_type IS NOT NULL AND NOT regexp_matches(p_type, '^[A-Z]+$')
            UNION ALL
            SELECT 'check:name_words:minItems', 'minItems', CAST(p_partkey AS VARCHAR),
                   '[' || replace(p_name, ' ', ', ') || ']'
            FROM part
            WHERE p_name IS NOT NULL
              AND len(string_split(p_name, ' ')) < 2
        """,
        "unique_atomic": """
            SELECT 'unique:o_custkey' AS constraint_id, 'dup_unique' AS reason,
                   CAST(o_orderkey AS VARCHAR) AS row_id,
                   CAST(o_custkey AS VARCHAR) AS observed_value
            FROM (
              SELECT o_orderkey, o_custkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY CAST(o_orderkey AS VARCHAR)) AS rn
              FROM orders WHERE o_custkey IS NOT NULL
            ) WHERE rn > 1
        """,
        "pk_compound": f"""
            SELECT 'pk:l_partkey,l_suppkey' AS constraint_id, 'dup_pk' AS reason,
                   li_id AS row_id,
                   '[' || l_partkey || ',' || l_suppkey || ']' AS observed_value
            FROM (
              SELECT {LI_ID} AS li_id, l_partkey, l_suppkey,
                     ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
                                        ORDER BY {LI_ID}) AS rn
              FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
            ) WHERE rn > 1
        """,
        "fk_revocation": """
            SELECT 'check:c_acctbal:minimum' AS constraint_id, 'minimum' AS reason,
                   CAST(c_custkey AS VARCHAR) AS row_id,
                   CAST(c_acctbal AS VARCHAR) AS observed_value
            FROM customer WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal >= 0.0)
            UNION ALL
            SELECT 'fk:orders.o_custkey->customer', 'stale_fk',
                   CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR)
            FROM orders o
            WHERE o_custkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal >= 0.0
            )
        """,
        "fk_clean": f"""
            SELECT 'fk:lineitem.l_partkey->part' AS constraint_id, 'stale_fk' AS reason,
                   {LI_ID} AS row_id, CAST(l_partkey AS VARCHAR) AS observed_value
            FROM lineitem l
            WHERE l_partkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
            UNION ALL
            SELECT 'fk:lineitem.l_suppkey->supplier', 'stale_fk',
                   {LI_ID}, CAST(l_suppkey AS VARCHAR)
            FROM lineitem l
            WHERE l_suppkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
        """,
        "jk_index": """
            SELECT 'jk:customer.c_custkey->orders' AS constraint_id, 'stale_fk' AS reason,
                   CAST(c_custkey AS VARCHAR) AS row_id,
                   CAST(c_custkey AS VARCHAR) AS observed_value
            FROM customer c
            WHERE c_custkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "limit_scope": f"""
            SELECT 'unique:l_partkey' AS constraint_id, 'dup_unique' AS reason,
                   li_id AS row_id, CAST(l_partkey AS VARCHAR) AS observed_value
            FROM (
              SELECT {LI_ID} AS li_id, l_partkey,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_partkey
                                        ORDER BY {LI_ID}) AS rn
              FROM lineitem
              WHERE l_partkey IS NOT NULL AND l_returnflag IS NOT NULL
            ) WHERE rn > 1
        """,
        "missing_member": """
            SELECT 'unique:o_custkey,o_prio_n' AS constraint_id, 'dup_unique' AS reason,
                   CAST(o_orderkey AS VARCHAR) AS row_id,
                   '[' || o_custkey || ',' || to_json(o_prio_n) || ']' AS observed_value
            FROM (
              SELECT o_orderkey, o_custkey,
                     NULLIF(o_orderpriority, '3-MEDIUM') AS o_prio_n,
                     ROW_NUMBER() OVER (
                       PARTITION BY o_custkey, NULLIF(o_orderpriority, '3-MEDIUM')
                       ORDER BY CAST(o_orderkey AS VARCHAR)) AS rn
              FROM orders
              WHERE o_custkey IS NOT NULL
                AND NULLIF(o_orderpriority, '3-MEDIUM') IS NOT NULL
            ) WHERE rn > 1
        """,
        "dangling_jk": """
            SELECT 'jk:nation.n_regionkey->region' AS constraint_id,
                   'dangling_jk' AS reason,
                   CAST(n_nationkey AS VARCHAR) AS row_id,
                   CAST(n_regionkey AS VARCHAR) AS observed_value
            FROM nation WHERE n_regionkey IS NOT NULL
        """,
        "provider_inline": """
            SELECT 'fk:nation.n_regionkey->region' AS constraint_id,
                   'stale_fk' AS reason,
                   CAST(n_nationkey AS VARCHAR) AS row_id,
                   CAST(n_regionkey AS VARCHAR) AS observed_value
            FROM nation
            WHERE n_regionkey IS NOT NULL AND n_regionkey NOT IN (0, 1, 2)
        """,
        # the remote server deterministically serves R0/R1/R2 (one
        # dead base skipped, blank line dropped) — the oracle predicts
        # the fetched key set
        "provider_remote": """
            SELECT 'fk:nation.n_regioncode->region' AS constraint_id,
                   'stale_fk' AS reason,
                   CAST(n_nationkey AS VARCHAR) AS row_id,
                   'R' || CAST(n_regionkey AS VARCHAR) AS observed_value
            FROM nation
            WHERE n_regionkey IS NOT NULL
              AND 'R' || CAST(n_regionkey AS VARCHAR)
                  NOT IN ('R0', 'R1', 'R2')
        """,
        "partition_verdicts": """
            SELECT o_orderstatus AS scope,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                                  AND NOT (o_totalprice <= 300000.0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
                   CAST(CASE WHEN SUM(CASE WHEN o_totalprice IS NOT NULL
                                            AND NOT (o_totalprice <= 300000.0)
                                       THEN 1 ELSE 0 END) = 0
                        THEN 1 ELSE 0 END AS INT) AS pass_flag
            FROM orders GROUP BY o_orderstatus
        """,
        # Injection-rule oracle for the image suite (see payload/synth.py):
        # valid for key domains where the id-dup/phash-dup rules don't
        # collide with the pass-1 rules (k < 7171, true at sf≤0.01).
        "image_suite": """
            WITH base AS (
              SELECT p_partkey AS k,
                     'img' || lpad(CAST(CASE WHEN p_partkey % 73 = 0 AND p_partkey >= 73
                                        THEN p_partkey - 1 ELSE p_partkey END AS VARCHAR),
                                   8, '0') AS iid
              FROM part
            )
            SELECT 'payload:decode' AS constraint_id, 'decode' AS reason, iid AS row_id
            FROM base WHERE k % 97 = 0
            UNION ALL
            SELECT 'payload:dims', 'dims', iid FROM base
            WHERE k % 97 <> 0 AND (k % 101 = 0 OR k % 89 = 0)
            UNION ALL
            SELECT 'payload:fmt', 'fmt', iid FROM base
            WHERE k % 97 <> 0 AND k % 103 = 0
            UNION ALL
            SELECT 'payload:psnr', 'psnr', iid FROM base
            WHERE k % 97 <> 0 AND k % 83 = 0
            UNION ALL
            SELECT 'payload:caption', 'caption', iid FROM base WHERE k % 79 = 0
            UNION ALL
            SELECT 'check:w:minimum', 'minimum', iid FROM base WHERE k % 101 = 0
            UNION ALL
            SELECT 'fk:images.fmt->formats', 'stale_fk', iid FROM base
            WHERE k % 103 = 0 AND k % 101 <> 0   -- pass-1 revocation gate
            UNION ALL
            -- registration-time dup semantics (round 5, [verified]
            -- reference probes): rows SHARING a row_id behave like one
            -- doc's repeated registrations — the later one always
            -- errors, revoked or not — so every injected id pair emits
            -- exactly one dup_pk
            SELECT 'pk:image_id', 'dup_pk', iid FROM base
            WHERE k % 73 = 0 AND k >= 73
            UNION ALL
            -- cross-row dups: the REPORTER errors regardless of its
            -- own pass-1 fate (forget runs after); only a SURVIVING
            -- holder (k-3 partner not revoked) makes the key present
            SELECT 'unique:phash', 'dup_unique',
                   'img' || lpad(CAST(k AS VARCHAR), 8, '0')
            FROM base WHERE k % 71 = 0 AND k >= 71
              AND (k - 3) % 101 <> 0
        """,
        "stats_profile": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
                   MIN(l_quantity) AS q_min,
                   MAX(l_quantity) AS q_max,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS pk_distinct
            FROM lineitem GROUP BY l_returnflag
        """,
        "text_stats": """
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_m,
                   CAST(len(regexp_extract_all(lower(text), '\\bthe\\b'))
                      + len(regexp_extract_all(lower(text), '\\band\\b'))
                      + len(regexp_extract_all(lower(text), '\\bof\\b')) AS BIGINT) AS en_stop_hits,
                   CASE WHEN length(text) > 0
                        THEN round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                                   * 1.0 / length(text), 6)
                        ELSE NULL END AS alpha_ratio
            FROM documents
        """,
        "repetition_stats": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                 x -> x <> '') AS w
              FROM documents
            ),
            g1 AS (SELECT doc_id, unnest(w) AS g FROM w),
            c1 AS (SELECT doc_id, g, count(*) AS c FROM g1 GROUP BY 1, 2),
            p1 AS (
              SELECT doc_id, sum(c) AS tot, max(c) AS top,
                     sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS rep
              FROM c1 GROUP BY 1
            ),
            g2 AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(w)),
                                           i -> w[i] || ' ' || w[i + 1])) AS g
              FROM w
            ),
            c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
            p2 AS (
              SELECT doc_id, sum(c) AS tot, max(c) AS top,
                     sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS rep
              FROM c2 GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(p1.tot AS BIGINT) AS n_words,
                   round(p1.top / p1.tot, 6) AS top_word_frac,
                   round(p1.rep / p1.tot, 6) AS dup_word_frac,
                   round(p2.top / p2.tot, 6) AS top_bigram_frac,
                   round(p2.rep / p2.tot, 6) AS dup_bigram_frac
            FROM documents d
            LEFT JOIN p1 USING (doc_id)
            LEFT JOIN p2 USING (doc_id)
        """,
        "lang_id": """
            WITH s AS (
              SELECT doc_id,
                len(regexp_extract_all(lower(text), '\\bthe\\b'))
                  + len(regexp_extract_all(lower(text), '\\band\\b'))
                  + len(regexp_extract_all(lower(text), '\\bof\\b')) AS en,
                len(regexp_extract_all(lower(text), '\\bel\\b'))
                  + len(regexp_extract_all(lower(text), '\\bla\\b'))
                  + len(regexp_extract_all(lower(text), '\\bde\\b')) AS es,
                len(regexp_extract_all(lower(text), '\\ble\\b'))
                  + len(regexp_extract_all(lower(text), '\\bla\\b'))
                  + len(regexp_extract_all(lower(text), '\\bet\\b')) AS fr,
                len(regexp_extract_all(lower(text), '\\bder\\b'))
                  + len(regexp_extract_all(lower(text), '\\bund\\b'))
                  + len(regexp_extract_all(lower(text), '\\bdie\\b')) AS de
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                        WHEN de = greatest(en, es, fr, de) THEN 'de'
                        WHEN en = greatest(en, es, fr, de) THEN 'en'
                        WHEN es = greatest(en, es, fr, de) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        """,
        "dedup_exact": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
            ), keyed AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
              FROM corpus
            )
            SELECT CAST(doc_id AS BIGINT) AS dup_id,
                   CAST(MIN(doc_id) OVER (PARTITION BY fp) AS BIGINT) AS survivor_id
            FROM keyed
            QUALIFY doc_id <> MIN(doc_id) OVER (PARTITION BY fp)
        """,
        "dedup_minhash": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token' FROM documents
              WHERE doc_id < 30
            ), toks AS (
              SELECT doc_id AS doc,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM corpus
            ), sh AS (
              SELECT DISTINCT doc,
                     CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                          ELSE array_to_string(t, ' ') END AS shingle
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
            ), sig AS (
              SELECT doc,
                     min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                     min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                     min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                     min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
              FROM sh GROUP BY doc
            ), bands AS (
              SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig
              UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig
            ), pairs AS (
              SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
            ), sizes AS (
              SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
            ), inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS i
              FROM pairs p
              JOIN sh sa ON sa.doc = p.doc_a
              JOIN sh sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY p.doc_a, p.doc_b
            )
            SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
                   CAST(p.doc_b AS BIGINT) AS doc_b,
                   round(COALESCE(i.i, 0) * 1.0 / (za.sz + zb.sz - COALESCE(i.i, 0)), 6) AS jaccard
            FROM pairs p
            LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
            JOIN sizes za ON za.doc = p.doc_a
            JOIN sizes zb ON zb.doc = p.doc_b
            WHERE COALESCE(i.i, 0) * 1.0 / (za.sz + zb.sz - COALESCE(i.i, 0)) >= 0.5
        """,
        # the dedup_minhash chain composed to its corpus-level verdict:
        # verified pairs -> symmetric edges -> recursive-CTE components
        # -> survivor = min reachable id (= the component label itself)
        "dedup_survivors": """
            WITH RECURSIVE corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' extra token' FROM documents
              WHERE doc_id < 30
            ), toks AS (
              SELECT doc_id AS doc,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM corpus
            ), sh AS (
              SELECT DISTINCT doc,
                     CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                          ELSE array_to_string(t, ' ') END AS shingle
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
            ), sig AS (
              SELECT doc,
                     min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                     min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                     min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                     min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
              FROM sh GROUP BY doc
            ), bands AS (
              SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig
              UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig
              UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig
              UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig
            ), cand AS (
              SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
            ), sizes AS (
              SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
            ), inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS i
              FROM cand p
              JOIN sh sa ON sa.doc = p.doc_a
              JOIN sh sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY p.doc_a, p.doc_b
            ), und AS (
              SELECT p.doc_a, p.doc_b
              FROM cand p
              LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
              JOIN sizes za ON za.doc = p.doc_a
              JOIN sizes zb ON zb.doc = p.doc_b
              WHERE COALESCE(i.i, 0) * 1.0 / (za.sz + zb.sz - COALESCE(i.i, 0)) >= 0.5
            ), edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM und
              UNION ALL
              SELECT doc_b, doc_a FROM und
            ), walk AS (
              SELECT doc_id AS id, doc_id AS label FROM corpus
              UNION
              SELECT e.dst, w.label
              FROM walk w JOIN edges e ON e.src = w.id
            )
            SELECT CAST(id AS BIGINT) AS doc_id,
                   CAST(min(label) AS BIGINT) AS component,
                   (id = min(label)) AS is_survivor
            FROM walk GROUP BY id
        """,
        "dedup_simhash": """
            WITH toks AS (
              SELECT doc_id, md5(u.tok) AS th
              FROM documents,
                   LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS u(tok)
            ), sums AS (
              SELECT doc_id,
                """ + ",\n                ".join(
                    f"SUM(CASE WHEN substr(th, {i + 1}, 1) IN "
                    f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{i}"
                    for i in range(16)
                ) + """
              FROM toks GROUP BY doc_id
            )
            SELECT doc_id,
                """ + " || ".join(
                    f"(CASE WHEN s{i} >= 0 THEN '1' ELSE '0' END)" for i in range(16)
                ) + """ AS simhash
            FROM sums
        """,
        "embed_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 10),
                 c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                       FROM embeddings),
                 scored AS (
                   SELECT query_id, neighbor_id,
                          list_dot_product(qv, cv)
                            / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos
                   FROM q, c WHERE query_id <> neighbor_id
                 )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(neighbor_id AS BIGINT) AS neighbor_id,
                   CAST(rnk AS BIGINT) AS rank
            FROM (
              SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id ASC) AS rnk
              FROM scored
            ) WHERE rnk <= 5
        """,
        "embed_neardup": """
            WITH corpus AS (
              SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings
              UNION ALL
              SELECT CAST(vec_id + 100000 AS BIGINT), embedding
              FROM embeddings WHERE vec_id < 20
            )
            SELECT a.id AS doc_a, b.id AS doc_b
            FROM corpus a JOIN corpus b ON a.id < b.id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        # the embed_neardup pair contract composed through the
        # survivors tail: exact cosine pairs -> symmetric edges ->
        # recursive-CTE components -> survivor = min reachable id
        "embed_survivors": """
            WITH RECURSIVE corpus AS (
              SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings
              UNION ALL
              SELECT CAST(vec_id + 100000 AS BIGINT), embedding
              FROM embeddings WHERE vec_id < 20
            ), und AS (
              SELECT a.id AS doc_a, b.id AS doc_b
              FROM corpus a JOIN corpus b ON a.id < b.id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
            ), edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM und
              UNION ALL
              SELECT doc_b, doc_a FROM und
            ), walk AS (
              SELECT id, id AS label FROM corpus
              UNION
              SELECT e.dst, w.label
              FROM walk w JOIN edges e ON e.src = w.id
            )
            SELECT CAST(id AS BIGINT) AS vec_id,
                   CAST(min(label) AS BIGINT) AS component,
                   (id = min(label)) AS is_survivor
            FROM walk GROUP BY id
        """,
        "dispatch": """
            SELECT 'dispatch' AS constraint_id, 'no_id' AS reason,
                   'x0' AS row_id, CAST(NULL AS VARCHAR) AS observed_value
            UNION ALL
            SELECT 'dispatch', 'schema_unknown', 'x1', 'ghost'
            UNION ALL
            SELECT 'check:rk:maximum', 'maximum',
                   'n' || CAST(n_nationkey AS VARCHAR),
                   CAST(CAST(n_regionkey AS BIGINT) AS VARCHAR)
            FROM nation
            WHERE n_regionkey IS NOT NULL AND NOT (n_regionkey <= 3)
            UNION ALL
            SELECT 'check:name:minLength', 'minLength',
                   'r' || CAST(r_regionkey AS VARCHAR), r_name
            FROM region
            WHERE r_name IS NOT NULL AND NOT (LENGTH(r_name) >= 5)
        """,
        "events_json": """
            SELECT 'check:k:minimum' AS constraint_id, 'minimum' AS reason,
                   CAST(event_id AS VARCHAR) AS row_id,
                   CAST(json_extract(props, '$.k')::BIGINT AS VARCHAR) AS observed_value
            FROM events
            WHERE json_extract(props, '$.k')::BIGINT IS NOT NULL
              AND NOT (json_extract(props, '$.k')::BIGINT >= 10)
            UNION ALL
            SELECT 'check:k:required', 'required', CAST(event_id AS VARCHAR),
                   CAST(NULL AS VARCHAR)
            FROM events WHERE json_extract(props, '$.k')::BIGINT IS NULL
            UNION ALL
            SELECT 'check:event_type:enum', 'enum', CAST(event_id AS VARCHAR),
                   event_type
            FROM events
            WHERE event_type IS NOT NULL
              AND event_type NOT IN ('click', 'view', 'purchase', 'signup')
        """,
        "quantiles_exact": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.25) AS p25,
                   quantile_cont(l_extendedprice, 0.5) AS p50,
                   quantile_cont(l_extendedprice, 0.75) AS p75,
                   quantile_cont(l_extendedprice, 0.95) AS p95
            FROM lineitem GROUP BY l_returnflag
        """,
        "salted_counts": """
            SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_suppkey
        """,
        "simhash_pairs": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id < 30
            ), toks AS (
              SELECT doc_id, md5(u.tok) AS th
              FROM corpus,
                   LATERAL unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS u(tok)
            ), sums AS (
              SELECT doc_id,
                """ + ",\n                ".join(
                    f"SUM(CASE WHEN substr(th, {i + 1}, 1) IN "
                    f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{i}"
                    for i in range(16)
                ) + """
              FROM toks GROUP BY doc_id
            ), sh AS (
              SELECT doc_id AS doc,
                """ + " || ".join(
                    f"(CASE WHEN s{i} >= 0 THEN '1' ELSE '0' END)" for i in range(16)
                ) + """ AS simhash
              FROM sums
            )
            SELECT CAST(a.doc AS BIGINT) AS doc_a, CAST(b.doc AS BIGINT) AS doc_b,
                   CAST(("""
                   + " + ".join(
                       f"(CASE WHEN substr(a.simhash,{i+1},1) <> substr(b.simhash,{i+1},1) THEN 1 ELSE 0 END)"
                       for i in range(16)
                   )
                   + """) AS BIGINT) AS hamming
            FROM sh a JOIN sh b
              ON a.doc < b.doc
            WHERE ("""
                   + " + ".join(
                       f"(CASE WHEN substr(a.simhash,{i+1},1) <> substr(b.simhash,{i+1},1) THEN 1 ELSE 0 END)"
                       for i in range(16)
                   )
                   + """) <= 2
        """,
        "sample_quota": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
            FROM documents
            WHERE substr(md5(concat_ws(chr(31), 's1',
                                       CAST(doc_id AS VARCHAR))), 1, 4)
                  < '4000'
        """,
        "quality_topn": """
            WITH r AS (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC
                     ) AS rn
              FROM documents
            )
            SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM r WHERE rn <= 5
        """,
        "dedup_components": """
            WITH RECURSIVE corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 25
              UNION ALL
              SELECT doc_id + 100000, text || ' zq1'
              FROM documents WHERE doc_id < 25
              UNION ALL
              SELECT doc_id + 200000, text || ' zq1 zq2'
              FROM documents WHERE doc_id < 25
            ), toks AS (
              SELECT doc_id AS doc,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM corpus
            ), sh AS (
              SELECT DISTINCT doc,
                     CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                          ELSE array_to_string(t, ' ') END AS shingle
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
            ), sizes AS (
              SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
            ), inter AS (
              SELECT sa.doc AS doc_a, sb.doc AS doc_b, COUNT(*) AS i
              FROM sh sa JOIN sh sb
                ON sb.shingle = sa.shingle AND sa.doc < sb.doc
              GROUP BY 1, 2
            ), und AS (
              SELECT i.doc_a, i.doc_b
              FROM inter i
              JOIN sizes za ON za.doc = i.doc_a
              JOIN sizes zb ON zb.doc = i.doc_b
              WHERE za.sz + zb.sz - 2 * i.i <= 1
            ), edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM und
              UNION ALL
              SELECT doc_b, doc_a FROM und
            ), walk AS (
              SELECT doc_id AS id, doc_id AS label FROM corpus
              UNION
              SELECT e.dst, w.label
              FROM walk w JOIN edges e ON e.src = w.id
            )
            SELECT CAST(id AS BIGINT) AS doc_id,
                   CAST(min(label) AS BIGINT) AS component
            FROM walk GROUP BY id
        """,
        "ngram_jaccard": """
            WITH docs AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 15
            ), toks AS (
              SELECT doc_id AS doc,
                     regexp_split_to_array(trim(lower(text)), '\\s+') AS t
              FROM docs
            ), sh AS (
              SELECT DISTINCT doc,
                     CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                          ELSE array_to_string(t, ' ') END AS shingle
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
            ), sizes AS (
              SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc
            ), pairs AS (
              SELECT a.doc AS doc_a, b.doc AS doc_b
              FROM (SELECT doc FROM sizes) a, (SELECT doc FROM sizes) b
              WHERE a.doc < b.doc
            ), inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS i
              FROM pairs p
              JOIN sh sa ON sa.doc = p.doc_a
              JOIN sh sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY p.doc_a, p.doc_b
            )
            SELECT CAST(p.doc_a AS BIGINT) AS doc_a,
                   CAST(p.doc_b AS BIGINT) AS doc_b,
                   CAST(COALESCE(i.i, 0) AS BIGINT) AS inter,
                   round(COALESCE(i.i, 0) * 1.0 / (za.sz + zb.sz - COALESCE(i.i, 0)), 6) AS jaccard
            FROM pairs p
            LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
            JOIN sizes za ON za.doc = p.doc_a
            JOIN sizes zb ON zb.doc = p.doc_b
        """,
        # synthetic-codec contracts: the FAUD/FVID containers are
        # deterministic arithmetic, so the exact companions (rate,
        # duration, frame geometry) recompute in SQL and the accuracy
        # verdicts must all be TRUE (see q_audio_features bounds)
        "audio_features": """
            SELECT 'a' || CAST(i AS VARCHAR) AS audio_id,
                   CAST(8000 AS INTEGER) AS sample_rate,
                   CAST(0.25 AS DOUBLE) AS duration_s,
                   TRUE AS rms_ok, TRUE AS zc_ok, TRUE AS peak_ok
            FROM range(0, 50) t(i)
        """,
        "video_frames": """
            SELECT 'v' || CAST(i AS VARCHAR) AS video_id,
                   CAST(f AS INTEGER) AS frame_idx,
                   CAST(16 AS INTEGER) AS w, CAST(12 AS INTEGER) AS h
            FROM range(0, 20) t(i), (VALUES (0), (2), (4)) u(f)
        """,
    }
    # the star variant labels the SAME graph identically (round-6 A/B:
    # algorithm-independent output) — one oracle text, two queries
    d["dedup_components_star"] = d["dedup_components"]
    d["dedup_components_hybrid"] = d["dedup_components"]
    d["drift_ledger"] = _drift_ledger_oracle()
    d["curation_ledger"] = _curation_ledger_oracle()
    # cross-increment near-dup ledger: increment 2's band collisions
    # against increment 1's recorded sketches + the m/8 component
    # estimator (dyadic → bitwise-stable), increment 1 emits nothing
    d["neardup_ledger"] = """
        WITH inc1 AS (
          SELECT CAST(doc_id AS VARCHAR) AS doc, text
          FROM documents WHERE doc_id < 30
        ), inc2 AS (
          SELECT CAST(doc_id + 100000 AS VARCHAR) AS doc,
                 text || ' extra token' AS text
          FROM documents WHERE doc_id < 30
        ), sh1 AS (
          SELECT DISTINCT doc,
                 CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                      ELSE array_to_string(t, ' ') END AS shingle
          FROM (SELECT doc,
                       regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM inc1),
               LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
        ), sh2 AS (
          SELECT DISTINCT doc,
                 CASE WHEN len(t) >= 3 THEN array_to_string(t[i:i+2], ' ')
                      ELSE array_to_string(t, ' ') END AS shingle
          FROM (SELECT doc,
                       regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM inc2),
               LATERAL unnest(generate_series(1, greatest(len(t) - 2, 1))) AS u(i)
        ), sig1 AS (
          SELECT doc,
                 min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                 min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                 min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                 min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
          FROM sh1 GROUP BY doc
        ), sig2 AS (
          SELECT doc,
                 min(md5('s0:' || shingle)) AS h0, min(md5('s1:' || shingle)) AS h1,
                 min(md5('s2:' || shingle)) AS h2, min(md5('s3:' || shingle)) AS h3,
                 min(md5('s4:' || shingle)) AS h4, min(md5('s5:' || shingle)) AS h5,
                 min(md5('s6:' || shingle)) AS h6, min(md5('s7:' || shingle)) AS h7
          FROM sh2 GROUP BY doc
        ), b1 AS (
          SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig1
          UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig1
          UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig1
          UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig1
        ), b2 AS (
          SELECT doc, 0 AS band, h0 || '|' || h1 AS bucket FROM sig2
          UNION ALL SELECT doc, 1, h2 || '|' || h3 FROM sig2
          UNION ALL SELECT doc, 2, h4 || '|' || h5 FROM sig2
          UNION ALL SELECT doc, 3, h6 || '|' || h7 FROM sig2
        ), cands AS (
          SELECT DISTINCT n.doc AS doc_new, p.doc AS doc_prior
          FROM b2 n JOIN b1 p
            ON n.band = p.band AND n.bucket = p.bucket
        )
        SELECT CAST(c.doc_new AS BIGINT) AS doc_new,
               CAST(c.doc_prior AS BIGINT) AS doc_prior,
               ((CASE WHEN n.h0 = p.h0 THEN 1 ELSE 0 END
               + CASE WHEN n.h1 = p.h1 THEN 1 ELSE 0 END
               + CASE WHEN n.h2 = p.h2 THEN 1 ELSE 0 END
               + CASE WHEN n.h3 = p.h3 THEN 1 ELSE 0 END
               + CASE WHEN n.h4 = p.h4 THEN 1 ELSE 0 END
               + CASE WHEN n.h5 = p.h5 THEN 1 ELSE 0 END
               + CASE WHEN n.h6 = p.h6 THEN 1 ELSE 0 END
               + CASE WHEN n.h7 = p.h7 THEN 1 ELSE 0 END) / 8.0)
                 AS est_jaccard
        FROM cands c
        JOIN sig2 n ON n.doc = c.doc_new
        JOIN sig1 p ON p.doc = c.doc_prior
    """
    return d
