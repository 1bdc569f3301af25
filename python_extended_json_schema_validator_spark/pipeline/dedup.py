"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — all expressed relationally
(explode → aggregate → join) so they scale with shuffles instead of
driver state, and all deterministic (md5-based hashing) so an ANSI-SQL
oracle can replicate them.

Scale shape (the part that matters at 100 TB):
- shingling is ``explode`` (no driver fan-out), shingle→doc pairs are
  DISTINCT-ed before aggregation (bounds map-side combine state);
- MinHash signatures are ONE groupBy(doc) computing H mins in a single
  shuffle, not H passes;
- LSH banding turns all-pairs O(n²) into groupBy(band_key) buckets —
  candidate pairs come from a self-join *within* buckets only;
- verification (true Jaccard) runs only on candidate pairs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str = "text", normalized: bool = True
) -> DataFrame:
    """Rows that duplicate an earlier (min-id survivor) document
    byte-for-byte (or normalized): → (dup_id, survivor_id, fp)."""
    norm = F.col(text_col)
    if normalized:
        norm = F.trim(F.regexp_replace(F.lower(norm), r"\s+", " "))
    keyed = (
        df.select(F.col(id_col).alias("doc"), F.md5(norm.cast("binary")).alias("fp"))
        # NULL text → NULL fp; grouping NULLs together would report
        # false duplicates among contentless rows — exclude them (the
        # missing-member doctrine)
        .where(F.col("fp").isNotNull())
    )
    w = Window.partitionBy("fp")
    return (
        keyed.withColumn("survivor", F.min("doc").over(w))
        .where(F.col("doc") != F.col("survivor"))
        .select(F.col("doc").alias("dup_id"), F.col("survivor").alias("survivor_id"), "fp")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct k-word shingles per document → (doc, shingle).
    Tokenization: lowercase, split on whitespace."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """H-wide MinHash signature per doc in ONE aggregation: hash_i =
    min(md5(i || shingle)) — md5 hex strings compare lexicographically
    identically everywhere, so no engine-specific 64-bit arithmetic."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle")).cast("binary"))).alias(
            f"h{i}"
        )
        for i in range(num_hashes)
    ]
    return shingles.groupBy("doc").agg(*aggs)


def band_buckets(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(doc, band, bucket) rows: the signature split into ``bands``
    bands of ``num_hashes/bands`` rows each, bucket = the band's
    hash components joined — the LSH join key, shared by in-corpus
    candidate generation (lsh_candidate_pairs) and the
    cross-increment ledger (incremental_neardup.MinHashLedger)."""
    rows = num_hashes // bands
    banded = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        banded.append(
            signatures.select(
                F.col("doc"),
                F.lit(b).alias("band"),
                F.concat_ws("|", *cols).alias("bucket"),
            )
        )
    all_bands = banded[0]
    for d in banded[1:]:
        all_bands = all_bands.unionByName(d)
    return all_bands


def lsh_candidate_pairs(
    signatures: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature (rows = num_hashes/bands) and self-join
    within band buckets → candidate pairs (doc_a < doc_b, distinct)."""
    all_bands = band_buckets(signatures, num_hashes, bands)
    a = all_bands.alias("a")
    b = all_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, shingles: DataFrame
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs only:
    |A∩B| via join on shingle, |A∪B| = |A|+|B|-|A∩B|."""
    sizes = shingles.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    sa = shingles.alias("sa")
    sb = shingles.alias("sb")
    inter = (
        pairs.join(sa, pairs.doc_a == F.col("sa.doc"))
        .join(
            sb,
            (pairs.doc_b == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    max_iter: int = 25,
    strict: bool = True,
    stats: Optional[dict] = None,
    warn_on_partial: bool = True,
) -> DataFrame:
    """Near-duplicate CLUSTERING: connected components over a
    candidate-pair graph by min-label propagation — the
    group-then-keep-one step of a dedup pipeline.  A near-dup chain
    A~B~C collapses into ONE component even when (A, C) was never a
    candidate pair, which pairwise dedup alone cannot do.

    ``edges``: (src, dst) undirected pairs (e.g. from
    minhash_near_duplicates / simhash banding); ``ids``: one row per
    node.  Returns (id, component) with component = the smallest
    reachable node id — the canonical survivor of each group.

    Scale shape: one narrow shuffle per iteration (edges⋈labels on
    id + groupBy min over (id, label) longs — the texts/vectors never
    enter the loop), converging in O(graph diameter) iterations.
    Each iteration ends in localCheckpoint() to cut the join lineage,
    and convergence is a limit(1) probe, not a full count.

    Algorithm choice (round-6 A/B, BENCH_COMPONENTS.json star_ab):
    this plain loop wins BELOW ~100k nodes (fewer actions per round —
    1.8 s vs 2.1 s on the 75-node flagship graph); the two-phase
    large-star/small-star variant (connected_components_star) wins
    from ~200k up (28 s vs 47 s at 1.5M on the near-dup shape, equal
    output) and is the ONLY option on deep graphs (a 5M-node chain:
    star converges in 24 rounds where this loop's strict guard
    rightly raises at max_iter).  Default pipelines keep this loop
    because banded near-dup graphs are shallow and flagship-scale;
    reach for the star variant on unknown-diameter or ≥10^6-node
    graphs, or connected_components_hybrid when you'd rather not
    choose (plain rounds first, contracted star finishes any deep
    residue).

    A graph whose diameter exceeds ``max_iter`` (a pathological long
    chain at scale) would return INCOMPLETE components — chains
    collapse only max_iter hops per pass.  ``strict=True`` (default)
    raises RuntimeError in that case instead of silently returning
    possibly-wrong labels; ``strict=False`` keeps the partial labels
    (each still a valid COARSENING: never merges two true components)
    and logs a warning (``warn_on_partial=False`` silences it for
    callers like connected_components_hybrid whose phase 1 is partial
    BY DESIGN) for callers that prefer progress over
    exactness.

    ``stats``: a dict the call fills with per-iteration evidence —
    ``iterations`` (propagation passes run), ``iter_secs``
    (wall-clock per pass, including the convergence probe's
    limit(1) count), ``converged`` — consumed by
    tools/components_bench.py for the ≥1M-doc scale record."""
    import time as _time
    # materialize the symmetrized edge set ONCE: the loop joins it
    # every iteration, and without this the whole upstream edge
    # lineage (e.g. dedup_survivors' minhash -> LSH join -> Jaccard
    # verify chain) re-executes per pass (code-review round 6).
    # r08: IDENTITY edges (x, x) ride along, so each round is ONE
    # join + ONE aggregation — min over (own ∪ neighbor) labels
    # replaces the old groupBy + left-join-back shape (a shuffle per
    # round less), and the same aggregation yields the OLD label (the
    # identity row's), so the moved flag needs no second join either.
    sym = (
        edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        .unionByName(
            edges.select(F.col("dst").alias("s"), F.col("src").alias("d"))
        )
        .unionByName(
            ids.select(F.col(id_col).alias("s"), F.col(id_col).alias("d"))
        )
        .localCheckpoint(eager=False)
    )
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    )

    def _propagate(lbls):
        # every node has its identity row, so the groupBy covers all
        # ids and min(label over own ∪ nbrs) IS the propagation step
        new = (
            sym.join(lbls, sym["d"] == lbls["id"])
            .groupBy("s")
            .agg(
                F.min("label").alias("label"),
                F.min(
                    F.when(F.col("d") == F.col("s"), F.col("label"))
                ).alias("__old"),
            )
            .select(
                F.col("s").alias("id"),
                "label",
                (F.col("label") != F.col("__old")).alias("__moved"),
            )
            .localCheckpoint(eager=False)
        )
        # the moved flag rides the checkpointed frame: the probe is a
        # limit(1) scan of already-materialized partitions, not a
        # join of old vs new labels (r08 — the probe join added two
        # shuffles + its own AQE jobs per iteration)
        moved = new.where(F.col("__moved")).limit(1).count()
        return new.select("id", "label"), moved

    changed = 1
    iter_secs = []
    for _ in range(max_iter):
        t0 = _time.time()
        labels, changed = _propagate(labels)
        iter_secs.append(_time.time() - t0)
        if changed == 0:
            break
    if changed != 0:
        # the loop exhausted max_iter with the LAST iteration still
        # moving labels — that alone doesn't prove incompleteness (the
        # final iteration may have finished the job), so one extra
        # no-change probe decides (round-4 review: a chain that
        # converges exactly on iteration max_iter must not raise)
        _, changed = _propagate(labels)
    if stats is not None:
        stats["iterations"] = len(iter_secs)
        stats["iter_secs"] = [round(s, 2) for s in iter_secs]
        stats["converged"] = changed == 0
    if changed != 0:
        # genuinely unconverged (VERDICT/ADVICE round-3: unconverged
        # labels must never be mistaken for results)
        msg = (
            f"connected_components did not converge within "
            f"max_iter={max_iter} iterations (graph diameter too "
            f"large); labels are an incomplete coarsening. Raise "
            f"max_iter or pass strict=False to accept partial labels."
        )
        if strict:
            raise RuntimeError(msg)
        if warn_on_partial:
            import logging

            logging.getLogger(__name__).warning(msg)
    return labels.select("id", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    max_iter: int = 50,
    strict: bool = True,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the DEEP-GRAPH path.

    Plain min-label propagation (connected_components) moves a
    component's min label ONE HOP per iteration: O(diameter) rounds,
    perfect for shallow near-dup clusters, hopeless on a chained
    graph (a 5M-node path would need 5M rounds).  The star rounds
    contract paths DOUBLY-logarithmically: large-star hangs every
    node's larger neighbors directly onto its smallest reachable
    node, small-star re-hangs the smaller ones, and the edge set
    converges to per-component stars in O(log² n) rounds (~10-25 for
    any realistic n) REGARDLESS of diameter.

    Per round: 2 grouped mins + 2 joins + a distinct — all on (long,
    long) edges, nothing wider ever shuffles; lineage cut by
    localCheckpoint like the plain loop.  Convergence = the small-star
    edge set reaches a fixpoint (count equal + one anti-join
    limit(1) probe); the strict raise-guard is identical to
    connected_components.  Pick by graph shape: near-dup banding
    output → plain propagation (fewer shuffles/round, diameter is
    small); unknown/chain-risk graphs → this (BENCH_COMPONENTS.json
    round-6 A/B: equal output on shallow graphs, star alone finishes
    the 5M-node chain).
    """
    import time as _time

    e = (
        edges.select(
            F.col("src").cast("long").alias("u"),
            F.col("dst").cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _large_star(ed):
        sym = ed.unionByName(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed):
        o = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        hang = (
            o.join(mins, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        root = o.join(mins, "u").select("u", F.col("m").alias("v"))
        return (
            hang.unionByName(root)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    iter_secs = []
    converged = False
    for _ in range(max_iter):
        t0 = _time.time()
        new = _small_star(_large_star(e)).localCheckpoint(eager=False)
        same_count = new.count() == e.count()
        moved = (
            0
            if not same_count
            else new.exceptAll(e).limit(1).count()
        )
        done = same_count and moved == 0
        e = new
        iter_secs.append(_time.time() - t0)
        if done:
            converged = True
            break
    if stats is not None:
        stats["iterations"] = len(iter_secs)
        stats["iter_secs"] = [round(s, 2) for s in iter_secs]
        stats["converged"] = converged
    if not converged:
        msg = (
            f"connected_components_star did not reach an edge fixpoint "
            f"within max_iter={max_iter} rounds; labels are an "
            f"incomplete coarsening. Raise max_iter or pass "
            f"strict=False to accept partial labels."
        )
        if strict:
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    # converged edges are per-component stars: (node, component-min)
    stars = e.groupBy("u").agg(F.min("v").alias("component"))
    out = (
        ids.select(F.col(id_col).cast("long").alias("id"))
        .join(stars, F.col("id") == F.col("u"), "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )
    return out


def connected_components_hybrid(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    plain_iters: int = 8,
    star_max_iter: int = 50,
    strict: bool = True,
    stats: Optional[dict] = None,
) -> DataFrame:
    """The don't-make-me-choose components API: a few cheap plain
    min-label-propagation rounds FIRST (near-dup graphs usually
    converge right there — fewer shuffles per round), then, only if
    labels are still moving, CONTRACT the graph to its label quotient
    (distinct (label(src), label(dst)) pairs) and let the star rounds
    finish the residue in O(log² n) regardless of diameter; final
    labels compose through one join.

    What the contraction does and does NOT buy (code-review round 6):
    clusters the plain phase fully collapsed vanish from the quotient
    (src = dst edges are dropped) — on the common
    mostly-shallow-plus-some-deep-residue graph the star phase runs
    on just the residue.  But min-label propagation moves labels ONE
    HOP per round, so a pure ``n``-node chain still has ~``n -
    plain_iters`` distinct labels afterwards: deep chains do NOT
    shrink ``plain_iters``-fold, and on a pathological all-chain
    graph hybrid costs star plus ``plain_iters`` wasted full-graph
    rounds (measured: 289 s vs bare star 233 s on the 5M chain,
    quotient_nodes 4,999,992).  Pick bare
    ``connected_components_star`` when you KNOW the graph is deep;
    hybrid's value is not needing to know.

    Correctness: every plain round yields a valid coarsening (never
    merges two true components), the quotient graph's components map
    1:1 onto the residue's, and star is exact on any graph — so the
    composition equals plain/star run alone (equality-tested).  Cost
    when plain converges (the common near-dup case): exactly plain's
    cost plus one convergence probe — the contraction never runs.

    Output contract: (id long, component long) regardless of which
    internal path ran (the star leg computes in longs, so the
    converged fast path casts to match — stable schema for appending
    writers).  ``stats`` gains ``quotient_nodes`` and
    ``residual_sec`` (contraction + star phase wall) when phase 2
    runs."""
    import time as _time

    # materialize the (long,long) edge list ONCE up front: the plain
    # phase re-joins edges every round and the quotient build reads
    # them again — without this each pass re-executes the upstream
    # pair-generation lineage (minhash/LSH/verify in dedup_survivors)
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint(eager=False)
    lids = ids.select(F.col(id_col).cast("long").alias(id_col))
    st_plain: dict = {}
    # no persist(): the plain loop localCheckpoints every iteration,
    # so `partial` is already materialization-backed — an extra
    # storage layer only adds a cache-write pass (measured 2× on the
    # 1.5M shallow A/B before removal)
    partial = connected_components(
        e, lids, id_col=id_col, max_iter=plain_iters, strict=False,
        stats=st_plain, warn_on_partial=False,
    )
    if stats is not None:
        stats["plain_iterations"] = st_plain["iterations"]
        stats["plain_converged"] = st_plain["converged"]
    if st_plain["converged"]:
        if stats is not None:
            stats["star_iterations"] = 0
            stats["converged"] = True
        return partial
    # quotient graph over the partial labels
    t0 = _time.time()
    lbl = partial.select(
        F.col("id").alias("__n"), F.col("component").alias("__l")
    )
    q = (
        e.join(lbl, e["src"] == lbl["__n"])
        .select(F.col("__l").alias("src"), "dst")
        .join(
            lbl.select(
                F.col("__n").alias("__n2"), F.col("__l").alias("__l2")
            ),
            F.col("dst") == F.col("__n2"),
        )
        .select("src", F.col("__l2").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    qids = partial.select(F.col("component").alias("id")).distinct()
    if stats is not None:
        # cheap count over the narrow distinct-label frame: the
        # honest record of how much (or little) the plain phase
        # actually contracted the graph
        stats["quotient_nodes"] = qids.count()
    st_star: dict = {}
    quotient = connected_components_star(
        q, qids, max_iter=star_max_iter, strict=strict, stats=st_star
    )
    if stats is not None:
        stats["star_iterations"] = st_star["iterations"]
        stats["converged"] = st_star["converged"]
        # contraction + star phase wall (star runs eagerly inside
        # connected_components_star, so the two are not separable
        # from here without double-materializing the quotient)
        stats["residual_sec"] = round(_time.time() - t0, 2)
    # compose: node -> partial label -> quotient component
    out = (
        partial.join(
            quotient.select(
                F.col("id").alias("__q"), F.col("component").alias("__c")
            ),
            partial["component"] == F.col("__q"),
        )
        .select("id", F.col("__c").alias("component"))
    )
    return out


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full pipeline: shingle → minhash → LSH buckets → exact Jaccard
    on candidates → pairs ≥ threshold."""
    sh = word_shingles(df, id_col, text_col, k)
    sig = minhash_signatures(sh, num_hashes)
    pairs = lsh_candidate_pairs(sig, num_hashes, bands)
    return jaccard_on_pairs(pairs, sh).where(F.col("jaccard") >= threshold)


def dedup_survivors(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    plain_iters: int = 8,
    stats: Optional[dict] = None,
) -> DataFrame:
    """Corpus-level near-dup DEDUPLICATION, end to end: the answer to
    "give me the deduplicated corpus", not just "show me the pairs".
    minhash LSH candidates → exact-Jaccard verify (≥ ``threshold``)
    → connected_components_hybrid over the verified pair graph →
    survivor = the smallest id of each component.

    Returns ONE row per input doc: (``id_col``, component,
    is_survivor).  Keep-side filter is ``is_survivor``; the
    drop-side rows carry WHICH survivor absorbed them (component),
    so the decision is auditable — the trait every validation-engine
    verdict in this repo shares.

    Survivor selection costs NOTHING beyond the components run:
    component labels ARE min reachable ids, so is_survivor is the
    map-side comparison id = component — no extra shuffle, no window.
    Scale shape = the sum of its parts (banded equi-join candidates,
    shingle-join verify, (id,label)-only hybrid clustering); texts
    never ride the clustering loop.  ``id_col`` must be integral
    (the components contract).
    """
    pairs = minhash_near_duplicates(
        df, id_col, text_col, k=k, num_hashes=num_hashes, bands=bands,
        threshold=threshold,
    )
    return survivors_from_pairs(
        pairs, df.select(F.col(id_col)), id_col=id_col,
        plain_iters=plain_iters, stats=stats,
    )


def survivors_from_pairs(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    plain_iters: int = 8,
    stats: Optional[dict] = None,
) -> DataFrame:
    """The clustering + survivor-flag tail of dedup_survivors,
    factored out so ANY pair generator feeds the same verdict —
    minhash (dedup_survivors), simhash_near_duplicates /
    simhash_pairs_from_signatures, embedding LSH
    (similarity.embedding_near_duplicates), or a hand-built edge
    list.  ``pairs``: (``a_col``, ``b_col``) verified near-dup
    pairs; ``ids``: one row per corpus doc (``id_col``, integral).
    Returns one row per doc: (``id_col``, component, is_survivor
    = id = component)."""
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    )
    comp = connected_components_hybrid(
        edges, ids, id_col=id_col, plain_iters=plain_iters, stats=stats
    )
    return comp.select(
        F.col("id").alias(id_col),
        "component",
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )


def _hash_chunks(positions: int):
    """(names, projections): the `simhash` bit string split into
    ≤32-bit integer chunks, conv'd once — 32 bits stay far inside a
    signed long, so ANY ``positions`` works (a whole-string conv
    would overflow past 64).  Shared by both banding forms so their
    hamming verification cannot diverge."""
    chunk_cols, chunk_names = [], []
    for ci, cs in enumerate(range(1, positions + 1, 32)):
        ln = min(32, positions - cs + 1)
        chunk_names.append(f"__c{ci}")
        chunk_cols.append(
            F.conv(F.substring("simhash", cs, ln), 2, 10)
            .cast("long")
            .alias(f"__c{ci}")
        )
    return chunk_names, chunk_cols


def _chunk_hamming(chunk_names) -> Column:
    """Σ bit_count(a_chunk XOR b_chunk) over the aliased pair chunks."""
    return sum(
        (
            F.bit_count(
                F.col(f"a{n}").bitwiseXOR(F.col(f"b{n}"))
            ).cast("int")
            for n in chunk_names
        ),
        F.lit(0),
    )


def block_bounds(positions: int, nblocks: int) -> "list[tuple[int, int]]":
    """(start, len) 1-based substring bounds splitting ``positions``
    bits as evenly as possible into ``nblocks`` pigeonhole blocks —
    shared by the banded joins here and the phash increment ledger
    (recorded block keys must match probe keys across increments)."""
    base, extra = divmod(positions, nblocks)
    bounds = []
    start = 1
    for bi in range(nblocks):
        ln = base + (1 if bi < extra else 0)
        bounds.append((start, ln))
        start += ln
    return bounds


def _join_parallelism(df: DataFrame) -> int:
    """Partition count for banded self-joins: max(cluster cores,
    configured shuffle partitions) — parameterised by the environment
    (defaultParallelism scales with the cluster, shuffle.partitions is
    the prod tuning knob), never a hard-coded local constant.

    Why explicit instead of AQE: the banded join's cost is its pair
    FAN-OUT (quadratic within buckets), which AQE's byte-based
    coalescing cannot see — a few MB of block keys coalesce to one
    partition and the multi-million-pair verify runs single-threaded
    (measured on the r08 flagship: the whole candidate join serialized
    onto 1 task).  A user-specified repartition pins the parallelism;
    the keys are hash-derived bits, so the spread is uniform by
    construction (skew on block keys is governed by the documented
    ``positions``/block-width knob, not by the partition count)."""
    spark = df.sparkSession
    try:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        shuffle_parts = 0
    return max(spark.sparkContext.defaultParallelism, shuffle_parts)


def banded_hamming_pairs(
    sh: DataFrame, max_hamming: int = 2, positions: int = 16
) -> DataFrame:
    """Pigeonhole-banded hamming pairs over (doc, simhash bit-string)
    signatures — recall 1.0 within ``max_hamming``; full-hash verify on
    integer chunks.  The block keys are ONE ``posexplode`` of a key
    array instead of a ``max_hamming + 1``-way union of frames.

    Why the single-scan form: the union form references the signature
    subtree once per block, and when the signature lineage is MAP-ONLY
    (e.g. image decode → DCT phash, payload/phash.py) Spark re-executes
    it per branch — measured 7× the decode work at ``max_hamming=6``;
    AQE's stage reuse only deduplicated the two join sides, not the
    sibling union branches.  The explode form scans the signatures
    once, and the explicit (blk, bkey) repartition makes BOTH join
    sides one ReusedExchange (accumulator-verified: N decodes for N
    images) while pinning the join parallelism (_join_parallelism —
    AQE's byte-based coalescing must not serialize the quadratic pair
    fan-out onto one task).  The hamming verify runs BEFORE the
    pair-dedup so the distinct shuffles only surviving pairs, not the
    full candidate fan-out (r08: 1.6M candidates → 19k survivors on
    the flagship corpus)."""
    bounds = block_bounds(positions, max_hamming + 1)
    chunk_names, chunk_cols = _hash_chunks(positions)
    blocked = sh.select("doc", "simhash", *chunk_cols).select(
        "doc",
        *chunk_names,
        F.posexplode(
            F.array(*[F.substring("simhash", s, ln) for s, ln in bounds])
        ).alias("blk", "bkey"),
    ).repartition(_join_parallelism(sh), "blk", "bkey")

    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("doc_a"),
        F.col("b.doc").alias("doc_b"),
        *[F.col(f"a.{n}").alias(f"a{n}") for n in chunk_names],
        *[F.col(f"b.{n}").alias(f"b{n}") for n in chunk_names],
    )
    return (
        cand.withColumn("hamming", _chunk_hamming(chunk_names))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()  # a pair can match in several blocks
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", positions: int = 16
) -> DataFrame:
    """SimHash over word tokens: position i takes the i-th hex nibble
    of md5(token) (positions beyond 32 draw from md5(token || "#k"),
    k = i//32 — one md5 per 32 positions, so widening the signature
    keeps yielding INDEPENDENT bits instead of constant zeros); the
    sign of Σ±1 across tokens gives bit i.  Near-duplicate docs differ
    in few positions (hamming distance on the bit string).  Relational
    + portable: no 64-bit arithmetic, just substr/IN/sum."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    n_hashes = (positions + 31) // 32
    for k in range(n_hashes):
        suffix = F.lit(f"#{k}") if k else F.lit("")
        toks = toks.withColumn(
            f"th{k}", F.md5(F.concat(F.col("tok"), suffix).cast("binary"))
        )
    aggs = [
        F.sum(
            F.when(
                F.substring(f"th{i // 32}", (i % 32) + 1, 1).isin(*_HEX_HIGH), 1
            ).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(positions)
    ]
    sums = toks.groupBy("doc").agg(*aggs)
    bits = F.concat(
        *[F.when(F.col(f"s{i}") >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(positions)]
    )
    return sums.select("doc", bits.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 2,
    positions: int = 16,
) -> DataFrame:
    """ALL pairs whose SimHash differs in ≤ max_hamming positions —
    recall 1.0 by the pigeonhole principle: the signature is split into
    ``max_hamming + 1`` blocks, so any pair within the hamming budget
    agrees EXACTLY on at least one block; candidates are the union of
    per-block equi-joins (bucketed, never all-pairs), deduplicated,
    then hamming-verified on the full signature.

    Scale shape: each block join is a shuffle on an ~(positions /
    (h+1))-bit key — at 100 TB the block width (via ``positions``)
    controls bucket sizes; widening the signature sharpens buckets
    without changing the recall guarantee."""
    sh = simhash(df, id_col, text_col, positions)
    return simhash_pairs_from_signatures(sh, max_hamming, positions)


def simhash_pairs_from_signatures(
    sh: DataFrame, max_hamming: int = 2, positions: int = 16
) -> DataFrame:
    """Pigeonhole-banded pair generation over precomputed (doc,
    simhash) signatures — see simhash_near_duplicates.

    Hamming verification runs on INTEGER chunks — the bit string is
    split into ≤32-bit pieces converted once (conv base-2; 32 bits
    stay far inside a signed long, so ANY ``positions`` works —
    including 64+, where a single whole-string conv would overflow)
    and hamming = Σ bit_count(chunk_a XOR chunk_b), a couple of
    codegen'd ops per pair instead of ``positions`` substring
    comparisons.

    r08: delegates to the single-scan ``banded_hamming_pairs`` form.
    The previous per-block UNION of frames referenced the signature
    subtree once per block AND per join side — the flagship plan
    executed the tokenize → md5 → 16-way aggregation six times
    (3 blocks × 2 sides, zero ReusedExchange).  The posexplode form
    computes the signature once under a shared exchange; output is
    identical (same pigeonhole blocks via ``block_bounds``, same
    chunked verify)."""
    return banded_hamming_pairs(sh, max_hamming, positions)
