"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k as the exactness baseline, sign-LSH bucketed
ANN as the scale path, and embedding-cosine near-duplicate detection.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF);
accumulation is in DOUBLE in declared index order so results are
deterministic and reproducible by the SQL oracle.

Scale shape: brute-force is a broadcast nested-loop (queries tiny ×
corpus huge — fine, one scan); the ANN variant buckets by sign
pattern so the join fans out only within buckets.  For real 10^12-row
ANN you'd persist an IVF index table (centroid assignment via k-means
— the same bucketed-join shape with learned buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (ranked last) for zero-norm vectors — under Spark 4's
    default ANSI mode a bare division would throw DIVIDE_BY_ZERO and
    abort the job on the first all-zeros embedding (a common
    padding/failed-encoder value)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(None).cast("double")).otherwise(
        dot(a, b) / denom
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self-match
    excluded, ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # broadcast the QUERY side (small) against the corpus scan
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _matrix_lit(rows) -> Column:
    """One literal array<array<double>> via a single parsed SQL
    expression.  The per-element ``F.array(*[F.lit(x) ...])`` form
    costs one py4j round trip per scalar — ≈0.5 s of driver time per
    8×64 matrix, paid once per table per join side on every query
    construction (r08-measured ~100× slower than the parser).  The
    ``D`` suffix forces DOUBLE literals (bare decimals parse as
    DECIMAL); ``repr`` round-trips doubles exactly — bitwise-verified
    including denormals, -0.0 and 1e300-scale values."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in row) + ")"
            for row in rows
        )
        + ")"
    )


def random_hyperplanes(
    dim: int, bits: int = 8, tables: int = 4, seed: int = 42
) -> list:
    """Seeded Gaussian hyperplanes for cosine LSH: ``tables`` tables of
    ``bits`` planes each, every plane a ``dim``-vector.  Deterministic
    (same seed → same planes on driver and in the SQL oracle)."""
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def hyperplane_bucket(vec: Column, planes: list) -> Column:
    """One table's bucket key: sign(R·v) per plane, concatenated —
    the classic random-projection cosine LSH (sign agreement
    probability = 1 - angle/π).  Pure column algebra, JVM-side: the
    whole table of planes is ONE literal array<array<double>> and the
    signs come from a single ``transform`` whose lambda holds one
    zip_with/aggregate dot-product template — a compact expression
    tree (one aggregate node total) instead of ``bits`` separate
    aggregates, which keeps analysis/codegen cost flat as bits×tables
    grows.  The plane matrix is ONE parsed literal (_matrix_lit) so
    driver-side construction is a single py4j call."""
    planes_lit = _matrix_lit(planes)
    signs = F.transform(
        planes_lit,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.concat_ws("", signs)


def _multi_table_buckets(
    df: DataFrame, id_alias: str, vec_col: str, id_col: str, planes: list
) -> DataFrame:
    """(id, table, bucket) rows — one row per LSH table
    (OR-amplification: a pair is a candidate if ANY table agrees).
    Vectors are NOT carried: candidates dedup on narrow id pairs and
    vectors re-attach afterwards — at scale the distinct shuffles
    16-byte pairs instead of dim×8-byte arrays."""
    frames = [
        df.select(
            F.col(id_col).alias(id_alias),
            F.lit(t).alias("tbl"),
            hyperplane_bucket(F.col(vec_col), table_planes).alias("bucket"),
        )
        for t, table_planes in enumerate(planes)
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with multi-table
    OR-amplification: candidates share a bucket in ANY of ``tables``
    seeded sign(R·v) tables; exact cosine + ranking on the candidate
    set only.  Knobs: more ``bits`` → smaller buckets (less work,
    lower per-table recall); more ``tables`` → higher recall.  Gaussian
    planes make bucket sizes data-independent-ish (no hot leading-dim
    buckets), and the equi-join per table replaces the all-pairs scan.
    Pass ``dim`` (embedding width) to skip the inference scan — at
    production scale the width is known from the table schema."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, bits, tables, seed)
    q = _multi_table_buckets(queries, "query_id", vec_col, id_col, planes)
    c = _multi_table_buckets(corpus, "neighbor_id", vec_col, id_col, planes)
    cand = (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _centroid_probes(vec: Column, centroids, nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest cluster ids for one vector —
    PURE column algebra, zero joins, zero shuffles.

    The k centroids become ONE literal array<array<double>> (the same
    trick hyperplane_bucket uses for its plane matrix); a two-arg
    ``transform`` lambda computes (L2², cluster) structs per centroid,
    ``array_sort`` orders them (struct compare: d2 asc, then cluster
    asc — identical tie-break to the old window), and ``slice`` takes
    the top nprobe.  Assignment of 10^12 rows is map-only; the old
    shape (crossJoin ×k then a row_number window) shuffled n×k
    vector-carrying rows per iteration just to take an argmin."""
    cents_lit = _matrix_lit(centroids)
    scored = F.transform(
        cents_lit,
        lambda cv, ci: F.struct(
            F.aggregate(
                F.zip_with(
                    vec, cv, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2"),
            ci.alias("cluster"),
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cluster"]
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
):
    """Lloyd's k-means expressed as DataFrame ops — the index-build
    step of IVF.  Per iteration: assignment is a MAP-ONLY literal-
    centroid-matrix argmin (_centroid_probes — no join, no shuffle);
    the only shuffle left is the centroid-update
    posexplode+groupBy((cluster, dim)) average, whose shuffle volume
    is rows×dim scalars with map-side partial aggregation.  Only k×dim
    floats ever reach the driver (the centroids themselves) — the
    classic driver-coordinated iterative shape.

    Deterministic: initial centroids are the k lowest-id vectors.
    Returns a list of k python float-lists.
    """
    init = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r.v] for r in init]
    # the iterative working set: persist so each Lloyd's iteration
    # re-reads a cached columnar projection instead of re-scanning the
    # source (at 10^12 rows that's iters-1 saved full-table scans;
    # storage is just the projected vector column)
    vecs = df.select(F.col(vec_col).alias("v")).persist()
    try:
        for _ in range(iters):
            assigned = vecs.select(
                _centroid_probes(F.col("v"), centroids, 1)
                .getItem(0)
                .alias("cluster"),
                "v",
            )
            sums = (
                assigned.select(
                    "cluster", F.posexplode("v").alias("dim", "x")
                )
                .groupBy("cluster", "dim")
                .agg(F.avg("x").alias("m"))
                .collect()
            )
            new_c = {r.cluster: dict() for r in sums}
            for r in sums:
                new_c[r.cluster][r.dim] = r.m
            for ci in range(k):
                if ci in new_c:
                    dims = new_c[ci]
                    centroids[ci] = [dims[d] for d in sorted(dims)]
    finally:
        vecs.unpersist()
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """→ (id, vec, cluster) rows; each vector appears in its nprobe
    nearest clusters (nprobe=1 for corpus indexing, >1 for queries).
    MAP-ONLY: literal-centroid argmin + one explode — the executed
    plan contains NO Exchange (asserted in tests/test_plans.py)."""
    return (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .select(
            "i",
            "v",
            F.explode(
                _centroid_probes(F.col("v"), centroids, nprobe)
            ).alias("cluster"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 4,
) -> DataFrame:
    """IVF approximate top-k: k-means the corpus into nlist cells
    (index build), probe each query's nprobe nearest cells, exact
    cosine only within probed cells.  The join is a cluster-equi-join
    — the 10^12-scale replacement for the all-pairs scan; recall is
    tunable via nprobe."""
    cents = kmeans_centroids(corpus, id_col, vec_col, k=nlist, iters=iters)
    c_idx = ivf_assign(corpus, cents, id_col, vec_col, nprobe=1).select(
        F.col("i").alias("neighbor_id"), F.col("v").alias("cv"), "cluster"
    )
    q_idx = ivf_assign(queries, cents, id_col, vec_col, nprobe=nprobe).select(
        F.col("i").alias("query_id"), F.col("v").alias("qv"), "cluster"
    )
    scored = (
        q_idx.join(c_idx, "cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int = None,
) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ threshold): random-hyperplane
    LSH candidates with multi-table OR-amplification, exact cosine
    verification on candidates only.  At cos ≥ 0.95 (angle ≤ ~18°) a
    single table of 8 planes already agrees with probability ≈
    (1-0.1)^8 ≈ 0.43; four tables push candidate recall ≈ 0.9+, and
    the verification step means precision is exact regardless.  Pass
    ``dim`` to skip the width-inference scan."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, bits, tables, seed)
    v = _multi_table_buckets(df, "doc", vec_col, id_col, planes)
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
        )
        .distinct()
    )
    va = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("__vb"))
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a", "doc_b", cosine(F.col("__va"), F.col("__vb")).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )
