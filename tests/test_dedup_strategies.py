"""Parity between the window and skew-proof agg dedup strategies:
identical violation MULTISETS on data with duplicate keys, duplicate
row_ids (the blame-the-survivor-copy case), scoped keys, and on real
testdata."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark import (
    EngineConfig,
    KeySpec,
    TableSpec,
    ValidationEngine,
)
from python_extended_json_schema_validator_spark.checks import uniqueness


def multiset(df):
    return Counter(
        (r.constraint_id, r.reason, r.row_id, r.observed_value)
        for r in df.collect()
    )


CASES = [
    # (rows, schema, keyspec)
    (
        [("r1", "a"), ("r2", "a"), ("r3", "b"), ("r4", "a")],
        "rid string, k string",
        KeySpec(("k",)),
    ),
    (
        # duplicate row_ids sharing a key: window blames m-1 copies of
        # the survivor id; agg must match exactly
        [("x", "a"), ("x", "a"), ("y", "b"), ("x", "b")],
        "rid string, k string",
        KeySpec(("k",)),
    ),
    (
        # NULL members excluded
        [("r1", None), ("r2", None), ("r3", "c"), ("r4", "c")],
        "rid string, k string",
        KeySpec(("k",)),
    ),
]


@pytest.mark.parametrize("rows,schema,ks", CASES)
def test_window_agg_parity_synthetic(spark, rows, schema, ks):
    df = spark.createDataFrame(rows, schema)
    spec = TableSpec(name="t", row_id="rid", unique=[ks])
    outs = {}
    for strat in ("window", "agg"):
        out = uniqueness.dup_violations(
            df, spec, ks, "dup_unique", "unique", strategy=strat
        )
        outs[strat] = multiset(out)
    assert outs["window"] == outs["agg"]
    assert sum(outs["window"].values()) > 0 or rows[0][1] is None


def test_window_agg_parity_scoped(spark):
    df = spark.createDataFrame(
        [("p1", "r1", "a"), ("p1", "r2", "a"), ("p2", "r3", "a")],
        "part string, rid string, k string",
    )
    spec = TableSpec(
        name="t", row_id="rid", scope_col="part",
        unique=[KeySpec(("k",), limit_scope=True)],
    )
    outs = {
        s: multiset(
            uniqueness.dup_violations(
                df, spec, spec.unique[0], "dup_unique", "unique", strategy=s
            )
        )
        for s in ("window", "agg")
    }
    assert outs["window"] == outs["agg"]
    assert sum(outs["window"].values()) == 1


def test_window_agg_parity_testdata(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumn(
        "li_id", (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    )
    spec = TableSpec(
        name="lineitem", row_id="li_id",
        primary_keys=[KeySpec(("l_partkey", "l_suppkey"))],
    )
    outs = {}
    for strat in ("window", "agg"):
        res = ValidationEngine(
            [spec], config=EngineConfig(dedup_strategy=strat)
        ).validate({"lineitem": li})
        outs[strat] = multiset(res.violations)
    assert outs["window"] == outs["agg"]
    assert sum(outs["window"].values()) > 100


# ------------------------------------------------------------------ #
# Round 6: large-star/small-star vs plain propagation (verdict #7)    #
# ------------------------------------------------------------------ #


def test_star_components_equal_plain(spark):
    """The two-phase star variant (Kiveris et al. 2014) produces
    EXACTLY the labels of plain min-label propagation on a random
    graph + stars + short chains + singletons."""
    import random

    from python_extended_json_schema_validator_spark.pipeline.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(3)
    n = 1500
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(1100)]
    edges += [(5000 + i, 5000 + i + 1) for i in range(15)]
    ids = (
        [(i,) for i in range(n)]
        + [(5000 + i,) for i in range(16)]
        + [(99999,)]  # singleton never in edges
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    idf = spark.createDataFrame(ids, "id long")
    plain = {
        r.id: r.component
        for r in connected_components(e, idf, max_iter=100).collect()
    }
    st: dict = {}
    star = {
        r.id: r.component
        for r in connected_components_star(e, idf, stats=st).collect()
    }
    assert plain == star
    assert st["converged"] and st["iterations"] <= 15
    assert star[99999] == 99999  # singleton labels itself


def test_star_components_collapse_deep_chain(spark):
    """Worst-case diameter: a 400-node path.  Plain propagation
    raises its strict guard at max_iter=25 (documented); the star
    variant converges in O(log² n) rounds with every node labeled by
    the chain head."""
    import pytest as _pytest

    from python_extended_json_schema_validator_spark.pipeline.dedup import (
        connected_components,
        connected_components_star,
    )

    ce = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "src long, dst long"
    )
    cids = spark.createDataFrame([(i,) for i in range(401)], "id long")
    with _pytest.raises(RuntimeError):
        connected_components(ce, cids, max_iter=25)
    st: dict = {}
    comp = connected_components_star(ce, cids, stats=st)
    assert st["converged"] and st["iterations"] <= 15
    assert {r.component for r in comp.collect()} == {0}


def test_star_components_strict_guard(spark):
    """max_iter exhaustion raises (strict) / warns with partial
    labels (strict=False) — same contract as plain propagation."""
    import pytest as _pytest

    from python_extended_json_schema_validator_spark.pipeline.dedup import (
        connected_components_star,
    )

    ce = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "src long, dst long"
    )
    cids = spark.createDataFrame([(i,) for i in range(301)], "id long")
    with _pytest.raises(RuntimeError):
        connected_components_star(ce, cids, max_iter=2)
    st: dict = {}
    out = connected_components_star(
        ce, cids, max_iter=2, strict=False, stats=st
    )
    assert not st["converged"]
    # partial labels are still a valid coarsening: never cross-merge
    assert out.count() == 301


def test_hybrid_components_equal_plain_and_star(spark):
    """connected_components_hybrid == plain == star on graphs from
    BOTH regimes: a shallow random graph (plain phase converges, star
    never runs) and a deep chain (plain phase leaves residue, the
    contracted quotient finishes under star)."""
    import random

    from python_extended_json_schema_validator_spark.pipeline.dedup import (
        connected_components_hybrid,
        connected_components_star,
    )

    rng = random.Random(11)
    n = 1200
    shallow = [(rng.randrange(n), rng.randrange(n)) for _ in range(700)]
    deep = [(10000 + i, 10000 + i + 1) for i in range(300)]
    edges = spark.createDataFrame(
        shallow + deep, "src long, dst long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in range(n)] + [(10000 + i,) for i in range(301)],
        "id long",
    )
    # star as the reference labeler: exact on any graph (trusted by
    # the equality/guard tests above) and O(log n) rounds where plain
    # needs one round per chain hop (max_iter=400 here cost minutes)
    want = {
        r.id: r.component
        for r in connected_components_star(edges, ids).collect()
    }
    st: dict = {}
    hybrid = {
        r.id: r.component
        for r in connected_components_hybrid(
            edges, ids, plain_iters=6, stats=st
        ).collect()
    }
    assert hybrid == want
    assert not st["plain_converged"] and st["converged"]
    assert st["star_iterations"] > 0  # the deep chain forced phase 2

    # truly-shallow graph (hub-spoke stars, diameter 2 — the banded
    # near-dup shape): plain phase converges, star never runs
    spokes = [(h * 10 + s, h * 10) for h in range(40) for s in (1, 2, 3)]
    e2 = spark.createDataFrame(spokes, "src long, dst long")
    i2 = spark.createDataFrame([(i,) for i in range(400)], "id long")
    st2: dict = {}
    h2 = {
        r.id: r.component
        for r in connected_components_hybrid(e2, i2, stats=st2).collect()
    }
    w2 = {
        r.id: r.component
        for r in connected_components_star(e2, i2).collect()
    }
    assert h2 == w2
    assert st2["converged"] and st2["star_iterations"] == 0


def test_dedup_survivors_end_to_end(spark):
    """dedup_survivors returns one row per doc; components chain
    through transitivity (A~B~C with no A—C pair) and is_survivor is
    exactly id == component (min reachable id)."""
    from python_extended_json_schema_validator_spark.pipeline.dedup import (
        dedup_survivors,
    )

    base = "the quick brown fox jumps over the lazy sleeping dog today"
    rows = [
        (1, base),
        (2, base + " zz"),          # near-dup of 1
        (3, base + " zz yy"),       # near-dup of 2, farther from 1
        (10, "completely different words about spark dataframes here"),
        (11, "completely different words about spark dataframes here"),
        (20, "a lone unique document with nothing in common at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st: dict = {}
    out = dedup_survivors(
        df, "doc_id", k=3, num_hashes=8, bands=4, threshold=0.4, stats=st
    ).collect()
    got = {r.doc_id: (r.component, r.is_survivor) for r in out}
    assert len(got) == 6  # one row per input doc, always
    # exact dup pair collapses; survivor is the min id
    assert got[10] == (10, True) and got[11] == (10, False)
    # the lone doc survives itself
    assert got[20] == (20, True)
    # the near-dup chain shares ONE component rooted at 1
    assert got[1] == (1, True)
    assert got[2][0] == 1 and not got[2][1]
    # every doc's flag is exactly id == component
    for i, (comp, surv) in got.items():
        assert surv == (i == comp)
    assert st["converged"]


def test_survivors_from_pairs_any_generator(spark):
    """survivors_from_pairs gives the same verdict shape over a
    simhash pair generator as dedup_survivors does over minhash —
    any (doc_a, doc_b) source plugs into the clustering tail."""
    from python_extended_json_schema_validator_spark.pipeline import dedup

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
        (3, "totally different content with other words inside it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_near_duplicates(
        df, "doc_id", "text", max_hamming=0, positions=16
    )
    out = dedup.survivors_from_pairs(
        pairs, df.select("doc_id"), id_col="doc_id"
    ).collect()
    got = {r.doc_id: (r.component, r.is_survivor) for r in out}
    assert got == {1: (1, True), 2: (1, False), 3: (3, True)}
