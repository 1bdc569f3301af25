"""Incremental curation (pipeline/curation.py): the composed
quality → exact → near-dup → quota chain across INCREMENTS, over the
KeyLedger / MinHashLedger / QuotaLedger families.  Registration-order
near-dup semantics (earlier string id holds; module docstring)."""

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.manifest import KeyLedger
from python_extended_json_schema_validator_spark.pipeline.curation import (
    QuotaLedger,
    curate_increment,
)
from python_extended_json_schema_validator_spark.pipeline.incremental_neardup import (
    MinHashLedger,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string"
    )


INC1 = [
    ("a1", "t1 t2 t3 t4 t5 x1", "A"),
    ("a2", "u1 u2 u3 u4 u5 u6 u7", "A"),
    ("a3", "short one", "A"),                      # quality (< 5 toks)
    ("a4", "t1  t2 t3 t4 t5   x1", "A"),           # normalized == a1
    ("a5", "u1 u2 u3 u4 u5 u6 u7 extra", "A"),     # near-dup of a2
]
INC2 = [
    ("b1", "t1 t2 t3 t4 t5 x1", "A"),              # exact vs history
    ("b2", "u1 u2 u3 u4 u5 u6 u7 other", "A"),     # near vs history
    ("b3", "v1 v2 v3 v4 v5 v6 v7 v8 v9", "A"),     # fresh, lang A full
    ("b4", "w1 w2 w3 w4 w5 w6", "B"),              # fresh, lang B open
]


@pytest.fixture()
def ledgers(tmp_path):
    return (
        KeyLedger(root=str(tmp_path / "keys")),
        MinHashLedger(str(tmp_path / "nd"), num_hashes=8, bands=4),
        QuotaLedger(str(tmp_path / "quota")),
    )


def _run(spark, rows, ledgers, **kw):
    kl, nl, ql = ledgers
    out = curate_increment(
        _docs(spark, rows), "doc_id", kl, nl, ql,
        min_tokens=5, threshold=0.5, quota=2, **kw,
    )
    return {r.doc: r.status for r in out.collect()}


def test_two_increment_curation(spark, ledgers):
    s1 = _run(spark, INC1, ledgers)
    assert s1 == {
        "a1": "kept",
        "a2": "kept",        # quota 2 for lang A: a2 (longest) + a1
        "a3": "quality",
        "a4": "exact_dup",   # later id drops (registration order)
        "a5": "near_dup",    # a2 < a5 holds
    }, s1

    s2 = _run(spark, INC2, ledgers, update=False)
    assert s2 == {
        "b1": "exact_dup",   # fingerprint recorded by increment 1
        "b2": "near_dup",    # sketch match vs increment 1's a2
        "b3": "quota",       # lang A budget consumed by increment 1
        "b4": "kept",        # lang B untouched
    }, s2


def test_update_false_records_nothing(spark, ledgers):
    kl, nl, ql = ledgers
    _run(spark, INC1, ledgers, update=False)
    assert kl.dim(spark, "curation", "text_fp") is None
    assert nl.sigs_dim(spark) is None
    assert ql.kept_counts(spark) is None


def test_ledger_state_after_update(spark, ledgers):
    kl, nl, ql = ledgers
    _run(spark, INC1, ledgers)
    # q1 = 4 quality-passing docs, 3 distinct fingerprints (a4 == a1)
    assert kl.dim(spark, "curation", "text_fp").count() == 3
    # q2 sketches: a1, a2, a5 (a4 exact-dropped) — near-dups ARE
    # recorded (seen content)
    assert nl.sigs_dim(spark).count() == 3
    # quota counts: lang A kept 2
    counts = {r.lang: r.kept for r in ql.kept_counts(spark).collect()}
    assert counts == {"A": 2}


def test_null_text_is_quality_failure(spark, ledgers):
    """NULL text → 0 tokens → 'quality' (review finding: it used to
    fall out of both branches and coalesce to a false 'quota')."""
    rows = INC1 + [("a9", None, "A")]
    s = _run(spark, rows, ledgers, update=False)
    assert s["a9"] == "quality", s


def test_quota_never_exceeded_across_increments(spark, ledgers):
    """The QuotaLedger must cap TOTAL kept per language across any
    number of increments — each increment keeps only the remaining
    budget."""
    def fresh(tag, n):
        return [
            (f"{tag}{i}", f"{tag}w{i}a {tag}w{i}b {tag}w{i}c "
                          f"{tag}w{i}d {tag}w{i}e {tag}w{i}f", "A")
            for i in range(n)
        ]

    kl, nl, ql = ledgers
    kept_total = 0
    for tag, n in (("a", 3), ("b", 3), ("c", 3)):
        out = curate_increment(
            _docs(spark, fresh(tag, n)), "doc_id", kl, nl, ql,
            min_tokens=5, threshold=0.5, quota=4,
        )
        kept_total += out.where("status = 'kept'").count()
    assert kept_total == 4  # 3 + 1 + 0
    counts = {r.lang: r.kept for r in ql.kept_counts(spark).collect()}
    assert counts == {"A": 4}


def _py_curate(rows, min_tokens, threshold, quota, H=8, bands=4):
    """Independent driver-side replay of curate_increment over ONE
    increment with empty ledgers — mirrors the md5 minhash and the
    registration-order semantics using plain Python."""
    import hashlib
    import re

    def toks(t):
        t = (t or "").strip()
        return re.split(r"\s+", t.lower()) if t else []

    def shingles(t):
        ts = toks(t)
        if len(ts) >= 3:
            return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}
        return {" ".join(ts)}

    def sig(t):
        sh = shingles(t)
        return tuple(
            min(hashlib.md5(f"s{i}:{s}".encode()).hexdigest() for s in sh)
            for i in range(H)
        )

    status = {}
    # quality
    q1 = []
    for doc, text, lang in rows:
        n = len(toks(text))
        if n < min_tokens:
            status[doc] = "quality"
        else:
            q1.append((doc, text, lang))
    # exact (normalized fingerprint, min string id holds)
    def norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    by_fp = {}
    for doc, text, lang in q1:
        by_fp.setdefault(norm(text), []).append(doc)
    exact_drop = set()
    for docs in by_fp.values():
        surv = min(docs)
        exact_drop.update(d for d in docs if d != surv)
    for d in exact_drop:
        status[d] = "exact_dup"
    q2 = [(d, t, l) for d, t, l in q1 if d not in exact_drop]
    # near (banded candidates, est = agreement/H >= threshold,
    # later string id drops)
    sigs = {d: sig(t) for d, t, _ in q2}
    rows_per_band = H // bands
    nd_drop = set()
    docs2 = sorted(sigs)
    for i, a in enumerate(docs2):
        for b in docs2[i + 1:]:
            sa, sb = sigs[a], sigs[b]
            banded = any(
                sa[j * rows_per_band:(j + 1) * rows_per_band]
                == sb[j * rows_per_band:(j + 1) * rows_per_band]
                for j in range(bands)
            )
            if not banded:
                continue
            est = sum(x == y for x, y in zip(sa, sb)) / H
            if est >= threshold:
                nd_drop.add(max(a, b))
    for d in nd_drop:
        status[d] = "near_dup"
    q3 = [(d, t, l) for d, t, l in q2 if d not in nd_drop]
    # quota: per lang by (n_chars desc, doc asc)
    by_lang = {}
    for d, t, l in q3:
        by_lang.setdefault(l, []).append((d, t))
    for l, entries in by_lang.items():
        ranked = sorted(entries, key=lambda e: (-len(e[1]), e[0]))
        for rank, (d, _t) in enumerate(ranked):
            status[d] = "kept" if rank < quota else "quota"
    return status


def test_randomized_differential_vs_python_replay(spark, tmp_path):
    """200 random corpora-doc statuses vs an independent Python
    replay of the whole chain (tokens, normalized fingerprints, md5
    minhash banding + m/H estimate, registration order, quota
    windows) — any drift in any stage breaks equality."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(40):
        n = rng.choice([2, 5, 6, 7, 8])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        if rng.random() < 0.2 and rows:
            text = rows[rng.randrange(len(rows))][1]  # exact dup
        elif rng.random() < 0.2 and rows:
            text = rows[rng.randrange(len(rows))][1] + " zz"  # near
        rows.append((f"d{i:03d}", text, rng.choice(["A", "B"])))

    kl = KeyLedger(root=str(tmp_path / "k"))
    nl = MinHashLedger(str(tmp_path / "n"), num_hashes=8, bands=4)
    ql = QuotaLedger(str(tmp_path / "q"))
    got = {
        r.doc: r.status
        for r in curate_increment(
            _docs(spark, rows), "doc_id", kl, nl, ql,
            min_tokens=5, threshold=0.5, quota=3, update=False,
        ).collect()
    }
    want = _py_curate(rows, min_tokens=5, threshold=0.5, quota=3)
    assert got == want, {
        k: (got[k], want.get(k)) for k in got if got[k] != want.get(k)
    }
