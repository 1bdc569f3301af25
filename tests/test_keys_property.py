"""Property-based parity: the Spark canonical-key algebra must agree
with the reference's json.dumps canonicalization (GenKeyStrings,
index_check.py:262-293) on arbitrary atomic values — including quotes,
backslashes, control characters, unicode, and numeric edge cases."""

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.keys import canonical_key
from python_extended_json_schema_validator_spark.providers import canonical_key_py

text_values = st.text(
    alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
    max_size=20,
)


def spark_canonical_strings(spark, values, dtype):
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r.k for r in df.select(canonical_key([F.col("v")]).alias("k")).collect()]


def test_string_canonicalization_bulk_random(spark):
    # one Spark job over many Hypothesis-style samples (a @given-per-row
    # loop would launch hundreds of jobs)
    samples = (
        ['he"llo', "back\\slash", "tab\tchar", "new\nline", "null\x00byte",
         "ünïcødé", "", " ", ",", "[]", '{"a":1}', "'quoted'", "\x1f", "€"]
        + [f"s{i}" for i in range(50)]
    )
    got = spark_canonical_strings(spark, samples, "string")
    want = [json.dumps(v, ensure_ascii=False) for v in samples]
    # json.dumps with ensure_ascii=False matches Spark's to_json
    # escaping for the mandatory escapes; compare parsed values to be
    # robust to optional-escape differences (e.g.  forms)
    for g, w, v in zip(got, want, samples):
        assert json.loads(g) == v, (g, w, v)
        assert canonical_key_py(v) == json.dumps(
            v, separators=(",", ":"), ensure_ascii=False
        )
        assert json.loads(canonical_key_py(v)) == v


def test_long_canonicalization_bulk(spark):
    samples = [0, 1, -1, 2**31, -(2**31), 2**62, -(2**62), 42]
    got = spark_canonical_strings(spark, samples, "long")
    assert got == [json.dumps(v) for v in samples]


def test_double_canonicalization_roundtrip(spark):
    # doubles use the generic to_json path; values must round-trip
    samples = [0.0, 1.5, -2.25, 1e-3, 12345.678]
    got = spark_canonical_strings(spark, samples, "double")
    for g, v in zip(got, samples):
        assert float(json.loads(g)) == v


def test_boolean_canonicalization(spark):
    got = spark_canonical_strings(spark, [True, False], "boolean")
    assert got == ["true", "false"]


@given(st.lists(text_values, min_size=2, max_size=4))
@settings(max_examples=30, deadline=None)
def test_composite_key_py_twin_matches_json_dumps(members):
    # driver-side twin (provider canonicalization) vs the canonical
    # serialization — ensure_ascii=False so provider keys byte-match
    # Spark's raw-UTF-8 to_json output (the reference's GenKeyStrings
    # uses the ascii-escaped default, but OUR invariant is cross-table
    # joinability inside this engine, where Spark sets the format)
    assert canonical_key_py(tuple(members)) == json.dumps(
        list(members), sort_keys=True, separators=(",", ":"),
        ensure_ascii=False,
    )


def test_unicode_keys_join_across_encoders(spark):
    """Cross-encoder joinability (review finding): a provider key with
    non-ASCII text must match the Spark-side canonical literal of the
    same string — otherwise FK probes would go falsely stale."""
    from python_extended_json_schema_validator_spark import (
        ForeignKeySpec, KeySpec, TableSpec, ValidationEngine,
    )
    from python_extended_json_schema_validator_spark.providers import (
        InlineProvider,
    )

    dspec = TableSpec(name="d", row_id="rid", primary_keys=[KeySpec(("k",))])
    fspec = TableSpec(
        name="f", row_id="rid",
        foreign_keys=[ForeignKeySpec(("k",), ref_table="d")],
    )
    prov = InlineProvider(table="d", keys=["café", "naïve"])
    fdf = spark.createDataFrame(
        [("r1", "café"), ("r2", "naïve"), ("r3", "plain")],
        "rid string, k string",
    )
    res = ValidationEngine([dspec, fspec], providers=[prov]).validate({"f": fdf})
    got = sorted((r.row_id, r.reason) for r in res.violations.collect())
    assert got == [("r3", "stale_fk")]


def test_key_strings_py_matches_spark_keyed(spark):
    """key_strings_py (the driver-side guess-world twin) produces the
    SAME multiset of key strings as uniqueness.keyed over shredded
    documents, for fan-out, composite, scoped and missing-member
    shapes."""
    import random

    from python_extended_json_schema_validator_spark import (
        KeySpec,
        TableSpec,
    )
    from python_extended_json_schema_validator_spark.checks import uniqueness
    from python_extended_json_schema_validator_spark.docshred import (
        shred_documents,
    )
    from python_extended_json_schema_validator_spark.keys import (
        key_strings_py,
    )
    from python_extended_json_schema_validator_spark.schemas import (
        load_schemas,
    )

    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "kp://t/1.0",
        "type": "object",
        "properties": {"a": {"unique": True}, "b": {}, "c": {}},
        "unique": ["a", "b"],
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert not [i for i in issues if i.severity == "error"], issues
    cs = registry["kp://t/1.0"]
    # a SCOPED key on the same shredded table (grammar holds one
    # unique per node, so this one is spec-level)
    scoped = KeySpec(("c",), name="kc", limit_scope=True)

    rng = random.Random(20260817)
    pool = [1, 2.5, "x", "esc\"d", True, None, [1, 2], {"k": "v"}, [],
            {"n": [3, "y"]}, "ü"]

    def gen():
        d = {}
        for m in ("a", "b", "c"):
            if rng.random() < 0.85:
                d[m] = rng.choice(pool)
        return d

    docs = [(f"f{i:03d}", gen()) for i in range(120)]
    # the scoped key reads the "c" instance column — make sure the
    # shredder emits it (spec-level keys are outside the compiled
    # schema's touch set)
    import dataclasses
    cs = dataclasses.replace(
        cs, value_paths=tuple(sorted(set(cs.value_paths) | {"c"}))
    )
    shredded = shred_documents(spark, docs, cs)
    for ks in list(cs.table_spec.unique) + [scoped]:
        k = uniqueness.keyed(shredded, cs.table_spec, ks)
        got = {}
        for r in k.collect():
            got.setdefault(r["__row_id"], []).append(r["__key"])
        for fname, doc in docs:
            want = sorted(
                key_strings_py(
                    doc, ks.members, limit_scope=ks.limit_scope,
                    scope=fname,
                )
            )
            assert sorted(got.get(fname, [])) == want, (
                ks.name, fname, doc, got.get(fname), want,
            )
