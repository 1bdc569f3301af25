"""Round-5 ADVICE fixes, each verified differentially against the
jsonschema library (the engine the reference delegates to):

1. enum/const integer equality past 2^53 — decimal(38,0) leg
   (row_checks._enum_pred), probe: 9007199254740992 must NOT match
   enum [9007199254740993];
2. anchor discovery skips data positions (enum/const/default) —
   a {"$anchor": ...} inside enum DATA must not resolve a $ref
   (schemas._find_anchor);
3. draft-03 disallow entries naming an unknown type record a
   schema_warning instead of silently compiling nothing
   (jsonschema Draft3 raises UnknownType there).
"""

import jsonschema
import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks
from python_extended_json_schema_validator_spark.docshred import shred_documents
from python_extended_json_schema_validator_spark.schemas import load_schemas

D2020 = "https://json-schema.org/draft/2020-12/schema"


def _reasons(spark, schema, uri, docs):
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry[uri]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(
        cs.table_spec.checks, json_mode=True,
        formats=cs.table_spec.custom_formats,
    )
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)
    return mine, issues


BIG = 9007199254740993  # 2^53 + 1


def test_enum_const_bigint_exact(spark):
    schema = {
        "$schema": D2020,
        "$id": "adv://enum/1.0",
        "type": "object",
        "properties": {
            "a": {"enum": [BIG, "x"]},
            "b": {"const": BIG},
            # float member keeps numeric (double) matching
            "c": {"enum": [1, 2.0, 3]},
        },
    }
    docs = [
        ("match_exact", {"a": BIG, "b": BIG}),
        # the ADVICE probe: differs only past 2^53 — double would
        # falsely accept, decimal(38,0) must reject
        ("off_by_one", {"a": BIG - 1, "b": BIG - 1}),
        ("float_form", {"c": 2.0}),
        ("int_vs_float_member", {"c": 2}),
        ("c_miss", {"c": 4}),
        ("str_ok", {"a": "x"}),
        ("neg", {"a": -BIG}),
        ("huge", {"a": 10**40}),
        ("b_float", {"b": float(BIG - 1)}),
    ]
    mine, _ = _reasons(spark, schema, "adv://enum/1.0", docs)
    v = jsonschema.validators.validator_for(schema)(schema)
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        assert mine[name] == want, (name, mine[name], want)


def test_huge_int_literals_compile_and_compare(spark):
    # schema literals beyond the 64-bit long range must not crash
    # compilation (F.lit throws on them) and the decimal legs stay
    # exact where jsonschema is exact
    big = 2**64 + 3
    schema = {
        "$schema": D2020,
        "$id": "adv://huge/1.0",
        "type": "object",
        "properties": {
            "a": {"enum": [big]},
            "b": {"multipleOf": big},
            "c": {"minimum": 2**70},
            "d": {"maximum": 10**309},  # beyond double range → +inf leg
        },
    }
    docs = [
        ("hit", {"a": big, "b": big * 3, "c": 2**70 + 5, "d": 1}),
        ("miss", {"a": big - 1, "b": big + 1, "c": 5}),
        ("float_c", {"c": 1e22}),
    ]
    mine, issues = _reasons(spark, schema, "adv://huge/1.0", docs)
    assert [i for i in issues if i.severity == "error"] == [], issues
    v = jsonschema.validators.validator_for(schema)(schema)
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        assert mine[name] == want, (name, mine[name], want)


def test_anchor_in_enum_data_not_resolved(spark):
    # {"$anchor": "adat"} lives inside enum DATA — jsonschema's
    # referencing would leave '#adat' unresolved; the engine must not
    # compile the data dict as the ref target (it used to, turning the
    # ref into a no-op {"$anchor": ...} schema that accepts anything —
    # here the data dict carries keywords that would flag everything)
    schema = {
        "$schema": D2020,
        "$id": "adv://anchor/1.0",
        "type": "object",
        "$defs": {
            "datacarrier": {
                "enum": [{"$anchor": "adat", "type": "integer", "maximum": 1}]
            },
            "real": {"$anchor": "areal", "type": "string"},
        },
        "properties": {
            "ok": {"$ref": "#areal"},
            "bad": {"$ref": "#adat"},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    # the unresolvable ref must surface as an issue (error or warning),
    # never as a silently-compiled data subtree
    assert any("adat" in i.description for i in issues), issues
    cs = registry.get("adv://anchor/1.0")
    if cs is not None:
        # the real anchor still compiles: a non-string `ok` flags type
        mine, _ = _reasons(
            spark, schema, "adv://anchor/1.0",
            [("t1", {"ok": 5}), ("t2", {"ok": "s", "bad": 99})],
        )
        assert "type" in mine["t1"]


def test_draft3_disallow_unknown_type_warns(spark):
    schema = {
        "$schema": "http://json-schema.org/draft-03/schema#",
        "id": "adv://disallow/1.0",
        "type": "object",
        "properties": {
            "a": {"disallow": ["foo", "integer"]},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    warns = [i for i in issues if i.severity == "warning"]
    assert any("disallow" in i.description and "foo" in i.description
               for i in warns), issues
    # the KNOWN entry still compiles: integer instances are disallowed
    mine, _ = _reasons(
        spark, schema, "adv://disallow/1.0",
        [("int", {"a": 3}), ("str", {"a": "x"})],
    )
    assert mine["int"] == {"disallow"}
    assert mine["str"] == set()
