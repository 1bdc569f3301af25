"""$dynamicRef / $recursiveRef lexical-scope compilation + 2019-09+
$ref-sibling semantics, differential against the jsonschema library
(the engine the reference delegates to, extensible_validator.py
:1163-1194 via extend_validator_helpers.py:50-64).

Parity targets ([verified] probes on jsonschema 4.26):
- 2019-09/2020-12 ``$ref`` keeps sibling keywords (conjunctive);
  drafts ≤07 replace the node wholly;
- ``$dynamicRef: "#a"`` with no same-named ``$dynamicAnchor`` in any
  other resource ≡ ``$ref: "#a"`` (lexical fallback is EXACT);
- ``$recursiveRef: "#"`` with no ``$recursiveAnchor: true`` elsewhere
  ≡ ``$ref: "#"``;
- plain ``$ref`` resolves ``$anchor``/``$dynamicAnchor`` fragments.

When an override IS possible (another resource declares the anchor)
the lexical target still compiles and a schema_warning records the
partial enforcement — the no-silent-drops invariant.
"""

import json
import random

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks
from python_extended_json_schema_validator_spark.docshred import shred_documents
from python_extended_json_schema_validator_spark.schemas import load_schemas

D2020 = "https://json-schema.org/draft/2020-12/schema"
D2019 = "https://json-schema.org/draft/2019-09/schema"

SCHEMA_DYN = {
    "$schema": D2020,
    "$id": "dyn://battery/1.0",
    "type": "object",
    "$defs": {
        "amount": {"$dynamicAnchor": "amt", "type": "integer", "minimum": 0},
        "tag": {"$anchor": "tag", "type": "string", "pattern": "^[a-z]+$"},
        "bounded": {"minimum": -5},
    },
    "properties": {
        # lexical $dynamicAnchor fallback (exact — single resource)
        "x": {"$dynamicRef": "#amt"},
        # $dynamicRef with sibling keywords (2020-12 keeps both)
        "y": {"$dynamicRef": "#amt", "maximum": 10},
        # plain $ref to a static $anchor fragment
        "z": {"$ref": "#tag"},
        # $ref with siblings — both constraints apply in 2020-12
        "w": {"$ref": "#/$defs/bounded", "maximum": 100},
    },
    "required": ["x"],
}

POOL = [None, True, False, -7, -1, 0, 3, 10, 11, 99, 100, 150, 0.5, 2.0,
        "", "ok", "BAD", "abc", "a1", [1], {"k": 1}]


def _reasons_mine(spark, schema, uri, docs):
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry[uri]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)
    return mine, issues


def _assert_differential(spark, schema, uri, docs):
    import jsonschema

    mine, _ = _reasons_mine(spark, schema, uri, docs)
    v = jsonschema.validators.validator_for(schema)(
        schema, format_checker=jsonschema.FormatChecker()
    )
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


def test_dynamicref_lexical_differential(spark):
    rng = random.Random(20260817)
    docs = []
    for i in range(250):
        doc = {}
        for p in ("x", "y", "z", "w"):
            if rng.random() < 0.3:
                continue
            doc[p] = rng.choice(POOL)
        docs.append((f"d{i}", doc))
    _assert_differential(spark, SCHEMA_DYN, "dyn://battery/1.0", docs)


SCHEMA_REC = {
    "$schema": D2019,
    "$id": "rec://battery/1.0",
    "type": "object",
    "properties": {
        "name": {"type": "string", "minLength": 2},
        "child": {"$recursiveRef": "#"},
    },
    "required": ["name"],
}


def test_recursiveref_2019_differential(spark):
    # depth ≤1 documents: the engine inlines ONE level of recursion
    # (cycle guard, warned) so deeper nests are out of compiled scope
    docs = [
        ("r0", {"name": "ok"}),
        ("r1", {"name": "x"}),            # minLength at root
        ("r2", {"name": "ok", "child": 3}),       # child type
        ("r3", {"name": "ok", "child": {"name": "ab"}}),
        ("r4", {"name": "ok", "child": {"name": 1}}),   # child.name type
        ("r5", {"name": "ok", "child": {}}),            # child required
        ("r6", {"name": "ok", "child": {"name": "z"}}),  # child minLength
        ("r7", {}),                        # required
        ("r8", {"name": "ok", "child": "s"}),
    ]
    _assert_differential(spark, SCHEMA_REC, "rec://battery/1.0", docs)
    # the one-level recursion bound is RECORDED, never silent
    _, issues = _reasons_mine(spark, SCHEMA_REC, "rec://battery/1.0", docs[:1])
    assert any(
        "recursive $recursiveRef" in i.description and i.severity == "warning"
        for i in issues
    ), issues


def test_draft7_ref_siblings_ignored(spark):
    # drafts ≤07: $ref replaces the node — the sibling maximum is DEAD
    # ([verified] probe: jsonschema Draft7 accepts x=20)
    schema = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "sib7://t/1.0",
        "definitions": {"pos": {"minimum": 0}},
        "properties": {"x": {"$ref": "#/definitions/pos", "maximum": 10}},
    }
    docs = [("a", {"x": 20}), ("b", {"x": -1}), ("c", {"x": 5})]
    _assert_differential(spark, schema, "sib7://t/1.0", docs)


def test_dynamic_override_possible_warns_but_compiles(spark):
    # a SECOND resource declares the same $dynamicAnchor name → the
    # dynamic scope could override the lexical target; the compiler
    # must warn (no silent drop) and still enforce the lexical target
    other = {
        "$schema": D2020,
        "$id": "dyn://other/1.0",
        "$dynamicAnchor": "amt",
        "type": "string",
    }
    registry, issues = load_schemas(
        [("s.json", SCHEMA_DYN), ("o.json", other)]
    )
    assert any(
        i.severity == "warning" and "$dynamicRef" in i.description
        and "override" in i.description
        for i in issues
    ), issues
    cs = registry["dyn://battery/1.0"]
    shredded = shred_documents(spark, [("a", {"x": -3}), ("b", {"x": 3})], cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    got = {(r.row_id, r.reason) for r in viol.collect()}
    assert ("a", "minimum") in got and not any(rid == "b" for rid, _ in got)


def test_recursive_anchor_elsewhere_warns(spark):
    other = {
        "$schema": D2019,
        "$id": "rec://other/1.0",
        "$recursiveAnchor": True,
        "type": "object",
    }
    _, issues = load_schemas([("s.json", SCHEMA_REC), ("o.json", other)])
    assert any(
        i.severity == "warning" and "$recursiveRef" in i.description
        and "override" in i.description
        for i in issues
    ), issues
