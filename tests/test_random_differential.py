"""Randomized differential: seeded random documents against a schema
exercising EVERY compiled keyword family, leaf reasons compared with
the jsonschema library per document (the exact engine the reference
delegates structural validation to).

Reason SETS are compared (not multisets): for propertyNames /
patternProperties / items, jsonschema emits one error per offending
name/element while this engine emits one per keyword — a documented
granularity difference (row_checks.compile_check); the violated
keyword set and the verdict are identical.

One Spark job validates all docs (driver-side shred of ~300 docs);
the seed is fixed so failures are reproducible.
"""

import json
import random

from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks
from python_extended_json_schema_validator_spark.docshred import shred_documents
from python_extended_json_schema_validator_spark.schemas import load_schemas

DRAFT = "http://json-schema.org/draft-07/schema#"

SCHEMA = {
    "$schema": DRAFT,
    "$id": "rand://battery/1.0",
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2, "maxLength": 6,
              "pattern": "^[a-z]+$"},
        "n": {"type": "number", "minimum": -5, "exclusiveMaximum": 100,
              "multipleOf": 0.5},
        "i": {"type": "integer", "enum": [1, 2, 3, 10, 2.0]},
        "c": {"const": "fixed"},
        "d": {"type": "string", "format": "date"},
        "em": {"format": "email"},
        "u": {"format": "uuid"},
        "ip": {"format": "ipv4"},
        "arr": {
            "type": "array", "minItems": 1, "maxItems": 4,
            "uniqueItems": True,
            "items": {"type": "integer", "minimum": 0},
        },
        "tai": {"items": [{"type": "integer"}],
                "additionalItems": False},
        "tas": {"items": [{"type": "integer"}],
                "additionalItems": {"type": "string", "minLength": 2}},
        "obj": {
            "type": "object",
            "minProperties": 1,
            "maxProperties": 3,
            "propertyNames": {"pattern": "^[a-z_]+$", "maxLength": 5},
            "patternProperties": {"^n": {"type": "number", "minimum": 0}},
            "additionalProperties": False,
            "properties": {"x": {"type": "string"}, "nx": {}},
        },
        "v": {
            "anyOf": [
                {"type": "integer", "minimum": 10},
                {"type": "string", "pattern": "^ok"},
            ]
        },
        "w": {
            "oneOf": [
                {"type": "number", "multipleOf": 3},
                {"type": "number", "minimum": 50},
            ]
        },
        "z": {"not": {"enum": ["bad", 13]}},
        "ite": {
            "if": {"type": "integer"},
            "then": {"minimum": 0},
            "else": {"maxLength": 4},
        },
        "ca": {"contains": {"type": "string", "minLength": 2}},
        # object-element items subschema: per-element properties +
        # required compile over ALIGNED sub-instance arrays
        "eo": {"items": {
            "type": "object",
            "properties": {"b": {"type": "integer", "minimum": 0},
                           "t": {"type": "string", "maxLength": 3}},
            "required": ["b"],
        }},
        # element object keywords: per-element keys arrays + aligned
        # member arrays + sub-property combinators
        "ck": {"items": {"type": "object", "properties": {"x": {}},
                         "additionalProperties": False,
                         "minProperties": 1,
                         "propertyNames": {"maxLength": 3}}},
        "dk": {"items": {"dependencies": {"p": ["q"]}}},
        "pk": {"items": {"patternProperties": {
            "^n": {"type": "number", "minimum": 0}}}},
        "ak": {"items": {"properties": {"x": {}},
                         "additionalProperties": {"type": "integer"}}},
        "eb": {"items": {"type": "object", "properties": {
            "v": {"anyOf": [{"type": "integer", "minimum": 10},
                            {"type": "string", "pattern": "^ok"}]}}}},
        # combinators INSIDE items subschemas (compiled per element)
        "ae": {"items": {"anyOf": [
            {"type": "integer", "minimum": 10},
            {"type": "string", "pattern": "^ok"},
        ]}},
        "oe": {"items": {"oneOf": [
            {"type": "number", "multipleOf": 3},
            {"type": "number", "minimum": 50},
        ]}},
        "ne": {"items": {"not": {"enum": ["bad", 13]}}},
        "ie": {"items": {
            "if": {"type": "integer"},
            "then": {"minimum": 0},
            "else": {"maxLength": 4},
        }},
        "a": {}, "b": {},
    },
    "required": ["s"],
    "dependencies": {
        "a": ["b"],
        "c": {"required": ["d"]},
    },
}

# value pool: scalars, arrays, objects, edge literals (type confusions,
# numeric-looking strings, bools-vs-ints, unicode, empty containers)
POOL = [
    None, True, False, 0, 1, -1, 2, 3, 7, 10, 13, 49, 50, 99, 100, 150,
    0.5, 1.5, 2.0, 3.5, -4.5, 96.0, 2.25,
    "", "x", "ab", "abc", "abcdefg", "ok", "okay", "bad", "fixed",
    "1", "1.0", "true", "héllo", "UPPER", "2024-01-02", "2024-13-99",
    "2024-02-31", "2024-02-29", "2023-02-29", "2024-1-2", "not a date",
    "a@b", "a@b.c", "@", "a@", "user name@x",
    "12345678-1234-1234-1234-123456789abc",
    "zz345678-1234-1234-1234-123456789abc",
    "1.2.3.4", "01.2.3.4", "256.1.1.1", "1.2.3",
    [], [1], [1, 2, 3], [1, 1], [1, 1.0], [True, 1], [0, -1], [2, "a"],
    [1, 2, 3, 4, 5], ["a", "a"], [[1], [1, 2]],
    {}, {"x": "s"}, {"x": 9}, {"nx": 5}, {"nz": -2}, {"n_a": 0.5},
    {"BAD": 1}, {"toolong": 1}, {"x": "s", "y": 1},
    {"a_": 1, "b_": 2, "c_": 3, "d_": 4},
    [{"b": 1}, {"b": -2}], [{"t": "toolong", "b": 0}], [{}],
    [{"b": "x"}, 3], [{"b": None}], [{"b": 2.0, "t": None}],
    [{"p": 1}], [{"p": 1, "q": 2}, {"r": 3}], [{"x": 1, "z": 2}],
    [{"n1": 5}, {"nx": -2}], [{"nz": "s"}], [{"x": "any", "w": 3}],
    [{"w": "s"}, {"n_a": 0.5}],
    [{"v": 5}], [{"v": 15}, {"v": "okay"}], [{"v": "nope"}],
]

PROPS = ["s", "n", "i", "c", "d", "em", "u", "ip", "arr", "tai", "tas",
         "obj", "v", "w",
         "z", "ite", "ca", "eo", "ck", "dk", "pk", "ak", "eb",
         "ae", "oe", "ne", "ie", "a", "b"]


def gen_doc(rng: random.Random) -> dict:
    doc = {}
    for p in PROPS:
        r = rng.random()
        if r < 0.35:
            continue  # absent
        doc[p] = rng.choice(POOL)
    if rng.random() < 0.15:
        doc["extra_key"] = rng.choice(POOL)  # undeclared at root (open)
    return doc


D2019 = "https://json-schema.org/draft/2019-09/schema"

# 2019-09 battery: the unevaluated* static subset (tuple-items /
# bare-array / root-object forms incl. the legacy AP-keys quirk),
# minContains/maxContains, dependentRequired — randomized against the
# draft-dispatched jsonschema validator
SCHEMA19 = {
    "$schema": D2019,
    "$id": "rand://battery19/1.0",
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2},
        "tup": {
            "type": "array",
            "items": [{"type": "integer"}, {"type": "string"}],
            "unevaluatedItems": False,
        },
        "anyarr": {"type": "array", "unevaluatedItems": False},
        "cb": {
            "type": "array",
            "contains": {"type": "string", "minLength": 2},
            "minContains": 1,
            "maxContains": 2,
        },
        "ob": {
            "type": "object",
            "properties": {"x": {}},
            "patternProperties": {"^n": {}},
            "unevaluatedProperties": False,
        },
        "ob2": {
            "type": "object",
            "properties": {"x": {}},
            # legacy-walk quirk: this object-form AP contributes the
            # key name "nx" as evaluated (and accepts any value)
            "additionalProperties": {"nx": {}},
            "unevaluatedProperties": False,
        },
        "obsf": {
            "type": "object",
            "properties": {"x": {}},
            "unevaluatedProperties": {"type": "integer", "minimum": 0},
        },
        "elup": {"items": {
            "properties": {"x": {}},
            "patternProperties": {"^n": {}},
            "unevaluatedProperties": False,
        }},
        "tupsf": {
            "type": "array",
            "items": [{"type": "integer"}],
            "unevaluatedItems": {"type": "string"},
        },
        "a": {},
        "b": {},
    },
    "required": ["s"],
    "dependentRequired": {"a": ["b"]},
    "unevaluatedProperties": False,
}

PROPS19 = ["s", "tup", "anyarr", "cb", "ob", "ob2", "obsf", "elup",
           "tupsf", "a", "b"]


def gen_doc19(rng: random.Random) -> dict:
    doc = {}
    for p in PROPS19:
        if rng.random() < 0.35:
            continue
        doc[p] = rng.choice(POOL)
    if rng.random() < 0.25:
        doc["extra_key"] = rng.choice(POOL)  # root unevaluatedProperties
    return doc


def test_random_docs_match_jsonschema_2019(spark):
    import jsonschema

    rng = random.Random(20260817)
    docs = [(f"r{i}", gen_doc19(rng)) for i in range(300)]

    registry, issues = load_schemas([("s.json", SCHEMA19)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    assert not [
        i
        for i in issues
        if i.severity == "warning" and "unevaluated" in i.description
    ], "battery19 must stay inside the compiled unevaluated* subset"
    cs = registry["rand://battery19/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    v = jsonschema.validators.validator_for(SCHEMA19)(SCHEMA19)
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


def test_random_docs_match_jsonschema(spark):
    import jsonschema

    rng = random.Random(20260816)
    docs = [(f"r{i}", gen_doc(rng)) for i in range(300)]

    registry, issues = load_schemas([("s.json", SCHEMA)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    assert not [
        i for i in issues if "array-element location" in i.description
    ], "items-level combinators must compile, not warn"
    cs = registry["rand://battery/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    # the reference passes a FormatChecker (extensible_validator.py:1164)
    # — so formats are ENFORCED, not annotation-only
    v = jsonschema.Draft7Validator(
        SCHEMA, format_checker=jsonschema.FormatChecker()
    )
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str), sorted(mine[name]),
                        sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


D2020 = "https://json-schema.org/draft/2020-12/schema"

# 2020-12 battery: prefixItems + unevaluatedItems (2020 bails for ANY
# `items` but honors prefixItems positions), the is_valid-based
# unevaluated* walk (AP={} evaluates EVERYTHING, value-dependent AP
# subschemas), dependentRequired/dependentSchemas, contains bounds,
# $dynamicRef lexical fallback, $ref with siblings, element
# combinators — randomized against the draft-dispatched validator
SCHEMA20 = {
    "$schema": D2020,
    "$id": "rand://battery20/1.0",
    "$defs": {
        "amount": {"$dynamicAnchor": "amt", "type": "integer", "minimum": 0},
        "bounded": {"minimum": -5},
    },
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2},
        "pfx": {
            "type": "array",
            "prefixItems": [{"type": "integer"}, {"type": "string"}],
            "unevaluatedItems": False,
        },
        "anyarr": {"type": "array", "unevaluatedItems": False},
        "itemsarr": {"type": "array", "items": {"type": "integer"},
                     "unevaluatedItems": False},
        "pfxtail": {
            "type": "array",
            "prefixItems": [{"type": "string"}],
            "items": {"type": "integer", "minimum": 0},
        },
        "cb": {
            "type": "array",
            "contains": {"type": "string", "minLength": 2},
            "minContains": 1,
            "maxContains": 2,
        },
        "ob": {
            "type": "object",
            "properties": {"x": {}},
            "patternProperties": {"^n": {}},
            "unevaluatedProperties": False,
        },
        "obap": {
            "type": "object",
            "properties": {"x": {}},
            # 2020-12 walk: AP={} accepts every value -> everything
            # evaluated -> UP can never fire (unlike 2019-09!)
            "additionalProperties": {},
            "unevaluatedProperties": False,
        },
        "obapv": {
            "type": "object",
            "additionalProperties": {"type": "integer", "minimum": 0},
            "unevaluatedProperties": False,
        },
        "obsf": {
            "type": "object",
            "properties": {"x": {}},
            "unevaluatedProperties": {"type": "integer", "minimum": 0},
        },
        "dyn": {"$dynamicRef": "#amt"},
        "refsib": {"$ref": "#/$defs/bounded", "maximum": 100},
        "ec": {"items": {"anyOf": [
            {"type": "integer", "minimum": 10},
            {"type": "string", "pattern": "^ok"},
        ]}},
        "a": {}, "b": {}, "c": {},
    },
    "required": ["s"],
    "dependentRequired": {"a": ["b"]},
    "dependentSchemas": {"b": {"required": ["c"]}},
}

PROPS20 = ["s", "pfx", "anyarr", "itemsarr", "pfxtail", "cb", "ob", "obap",
           "obapv", "obsf", "dyn", "refsib", "ec", "a", "b", "c"]


def test_random_docs_match_jsonschema_2020(spark):
    import jsonschema

    rng = random.Random(20260818)
    docs = []
    for i in range(300):
        doc = {}
        for p in PROPS20:
            if rng.random() < 0.35:
                continue
            doc[p] = rng.choice(POOL)
        docs.append((f"r{i}", doc))

    registry, issues = load_schemas([("s.json", SCHEMA20)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry["rand://battery20/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    v = jsonschema.validators.validator_for(SCHEMA20)(SCHEMA20)
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


D4 = "http://json-schema.org/draft-04/schema#"

# draft-04 battery: boolean exclusiveMinimum (legacy bound modifier),
# tuple items, dependencies both forms, plus the keywords draft-04
# IGNORES (const/contains/propertyNames/if-then) — the net that
# catches draft-gating mistakes in either direction
SCHEMA4 = {
    "$schema": D4,
    "id": "rand://battery4/1.0",
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2, "pattern": "^[a-z]+$"},
        "n": {"type": "number", "minimum": 0, "exclusiveMinimum": True,
              "maximum": 100},
        "i": {"type": "integer", "enum": [1, 2, 3]},
        "c": {"const": "fixed"},            # ignored by Draft4
        "m": {"multipleOf": 3},
        "t": {"items": [{"type": "integer"}, {"type": "string"}]},
        "arr": {"type": "array", "minItems": 1, "uniqueItems": True,
                "items": {"type": "integer", "minimum": 0}},
        "obj": {"type": "object", "minProperties": 1, "maxProperties": 3,
                "additionalProperties": False,
                "properties": {"x": {}},
                "patternProperties": {"^n": {"type": "number"}}},
        "d": {"type": "string", "format": "date"},
        "v": {"anyOf": [{"type": "integer", "minimum": 10},
                        {"type": "string"}]},
        "w": {"oneOf": [{"type": "number", "multipleOf": 3},
                        {"type": "number", "minimum": 50}]},
        "z": {"not": {"enum": ["bad"]}},
        "ite": {"if": {"type": "integer"}, "then": {"minimum": 0}},  # ignored
        "pn": {"propertyNames": {"maxLength": 3}},                   # ignored
        "ct": {"contains": {"type": "string"}},                      # ignored
        "a": {}, "b": {},
    },
    "required": ["s"],
    "dependencies": {"a": ["b"], "c": {"required": ["d"]}},
}

PROPS4 = ["s", "n", "i", "c", "m", "t", "arr", "obj", "d", "v", "w", "z",
          "ite", "pn", "ct", "a", "b"]


def test_random_docs_match_jsonschema_draft4(spark):
    import jsonschema

    rng = random.Random(20260819)
    docs = []
    for i in range(300):
        doc = {}
        for p in PROPS4:
            if rng.random() < 0.35:
                continue
            doc[p] = rng.choice(POOL)
        docs.append((f"r{i}", doc))

    registry, issues = load_schemas([("s.json", SCHEMA4)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry["rand://battery4/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    v = jsonschema.Draft4Validator(
        SCHEMA4, format_checker=jsonschema.FormatChecker()
    )
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


D6 = "http://json-schema.org/draft-06/schema#"

# draft-06 battery: const/contains/propertyNames ACTIVE (unlike 04),
# if/then/else IGNORED (unlike 07), standalone numeric exclusives
SCHEMA6 = {
    "$schema": D6,
    "$id": "rand://battery6/1.0",
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2},
        "c": {"const": "fixed"},
        "x": {"type": "number", "exclusiveMinimum": 0,
              "exclusiveMaximum": 100},
        "ct": {"contains": {"type": "string", "minLength": 2}},
        "pn": {"propertyNames": {"maxLength": 3}},
        "ite": {"if": {"type": "integer"}, "then": {"minimum": 0}},  # ignored
        "eo": {"items": {"type": "object",
                         "properties": {"b": {"type": "integer"}},
                         "required": ["b"]}},
        "v": {"anyOf": [{"type": "integer", "minimum": 10},
                        {"type": "string"}]},
        "a": {}, "b": {},
    },
    "required": ["s"],
    "dependencies": {"a": ["b"]},
}

PROPS6 = ["s", "c", "x", "ct", "pn", "ite", "eo", "v", "a", "b"]


def test_random_docs_match_jsonschema_draft6(spark):
    import jsonschema

    rng = random.Random(20260820)
    docs = []
    for i in range(300):
        doc = {}
        for p in PROPS6:
            if rng.random() < 0.35:
                continue
            doc[p] = rng.choice(POOL)
        docs.append((f"r{i}", doc))

    registry, issues = load_schemas([("s.json", SCHEMA6)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry["rand://battery6/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    v = jsonschema.Draft6Validator(
        SCHEMA6, format_checker=jsonschema.FormatChecker()
    )
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


D3 = "http://json-schema.org/draft-03/schema#"

# draft-03 battery: boolean `required` ON property subschemas (read by
# the parent's properties validator), divisibleBy, boolean
# exclusiveMinimum modifier, the keywords draft-03 lacks (multipleOf,
# const, anyOf are NOT keywords -> exactly ignored)
SCHEMA3 = {
    "$schema": D3,
    "id": "rand://battery3/1.0",
    "type": "object",
    "properties": {
        "s": {"type": "string", "minLength": 2, "required": True},
        "d": {"divisibleBy": 3},
        "m": {"multipleOf": 3},              # not a draft-03 keyword
        "x": {"type": "number", "minimum": 0, "exclusiveMinimum": True},
        "c": {"const": "fixed"},             # ignored
        "v": {"anyOf": [{"type": "integer"}]},  # ignored
        "t": {"type": "integer"},            # strict int (1.0 fails)
        "arr": {"type": "array", "minItems": 1, "uniqueItems": True,
                "items": {"type": "integer", "divisibleBy": 2}},
        "obj": {"type": "object",
                "properties": {"q": {"type": "string", "required": True}}},
        "z": {"disallow": "string"},
        "u": {"disallow": ["integer", "boolean"]},
        "e": {"extends": [{"minimum": 0}, {"maximum": 100}]},
        "a": {}, "b": {},
    },
    "dependencies": {"a": ["b"]},
}

PROPS3 = ["s", "d", "m", "x", "c", "v", "t", "arr", "obj", "z", "u", "e",
          "a", "b"]


def test_random_docs_match_jsonschema_draft3(spark):
    import jsonschema

    rng = random.Random(20260821)
    docs = []
    for i in range(300):
        doc = {}
        for p in PROPS3:
            if rng.random() < 0.35:
                continue
            doc[p] = rng.choice(POOL)
        docs.append((f"r{i}", doc))

    registry, issues = load_schemas([("s.json", SCHEMA3)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry["rand://battery3/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)

    v = jsonschema.Draft3Validator(
        SCHEMA3, format_checker=jsonschema.FormatChecker()
    )
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"
