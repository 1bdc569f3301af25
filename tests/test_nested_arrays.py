"""Round-5: SECOND array level for per-element compilation
("a[].b[]" / "a[][]" scalar keywords and combinators via the
flat-filtered leaf collection, docshred.flat_instances) — randomized
differential against the jsonschema library, plus warning-gone
assertions for the newly-compiled shapes.
"""

import json
import random

import jsonschema
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks
from python_extended_json_schema_validator_spark.docshred import (
    flat_instances,
    shred_documents,
)
from python_extended_json_schema_validator_spark.schemas import load_schemas

D07 = "http://json-schema.org/draft-07/schema#"
D2020 = "https://json-schema.org/draft/2020-12/schema"

NESTED = {
    "$schema": D07,
    "$id": "nest://battery/1.0",
    "type": "object",
    "properties": {
        # a[].b[] — scalar keywords two levels deep
        "a": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "b": {
                        "type": "array",
                        "items": {
                            "type": "integer",
                            "minimum": 0,
                            "maximum": 50,
                        },
                    }
                },
            },
        },
        # m[][] — direct items-of-items
        "m": {
            "type": "array",
            "items": {
                "type": "array",
                "items": {"type": "string", "pattern": "^[a-z]+$"},
            },
        },
        # combinators two levels deep: anyOf / not / if-then-else
        "c": {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {
                    "v": {
                        "type": "array",
                        "items": {
                            "anyOf": [
                                {"type": "integer", "minimum": 10},
                                {"type": "string", "maxLength": 3},
                            ],
                            "not": {"const": "zz"},
                            "if": {"type": "number"},
                            "then": {"multipleOf": 2},
                        },
                    }
                },
            },
        },
    },
}


def gen_doc(rng: random.Random) -> dict:
    def leaf_int():
        return rng.choice([-5, 0, 3, 25, 50, 51, 99, "x", None, 1.5, True])

    def leaf_str():
        return rng.choice(["ab", "zz", "xyz", "ABC", "toolong", 7, [], {}])

    doc: dict = {}
    if rng.random() < 0.9:
        doc["a"] = [
            rng.choice(
                [
                    {"b": [leaf_int() for _ in range(rng.randrange(3))]},
                    {"b": rng.choice([3, "s", None, {}])},
                    {},
                    "notobj",
                    7,
                ]
            )
            for _ in range(rng.randrange(3))
        ]
    if rng.random() < 0.9:
        doc["m"] = [
            rng.choice(
                [
                    [leaf_str() for _ in range(rng.randrange(3))],
                    "notarr",
                    5,
                    {},
                ]
            )
            for _ in range(rng.randrange(3))
        ]
    if rng.random() < 0.9:
        doc["c"] = [
            rng.choice(
                [
                    {
                        "v": [
                            rng.choice([4, 11, 12, "ab", "zz", "long1",
                                        None, 2.5, 14.0])
                            for _ in range(rng.randrange(3))
                        ]
                    },
                    {"v": "notarr"},
                    {},
                ]
            )
            for _ in range(rng.randrange(3))
        ]
    return doc


def test_nested_shapes_compile_without_warnings():
    registry, issues = load_schemas([("s.json", NESTED)])
    warns = [i for i in issues if i.severity == "warning"]
    assert warns == [], warns
    cs = registry["nest://battery/1.0"]
    assert not cs.warnings
    assert "a[].b[]" in cs.instance_paths
    assert "m[][]" in cs.instance_paths
    assert "c[].v[]" in cs.instance_paths


def test_flat_instances_semantics():
    doc = {
        "a": [{"b": [1, 2]}, {"b": "notarr"}, {}, "x", {"b": [3]}],
        "m": [[1], "no", [2, 3]],
    }
    assert flat_instances(doc, "a[].b[]") == [1, 2, 3]
    assert flat_instances(doc, "m[][]") == [1, 2, 3]
    assert flat_instances({}, "a[].b[]") == []
    assert flat_instances({"a": "no"}, "a[].b[]") == []


def test_random_nested_docs_match_jsonschema(spark):
    rng = random.Random(20260817)
    docs = [(f"d{i:03d}", gen_doc(rng)) for i in range(300)]
    registry, issues = load_schemas([("s.json", NESTED)])
    cs = registry["nest://battery/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)
    v = jsonschema.validators.validator_for(NESTED)(NESTED)
    bad = []
    for name, doc in docs:
        want = {e.validator for e in v.iter_errors(doc)}
        if mine[name] != want:
            bad.append((name, json.dumps(doc, default=str),
                        sorted(mine[name]), sorted(want)))
    assert not bad, f"{len(bad)} mismatches; first 5: {bad[:5]}"


def test_three_levels_still_warn():
    deep = {
        "$schema": D07,
        "$id": "nest://deep/1.0",
        "type": "object",
        "properties": {
            "a": {
                "type": "array",
                "items": {
                    "type": "array",
                    "items": {
                        "type": "array",
                        "items": {"type": "integer"},
                    },
                },
            }
        },
    }
    registry, issues = load_schemas([("s.json", deep)])
    # a[][][] is STILL a direct trailing-[] location → compiles flat
    # at any depth; make sure it actually does (no warning) — the
    # flat collection is depth-agnostic
    assert [i for i in issues if i.severity == "warning"] == [], issues
    # ...but a sub-PROPERTY below two array levels stays warned
    deeper = {
        "$schema": D07,
        "$id": "nest://deeper/1.0",
        "type": "object",
        "properties": {
            "a": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {
                        "b": {
                            "type": "array",
                            "items": {
                                "type": "object",
                                "properties": {
                                    "c": {"type": "integer"},
                                },
                            },
                        }
                    },
                },
            }
        },
    }
    registry, issues = load_schemas([("s.json", deeper)])
    assert any(
        i.severity == "warning" and "a[].b[].c" in i.description
        for i in issues
    ), issues
