"""Disjunctive combinator (anyOf/oneOf/not), draft-keyword
(multipleOf/uniqueItems/dependencies/patternProperties/propertyNames/
min-maxProperties) and custom-format parity.

Two differential layers:

- vs the jsonschema LIBRARY (the exact engine the reference delegates
  structural validation to, extend_validator_helpers.py:50-64): leaf
  reason names must match per document;
- vs the ACTUAL reference validator in a fresh subprocess
  (tests/ref_runner.py): per-file verdicts, normalized reasons, and
  the pass-1 revocation interplay (a doc failing a combinator must
  not register keys — extensible_validator.py:1195-1215 cleanup).
"""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.checks import row_checks
from python_extended_json_schema_validator_spark.docshred import shred_documents
from python_extended_json_schema_validator_spark.schemas import load_schemas
from python_extended_json_schema_validator_spark.suite import run_suite

DRAFT = "http://json-schema.org/draft-07/schema#"


@pytest.fixture(scope="module")
def reference():
    runner = os.path.join(os.path.dirname(__file__), "ref_runner.py")

    def run(schemas: list, docs: list, config: dict = {}, warm_up: bool = False):
        payload = json.dumps(
            {
                "schemas": schemas,
                "docs": [[n, d] for n, d in docs],
                "config": config,
                "warm_up": warm_up,
            }
        )
        proc = subprocess.run(
            [sys.executable, runner],
            input=payload,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, f"reference runner failed: {proc.stderr[-2000:]}"
        return json.loads(proc.stdout)

    return run


def engine_reasons(spark, schema, docs):
    """Shred + validate named docs against one compiled schema →
    {doc name: sorted leaf reasons}."""
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    cs = registry[schema.get("$id") or schema["id"]]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    out = {n: [] for n, _ in docs}
    for r in viol.collect():
        out.setdefault(r.row_id, []).append(r.reason)
    return {k: sorted(v) for k, v in out.items()}


def jsonschema_reasons(schema, docs):
    import jsonschema

    v = jsonschema.Draft7Validator(schema)
    return {n: sorted(e.validator for e in v.iter_errors(d)) for n, d in docs}


def assert_jsonschema_parity(spark, schema, docs):
    got = engine_reasons(spark, schema, docs)
    want = jsonschema_reasons(schema, docs)
    assert got == want, f"engine {got} != jsonschema {want}"
    return got


# ---------------------------------------------------------------------------
# jsonschema-library differentials (leaf reason parity)
# ---------------------------------------------------------------------------


def test_anyof_oneof_not_leaf_parity(spark):
    schema = {
        "$schema": DRAFT,
        "$id": "comb://basic/1.0",
        "type": "object",
        "properties": {
            "v": {
                "anyOf": [
                    {"type": "integer", "minimum": 10},
                    {"type": "string", "pattern": "^x"},
                ]
            },
            "w": {
                "oneOf": [
                    {"type": "number", "multipleOf": 3},
                    {"type": "number", "minimum": 100},
                ]
            },
            "z": {"not": {"type": "string", "maxLength": 3}},
        },
    }
    docs = [
        ("ok", {"v": 15, "w": 9, "z": 12}),
        ("anyof_low", {"v": 5}),
        ("anyof_str", {"v": "xray"}),
        ("anyof_badstr", {"v": "yak"}),
        ("oneof_both", {"w": 300}),
        ("oneof_none", {"w": 7}),
        ("not_fail", {"z": "ab"}),
        ("not_pass_long", {"z": "abcdef"}),
        ("all_absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["anyof_low"] == ["anyOf"]
    assert got["oneof_both"] == ["oneOf"]
    assert got["not_fail"] == ["not"]
    assert got["all_absent"] == []


def test_nested_combinators_allof_ref_and_boolean_branches(spark):
    schema = {
        "$schema": DRAFT,
        "$id": "comb://nested/1.0",
        "definitions": {
            "positive": {"type": "number", "exclusiveMinimum": 0},
        },
        "type": "object",
        "properties": {
            "n": {
                "anyOf": [
                    {"$ref": "#/definitions/positive"},
                    {
                        "allOf": [
                            {"type": "string"},
                            {"minLength": 2},
                        ]
                    },
                ]
            },
            "m": {
                "oneOf": [
                    {"not": {"type": "string"}},
                    {"enum": ["a", "b"]},
                ]
            },
            "gated": {"anyOf": [True, {"type": "integer"}]},
            "closed": {"anyOf": [False]},
        },
    }
    docs = [
        ("pos", {"n": 3.5}),
        ("neg", {"n": -1}),
        ("str_ok", {"n": "ab"}),
        ("str_short", {"n": "a"}),
        ("m_num", {"m": 7}),       # branch1 ok, branch2 fail -> oneOf ok
        ("m_enum", {"m": "a"}),    # branch1 fail (is str), branch2 ok -> ok
        ("m_badstr", {"m": "zz"}),  # both fail -> oneOf
        ("gated_any", {"gated": "whatever"}),
        ("closed_any", {"closed": 1}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["neg"] == ["anyOf"]
    assert got["closed_any"] == ["anyOf"]


def test_dependencies_and_dependent_schema(spark):
    schema = {
        "$schema": DRAFT,
        "$id": "comb://deps/1.0",
        "type": "object",
        "properties": {
            "card": {"type": "string"},
            "cvv": {"type": "string"},
            "billing": {"type": "string"},
        },
        "dependencies": {
            "card": ["cvv"],
            "cvv": {
                "properties": {"billing": {"type": "string"}},
                "required": ["billing"],
            },
        },
    }
    docs = [
        ("none", {}),
        ("full", {"card": "c", "cvv": "1", "billing": "b"}),
        ("card_only", {"card": "c"}),
        ("cvv_no_billing", {"card": "c", "cvv": "1"}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["card_only"] == ["dependencies"]
    # schema-form deps descend: leaf validator name, not 'dependencies'
    assert got["cvv_no_billing"] == ["required"]


def test_object_and_array_keywords(spark):
    schema = {
        "$schema": DRAFT,
        "$id": "comb://objarr/1.0",
        "type": "object",
        "properties": {
            "tags": {"type": "array", "uniqueItems": True},
            "meta": {
                "type": "object",
                "minProperties": 1,
                "maxProperties": 3,
                "propertyNames": {"pattern": "^[a-z]+$"},
                "patternProperties": {"^n": {"type": "number", "minimum": 0}},
                "additionalProperties": False,
                "properties": {"x": {"type": "string"}},
            },
            "step": {"type": "number", "multipleOf": 0.5},
        },
    }
    docs = [
        ("ok", {"tags": [1, "1", True], "meta": {"na": 2, "x": "s"}, "step": 2.5}),
        ("uniq_numeric_eq", {"tags": [1, 1.0]}),
        ("uniq_bool_distinct", {"tags": [True, 1]}),
        ("uniq_objects", {"tags": [{"a": 1}, {"a": 1}]}),
        ("patprop_neg", {"meta": {"nz": -3}}),
        ("propname_upper", {"meta": {"NZ": 3}}),
        ("minprops", {"meta": {}}),
        ("maxprops", {"meta": {"aa": 1, "bb": 2, "cc": 3, "dd": 4}}),
        ("mult_frac", {"step": 0.75}),
        ("addprop_carveout", {"meta": {"nq": 5}}),  # matches ^n: allowed
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["uniq_numeric_eq"] == ["uniqueItems"]
    assert got["uniq_objects"] == ["uniqueItems"]
    assert got["patprop_neg"] == ["minimum"]
    assert got["addprop_carveout"] == []


# ---------------------------------------------------------------------------
# reference differentials (verdict + revocation parity)
# ---------------------------------------------------------------------------

KEY_REASONS = {
    "dup_unique", "dup_pk", "stale_fk", "dangling_fk", "stale_jk",
    "dangling_jk", "fatal",
}


def normalize(per_file: dict) -> dict:
    return {
        f: sorted(r if r in KEY_REASONS else "schema_error" for r in reasons)
        for f, reasons in per_file.items()
    }


def test_reference_combinator_verdicts(spark, reference):
    """The reference (via jsonschema) fails docs that miss every anyOf
    branch; per-file verdicts and exit codes must match."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://refdiff/1.0",
        "type": "object",
        "properties": {
            "payload": {
                "anyOf": [
                    {"type": "integer", "minimum": 0},
                    {"type": "string", "minLength": 1},
                ]
            },
            "mode": {"not": {"enum": ["forbidden"]}},
        },
    }
    docs = [
        ("good_int", {"@schema": "comb://refdiff/1.0", "payload": 5}),
        ("good_str", {"@schema": "comb://refdiff/1.0", "payload": "hello"}),
        ("bad_neg", {"@schema": "comb://refdiff/1.0", "payload": -2}),
        ("bad_empty", {"@schema": "comb://refdiff/1.0", "payload": ""}),
        ("bad_mode", {"@schema": "comb://refdiff/1.0", "mode": "forbidden"}),
        ("ok_mode", {"@schema": "comb://refdiff/1.0", "mode": "other"}),
    ]
    ref = reference([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    got = normalize(res.per_file)
    want = normalize(ref)
    assert got == want, f"engine {got} != reference {want}"
    assert want["bad_neg"] == ["schema_error"]
    assert res.exit_code == 2


def test_reference_combinator_revocation(spark, reference):
    """A doc failing a combinator is pass-1-revoked: its unique key
    never registers, so a later duplicate is NOT blamed (reference
    cleanup at extensible_validator.py:1195-1215)."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://revoke/1.0",
        "type": "object",
        "properties": {
            "local_id": {"type": "string", "unique": True},
            "v": {"oneOf": [{"type": "integer"}, {"type": "boolean"}]},
        },
        "required": ["local_id"],
    }
    docs = [
        # d1 fails oneOf (string) -> its key 'k1' must be revoked
        ("d1", {"@schema": "comb://revoke/1.0", "local_id": "k1", "v": "s"}),
        ("d2", {"@schema": "comb://revoke/1.0", "local_id": "k1", "v": 1}),
        ("d3", {"@schema": "comb://revoke/1.0", "local_id": "k2", "v": True}),
        ("d4", {"@schema": "comb://revoke/1.0", "local_id": "k2", "v": 2}),
    ]
    ref = reference([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    got = normalize(res.per_file)
    want = normalize(ref)
    assert got == want, f"engine {got} != reference {want}"
    # d2 clean (d1 revoked); d4 is the real duplicate
    assert want == {
        "d1": ["schema_error"], "d2": [], "d3": [], "d4": ["dup_unique"],
    }


def test_trigger_registration_inside_not(spark, reference):
    """jsonschema evaluates `not` branches via is_valid→iter_errors, so
    key triggers inside them register (walk parity)."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://nottrig/1.0",
        "type": "object",
        "properties": {
            "a": {"type": "string", "unique": True},
        },
        "not": {"required": ["forbidden_field"]},
    }
    docs = [
        ("d1", {"@schema": "comb://nottrig/1.0", "a": "x"}),
        ("d2", {"@schema": "comb://nottrig/1.0", "a": "x"}),
        ("d3", {"@schema": "comb://nottrig/1.0", "a": "y",
                "forbidden_field": 1}),
    ]
    ref = reference([schema], docs)
    res = run_suite(spark, [("s.json", schema)], docs)
    assert normalize(res.per_file) == normalize(ref)
    assert normalize(ref) == {"d1": [], "d2": ["dup_unique"],
                              "d3": ["schema_error"]}


# ---------------------------------------------------------------------------
# warnings: no silent under-validation
# ---------------------------------------------------------------------------


def test_dropped_keywords_record_warnings():
    schema = {
        "$schema": DRAFT,
        "$id": "warn://drop/1.0",
        "type": "object",
        "properties": {
            "meta": {
                "type": "object",
                # `contains` is outside the scalar subset -> warning
                "patternProperties": {"^x": {"contains": {"type": "string"}}},
            },
            "arr": {
                "type": "array",
                "items": {
                    # combinator branch OUTSIDE the scalar subset under
                    # an array-element location -> warning (a scalar
                    # branch like {"type": "string"} now compiles)
                    "anyOf": [{"properties": {"x": {"type": "string"}},
                               "required": ["x"]}],
                },
            },
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert "warn://drop/1.0" in registry  # warnings do NOT reject
    warns = [i for i in issues if i.severity == "warning"]
    assert warns, "dropped keywords must leave a trace"
    # SCHEMA-FORM unevaluatedProperties inside an ELEMENT subschema is
    # beyond the compiled static-false subset -> must warn (the static
    # `unevaluatedProperties: false` form now compiles per element)
    el_schema = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "warn://eldrop/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "items": {"type": "object",
                          "unevaluatedProperties": {"type": "integer"}},
            }
        },
    }
    _, el_issues = load_schemas([("s.json", el_schema)])
    assert any(
        "unevaluatedProperties" in i.description
        for i in el_issues
        if i.severity == "warning"
    )
    assert all(i.reason == "schema_warning" for i in warns)
    text = " ".join(i.description for i in warns)
    assert "contains" in text
    assert "under an array-element location" in text and "anyOf" in text
    assert not [i for i in issues if i.severity == "error"]


def test_unevaluated_static_compiles_dynamic_warns():
    # 2019-09+ unevaluatedProperties/Items: the static subset (no
    # in-place applicators) COMPILES; dynamic shapes warn; draft-07
    # ignores both keywords entirely (so does jsonschema).
    base = {
        "type": "object",
        "properties": {"a": {"type": "string"}},
        "unevaluatedProperties": False,
    }
    new = dict(base, **{
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "unev://static/1.0",
    })
    registry, issues = load_schemas([("s.json", new)])
    assert "unev://static/1.0" in registry
    assert not any("unevaluated" in i.description for i in issues)
    checks = registry["unev://static/1.0"].table_spec.checks
    assert any(
        getattr(c, "keys_reason", None) == "unevaluatedProperties"
        for c in checks
    )

    dyn = dict(new, **{"$id": "unev://dyn/1.0",
                       "anyOf": [{"required": ["a"]}]})
    registry2, issues2 = load_schemas([("s.json", dyn)])
    warns = [i for i in issues2 if i.severity == "warning"]
    assert any("unevaluatedProperties" in i.description for i in warns)
    assert not any(
        getattr(c, "keys_reason", None) == "unevaluatedProperties"
        for c in registry2["unev://dyn/1.0"].table_spec.checks
    )

    old = dict(base, **{
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$id": "unev://d7/1.0",
    })
    registry7, issues7 = load_schemas([("s.json", old)])
    assert "unev://d7/1.0" in registry7
    assert not any("unevaluated" in i.description for i in issues7)
    assert not any(
        getattr(c, "keys_reason", None) == "unevaluatedProperties"
        for c in registry7["unev://d7/1.0"].table_spec.checks
    )


D2019 = "https://json-schema.org/draft/2019-09/schema"
D2020 = "https://json-schema.org/draft/2020-12/schema"


def jsonschema_reasons_auto(schema, docs):
    """Like jsonschema_reasons but draft-dispatched via validator_for
    (2019-09/2020-12 unevaluated* semantics differ per draft)."""
    import jsonschema

    v = jsonschema.validators.validator_for(schema)(schema)
    return {n: sorted(e.validator for e in v.iter_errors(d)) for n, d in docs}


def assert_auto_parity(spark, schema, docs):
    got = engine_reasons(spark, schema, docs)
    want = jsonschema_reasons_auto(schema, docs)
    assert got == want, f"engine {got} != jsonschema {want}"
    return got


def test_unevaluated_properties_static_parity_2019(spark):
    schema = {
        "$schema": D2019,
        "$id": "unev://p19/1.0",
        "type": "object",
        "properties": {"a": {"type": "string"}},
        "patternProperties": {"^x": {}},
    }
    docs = [
        ("ok_decl", {"a": "v"}),
        ("ok_pat", {"a": "v", "x9": 1}),
        ("bad_extra", {"a": "v", "b": 1}),
        ("bad_two", {"b": 1, "c": 2}),
    ]
    s = dict(schema, unevaluatedProperties=False)
    got = assert_auto_parity(spark, s, docs)
    assert got["bad_extra"] == ["unevaluatedProperties"]

    # legacy-walk quirk: object-form additionalProperties contributes
    # its OWN KEYS as evaluated names under 2019-09
    # (values satisfy the AP subschema so the uncompiled schema-form
    # AP validation stays silent on both sides)
    s_ap = dict(s, additionalProperties={"type": "integer"})
    docs_ap = [
        ("key_named_type", {"a": "v", "type": 5}),
        ("other_extra", {"a": "v", "zz": 1}),
    ]
    got = assert_auto_parity(spark, s_ap, docs_ap)
    assert got["key_named_type"] == []
    assert got["other_extra"] == ["unevaluatedProperties"]

    # AP false: both validators fire on the same extra key
    s_apf = dict(s, additionalProperties=False)
    got = assert_auto_parity(spark, s_apf, [("bad", {"a": "v", "b": 1})])
    assert got["bad"] == ["additionalProperties", "unevaluatedProperties"]

    # AP true: unevaluatedProperties can never fire
    s_apt = dict(s, additionalProperties=True)
    assert_auto_parity(spark, s_apt, docs)


def test_unevaluated_properties_static_parity_2020(spark):
    schema = {
        "$schema": D2020,
        "$id": "unev://p20/1.0",
        "type": "object",
        "properties": {"a": {"type": "string"}},
        "unevaluatedProperties": False,
    }
    docs = [
        ("ok", {"a": "v"}),
        ("bad", {"a": "v", "b": 1}),
    ]
    got = assert_auto_parity(spark, schema, docs)
    assert got["bad"] == ["unevaluatedProperties"]

    # 2020-12: AP={} accepts every value → everything evaluated
    s_ap = dict(schema, additionalProperties={})
    got = assert_auto_parity(spark, s_ap, docs)
    assert got["bad"] == []

    # 2020-12 object-form AP is value-dependent: a property counts as
    # evaluated iff its value satisfies AP — compiled via #entries.
    # int value → evaluated, no error; string value → AP leaf error
    # (schema-form AP values are validated too) AND unevaluated.
    s_dyn = dict(schema, **{"$id": "unev://p20d/1.0",
                            "additionalProperties": {"type": "integer"}})
    got = assert_auto_parity(spark, s_dyn, [
        ("ap_valid", {"a": "v", "b": 1}),
        ("ap_invalid", {"a": "v", "b": "x"}),
    ])
    assert got["ap_valid"] == []
    assert got["ap_invalid"] == ["type", "unevaluatedProperties"]


def test_schema_form_additional_properties_values(spark):
    # schema-form additionalProperties validates undeclared property
    # VALUES with leaf reasons (all drafts) — previously annotation-only
    schema = {
        "$schema": DRAFT,
        "$id": "apv://d7/1.0",
        "type": "object",
        "properties": {"x": {}},
        "patternProperties": {"^n": {}},
        "additionalProperties": {"type": "integer", "minimum": 0},
    }
    docs = [
        ("ok_declared", {"x": "anything"}),
        ("ok_pattern", {"nfoo": "anything"}),
        ("ok_extra_int", {"y": 3}),
        ("bad_extra_str", {"y": "s"}),
        ("bad_extra_neg", {"y": -2}),
        ("bad_both", {"y": "s", "z": -1}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["bad_extra_str"] == ["type"]
    assert got["bad_extra_neg"] == ["minimum"]


def test_unevaluated_properties_schema_form_parity(spark):
    up = {"type": "integer", "minimum": 0}
    for draft, sid in ((D2019, "unev://sf19/1.0"), (D2020, "unev://sf20/1.0")):
        schema = {
            "$schema": draft,
            "$id": sid,
            "type": "object",
            "properties": {"a": {}},
            "patternProperties": {"^n": {}},
            "unevaluatedProperties": up,
        }
        docs = [
            ("ok_int", {"a": 1, "b": 3}),
            ("bad_str", {"a": 1, "b": "s"}),
            ("bad_neg", {"a": 1, "b": -1}),
            ("ok_pattern", {"nx": "whatever"}),
            # legacy-walk quirk: UP's OWN keys count as evaluated
            # names under 2019-09, but not 2020-12
            ("key_named_type", {"a": 1, "type": "zz"}),
        ]
        got = assert_auto_parity(spark, schema, docs)
        assert got["bad_str"] == ["unevaluatedProperties"]
        assert got["key_named_type"] == (
            [] if draft == D2019 else ["unevaluatedProperties"]
        )

        # alongside schema-form AP: AP-valid values are evaluated
        # under 2020-12 only; AP leaf errors fire in both
        s_ap = dict(schema, **{"$id": sid + "ap",
                               "additionalProperties": {"type": "string"}})
        docs_ap = [
            ("extra_str", {"b": "s"}),
            ("extra_int", {"b": 2}),
            ("extra_bool", {"b": True}),
        ]
        got = assert_auto_parity(spark, s_ap, docs_ap)
        assert got["extra_bool"] == ["type", "unevaluatedProperties"]
        assert got["extra_str"] == (
            ["unevaluatedProperties"] if draft == D2019 else []
        )


def test_unevaluated_items_schema_form_parity(spark):
    # 2019-09 tuple-items prefix + UI subschema over the tail
    s19 = {
        "$schema": D2019,
        "$id": "unev://isf19/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "items": [{"type": "integer"}],
                "unevaluatedItems": {"type": "string"},
            }
        },
    }
    got = assert_auto_parity(spark, s19, [
        ("ok_prefix", {"arr": [1]}),
        ("ok_tail", {"arr": [1, "x", "y"]}),
        ("bad_tail", {"arr": [1, 2]}),
        ("bad_prefix", {"arr": ["a"]}),
        ("empty", {"arr": []}),
    ])
    assert got["bad_tail"] == ["unevaluatedItems"]
    assert got["bad_prefix"] == ["type"]  # prefix position is evaluated

    # no prefix at all: every element must satisfy the UI subschema
    s19n = {
        "$schema": D2019,
        "$id": "unev://isf19n/1.0",
        "type": "object",
        "properties": {
            "arr": {"type": "array", "unevaluatedItems": {"type": "string"}}
        },
    }
    got = assert_auto_parity(spark, s19n, [
        ("ok", {"arr": ["a", "b"]}),
        ("bad", {"arr": ["a", 1]}),
    ])
    assert got["bad"] == ["unevaluatedItems"]

    # 2020-12 prefixItems form
    s20 = {
        "$schema": D2020,
        "$id": "unev://isf20/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "prefixItems": [{"type": "integer"}],
                "unevaluatedItems": {"type": "string"},
            }
        },
    }
    got = assert_auto_parity(spark, s20, [
        ("ok", {"arr": [1, "x"]}),
        ("bad", {"arr": [1, 2]}),
    ])
    assert got["bad"] == ["unevaluatedItems"]


def test_unevaluated_items_static_parity(spark):
    # 2019-09: tuple-form items evaluates its positions; longer fails
    s19 = {
        "$schema": D2019,
        "$id": "unev://i19/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "items": [{"type": "integer"}],
                "unevaluatedItems": False,
            }
        },
    }
    docs = [
        ("ok_one", {"arr": [1]}),
        ("ok_empty", {"arr": []}),
        ("bad_long", {"arr": [1, 2]}),
        ("absent", {}),
    ]
    got = assert_auto_parity(spark, s19, docs)
    assert got["bad_long"] == ["unevaluatedItems"]

    # no items at all: any element is unevaluated
    s19n = {
        "$schema": D2019,
        "$id": "unev://i19n/1.0",
        "type": "object",
        "properties": {
            "arr": {"type": "array", "unevaluatedItems": False}
        },
    }
    got = assert_auto_parity(
        spark, s19n, [("bad", {"arr": [1]}), ("ok", {"arr": []})]
    )
    assert got["bad"] == ["unevaluatedItems"]

    # dict-form items evaluates everything → vacuous both sides
    s19v = {
        "$schema": D2019,
        "$id": "unev://i19v/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "items": {"type": "integer"},
                "unevaluatedItems": False,
            }
        },
    }
    assert_auto_parity(spark, s19v, [("ok", {"arr": [1, 2, 3]})])

    # 2020-12: prefixItems covers its positions
    s20 = {
        "$schema": D2020,
        "$id": "unev://i20/1.0",
        "type": "object",
        "properties": {
            "arr": {
                "type": "array",
                "prefixItems": [{"type": "integer"}],
                "unevaluatedItems": False,
            }
        },
    }
    got = assert_auto_parity(
        spark, s20, [("ok", {"arr": [3]}), ("bad", {"arr": [3, 4]})]
    )
    assert got["bad"] == ["unevaluatedItems"]


# ---------------------------------------------------------------------------
# custom format registry (⇔ customFormats, extensible_validator.py:77-84)
# ---------------------------------------------------------------------------


def test_custom_format_regex_from_schema_file(spark, tmp_path):
    fmt_schema = {
        "$schema": DRAFT,
        "$id": "fmt://curie/1.0",
        "type": "object",
        "properties": {"xref": {"type": "string", "format": "curie"}},
    }
    p = tmp_path / "fmt_schema.json"
    p.write_text(json.dumps(fmt_schema))
    registry, issues = load_schemas(
        str(p), custom_formats={"curie": r"^[A-Za-z_][A-Za-z0-9_.-]*:\S+$"}
    )
    assert [i for i in issues if i.severity == "error"] == []
    cs = registry["fmt://curie/1.0"]
    docs = [
        ("ok", {"xref": "GO:0008150"}),
        ("bad", {"xref": "not a curie"}),
        ("absent", {}),
    ]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(
        cs.table_spec.checks, json_mode=True,
        formats=cs.table_spec.custom_formats,
    )
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    got = {r.row_id: r.reason for r in viol.collect()}
    assert got == {"bad": "format"}


def test_custom_format_reference_protocol(spark):
    """The reference's class protocol (FormatName + IsCorrectFormat)
    compiles to an Arrow-batched pandas UDF."""

    class EvenLength:
        FormatName = "even-length"

        @staticmethod
        def IsCorrectFormat(v, schema=None):
            return isinstance(v, str) and len(v) % 2 == 0

    schema = {
        "$schema": DRAFT,
        "$id": "fmt://even/1.0",
        "type": "object",
        "properties": {"code": {"type": "string", "format": "even-length"}},
    }
    registry, issues = load_schemas(
        [("s.json", schema)], custom_formats=[EvenLength]
    )
    assert [i for i in issues if i.severity == "error"] == []
    cs = registry["fmt://even/1.0"]
    docs = [("ok", {"code": "ab"}), ("bad", {"code": "abc"}), ("none", {})]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(
        cs.table_spec.checks, json_mode=True,
        formats=cs.table_spec.custom_formats,
    )
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    got = {r.row_id: r.reason for r in viol.collect()}
    assert got == {"bad": "format"}


def test_items_scalar_keywords_leaf_parity(spark):
    """Direct per-element `items` keywords (scalar subset) compile to
    forall over the element-literal array with LEAF reasons, exactly
    like jsonschema's descend into items."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://items/1.0",
        "type": "object",
        "properties": {
            "tags": {
                "type": "array",
                "minItems": 1,
                "items": {"type": "string", "pattern": "^t"},
            },
            "nums": {"items": {"type": "number", "minimum": 0, "multipleOf": 2}},
        },
    }
    docs = [
        ("ok", {"tags": ["ta", "tb"], "nums": [0, 4, 8]}),
        ("tag_type", {"tags": ["ta", 7]}),
        ("tag_pat", {"tags": ["ta", "xb"]}),
        ("tags_empty", {"tags": []}),
        ("num_neg", {"nums": [2, -4]}),
        ("num_odd", {"nums": [2, 3]}),
        ("num_both", {"nums": [-3]}),
        ("not_array", {"nums": "na"}),  # items vacuous on non-arrays
        ("absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["tag_type"] == ["type"]
    assert got["tag_pat"] == ["pattern"]
    assert got["num_both"] == ["minimum", "multipleOf"]
    assert got["not_array"] == []


def test_edge_guards(spark):
    """Edge hardening: empty enum compiles to always-fail instead of
    crashing isin(); empty anyOf/oneOf rejected at spec level; a False
    dependency schema surfaces as reason 'dependencies' (jsonschema
    emits validator=None there — nothing mappable)."""
    from python_extended_json_schema_validator_spark import (
        CombinatorCheck, SpecError,
    )

    with pytest.raises(SpecError, match="at least one branch"):
        CombinatorCheck(column="#root", kind="anyOf", branches=())

    schema = {
        "$schema": DRAFT,
        "$id": "edge://guards/1.0",
        "type": "object",
        "properties": {"e": {"enum": []}},
        "dependencies": {"trigger": False},
    }
    docs = [
        ("empty_enum", {"e": 1}),
        ("dep_false", {"trigger": 1}),
        ("clean", {}),
    ]
    got = engine_reasons(spark, schema, docs)
    assert got["empty_enum"] == ["enum"]
    assert got["dep_false"] == ["dependencies"]
    assert got["clean"] == []
    # verdict parity with jsonschema (names aside)
    import jsonschema

    v = jsonschema.Draft7Validator(schema)
    for name, doc in docs:
        assert bool(got[name]) == (not v.is_valid(doc)), name


def test_tuple_items_per_index_parity(spark):
    """Draft-07 tuple-form items: per-INDEX scalar checks with leaf
    reasons; absent positions vacuous; extra elements unconstrained
    (no additionalItems declared)."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://tuple/1.0",
        "type": "object",
        "properties": {
            "pair": {
                "type": "array",
                "items": [
                    {"type": "string", "pattern": "^k"},
                    {"type": "integer", "minimum": 0},
                ],
            },
        },
    }
    docs = [
        ("ok", {"pair": ["key", 5]}),
        ("short", {"pair": ["key"]}),
        ("empty", {"pair": []}),
        ("bad_first", {"pair": ["x", 5]}),
        ("bad_second", {"pair": ["key", -2]}),
        ("bad_both", {"pair": [3, "x"]}),
        ("extra_free", {"pair": ["key", 5, "anything", None]}),
        ("not_array", {"pair": "ka"}),
        ("absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["bad_first"] == ["pattern"]
    assert got["bad_second"] == ["minimum"]
    assert sorted(got["bad_both"]) == ["type", "type"] or got["bad_both"] == ["type"]
    assert got["extra_free"] == []
    assert got["short"] == []


def test_contains_and_bounds_parity(spark):
    """contains (draft-07) reason split + 2020-12 min/maxContains:
    zero matches → contains; partial → minContains; excess →
    maxContains; minContains 0 silences contains."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://contains/1.0",
        "type": "object",
        "properties": {
            "a": {"type": "array",
                  "contains": {"type": "integer", "minimum": 5}},
        },
    }
    docs = [
        ("hit", {"a": [1, 7]}),
        ("none", {"a": [1, 2]}),
        ("empty", {"a": []}),
        ("nonarray", {"a": "x"}),
        ("absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["none"] == ["contains"]
    assert got["empty"] == ["contains"]
    # contains itself vacuous on non-arrays; the declared type fires
    assert got["nonarray"] == ["type"]


def test_min_max_contains_2020_parity(spark):
    import jsonschema

    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "comb://contains2020/1.0",
        "type": "object",
        "properties": {
            "a": {"contains": {"type": "integer"}, "minContains": 2,
                  "maxContains": 3},
            "z": {"contains": {"type": "integer"}, "minContains": 0},
        },
    }
    docs = [
        ("partial", {"a": [1]}),
        ("ok", {"a": [1, 2]}),
        ("excess", {"a": [1, 2, 3, 4]}),
        ("zero", {"a": ["x"]}),
        ("minzero_empty", {"z": []}),
    ]
    got = engine_reasons(spark, schema, docs)
    v = jsonschema.Draft202012Validator(schema)
    want = {n: sorted(e.validator for e in v.iter_errors(d)) for n, d in docs}
    assert got == want, f"engine {got} != jsonschema {want}"
    assert got["partial"] == ["minContains"]
    assert got["excess"] == ["maxContains"]
    assert got["zero"] == ["contains"]
    assert got["minzero_empty"] == []


def test_if_then_else_leaf_parity(spark):
    schema = {
        "$schema": DRAFT,
        "$id": "comb://ite/1.0",
        "type": "object",
        "properties": {
            "p": {
                "if": {"type": "integer"},
                "then": {"minimum": 10},
                "else": {"type": "string", "minLength": 3},
            },
            "q": {"if": {"const": "x"}, "then": {"maxLength": 1}},
            "r": {"if": {"type": "number"}, "else": {"enum": ["a"]}},
        },
    }
    docs = [
        ("then_ok", {"p": 20}),
        ("then_fail", {"p": 5}),
        ("else_ok", {"p": "abcd"}),
        ("else_fail", {"p": "x"}),
        ("bool_else", {"p": True}),
        ("q_then", {"q": "x"}),
        ("q_skip", {"q": "anything else entirely"}),
        ("r_else_fail", {"r": "zz"}),
        ("r_if_ok", {"r": 4.5}),
        ("absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["then_fail"] == ["minimum"]
    assert got["else_fail"] == ["minLength"]
    assert got["bool_else"] == ["type"]
    assert got["r_else_fail"] == ["enum"]


def test_prefix_items_ignored_under_2019(spark):
    # prefixItems is a 2020-12 keyword; Draft201909Validator ignores
    # it — compiling it under 2019-09 would over-validate (probe:
    # jsonschema 4.26 emits NO error for a violating element)
    s19 = {
        "$schema": D2019,
        "$id": "pfx://ig19/1.0",
        "type": "object",
        "properties": {
            "arr": {"type": "array", "prefixItems": [{"type": "integer"}]}
        },
    }
    got = assert_auto_parity(spark, s19, [("doc", {"arr": ["not-int"]})])
    assert got["doc"] == []

    s20 = {
        "$schema": D2020,
        "$id": "pfx://en20/1.0",
        "type": "object",
        "properties": {
            "arr": {"type": "array", "prefixItems": [{"type": "integer"}]}
        },
    }
    got = assert_auto_parity(spark, s20, [("doc", {"arr": ["not-int"]})])
    assert got["doc"] == ["type"]


def test_dependencies_family_draft_split(spark):
    # jsonschema ignores dependentRequired/dependentSchemas under
    # draft-07 and legacy `dependencies` under 2019-09+ — so must we
    d7 = {
        "$schema": DRAFT,
        "$id": "deps://d7split/1.0",
        "type": "object",
        "dependentRequired": {"a": ["b"]},
        "dependentSchemas": {"a": {"required": ["c"]}},
    }
    got = assert_auto_parity(spark, d7, [("trig", {"a": 1})])
    assert got["trig"] == []

    d19 = {
        "$schema": D2019,
        "$id": "deps://d19split/1.0",
        "type": "object",
        "dependencies": {"a": ["b"]},
        "dependentRequired": {"a": ["d"]},
    }
    got = assert_auto_parity(spark, d19, [("trig", {"a": 1})])
    assert got["trig"] == ["dependentRequired"]


D4 = "http://json-schema.org/draft-04/schema#"
D3 = "http://json-schema.org/draft-03/schema#"


def test_draft4_keyword_gates(spark):
    """Draft4Validator ignores const/contains/propertyNames and treats
    exclusiveMinimum as the boolean minimum-modifier — compiling them
    draft-blind would over-validate ([verified] probes)."""
    schema = {
        "$schema": D4,
        "id": "old://d4/1.0",
        "type": "object",
        "properties": {
            "c": {"const": "x"},
            "m": {"type": "number", "multipleOf": 3},
            "nb": {"type": "number", "minimum": 5},
            "obj": {"type": "object", "minProperties": 2},
            "pn": {"type": "object", "propertyNames": {"pattern": "^a"}},
            "ca": {"type": "array", "contains": {"type": "string"}},
        },
    }
    docs = [
        ("const_ign", {"c": "zzz"}),
        ("mult_bad", {"m": 4}),
        ("nb_edge", {"nb": 5}),
        ("nb_low", {"nb": 4}),
        ("minprops", {"obj": {"a": 1}}),
        ("pn_ign", {"pn": {"zzz": 1}}),
        ("ca_ign", {"ca": [1]}),
    ]
    got = assert_auto_parity(spark, schema, docs)
    assert got["const_ign"] == []
    assert got["mult_bad"] == ["multipleOf"]
    assert got["nb_edge"] == []
    assert got["minprops"] == ["minProperties"]
    assert got["pn_ign"] == [] and got["ca_ign"] == []

    # boolean exclusiveMinimum tightens the bound; since round 4 the
    # reason matches jsonschema too (Draft4's legacy `minimum`
    # validator owns the modifier and reports under `minimum`)
    s_ex = dict(schema, **{
        "id": "old://d4ex/1.0",
        "properties": {"b": {"type": "number", "minimum": 5,
                             "exclusiveMinimum": True}},
    })
    got_ex = assert_auto_parity(spark, s_ex, [("edge", {"b": 5}),
                                              ("above", {"b": 6})])
    assert got_ex["edge"] == ["minimum"] and got_ex["above"] == []


def test_draft3_ignores_multiple_of(spark):
    schema = {
        "$schema": D3,
        "id": "old://d3/1.0",
        "type": "object",
        "properties": {"m": {"type": "number", "multipleOf": 3}},
    }
    got = assert_auto_parity(spark, schema, [("m_ign", {"m": 4})])
    assert got["m_ign"] == []


def test_element_combinator_parity_and_fallback(spark):
    # direct items-level combinators compile per element (leaf probe
    # parity covered by test_random_differential); this pins the exact
    # fallback boundary: a branch outside the scalar subset must WARN
    # and not compile (a weaker `not`/`oneOf` branch would
    # over-validate)
    schema = {
        "$schema": DRAFT,
        "$id": "elc://t/1.0",
        "type": "object",
        "properties": {
            "good": {"items": {"anyOf": [
                {"type": "integer", "minimum": 10},
                {"type": "string", "pattern": "^ok"},
            ]}},
            "deep": {"items": {"not": {"properties": {"x": {"type": "integer"}},
                                       "required": ["x"]}}},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    warns = [i.description for i in issues if i.severity == "warning"]
    assert any("array-element location" in w and "'not'" in w for w in warns), warns
    assert not any("anyOf" in w for w in warns), warns
    got = assert_auto_parity(
        spark,
        schema,
        [
            ("ok1", {"good": [15, "okay"]}),
            ("bad1", {"good": [5]}),
            ("bad2", {"good": ["nope", 20]}),
            ("vac", {"good": "not-an-array"}),
            # `deep` is only partially enforced (warned) — docs where
            # the uncompiled branch decides are excluded from parity
        ],
    )
    assert got["bad1"] == ["anyOf"] and got["bad2"] == ["anyOf"]
    assert got["ok1"] == [] and got["vac"] == []


def test_custom_formats_are_scoped_not_global(spark):
    """customFormats are scoped to the load that declared them (⇔ the
    reference's per-ExtensibleValidator-instance customFormats,
    extensible_validator.py:77-84): they never mutate the global
    FORMATS registry, so a later load in the same process neither sees
    the custom name nor a shadowed built-in."""
    from python_extended_json_schema_validator_spark.checks.row_checks import (
        FORMATS,
    )

    before = dict(FORMATS)
    schema = {
        "$schema": DRAFT,
        "$id": "fmt://scoped/1.0",
        "type": "object",
        "properties": {
            "xref": {"type": "string", "format": "curie"},
            # shadow a BUILT-IN name: only THIS load sees the override
            "mail": {"type": "string", "format": "email"},
        },
    }
    registry, _ = load_schemas(
        [("s.json", schema)],
        custom_formats={"curie": r"^[A-Z]+:\d+$", "email": r"^x@x$"},
    )
    assert FORMATS == before, "load_schemas must not touch global FORMATS"
    cs = registry["fmt://scoped/1.0"]
    shredded = shred_documents(
        spark,
        [("a", {"xref": "GO:1", "mail": "x@x"}),
         ("b", {"xref": "nope", "mail": "real@mail.com"})],
        cs,
    )
    battery = row_checks.compile_battery(
        cs.table_spec.checks, json_mode=True,
        formats=cs.table_spec.custom_formats,
    )
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    got = {(r.row_id, r.constraint_id) for r in viol.collect()}
    # scoped override: 'real@mail.com' FAILS the shadowed email here...
    assert got == {("b", "check:xref:format"), ("b", "check:mail:format")}

    # ...while a load WITHOUT custom formats gets the built-ins back
    # and never sees 'curie'
    plain = {
        "$schema": DRAFT,
        "$id": "fmt://plain/1.0",
        "type": "object",
        "properties": {"mail": {"type": "string", "format": "email"}},
    }
    registry2, _ = load_schemas([("s.json", plain)])
    cs2 = registry2["fmt://plain/1.0"]
    shredded2 = shred_documents(spark, [("c", {"mail": "real@mail.com"})], cs2)
    battery2 = row_checks.compile_battery(
        cs2.table_spec.checks, json_mode=True,
        formats=cs2.table_spec.custom_formats,
    )
    assert row_checks.row_violations(
        shredded2, F.col("__file"), battery2
    ).count() == 0


def test_multipleof_bigint_exact_parity(spark):
    """Integer instances beyond 2^53 use exact decimal arithmetic like
    jsonschema's int % int — the double path would call
    10000000000000001 a multiple of 10 (ADVICE round-3)."""
    schema = {
        "$schema": DRAFT,
        "$id": "comb://bigmult/1.0",
        "type": "object",
        "properties": {
            "m": {"multipleOf": 10},
            "h": {"multipleOf": 0.5},
        },
    }
    docs = [
        ("big_off", {"m": 10000000000000001}),   # 2^53+ -> double lies
        ("big_on", {"m": 10000000000000000}),
        ("huge_off", {"m": 10 ** 30 + 3}),
        ("huge_on", {"m": 10 ** 30}),
        ("neg_off", {"m": -10000000000000001}),
        ("float_path", {"m": 20.0}),
        ("frac", {"h": 2.5}),
        ("frac_bad", {"h": 2.3}),
        ("int_frac", {"h": 3}),
        ("skip_str", {"m": "55"}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["big_off"] == ["multipleOf"]
    assert got["big_on"] == [] and got["huge_on"] == []
    assert got["huge_off"] == ["multipleOf"]


def test_unevaluated_with_lossy_additional_properties_warns():
    """2020-12 unevaluatedProperties next to a NON-scalar-expressible
    additionalProperties: the compiled AP subset accepts everything, so
    the UP check is skipped — that consequence must be recorded on UP
    itself, not only via the AP-attributed subset warning (ADVICE
    round-3)."""
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "unev://lossyap/1.0",
        "type": "object",
        "properties": {
            "o": {
                "type": "object",
                "properties": {"x": {}},
                "additionalProperties": {"properties": {"q": {}}},
                "unevaluatedProperties": False,
            }
        },
    }
    _, issues = load_schemas([("s.json", schema)])
    warns = [i.description for i in issues if i.severity == "warning"]
    assert any(
        "unevaluatedProperties alongside a partially-compiled "
        "additionalProperties" in w
        for w in warns
    ), warns


def test_object_element_items_subschema_parity(spark):
    """`items: {type: object, properties: {...}, required: [...]}` —
    the most common array-of-objects shape — compiles per element over
    ALIGNED sub-instance literal arrays (round 4): scalar property
    keywords forall with NULL-entry vacuity, `required` as a zip of
    the parent literal array (object entries must carry the member).
    Leaf reasons match jsonschema's items descent exactly."""
    schema = {
        "$schema": DRAFT,
        "$id": "elobj://t/1.0",
        "type": "object",
        "properties": {
            "a": {"items": {
                "type": "object",
                "properties": {
                    "b": {"type": "integer", "minimum": 0},
                    "t": {"type": "string", "maxLength": 3},
                    "nest": {"type": "object",
                             "properties": {"q": {"type": "number"}},
                             "required": ["q"]},
                },
                "required": ["b"],
            }},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    # the whole shape compiles — NO per-element warnings remain
    assert [i for i in issues if i.severity == "warning"] == [], issues
    docs = [
        ("ok", {"a": [{"b": 1}, {"b": 2, "t": "ab"}]}),
        ("negb", {"a": [{"b": -1}]}),
        ("missb", {"a": [{}]}),
        ("badtypeb", {"a": [{"b": "x"}]}),
        ("nonobj_el", {"a": [3]}),
        ("tlong", {"a": [{"b": 1, "t": "toolong"}]}),
        ("bnull", {"a": [{"b": None}]}),
        ("notarr", {"a": 3}),
        ("absent", {}),
        ("nest_ok", {"a": [{"b": 1, "nest": {"q": 1.5}}]}),
        ("nest_missing_q", {"a": [{"b": 1, "nest": {}}]}),
        ("nest_bad_q", {"a": [{"b": 1, "nest": {"q": "s"}}]}),
        ("nest_nonobj", {"a": [{"b": 1, "nest": 7}]}),
        ("mixed", {"a": [{"b": -1}, {"t": "xxxx"}, "str"]}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["missb"] == ["required"]
    assert got["nest_missing_q"] == ["required"]
    assert sorted(got["mixed"]) == ["maxLength", "minimum", "required", "type"]


def test_root_array_items_compile(spark):
    """Root-level `items` (document IS the array) compiles against the
    #root[] element column — previously the '[]' path never shredded
    and element checks silently passed."""
    schema = {
        "$schema": DRAFT,
        "$id": "rootarr://t/1.0",
        "type": "array",
        "items": {"type": "integer", "minimum": 0},
    }
    docs = [
        ("ok", [1, 2]),
        ("neg", [1, -2]),
        ("str_el", ["x"]),
        ("nonarr", {"x": 1}),
        ("empty", []),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["neg"] == ["minimum"] and got["str_el"] == ["type"]


def test_element_object_keywords_parity(spark):
    """items-level object keywords (round 4, batch 2): per-element
    additionalProperties:false / min-maxProperties / propertyNames via
    `<loc>#keys` array<array> columns; required-form dependencies via
    aligned member arrays; combinators on element PROPERTIES
    ("a[].b": anyOf) with NULL-entry vacuity."""
    schema = {
        "$schema": DRAFT,
        "$id": "elkeys://t/1.0",
        "type": "object",
        "properties": {
            "a": {"items": {"type": "object", "properties": {
                "b": {"anyOf": [{"type": "integer", "minimum": 10},
                                {"type": "string", "pattern": "^ok"}]},
            }}},
            "c": {"items": {"type": "object",
                            "properties": {"x": {}},
                            "additionalProperties": False,
                            "minProperties": 1,
                            "maxProperties": 2,
                            "propertyNames": {"maxLength": 3}}},
            "d": {"items": {"dependencies": {"p": ["q"]}}},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    assert [i for i in issues if i.severity == "warning"] == [], [
        i.description for i in issues
    ]
    docs = [
        ("ok", {"a": [{"b": 15}, {"b": "okay"}, {}],
                "c": [{"x": 1}], "d": [{"p": 1, "q": 2}, {"r": 3}, 5]}),
        ("sub_anyof", {"a": [{"b": 5}]}),
        ("ap_extra", {"c": [{"x": 1, "z": 2}]}),
        ("minprops", {"c": [{}]}),
        ("maxprops", {"c": [{"x": 1, "ab": 2, "cd": 3}]}),
        ("pn_long", {"c": [{"x": 1, "longname": 2}]}),
        # one offending element (engine emits one violation per
        # KEYWORD, jsonschema one per element — documented granularity)
        ("nonobj_el", {"c": [3]}),
        ("dep_fire", {"d": [{"p": 1}]}),
        ("dep_vac", {"d": [{"q": 1}, 7]}),
        ("all_absent", {}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["sub_anyof"] == ["anyOf"]
    assert got["ap_extra"] == ["additionalProperties"]
    assert got["dep_fire"] == ["dependencies"]
    assert sorted(got["pn_long"]) == ["additionalProperties", "maxLength"]


def test_element_dependent_required_2019(spark):
    schema = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "eldep19://t/1.0",
        "type": "object",
        "properties": {"d": {"items": {"dependentRequired": {"p": ["q"]}}}},
    }
    docs = [
        ("fire", {"d": [{"p": 1}]}),
        ("ok", {"d": [{"p": 1, "q": 2}, {"r": 1}, 3]}),
    ]
    import jsonschema

    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "warning"] == [], [
        i.description for i in issues
    ]
    cs = registry["eldep19://t/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)
    v = jsonschema.validators.validator_for(schema)(schema)
    for n, d in docs:
        assert mine[n] == {e.validator for e in v.iter_errors(d)}, (n, mine[n])


def test_element_entries_keywords_parity(spark):
    """items-level patternProperties + schema-form additionalProperties
    VALUES compile via per-element entries maps (round 4, batch 3)."""
    schema = {
        "$schema": DRAFT,
        "$id": "elent://t/1.0",
        "type": "object",
        "properties": {
            "a": {"items": {"patternProperties": {
                "^n": {"type": "number", "minimum": 0}}}},
            "b": {"items": {"properties": {"x": {}},
                            "additionalProperties": {"type": "integer"}}},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    assert [i for i in issues if i.severity == "warning"] == [], [
        i.description for i in issues
    ]
    docs = [
        ("ok", {"a": [{"n1": 5}, {"z": "s"}, 7],
                "b": [{"x": "anything", "z": 3}, "str"]}),
        ("pp_neg", {"a": [{"n1": -5}]}),
        ("pp_type", {"a": [{"nx": "s"}]}),
        ("ap_bad", {"b": [{"z": "s"}]}),
        ("both_absent", {}),
        ("nonarr", {"a": 3, "b": "x"}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["pp_neg"] == ["minimum"]
    assert got["pp_type"] == ["type"]
    assert got["ap_bad"] == ["type"]


def test_element_unevaluated_properties_static(spark):
    """Static `unevaluatedProperties: false` inside items compiles per
    element (keys arrays), draft-split exactly like the object-level
    walk: 2019-09 legacy AP-own-keys quirk honored; 2020-12 AP={}
    makes UP vacuous."""
    import jsonschema

    cases = [
        ({"$schema": "https://json-schema.org/draft/2019-09/schema",
          "$id": "elup://a/1.0",
          "type": "object",
          "properties": {"a": {"items": {
              "properties": {"x": {}},
              "patternProperties": {"^n": {}},
              "unevaluatedProperties": False}}}},
         [("ok", {"a": [{"x": 1, "n2": 3}]}),
          ("extra", {"a": [{"z": 1}]}),
          ("nonobj", {"a": [5]})]),
        ({"$schema": "https://json-schema.org/draft/2019-09/schema",
          "$id": "elup://b/1.0",
          "type": "object",
          "properties": {"a": {"items": {
              "properties": {"x": {}},
              "additionalProperties": {"nx": {}},
              "unevaluatedProperties": False}}}},
         [("apkey", {"a": [{"nx": 1}]}),
          ("other", {"a": [{"zz": 1}]})]),
        ({"$schema": "https://json-schema.org/draft/2020-12/schema",
          "$id": "elup://c/1.0",
          "type": "object",
          "properties": {"a": {"items": {
              "properties": {"x": {}},
              "additionalProperties": {},
              "unevaluatedProperties": False}}}},
         [("vac", {"a": [{"zz": 1}]})]),
    ]
    for schema, docs in cases:
        registry, issues = load_schemas([("s.json", schema)])
        assert [i for i in issues if i.severity == "error"] == [], issues
        cs = registry[schema["$id"]]
        shredded = shred_documents(spark, docs, cs)
        battery = row_checks.compile_battery(
            cs.table_spec.checks, json_mode=True
        )
        viol = row_checks.row_violations(shredded, F.col("__file"), battery)
        mine = {n: set() for n, _ in docs}
        for r in viol.collect():
            mine[r.row_id].add(r.reason)
        v = jsonschema.validators.validator_for(schema)(schema)
        for n, d in docs:
            want = {e.validator for e in v.iter_errors(d)}
            assert mine[n] == want, (schema["$id"], n, mine[n], want)


def test_sub_level_object_keywords_parity(spark):
    """Object keywords on PROPERTIES of array elements ("a[].meta"):
    additionalProperties/min-maxProperties/propertyNames/
    patternProperties/static unevaluatedProperties all compile one
    array level down — filtered per-element collections are
    verdict-equivalent to aligned ones because dropped/NULL entries
    are vacuous."""
    import jsonschema

    schema = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "subobj://t/1.0",
        "type": "object",
        "properties": {"a": {"items": {"type": "object", "properties": {
            "meta": {"type": "object",
                     "properties": {"x": {}},
                     "additionalProperties": False,
                     "minProperties": 1,
                     "propertyNames": {"maxLength": 4},
                     "patternProperties": {"^n": {"type": "number"}}},
            "cfg": {"properties": {"q": {}},
                    "unevaluatedProperties": False},
        }}}},
    }
    registry, issues = load_schemas([("s.json", schema)])
    assert [i for i in issues if i.severity == "error"] == [], issues
    assert [i for i in issues if i.severity == "warning"] == [], [
        i.description for i in issues
    ]
    docs = [
        ("ok", {"a": [{"meta": {"x": 1}}, {"cfg": {"q": 2}}, {}]}),
        ("ap", {"a": [{"meta": {"x": 1, "zz": 2}}]}),
        ("minp", {"a": [{"meta": {}}]}),
        ("pnlong", {"a": [{"meta": {"x": 1, "verylong": 2}}]}),
        ("pp", {"a": [{"meta": {"x": 1, "n2": "s"}}]}),
        ("up", {"a": [{"cfg": {"z": 1}}]}),
        ("meta_nonobj", {"a": [{"meta": 3}]}),
        ("nonobj_el", {"a": [5]}),
        ("absent", {}),
    ]
    cs = registry["subobj://t/1.0"]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    mine = {n: set() for n, _ in docs}
    for r in viol.collect():
        mine[r.row_id].add(r.reason)
    v = jsonschema.validators.validator_for(schema)(schema)
    for n, d in docs:
        want = {e.validator for e in v.iter_errors(d)}
        assert mine[n] == want, (n, sorted(mine[n]), sorted(want))


def test_draft4_bool_exclusive_inside_items_and_branches(spark):
    """Round-4 review finding 1: draft-03/04 boolean exclusiveMinimum
    inside scalar SUBSETS (items elements, combinator branches) must
    pair with the bound (strict, reported under `minimum`) — the raw
    boolean used to leak into `double > true` and fail analysis."""
    schema = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "old://d4elex/1.0",
        "type": "object",
        "properties": {
            "a": {"items": {"minimum": 5, "exclusiveMinimum": True}},
            "v": {"anyOf": [{"minimum": 5, "exclusiveMinimum": True},
                            {"type": "string"}]},
        },
    }
    docs = [
        ("edge", {"a": [5], "v": 5}),
        ("above", {"a": [6], "v": 6}),
        ("below", {"a": [4]}),
        ("str", {"v": "s"}),
    ]
    got = assert_auto_parity(spark, schema, docs)
    assert got["edge"] == ["anyOf", "minimum"]
    assert got["above"] == [] and got["str"] == []


def test_python_backed_format_in_subset_warns_not_crashes(spark):
    """Round-4 review finding 2: Python-UDF format checkers ('regex',
    'idn-hostname', reference-protocol customs) cannot run inside
    forall/map_filter lambdas — the compiler must DROP them with a
    warning (never crash, never silently); JVM Column formats like
    'date' still compile per element."""
    schema = {
        "$schema": DRAFT,
        "$id": "fmt://hof/1.0",
        "type": "object",
        "properties": {
            "pats": {"items": {"type": "string", "format": "regex"}},
            "dates": {"items": {"type": "string", "format": "date"}},
        },
    }
    registry, issues = load_schemas([("s.json", schema)])
    warns = [i.description for i in issues if i.severity == "warning"]
    assert any("format" in w for w in warns), warns
    cs = registry["fmt://hof/1.0"]
    docs = [
        ("ok", {"pats": ["["], "dates": ["2024-02-29"]}),  # regex unchecked
        ("bad_date", {"dates": ["2024-02-31"]}),
        ("bad_type", {"pats": [3]}),
    ]
    shredded = shred_documents(spark, docs, cs)
    battery = row_checks.compile_battery(cs.table_spec.checks, json_mode=True)
    viol = row_checks.row_violations(shredded, F.col("__file"), battery)
    got = {}
    for r in viol.collect():
        got.setdefault(r.row_id, set()).add(r.reason)
    # the battery RUNS (no AnalysisException), date enforced per element
    assert got.get("bad_date") == {"format"}
    assert got.get("bad_type") == {"type"}
    assert "ok" not in got


def test_huge_int_enum_compiles(spark):
    """Round-4 review finding 3: enum members beyond float range must
    not crash the numeric-equality leg; exact literals still match."""
    schema = {
        "$schema": DRAFT,
        "$id": "enum://huge/1.0",
        "type": "object",
        "properties": {"h": {"enum": [10 ** 400, 5]}},
    }
    docs = [
        ("match_big", {"h": 10 ** 400}),
        ("match_small", {"h": 5.0}),
        ("miss", {"h": 7}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["match_big"] == [] and got["miss"] == ["enum"]


def test_additional_items_parity(spark):
    """additionalItems (drafts 03–2019-09): false caps the array at the
    tuple length (reason additionalItems); schema-form validates the
    tail with LEAF reasons; dict-form items ignores it — previously
    dropped with no warning at all."""
    schema = {
        "$schema": DRAFT,
        "$id": "ai://t/1.0",
        "type": "object",
        "properties": {
            "a": {"items": [{"type": "integer"}], "additionalItems": False},
            "b": {"items": [{"type": "integer"}],
                  "additionalItems": {"type": "string", "minLength": 2}},
            "c": {"items": {"type": "integer"}, "additionalItems": False},
        },
    }
    docs = [
        ("ok", {"a": [1], "b": [1, "ab"], "c": [1, 2, 3]}),
        ("too_long", {"a": [1, 2]}),
        ("tail_short", {"b": [1, "x"]}),
        ("tail_type", {"b": [1, 2]}),
        ("nonarr", {"a": 3}),
        ("empty", {"a": [], "b": []}),
    ]
    got = assert_jsonschema_parity(spark, schema, docs)
    assert got["too_long"] == ["additionalItems"]
    assert got["tail_short"] == ["minLength"]
    assert got["tail_type"] == ["type"]
