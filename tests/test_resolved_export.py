"""Consolidated-schema export parity: export_resolved /
export_resolved_schemas vs the ACTUAL reference's
getValidSchemas(do_resolve=True) → export_resolved_references
(extend_validator_helpers.py:405-471), run in a fresh subprocess."""

import json
import os
import subprocess
import sys

import pytest

from python_extended_json_schema_validator_spark.schemas import (
    export_resolved_schemas,
    load_schemas,
)

DRAFT = "http://json-schema.org/draft-07/schema#"


def reference_resolve(schemas: list) -> dict:
    runner = os.path.join(os.path.dirname(__file__), "ref_runner.py")
    proc = subprocess.run(
        [sys.executable, runner],
        input=json.dumps({"schemas": schemas, "docs": [], "resolve": True}),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, f"reference runner failed: {proc.stderr[-2000:]}"
    return json.loads(proc.stdout)


def engine_resolve(schemas: list) -> dict:
    registry, issues = load_schemas(
        [(f"s{i}.json", s) for i, s in enumerate(schemas)]
    )
    assert [i for i in issues if i.severity == "error"] == [], issues
    return export_resolved_schemas(registry)


def assert_resolution_parity(schemas: list):
    want = reference_resolve(schemas)
    got = engine_resolve(schemas)
    assert set(got) == set(want)
    for uri in want:
        assert got[uri] == want[uri], (
            f"{uri}: engine {json.dumps(got[uri], sort_keys=True)} != "
            f"reference {json.dumps(want[uri], sort_keys=True)}"
        )
    return got


def test_internal_fragment_ref_inlined():
    """SAME-document fragment refs: the reference's own export CRASHES
    here (verified 2026-08-16: refResolver_find_in_subschemas misses
    the root document, then _remote_cache raises _RefResolutionError
    'Unresolvable JSON pointer') — a latent reference bug, so this
    case is engine-only: we resolve it correctly instead of mirroring
    the crash."""
    schema = {
        "$schema": DRAFT,
        "$id": "res://frag/1.0",
        "definitions": {"pid": {"type": "string", "pattern": "^p"}},
        "type": "object",
        "properties": {
            "pid": {"$ref": "#/definitions/pid"},
            "alt": {"$ref": "#/definitions/pid"},
        },
    }
    got = engine_resolve([schema])
    props = got["res://frag/1.0"]["properties"]
    assert props["pid"] == {"type": "string", "pattern": "^p"}
    assert props["alt"] == {"type": "string", "pattern": "^p"}


def test_cross_schema_ref_inlined():
    dim = {
        "$schema": DRAFT,
        "$id": "res://dim/1.0",
        "type": "object",
        "properties": {"code": {"type": "string", "minLength": 2}},
    }
    fact = {
        "$schema": DRAFT,
        "$id": "res://fact/1.0",
        "type": "object",
        "properties": {
            "whole": {"$ref": "res://dim/1.0"},
            "part": {"$ref": "res://dim/1.0#/properties/code"},
        },
    }
    got = assert_resolution_parity([dim, fact])
    props = got["res://fact/1.0"]["properties"]
    assert props["part"] == {"type": "string", "minLength": 2}
    assert props["whole"]["properties"]["code"] == {
        "type": "string", "minLength": 2,
    }


def test_ref_chain_across_three_schemas():
    a = {
        "$schema": DRAFT, "$id": "res://a/1.0",
        "definitions": {"leaf": {"type": "integer", "minimum": 1}},
    }
    b = {
        "$schema": DRAFT, "$id": "res://b/1.0",
        "definitions": {"mid": {"$ref": "res://a/1.0#/definitions/leaf"}},
    }
    c = {
        "$schema": DRAFT, "$id": "res://c/1.0",
        "type": "object",
        "properties": {"x": {"$ref": "res://b/1.0#/definitions/mid"}},
    }
    got = assert_resolution_parity([a, b, c])
    assert got["res://c/1.0"]["properties"]["x"] == {
        "type": "integer", "minimum": 1,
    }


def test_circular_ref_terminates_with_reference_semantics():
    """Two schemas referencing each other: the reference stops at the
    re-entered context and returns the raw target; both sides must
    produce the SAME (finite) output."""
    a = {
        "$schema": DRAFT, "$id": "res://cyca/1.0",
        "type": "object",
        "properties": {"b": {"$ref": "res://cycb/1.0"}},
    }
    b = {
        "$schema": DRAFT, "$id": "res://cycb/1.0",
        "type": "object",
        "properties": {"a": {"$ref": "res://cyca/1.0"}},
    }
    assert_resolution_parity([a, b])


def test_sibling_keys_of_ref_are_discarded():
    """Reference quirk: a node carrying $ref is wholly replaced by the
    target — draft-07 semantics (siblings ignored).  Cross-schema form
    so the reference's export survives (see
    test_internal_fragment_ref_inlined)."""
    base = {
        "$schema": DRAFT,
        "$id": "res://sibbase/1.0",
        "definitions": {"t": {"type": "string"}},
    }
    schema = {
        "$schema": DRAFT,
        "$id": "res://sib/1.0",
        "type": "object",
        "properties": {
            "x": {
                "$ref": "res://sibbase/1.0#/definitions/t",
                "description": "overridden",
            },
        },
    }
    got = assert_resolution_parity([base, schema])
    assert got["res://sib/1.0"]["properties"]["x"] == {"type": "string"}


def test_unresolvable_ref_raises():
    schema = {
        "$schema": DRAFT,
        "$id": "res://bad/1.0",
        "type": "object",
        "properties": {"x": {"$ref": "res://nowhere/9.9"}},
    }
    # load_schemas flags the unresolvable ref at compile time already;
    # export on a hand-built cache must raise like the reference
    from python_extended_json_schema_validator_spark.schemas import (
        export_resolved,
    )

    with pytest.raises(ValueError, match="Unable to finish resolution"):
        export_resolved("res://bad/1.0", schema, {"res://bad/1.0": schema})
