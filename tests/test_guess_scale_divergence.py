"""Guess-mode at table scale: the documented divergence (round 6).

The reference's guess mode (extensible_validator.py:1229-1340) is
inherently SEQUENTIAL: tries interleave with dispatched validation in
corpus order and a try is rejected on KEY COLLISION with the
registered-so-far worlds, so a doc structurally valid under schema A
can still be claimed by schema B because an EARLIER doc holds its
key.  run_suite mirrors this exactly (suite._guess_dispatch: one
distributed job for structural verdicts, a driver claim walk for key
worlds) — correct, but the claim walk is O(docs) driver state and
order-dependent, so it cannot be the 10^12-row path.

The recommended table-scale alternative is
dispatch.SchemaDispatcher.guess: FIRST-TRUE-WINS over the compiled
batteries in declaration order, no key claiming — one distributed
map-only pass, embarrassingly parallel, order-free.  The trade: key
collisions no longer re-route a doc to a later schema.  This test
PINS the exact doc where the two modes diverge, with the reference
subprocess confirming the sequential side.
"""

import json
import os
import subprocess
import sys

from python_extended_json_schema_validator_spark import TableSpec
from python_extended_json_schema_validator_spark.dispatch import (
    SchemaDispatcher,
)
from python_extended_json_schema_validator_spark.spec import ColumnCheck
from python_extended_json_schema_validator_spark.suite import run_suite

RUNNER = os.path.join(os.path.dirname(__file__), "ref_runner.py")

A = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "guess://strict/1.0",
    "type": "object",
    "properties": {"k": {"type": "string", "primary_key": True}},
    "required": ["k"],
    "additionalProperties": False,
}
B = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "guess://loose/1.0",
    "type": "object",
    "properties": {"k": {"type": ["string", "integer"]}},
    "required": ["k"],
    "additionalProperties": False,
}
DOCS = [
    ("d1", {"k": "x"}),  # claims A, registers PK "x"
    ("d2", {"k": "x"}),  # structurally A-valid; key collision -> B
    ("d3", {"k": 5}),    # structurally fails A (type) -> B
]


def _ref_two_file_order():
    """The reference's guess loop iterates schemaHash INSERTION order
    = os.listdir discovery order ([probed] extensible_validator.py:
    1234 `for schemaObj in p_schemaHash.values()` + :207 os.listdir)
    — on ext4 that is htree HASH order of the filenames, not creation
    or sorted order.  Learn this FS's order for ref_runner's s0/s1
    naming so the differential can place the strict schema in the
    slot the reference tries FIRST."""
    import tempfile

    d = tempfile.mkdtemp(prefix="schemas")
    for i in range(2):
        with open(f"{d}/s{i}.json", "w") as f:
            f.write("{}")
    return [int(n[1]) for n in os.listdir(d)]


def test_sequential_guess_reroutes_on_key_collision(spark):
    res = run_suite(
        spark, [("a.json", A), ("b.json", B)], DOCS, guess_unmatched=True
    )
    # the engine tries candidates in deterministic LOAD order (A
    # first); the reference's own order is filesystem-incidental (see
    # _ref_two_file_order) — pinning load order is the deliberate,
    # documented choice
    assert res.doc_schema == {
        "d1": "guess://strict/1.0",
        "d2": "guess://loose/1.0",  # the key-collision re-route
        "d3": "guess://loose/1.0",
    }
    assert not any(res.per_file.values())

    # differential: arrange the payload slots so the reference tries
    # STRICT first on this filesystem, then compare doc-for-doc
    order = _ref_two_file_order()
    slots = [None, None]
    slots[order[0]] = A  # tried first
    slots[order[1]] = B
    payload = json.dumps(
        {
            "schemas": slots,
            "docs": [[n, d] for n, d in DOCS],
            "config": {},
            "guess": True,
            "report": True,
        }
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = json.loads(proc.stdout)
    ref_assign = {e["file"]: e["schema_id"] for e in ref["docs"]}
    assert ref_assign == res.doc_schema


def test_table_scale_guess_is_first_true_wins(spark):
    """The 10^12-row path: SchemaDispatcher.guess assigns d2 to A —
    structurally first-true-wins, NO key claiming.  This divergence is
    deliberate and documented (COVERAGE.md): at table scale the
    sequential claim walk would serialize the corpus through the
    driver; uniqueness still flags d2 as dup_pk INSIDE schema A's
    engine run afterwards, so the collision is reported, not lost —
    it just no longer re-routes the doc."""
    df = spark.createDataFrame(
        [("d1", "x"), ("d2", "x"), ("d3", "y")], "file string, k string"
    )
    specs = {
        "guess://strict/1.0": TableSpec(
            name="strict",
            row_id="file",
            checks=[ColumnCheck(column="k", required=True,
                                pattern="^[a-z]+$")],
        ),
        "guess://loose/1.0": TableSpec(
            name="loose",
            row_id="file",
            checks=[ColumnCheck(column="k", required=True)],
        ),
    }
    disp = SchemaDispatcher(specs)
    got = {
        r.file: r["__matched_schema"]
        for r in disp.guess(df).select("file", "__matched_schema").collect()
    }
    # ALL rows match the first schema structurally — d2 included:
    # the key collision does not re-route at table scale
    assert got == {
        "d1": "guess://strict/1.0",
        "d2": "guess://strict/1.0",
        "d3": "guess://strict/1.0",
    }
