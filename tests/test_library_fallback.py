"""Library-verdict escape hatch (library_fallback.py): schemas whose
compilation records warnings validate through the ACTUAL jsonschema
stack — differential against the REAL reference validator
(tests/ref_runner.py subprocess) on shapes the compiler cannot
express, plus plan proofs that compiled-clean schemas never enter the
Python stage.
"""

import json
import subprocess
import sys
import os

import pytest
from pyspark.sql import functions as F

from python_extended_json_schema_validator_spark.schemas import load_schemas
from python_extended_json_schema_validator_spark.suite import (
    run_suite,
    validate_json_table,
)

RUNNER = os.path.join(os.path.dirname(__file__), "ref_runner.py")

KEY_REASONS = {
    "dup_unique", "dup_pk", "stale_fk", "dangling_fk", "stale_jk",
    "dangling_jk", "fatal",
}


def normalize(per_file: dict) -> dict:
    return {
        f: sorted(r if r in KEY_REASONS else "schema_error" for r in reasons)
        for f, reasons in per_file.items()
    }


def reference_run(schemas, docs, config=None):
    payload = json.dumps(
        {"schemas": schemas, "docs": [[n, d] for n, d in docs],
         "config": config or {}}
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout)


D2020 = "https://json-schema.org/draft/2020-12/schema"
D07 = "http://json-schema.org/draft-07/schema#"

# items whose anyOf branches are OBJECT schemas with nested properties
# — not scalar-expressible, so the compiler records a warning and only
# partially enforces (the uncompiled residue: branch object shapes).
# draft-07: the reference cannot load 2019-09/2020-12 schemas OFFLINE
# (its meta-validation resolves the sub-meta documents over HTTP), so
# the reference-subprocess differentials stick to single-file-meta
# drafts; 2020-12 shapes are differentialed against jsonschema
# directly below (the exact library the reference delegates to).
WARNED_SCHEMA = {
    "$schema": D07,
    "$id": "lf://deep/1.0",
    "type": "object",
    "properties": {
        "fid": {"type": "string"},
        "rows": {
            "type": "array",
            "items": {
                "anyOf": [
                    {
                        "type": "object",
                        "properties": {
                            "kind": {"const": "point"},
                            "xy": {
                                "type": "array",
                                "items": {"type": "number"},
                                "minItems": 2,
                            },
                        },
                        "required": ["kind", "xy"],
                    },
                    {
                        "type": "object",
                        "properties": {
                            "kind": {"const": "label"},
                            "text": {"type": "string", "minLength": 1},
                        },
                        "required": ["kind", "text"],
                    },
                ]
            },
        },
    },
    "required": ["fid"],
    "primary_key": ["fid"],
}

DOCS = [
    ("ok_point", {"@schema": "lf://deep/1.0", "fid": "a",
                  "rows": [{"kind": "point", "xy": [1, 2]}]}),
    ("ok_label", {"@schema": "lf://deep/1.0", "fid": "b",
                  "rows": [{"kind": "label", "text": "hi"}]}),
    # fails ONLY the uncompiled residue: object branch internals
    ("short_xy", {"@schema": "lf://deep/1.0", "fid": "c",
                  "rows": [{"kind": "point", "xy": [1]}]}),
    ("empty_text", {"@schema": "lf://deep/1.0", "fid": "d",
                    "rows": [{"kind": "label", "text": ""}]}),
    ("bad_kind", {"@schema": "lf://deep/1.0", "fid": "e",
                  "rows": [{"kind": "circle", "r": 3}]}),
    # fails a COMPILED check too (rows not an array)
    ("not_array", {"@schema": "lf://deep/1.0", "fid": "f", "rows": 3}),
    ("missing_fid", {"@schema": "lf://deep/1.0",
                     "rows": [{"kind": "label", "text": "x"}]}),
    # duplicate PK vs 'a' — but 'a2' also fails the residue, so the
    # reference revokes it and registers NO key: no dup_pk may appear
    ("revoked_dup", {"@schema": "lf://deep/1.0", "fid": "a",
                     "rows": [{"kind": "point", "xy": [9]}]}),
    # true duplicate: passes everything, collides with 'a'
    ("true_dup", {"@schema": "lf://deep/1.0", "fid": "a",
                  "rows": [{"kind": "point", "xy": [3, 4]}]}),
]


def test_schema_is_actually_warned():
    registry, issues = load_schemas([("s.json", WARNED_SCHEMA)])
    cs = registry["lf://deep/1.0"]
    assert cs.warnings, "fixture must exercise the warned path"
    assert cs.ref_cache is not None


def test_fallback_matches_reference(spark):
    res = run_suite(
        spark, [("s.json", WARNED_SCHEMA)], DOCS, library_fallback=True
    )
    ref = reference_run([WARNED_SCHEMA], DOCS)
    assert normalize(res.per_file) == normalize(ref)


def test_without_fallback_underreports(spark):
    # sanity that the fixture exercises real residue: compiled-only
    # under-reports the object-branch internals
    res = run_suite(
        spark, [("s.json", WARNED_SCHEMA)], DOCS, library_fallback=False
    )
    ref = reference_run([WARNED_SCHEMA], DOCS)
    assert normalize(res.per_file) != normalize(ref)
    # specifically: short_xy's residue failure is invisible to the
    # compiled battery
    assert res.per_file["short_xy"] == []
    assert ref["short_xy"] != []


DYN_OVERRIDE = {
    "$schema": D2020,
    "$id": "lf://dyn/1.0",
    "type": "object",
    "$defs": {
        "amt": {"$dynamicAnchor": "T", "type": "integer", "minimum": 0},
    },
    "properties": {
        "v": {"$dynamicRef": "#T"},
    },
}

# a SECOND loaded resource declaring the same $dynamicAnchor — an
# override of the lexical target is POSSIBLE, so the compiler keeps
# the lexical fallback but records the dynamic-residue warning
DYN_OTHER = {
    "$schema": D2020,
    "$id": "lf://dyn/other",
    "$dynamicAnchor": "T",
    "type": "string",
}

DYN_DOCS = [
    ("d_ok", {"@schema": "lf://dyn/1.0", "v": 3}),
    ("d_neg", {"@schema": "lf://dyn/1.0", "v": -2}),
    ("d_str", {"@schema": "lf://dyn/1.0", "v": "abcd"}),
    ("d_null", {"@schema": "lf://dyn/1.0", "v": None}),
]


def test_dynamic_override_matches_jsonschema(spark):
    # 2020-12 dynamic override — the reference subprocess cannot load
    # 2020-12 offline (remote sub-meta resolution), so the oracle is
    # the jsonschema library itself, built EXACTLY like the reference
    # builds it (validator_for + FormatChecker)
    import jsonschema

    registry, _ = load_schemas(
        [("s1.json", DYN_OVERRIDE), ("s2.json", DYN_OTHER)]
    )
    assert registry["lf://dyn/1.0"].warnings
    res = run_suite(
        spark,
        [("s1.json", DYN_OVERRIDE), ("s2.json", DYN_OTHER)],
        DYN_DOCS,
        library_fallback=True,
    )
    v = jsonschema.validators.validator_for(DYN_OVERRIDE)(
        DYN_OVERRIDE, format_checker=jsonschema.FormatChecker()
    )
    for name, doc in DYN_DOCS:
        want = sorted(
            e.validator if isinstance(e.validator, str) else "schema_error"
            for e in v.iter_errors(doc)
        )
        assert res.per_file[name] == want, (name, res.per_file[name], want)


CLEAN_SCHEMA = {
    "$schema": D2020,
    "$id": "lf://clean/1.0",
    "type": "object",
    "properties": {
        "fid": {"type": "string"},
        "n": {"type": "integer", "minimum": 0},
    },
    "required": ["fid"],
    "primary_key": ["fid"],
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_clean_schema_never_enters_python(spark):
    registry, issues = load_schemas([("s.json", CLEAN_SCHEMA)])
    assert not registry["lf://clean/1.0"].warnings
    rows = [("f1", json.dumps({"@schema": "lf://clean/1.0", "fid": "x",
                               "n": -1}))]
    df = spark.createDataFrame(rows, "file string, json string")
    result, _ = validate_json_table(
        spark, [("s.json", CLEAN_SCHEMA)], df, library_fallback=True
    )
    plan = _plan(result.row_viol["lf://clean/1.0"])
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    got = {(r.reason, r.row_id)
           for r in result.row_viol["lf://clean/1.0"].collect()}
    assert got == {("minimum", "f1")}


def test_warned_schema_distributed_path(spark):
    # the distributed (file, json-text) entry point takes the same
    # escape hatch; the library stage shows up as exactly one
    # ArrowEvalPython over __raw
    rows = [(n, json.dumps(d)) for n, d in DOCS]
    df = spark.createDataFrame(rows, "file string, json string")
    result, registry = validate_json_table(
        spark, [("s.json", WARNED_SCHEMA)], df, library_fallback=True
    )
    plan = _plan(result.row_viol["lf://deep/1.0"])
    assert "ArrowEvalPython" in plan
    per_file: dict = {n: [] for n, _ in DOCS}
    for r in result.violations.collect():
        per_file[r.row_id].append(r.reason)
    ref = reference_run([WARNED_SCHEMA], DOCS)
    assert normalize(per_file) == normalize(ref)


# ---------------------------------------------------------------------------
# round-5: sequential forget cascades (EngineConfig.forget_mode)
# ---------------------------------------------------------------------------

CASCADE_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "casc://v/1.0",
    "type": "object",
    "properties": {
        "a": {"type": "string", "unique": True},
        "b": {"type": "string", "unique": True},
        "n": {"type": "integer", "minimum": 0},
    },
}


def _casc_docs(rows):
    return [
        (f"d{i+1}", {"@schema": "casc://v/1.0", **r})
        for i, r in enumerate(rows)
    ]


CASCADE_CASES = {
    # d2 dups a → forgotten → its b=q de-registered → d3 clean
    "cascade": _casc_docs(
        [{"a": "x", "b": "p"}, {"a": "x", "b": "q"}, {"a": "y", "b": "q"}]
    ),
    # control: d2 clean → d3 dups b
    "control": _casc_docs(
        [{"a": "x", "b": "p"}, {"a": "z", "b": "q"}, {"a": "y", "b": "q"}]
    ),
    # d2 forgotten, d3 becomes the b=q holder, d4 dups d3
    "chain4": _casc_docs(
        [{"a": "x", "b": "p"}, {"a": "x", "b": "q"},
         {"a": "y", "b": "q"}, {"a": "w", "b": "q"}]
    ),
    # STRUCTURAL failure also forgets: d2 fails minimum AND holds
    # fresh b=q → d3 clean; d2 still reports its a-dup (registration
    # precedes forget)
    "struct_forget": _casc_docs(
        [{"a": "x", "b": "p"}, {"a": "x", "b": "q", "n": -1},
         {"a": "y", "b": "q"}]
    ),
    # deeper alternation: d2 dup-a forgotten; d3 holds b; d4 dups b
    # (forgotten) releasing c?—no third key, keep simple depth-2 mix
    "mixed": _casc_docs(
        [{"a": "x"}, {"a": "x", "b": "q"}, {"b": "q"}, {"b": "q"}]
    ),
}


@pytest.mark.parametrize("case", sorted(CASCADE_CASES))
def test_sequential_forget_matches_reference(spark, case):
    docs = CASCADE_CASES[case]
    res = run_suite(spark, [("s.json", CASCADE_SCHEMA)], docs)
    ref = reference_run([CASCADE_SCHEMA], docs)
    assert normalize(res.per_file) == normalize(ref), (
        case, res.per_file, ref,
    )


def test_oneshot_vs_sequential_divergence_documented(spark):
    # the scale default ('oneshot') intentionally approximates: d3 is
    # flagged against the struct-ok d2 even though the reference
    # forgets d2 — this test PINS the documented divergence so a
    # future change is a conscious one
    from python_extended_json_schema_validator_spark.engine import (
        EngineConfig,
    )

    docs = CASCADE_CASES["cascade"]
    seq = run_suite(spark, [("s.json", CASCADE_SCHEMA)], docs)
    one = run_suite(
        spark, [("s.json", CASCADE_SCHEMA)], docs,
        engine_config=EngineConfig(forget_mode="oneshot"),
    )
    assert seq.per_file["d3"] == []          # reference-exact
    assert one.per_file["d3"] == ["dup_unique"]  # one-pass approximation
    assert seq.per_file["d2"] == one.per_file["d2"] == ["dup_unique"]
    # pin the PER-SURFACE defaults too (the policy paragraph on
    # EngineConfig.forget_mode): engine API = 'oneshot' (table-scale
    # surface), suite/CLI = 'sequential' (reference-parity surface,
    # asserted behaviorally above — `seq` passed no engine_config)
    assert EngineConfig().forget_mode == "oneshot"


# ---------------------------------------------------------------------------
# round-5: guess-mode sequential key semantics (reference probes)
# ---------------------------------------------------------------------------

GUESS_S1 = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "g://one/1.0",
    "type": "object",
    "properties": {"a": {"type": "string", "unique": True}},
    "required": ["a"],
}
GUESS_S2 = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "$id": "g://two/1.0",
    "type": "object",
    "properties": {"a": {"type": "string"}},
    "required": ["a"],
}

GUESS_CASES = {
    # unmatched doc dups the dispatched holder → try rejected → claim
    # falls through to the key-less second schema → clean
    "fallthrough": (
        [GUESS_S1, GUESS_S2],
        [("d1", {"@schema": "g://one/1.0", "a": "x"}), ("u1", {"a": "x"})],
    ),
    # single candidate: the failed try's dup error is REPORTED
    "guess_dup": (
        [GUESS_S1],
        [("d1", {"@schema": "g://one/1.0", "a": "x"}), ("u1", {"a": "x"})],
    ),
    # unmatched doc EARLIER in corpus order claims and registers; the
    # dispatched doc after it becomes the duplicate
    "guess_first": (
        [GUESS_S1],
        [("a_u1", {"a": "x"}), ("b_d2", {"@schema": "g://one/1.0", "a": "x"})],
    ),
    # guessed docs register sequentially among themselves
    "guess_seq": (
        [GUESS_S1],
        [("a_u1", {"a": "x"}), ("b_u2", {"a": "x"}), ("c_u3", {"a": "y"})],
    ),
    # structural failure reasons accumulate per failed try
    "guess_struct": (
        [GUESS_S1, GUESS_S2],
        [("u1", {"b": 1})],
    ),
}


@pytest.mark.parametrize("case", sorted(GUESS_CASES))
def test_guess_sequential_matches_reference(spark, case):
    schemas, docs = GUESS_CASES[case]
    res = run_suite(
        spark, [(f"s{i}.json", s) for i, s in enumerate(schemas)],
        docs, guess_unmatched=True,
    )
    payload = json.dumps(
        {"schemas": schemas, "docs": [[n, d] for n, d in docs],
         "config": {}, "guess": True}
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ref = json.loads(proc.stdout)
    assert normalize(res.per_file) == normalize(ref), (
        case, res.per_file, ref,
    )


def test_custom_formats_ride_the_fallback(spark):
    """Custom formats (regex AND reference-protocol callables) must
    register on the fallback's FormatChecker exactly like the
    reference's customFormatCheckerInstance.checks registration
    (extensible_validator.py:132-138)."""

    class EvenFormat:
        FormatName = "evenlen"

        @staticmethod
        def IsCorrectFormat(v):
            return not isinstance(v, str) or len(v) % 2 == 0

    schema = {
        "$schema": D07,
        "$id": "lf://fmt/1.0",
        "type": "object",
        "properties": {
            # items.anyOf object branches → warned → fallback active;
            # the format sits INSIDE the residue so only the library
            # stack can enforce it
            "recs": {
                "items": {
                    "anyOf": [
                        {
                            "type": "object",
                            "properties": {
                                "code": {
                                    "type": "string",
                                    "format": "hexcode",
                                },
                            },
                            "required": ["code"],
                        },
                        {"type": "integer"},
                    ]
                }
            },
            "tag": {"type": "string", "format": "evenlen"},
        },
    }
    from python_extended_json_schema_validator_spark.schemas import (
        normalize_custom_formats,
    )

    registry, issues = load_schemas(
        [("s.json", schema)],
        custom_formats={"hexcode": r"^[0-9a-f]+$"},
    )
    cs = registry["lf://fmt/1.0"]
    assert cs.warnings
    # merge in the protocol-class format (callable with py_pred)
    import dataclasses

    fmts = dict(cs.table_spec.custom_formats or {})
    fmts.update(normalize_custom_formats([EvenFormat]))
    cs = dataclasses.replace(
        cs, table_spec=dataclasses.replace(
            cs.table_spec, custom_formats=fmts
        )
    )
    registry = {cs.uri: cs}

    from python_extended_json_schema_validator_spark.library_fallback import (
        build_validator,
        library_errors_column,
        library_pass1_ok,
    )

    # executor-side construction smoke: the validator itself
    v = build_validator(cs.schema, cs.uri, {cs.uri: cs.schema}, fmts)
    errs = {e.validator for e in v.iter_errors(
        {"recs": [{"code": "xyz!"}], "tag": "odd"}
    )}
    assert errs == {"anyOf", "format"}

    # end-to-end through the Spark stage (pickling the format closures)
    import json as _json

    rows = [
        ("ok", _json.dumps({"recs": [{"code": "1a2b"}, 5], "tag": "ab"})),
        ("bad_code", _json.dumps({"recs": [{"code": "XYZ"}]})),
        ("bad_tag", _json.dumps({"tag": "abc"})),
    ]
    df = spark.createDataFrame(rows, "file string, json string").withColumnRenamed("json", "__raw")
    col = library_errors_column(
        cs.schema, cs.uri, {cs.uri: cs.schema}, fmts
    )
    got = {
        r["file"]: sorted(e["reason"] for e in (r["e"] or []))
        for r in df.select("file", col.alias("e")).collect()
    }
    assert got == {
        "ok": [],
        "bad_code": ["anyOf"],
        "bad_tag": ["format"],
    }, got


# ---------------------------------------------------------------- #
# Round 6: reference parity is the DEFAULT, not an opt-in.  The     #
# reference enforces every JSON-Schema shape unconditionally        #
# (extend_validator_helpers.py:50-64 via                            #
# extensible_validator.py:1163-1194), so a default-config run must  #
# never under-report vs it.  library_fallback now defaults to True  #
# on run_suite / validate_json_table / the CLI, matching the        #
# forget_mode="sequential" parity-by-default policy.                #
# ---------------------------------------------------------------- #


def test_default_run_suite_matches_reference(spark):
    """run_suite with NO library_fallback argument (the default
    surface a reference user lands on) bit-matches the reference's
    per-file reasons on a warned schema."""
    res = run_suite(spark, [("s.json", WARNED_SCHEMA)], DOCS)
    ref = reference_run([WARNED_SCHEMA], DOCS)
    assert normalize(res.per_file) == normalize(ref)


def test_default_cli_matches_reference(spark, tmp_path):
    """The module CLI with NO flags on a warned schema: per-file
    report reasons bit-match the reference subprocess, and
    --no-library-fallback is the documented opt-OUT (under-reports
    the residue, loudly warned)."""
    from python_extended_json_schema_validator_spark.__main__ import main

    sdir = tmp_path / "schemas"
    ddir = tmp_path / "docs"
    sdir.mkdir()
    ddir.mkdir()
    (sdir / "s.json").write_text(json.dumps(WARNED_SCHEMA))
    for name, doc in DOCS:
        (ddir / f"{name}.json").write_text(json.dumps(doc))

    rep = tmp_path / "rep.json"
    rc = main([str(sdir), str(ddir), "--report", str(rep),
               "--quiet-report"])
    assert rc == 2
    entries = json.load(open(rep))
    got = {
        os.path.splitext(os.path.basename(e["file"]))[0]:
            sorted(x["reason"] for x in e.get("errors", []))
        for e in entries if "uri" not in e
    }
    ref = reference_run([WARNED_SCHEMA], DOCS)
    assert normalize(got) == normalize(ref)
    # the residue-only failure is present by DEFAULT now
    assert got["short_xy"] != []

    # opt-out: --no-library-fallback restores the compiled-only plan
    # (short_xy's object-branch residue is invisible again)
    rep2 = tmp_path / "rep2.json"
    rc = main([str(sdir), str(ddir), "--report", str(rep2),
               "--quiet-report", "--no-library-fallback"])
    assert rc == 2
    entries2 = json.load(open(rep2))
    got2 = {
        os.path.splitext(os.path.basename(e["file"]))[0]:
            sorted(x["reason"] for x in e.get("errors", []))
        for e in entries2 if "uri" not in e
    }
    assert got2["short_xy"] == []
    assert normalize(got2) != normalize(ref)


def test_default_validate_json_table_enforces_residue(spark):
    """validate_json_table's default now routes warned-schema rows
    through the library stage: the residue-only failure (short_xy)
    produces violations with no explicit flag."""
    rows = [(n, json.dumps(d)) for n, d in DOCS]
    df = spark.createDataFrame(rows, "file string, json string")
    result, registry = validate_json_table(
        spark, [("s.json", WARNED_SCHEMA)], df
    )
    files = {
        r.row_id for r in
        result.row_viol["lf://deep/1.0"].select("row_id").collect()
    }
    assert "short_xy" in files
