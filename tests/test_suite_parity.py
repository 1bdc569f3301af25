"""GOLDEN parity on the reference's OWN test-data suites: run the
actual reference validator (fresh subprocess, tests/ref_runner.py) and
this engine's suite runner on the same schema files + document dirs,
and compare per-file violation reasons and pass/fail.

This is the acceptance test for JSON Schema document ingestion
(schemas.py + docshred.py + suite.py): a user of the reference can
point this engine at their existing test-data/*/schemas/*.json and
get the same verdicts.

Documents are fed to BOTH sides in sorted order, so the reference's
first-seen duplicate survivor == this engine's min-row_id survivor.
"""

import json
import os
import subprocess
import sys

import pytest

from python_extended_json_schema_validator_spark.schemas import (
    load_schemas,
    parse_json_or_yaml,
    scan_files,
)
from python_extended_json_schema_validator_spark.suite import run_suite, scan_documents

BASE = "/root/reference/test-data"
RUNNER = os.path.join(os.path.dirname(__file__), "ref_runner.py")

KEY_REASONS = {
    "dup_unique", "dup_pk", "stale_fk", "dangling_fk", "stale_jk", "dangling_jk",
}


def normalize(per_file: dict) -> dict:
    """Engine keyword reasons (type/minimum/...) ⇔ the reference's
    generic 'schema_error' for structural failures."""
    return {
        f: sorted(r if r in KEY_REASONS else "schema_error" for r in reasons)
        for f, reasons in per_file.items()
    }


def reference_run(schema_files, docs, config=None, warm_up=False):
    payload = json.dumps(
        {
            "schemas": [parse_json_or_yaml(f) for f in schema_files],
            "docs": [[n, d] for n, d in docs],
            "config": config or {},
            "warm_up": warm_up,
        }
    )
    proc = subprocess.run(
        [sys.executable, RUNNER], input=payload, capture_output=True,
        text=True, timeout=180,
    )
    assert proc.returncode == 0, f"reference runner failed: {proc.stderr[-2000:]}"
    return json.loads(proc.stdout)


def schema_files_for(suite: str, source) -> list:
    if source == "schemas":
        return scan_files(f"{BASE}/{suite}/schemas")
    return [f"{BASE}/{suite}/{f}" for f in source]


# (suite, schema source, doc subdirs, config file, warm_up)
SUITES = [
    ("compound_pk", ["compound_pk_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("compound_unique", ["compound_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("fk_simple_example", "schemas",
     ["good_validation", "bad_validation", "bad_validation_2"], None, False),
    ("fk_to_named_pk", "schemas",
     ["good_validation", "bad_validation"], None, False),
    ("fk_with_inline", "schemas",
     ["good_validation", "bad_validation"], "ejv_inline.yaml", True),
    ("fk_with_inline_simple", "schemas",
     ["good_validation", "bad_validation"], "ejv_inline_simple.yaml", True),
    ("foreign_key_example", "schemas",
     ["good_validation", "bad_validation"], None, False),
    ("multiple_unique", ["multiple_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("named_pk", ["named_pk_schema.json"], ["good_validation"], None, False),
    ("named_unique", ["named_unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
    ("unique_simple", ["unique_schema.json"],
     ["good_validation", "bad_validation"], None, False),
]

CASES = [
    pytest.param(suite, source, sub, cfg, warm, id=f"{suite}-{sub}")
    for suite, source, subs, cfg, warm in SUITES
    for sub in subs
]


@pytest.mark.parametrize("suite,source,sub,cfg,warm", CASES)
def test_suite_parity(spark, suite, source, sub, cfg, warm):
    sfiles = schema_files_for(suite, source)
    docs = [
        (os.path.basename(f), d)
        for f, d, err in scan_documents(f"{BASE}/{suite}/{sub}")
        if err is None
    ]
    config = parse_json_or_yaml(f"{BASE}/{suite}/{cfg}") if cfg else None

    ref = reference_run(sfiles, docs, config=config, warm_up=warm)

    schemas = [(f, parse_json_or_yaml(f)) for f in sfiles]
    res = run_suite(spark, schemas, docs, config=config)

    assert res.schema_issues == [], res.schema_issues
    got = normalize(res.per_file)
    want = normalize(ref)
    assert got == want, f"{suite}/{sub}: engine {got} != reference {want}"
    # pass/fail parity: reference exit 2 ⇔ any error ⇔ engine exit 2
    ref_fails = any(v for v in want.values())
    assert (res.exit_code == 2) == ref_fails
    if not ref_fails:
        assert res.exit_code == 0


def test_wrong_schema_rejected():
    """unique_schema_wrong.json carries `unique: 18` — the reference
    rejects it at schema-validation time (exit 1 with no loadable
    schema, [verified]); load_schemas must reject it too."""
    f = f"{BASE}/unique_simple/unique_schema_wrong.json"
    registry, issues = load_schemas([(f, parse_json_or_yaml(f))])
    assert registry == {}
    assert any(i.reason == "schema_error" for i in issues)


def test_duplicate_schema_id_rejected():
    """named_unique ships three files sharing one $id — later files
    are dup_id rejects (extensible_validator.py:347-365)."""
    files = [
        f"{BASE}/named_unique/named_unique_schema.json",
        f"{BASE}/named_unique/duplicated_named_unique_schema.json",
    ]
    registry, issues = load_schemas([(f, parse_json_or_yaml(f)) for f in files])
    assert len(registry) == 1
    assert [i.reason for i in issues] == ["dup_id"]


def test_schema_hash_matches_reference():
    """GetNormalizedJSONHash parity (extensible_validator.py:832-839)."""
    from python_extended_json_schema_validator_spark.schemas import (
        normalized_json_hash,
    )

    schema = parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json")
    import hashlib

    want = hashlib.sha1(
        json.dumps(
            schema, sort_keys=True, indent=None, separators=(",", ":")
        ).encode("utf-8")
    ).hexdigest()
    assert normalized_json_hash(schema) == want


def test_yaml_document_fallback(tmp_path, spark):
    """A corrupt-JSON-but-valid-YAML document parses via the fallback
    (extensible_validator.py:1014-1053)."""
    sdir = tmp_path / "docs"
    sdir.mkdir()
    (sdir / "doc1.json").write_text(
        '"@schema": compound_pk_example/1.0\nlocal_id: uno\nother_id: diez\n'
    )
    schemas = [
        (
            "s.json",
            parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json"),
        )
    ]
    res = run_suite(spark, schemas, str(sdir))
    assert res.exit_code == 0
    assert list(res.per_file.values()) == [[]]


def test_unparseable_document_is_fatal(tmp_path, spark):
    (tmp_path / "bad.json").write_text("{: not json or yaml :}{")
    schemas = [
        (
            "s.json",
            parse_json_or_yaml(f"{BASE}/compound_pk/compound_pk_schema.json"),
        )
    ]
    res = run_suite(spark, schemas, str(tmp_path))
    assert res.exit_code == 2
    assert list(res.per_file.values()) == [["fatal"]]
